"""Python UDTF surface (Spark 4): document chunking as a table function.

SURVEY.md §2.9 marks UDTF as 'absent, available if needed' — chunking is
the natural need: RAG pipelines split documents into overlapping chunks
before embedding (the reference embeds whole rows, ``rag.py:48-49``, which
caps its retrieval granularity). The NATIVE implementation
(plans/chunking.py) is the production path — JVM-side, oracle-checked;
this UDTF is the same semantics through the Python-table-function API for
cases that need imperative chunking (tokenizer-aware boundaries etc.).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkDocument:
    """Whitespace-token chunker: windows of ``size`` tokens advancing by
    ``stride`` (overlap = size - stride). Emits at least one chunk for
    non-empty docs; trailing windows shorter than ``size`` are kept."""

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        i = 0
        idx = 0
        while i < len(toks):
            window = toks[i : i + size]
            yield idx, " ".join(window), len(window)
            if i + size >= len(toks):
                break
            i += stride
            idx += 1
