from emails_to_vector_db_spark.pipeline.embedder import (  # noqa: F401
    Embedder,
    HashingEmbedder,
    SentenceTransformerEmbedder,
    embed_documents,
)
from emails_to_vector_db_spark.pipeline.rag import (  # noqa: F401
    assemble_context,
    classify_intent_expr,
    classify_intent_rule_based,
    generate_with_llm,
    retrieve,
)
from emails_to_vector_db_spark.pipeline.store import (  # noqa: F401
    EmbeddingStore,
    embed_and_store,
)
