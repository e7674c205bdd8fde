"""The oracle-checked query library.

Every operator claimed in SURVEY.md §2 is exposed here as a named
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs over
the same parquet tables. ``__spark_entry__.py`` re-exports the registry.
"""

from emails_to_vector_db_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    register,
)

# Import for registration side effects.
from emails_to_vector_db_spark.plans import (  # noqa: F401,E402
    advanced,
    analytics,
    bucketed,
    chunking,
    cleaning,
    clustering,
    cohorts,
    corpus,
    curation,
    dedup,
    events,
    graph,
    ingest,
    maintenance,
    ml,
    pipeline,
    postings,
    reduction,
    relational,
    retrieval,
    semantic,
    setjoin,
    stats,
    textops,
    tokenizer,
    tpch_extra,
    tpch_more,
    valuation,
    vector,
)
