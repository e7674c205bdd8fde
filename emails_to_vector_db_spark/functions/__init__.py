from emails_to_vector_db_spark.functions.vector import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
    squared_l2,
    vector_lit,
)
