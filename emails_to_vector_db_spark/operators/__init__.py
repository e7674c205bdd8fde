from emails_to_vector_db_spark.operators.knn import (  # noqa: F401
    knn_join,
    knn_topk,
)
