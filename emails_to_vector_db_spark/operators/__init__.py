from emails_to_vector_db_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_component_edges,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from emails_to_vector_db_spark.operators.ivf import (  # noqa: F401
    ivf_ann_join,
    train_centroids,
)
from emails_to_vector_db_spark.operators.knn import (  # noqa: F401
    knn_join,
    knn_topk,
)
from emails_to_vector_db_spark.operators.similarity import (  # noqa: F401
    ann_lsh_join,
    brute_force_join,
)
