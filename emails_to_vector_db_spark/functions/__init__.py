from emails_to_vector_db_spark.functions.text import (  # noqa: F401
    LANG_STOPWORDS,
    fingerprint,
    md5_long,
    mean_token_len,
    punct_ratio,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
)
from emails_to_vector_db_spark.functions.vector import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    distance,
    dot,
    l2_distance,
    l2_norm,
    squared_l2,
    vector_lit,
)
