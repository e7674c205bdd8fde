from emails_to_vector_db_spark.streaming.ingest import (  # noqa: F401
    deduped_stream,
    read_events_stream,
    session_counts,
    sliding_counts,
    stream_embed_to_store,
    tumbling_counts,
)
from emails_to_vector_db_spark.streaming.stateful import (  # noqa: F401
    running_user_profiles,
)
