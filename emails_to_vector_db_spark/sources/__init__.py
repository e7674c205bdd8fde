from emails_to_vector_db_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    register_views,
    table_path,
)
