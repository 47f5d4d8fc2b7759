from mapreduceimpl_spark.sources.registry import (
    TABLES,
    load_table,
    load_tables,
    read_text_lines,
    register_views,
    table_path,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_text_lines",
    "register_views",
    "table_path",
]
