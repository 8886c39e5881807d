from eurovision_spark.sources.files import read_csv, read_jsonl, split_corrupt
from eurovision_spark.sources.tables import (
    TABLES,
    load_events,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "TABLES",
    "load_events",
    "load_table",
    "load_tables",
    "read_csv",
    "read_jsonl",
    "register_views",
    "split_corrupt",
]
