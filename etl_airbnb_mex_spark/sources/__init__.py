"""Source connectors and sinks (SURVEY.md §2.1 S1–S12)."""

from .readers import (
    AIRBNB_SCHEMAS,
    read_jsonl,
    read_parquet,
    read_table_set,
    unwrap_mongo_date,
)
from .writers import (
    drop_id_columns,
    normalize_for_sink,
    write_excel_report,
    write_json_report,
    write_parquet_overwrite,
)

__all__ = [
    "AIRBNB_SCHEMAS",
    "read_jsonl",
    "read_parquet",
    "read_table_set",
    "unwrap_mongo_date",
    "drop_id_columns",
    "normalize_for_sink",
    "write_excel_report",
    "write_json_report",
    "write_parquet_overwrite",
]
