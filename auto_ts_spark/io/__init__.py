from auto_ts_spark.io.sources import (
    dedup_columns,
    infer_datetime_format,
    load_table,
    load_ts,
)

__all__ = ["load_ts", "load_table", "dedup_columns", "infer_datetime_format"]
