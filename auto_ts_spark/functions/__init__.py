from auto_ts_spark.functions import calendar, metrics

__all__ = ["calendar", "metrics"]
