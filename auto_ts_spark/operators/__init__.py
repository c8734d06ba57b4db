from auto_ts_spark.operators import folds, future, lags, profile

__all__ = ["lags", "folds", "future", "profile"]
