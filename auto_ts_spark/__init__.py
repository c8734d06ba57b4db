"""auto_ts_spark — a PySpark-native time-series AutoML + analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of AutoViML/Auto_TS (see SURVEY.md), plus
the large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB training-data pipeline
needs.

Layout:
- ``io``         sources: CSV/parquet loading, datetime inference
- ``functions``  scalar/agg expression builders (calendar, metrics, text)
- ``operators``  DataFrame → DataFrame transforms (lags, folds, dedup, ...)
- ``models``     forecaster registry (fourier, AR, VAR, Spark-ML GBT)
- ``streaming``  Structured Streaming variants of the window ops
- ``auto``       the AutoTimeSeries facade (fit / predict / leaderboard)
"""

__version__ = "0.1.0"

from auto_ts_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
