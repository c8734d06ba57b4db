"""Operator package with LAZY submodule loading (PEP 562): importing
one operator module must not pull the whole family — multimodal and
similarity import numpy/pandas at module level, which would otherwise
become an import-time cost (and hard dependency) of every expression-
only module like lags or textops, in every executor process."""

import importlib

__all__ = [
    "asof",
    "budget",
    "decontam",
    "dedup",
    "drift",
    "dsir",
    "encoders",
    "folds",
    "future",
    "lags",
    "lm_quality",
    "multimodal",
    "packing",
    "partitioning",
    "pii",
    "profile",
    "quality_classifier",
    "rangejoin",
    "sampling",
    "sessions",
    "similarity",
    "textops",
    "urls",
]


def __getattr__(name: str):
    if name in __all__:
        return importlib.import_module(f"auto_ts_spark.operators.{name}")
    raise AttributeError(f"module 'auto_ts_spark.operators' has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
