"""Forecaster contract for the model registry.

Mirrors the reference's ``BuildBase`` fit/predict contract
(auto_ts/models/build_base.py:1-91) re-shaped for Spark: a forecaster
is a pure per-series pandas function (executed inside
``applyInPandas`` workers, one task per series — millions of series
parallelize for free), never a driver-side stateful object.

Worker protocol: given one series' pandas frame (ts-sorted, columns
``ts, y[, exog...]``), fold boundaries, and a horizon, return rows
``(ts, fold, yhat)`` where fold >= 0 are CV test predictions (model
fitted on that fold's train prefix only) and fold == -1 is the final
forecast fitted on all rows (h rows past the last train ts).
Scoring happens Spark-side by joining predictions back to actuals —
the same oracle-checked metric expressions as everything else.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

# (pdf, folds=[(train_end, test_end), ...], horizon, freq_seconds) -> pdf
ForecastFn = Callable[[pd.DataFrame, list[tuple[int, int]], int], pd.DataFrame]


def expanding_fold_bounds(n: int, n_splits: int, test_size: int) -> list[tuple[int, int]]:
    """sklearn TimeSeriesSplit-parity fold bounds (1-based row counts):
    fold i trains rows [1 .. n-(n_splits-i)*test_size], tests next
    ``test_size`` rows. Degenerate folds (empty train) are dropped.

    When ``test_size`` is so large relative to ``n`` that NO fold has
    a non-empty train slice (e.g. a 6-row series scored at horizon 8),
    the fold size falls back to sklearn's default ``n // (n_splits+1)``
    so short series still get scored instead of crashing downstream
    with an empty leaderboard — the final forecast keeps the caller's
    full horizon either way."""
    out = []
    for i in range(n_splits):
        train_end = n - (n_splits - i) * test_size
        if train_end >= 1:
            out.append((train_end, min(train_end + test_size, n)))
    if not out and n_splits > 0 and n > n_splits:
        shrunk = max(1, n // (n_splits + 1))
        if shrunk < test_size:
            return expanding_fold_bounds(n, n_splits, shrunk)
    return out


def future_timestamps(last_ts: pd.Timestamp, h: int, freq_seconds: float) -> pd.Series:
    """h future timestamps (numpy-side twin of W11).

    Monthly-and-coarser cadences (median gap >= 28 days) step by
    calendar month offsets computed FROM the anchor, so month-end stays
    on month-end (08-31 -> 09-30 -> 10-31) — the reference shifts the
    DatetimeIndex by periods at freq (build_ml.py:585-593); a fixed
    ~30.4-day delta would drift off the calendar. Sub-monthly cadences
    keep the exact fixed step. Floored to microseconds — Spark
    timestamps are µs precision and Arrow's safe cast rejects sub-µs
    remainders from a fractional step.
    """
    d = freq_seconds / 86400.0
    if d >= 28:
        months = 1 if d < 89 else 3 if d < 178 else 6 if d < 360 else 12
        return pd.Series(
            [last_ts + pd.DateOffset(months=months * (i + 1)) for i in range(h)]
        ).dt.floor("us")
    step = pd.Timedelta(seconds=freq_seconds)
    return pd.Series([last_ts + step * (i + 1) for i in range(h)]).dt.floor("us")


def aic(rss: float, n: int, k: int) -> float:
    rss = max(rss, 1e-12)
    return n * float(np.log(rss / n)) + 2 * k
