"""Fourier-trend forecaster — the engine's Prophet-family analogue.

The reference's Prophet builder (auto_ts/models/build_prophet.py:82-346)
fits trend + seasonal components (+ exogenous regressors) per series.
This re-expression uses the same decomposition — linear trend + Fourier
seasonal basis + optional exog — fitted by ridge-stabilized least
squares in numpy. Deterministic (no MCMC), which the golden-test
strategy (SURVEY.md §5) prefers, and orders of magnitude cheaper per
series; one fit is a single ~(n × 2K+2) lstsq.

Runs inside applyInPandas workers — see models/registry.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from auto_ts_spark.models.base import expanding_fold_bounds, future_timestamps


def _design(t: np.ndarray, period: float, k_fourier: int, exog: np.ndarray | None) -> np.ndarray:
    cols = [np.ones_like(t), t]
    for k in range(1, k_fourier + 1):
        ang = 2.0 * np.pi * k * t / period
        cols.append(np.sin(ang))
        cols.append(np.cos(ang))
    X = np.column_stack(cols)
    if exog is not None and exog.size:
        X = np.column_stack([X, exog])
    return X


def _fit_beta(X: np.ndarray, y: np.ndarray, ridge: float = 1e-8) -> np.ndarray:
    # ridge-stabilized normal equations: deterministic, rank-safe
    XtX = X.T @ X + ridge * np.eye(X.shape[1])
    return np.linalg.solve(XtX, X.T @ y)


def forecast_fourier(
    pdf: pd.DataFrame,
    folds: list[tuple[int, int]],
    horizon: int,
    *,
    seasonal_period: int = 12,
    k_fourier: int = 3,
    exog_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Per-series worker: CV test predictions per fold + final forecast
    (fold = -1). Exog future values are persisted (last observed) when
    the future frame has none — same policy as the reference's
    univariate future frame."""
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    y = pdf["y"].to_numpy(dtype=float)
    n = len(pdf)
    exog = (
        pdf[exog_cols].to_numpy(dtype=float) if exog_cols else None
    )
    t_all = np.arange(n, dtype=float)
    out_rows: list[pd.DataFrame] = []

    def fit_predict(train_n: int, idx_pred: np.ndarray) -> np.ndarray:
        Xtr = _design(
            t_all[:train_n], seasonal_period, k_fourier, exog[:train_n] if exog is not None else None
        )
        beta = _fit_beta(Xtr, y[:train_n])
        ex_pred = None
        if exog is not None:
            in_range = idx_pred[idx_pred < n]
            ex_pred = exog[np.clip(idx_pred, 0, n - 1)]
            if len(in_range) < len(idx_pred):  # persist last row for future steps
                ex_pred[idx_pred >= n] = exog[train_n - 1]
        Xp = _design(idx_pred.astype(float), seasonal_period, k_fourier, ex_pred)
        return Xp @ beta

    for fold, (train_end, test_end) in enumerate(folds):
        idx = np.arange(train_end, test_end)
        yhat = fit_predict(train_end, idx)
        out_rows.append(
            pd.DataFrame({"ts": pdf["ts"].iloc[train_end:test_end].to_numpy(), "fold": fold, "yhat": yhat})
        )

    freq_s = (
        (pdf["ts"].iloc[-1] - pdf["ts"].iloc[0]).total_seconds() / max(n - 1, 1)
        if n > 1
        else 86400.0
    )
    future_idx = np.arange(n, n + horizon)
    yhat_future = fit_predict(n, future_idx)
    out_rows.append(
        pd.DataFrame(
            {
                "ts": future_timestamps(pdf["ts"].iloc[-1], horizon, freq_s).to_numpy(),
                "fold": -1,
                "yhat": yhat_future,
            }
        )
    )
    return pd.concat(out_rows, ignore_index=True)
