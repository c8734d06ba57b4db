"""Seasonal-AR forecaster — the engine's (auto-)SARIMAX-family analogue.

The reference grid-searches SARIMAX orders by AIC/BIC
(auto_ts/models/ar_based/param_finder.py:41-143,
build_sarimax.py:230-296). This re-expression keeps the same search
shape — grid over (p, d, P) scored by AIC, best refit, h-step
recursive forecast — with the model fitted by OLS on lagged values
(AR + seasonal-AR + drift). MA terms are approximated by a second
Hannan-Rissanen stage on lagged residuals when ``q > 0``.

Deterministic, no optimizer iterations; one candidate fit is a single
lstsq, so the whole grid for one series costs microseconds — the grid
fan-out strategy in SURVEY.md §2.9-M1 becomes unnecessary below
~100k series × candidates, and above that the per-series
applyInPandas parallelism already covers it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from auto_ts_spark.models.base import aic, future_timestamps


def _lagged_design(
    y: np.ndarray,
    p: int,
    season_lags: list[int],
    q_resid: np.ndarray | None,
    q: int,
    exog: np.ndarray | None = None,
):
    max_lag = max([p] + season_lags + [q]) if (p or season_lags or q) else 1
    n = len(y)
    if n <= max_lag + 1:
        return None, None, max_lag
    rows = np.arange(max_lag, n)
    cols = [np.ones(len(rows))]
    for i in range(1, p + 1):
        cols.append(y[rows - i])
    for m in season_lags:
        cols.append(y[rows - m])
    if q and q_resid is not None:
        for j in range(1, q + 1):
            cols.append(q_resid[rows - j])
    if exog is not None and exog.size:
        # contemporaneous exogenous regressors, aligned at time t —
        # the reference SARIMAX exog channel
        # (auto_ts/models/ar_based/build_arima_base.py:310-369)
        cols.extend(exog[rows].T)
    return np.column_stack(cols), y[rows], max_lag


def _fit_ar(
    y: np.ndarray,
    p: int,
    d: int,
    q: int,
    m: int,
    P: int,
    exog: np.ndarray | None = None,
):
    """Fit one candidate; returns (params dict, aic) or None."""
    yd = y.copy()
    exd = exog.copy() if exog is not None else None
    tails = []
    for _ in range(d):
        tails.append(yd[-1])
        yd = np.diff(yd)
        if exd is not None:
            # simple-differencing ARIMAX: the exog channel is
            # differenced alongside the target so the regression stays
            # on a stationary pair (statsmodels SARIMAX
            # simple_differencing=True semantics)
            exd = np.diff(exd, axis=0)
    season_lags = [m * s for s in range(1, P + 1)] if m > 1 else []
    resid = None
    if q > 0:
        # Hannan-Rissanen stage 1: long-AR residuals
        X1, t1, _ = _lagged_design(yd, max(p, 2) + q, [], None, 0)
        if X1 is None:
            return None
        b1, *_ = np.linalg.lstsq(X1, t1, rcond=None)
        fitted = X1 @ b1
        resid = np.zeros_like(yd)
        resid[len(yd) - len(fitted):] = t1 - fitted
    X, target, max_lag = _lagged_design(yd, p, season_lags, resid, q, exd)
    if X is None or len(target) <= X.shape[1] + 1:
        return None
    beta, *_ = np.linalg.lstsq(X, target, rcond=None)
    rss = float(np.sum((target - X @ beta) ** 2))
    score = aic(rss, len(target), X.shape[1] + 1)
    return {
        "beta": beta,
        "p": p,
        "d": d,
        "q": q,
        "season_lags": season_lags,
        "yd": yd,
        "resid": resid,
        "tails": tails,
        "max_lag": max_lag,
        "n_exog": 0 if exd is None else exd.shape[1],
        "exog_levels_tail": None if exog is None else exog[-(d + 1):].copy(),
    }, score


def _future_exog_diffed(
    model: dict, exog_future: np.ndarray | None, h: int
) -> np.ndarray | None:
    """Future exog rows in the model's (differenced) regression scale.

    ``exog_future`` is in LEVEL scale (h × k) when supplied; missing
    values/rows persist the last observed level (the same
    last-observation policy the fourier worker uses). With d > 0 the
    level rows are differenced against the stored observed tail."""
    k = model["n_exog"]
    if not k:
        return None
    d = model["d"]
    tail = model["exog_levels_tail"]  # last d+1 observed level rows
    last_level = tail[-1]
    if exog_future is None:
        levels = np.tile(last_level, (h, 1))
    else:
        levels = np.asarray(exog_future, dtype=float)[:h].copy()
        # per-cell NaN → persist last observed level
        nan_mask = np.isnan(levels)
        if nan_mask.any():
            levels[nan_mask] = np.tile(last_level, (len(levels), 1))[nan_mask]
        if len(levels) < h:
            levels = np.vstack([levels, np.tile(last_level, (h - len(levels), 1))])
    if d == 0:
        return levels
    full = np.vstack([tail[-d:], levels])
    for _ in range(d):
        full = np.diff(full, axis=0)
    return full


def _forecast_fitted(
    model: dict, h: int, exog_future: np.ndarray | None = None
) -> np.ndarray:
    yd = model["yd"].tolist()
    resid = model["resid"].tolist() if model["resid"] is not None else None
    beta = model["beta"]
    p, q, season_lags = model["p"], model["q"], model["season_lags"]
    exf = _future_exog_diffed(model, exog_future, h)
    preds_d = []
    for step in range(h):
        x = [1.0]
        for i in range(1, p + 1):
            x.append(yd[-i])
        for m_lag in season_lags:
            x.append(yd[-m_lag] if len(yd) >= m_lag else yd[0])
        if q and resid is not None:
            for j in range(1, q + 1):
                x.append(resid[-j] if len(resid) >= j else 0.0)
        if exf is not None:
            x.extend(exf[step])
        yhat = float(np.dot(beta, x))
        preds_d.append(yhat)
        yd.append(yhat)
        if resid is not None:
            resid.append(0.0)  # expected future shocks are zero
    # undo differencing (W4 cumsum, per tail level)
    preds = np.array(preds_d, dtype=float)
    for tail in reversed(model["tails"]):
        preds = tail + np.cumsum(preds)
    return preds


def forecast_seasonal_ar(
    pdf: pd.DataFrame,
    folds: list[tuple[int, int]],
    horizon: int,
    *,
    seasonal_period: int = 12,
    max_p: int = 3,
    max_d: int = 1,
    max_q: int = 1,
    max_P: int = 1,
    exog_cols: list[str] | None = None,
    future_pdf: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Per-series worker: AIC grid over (p,d,q,P), per-fold h-step
    forecasts from the fold-local best model, final forecast fold=-1.

    ``exog_cols`` adds contemporaneous exogenous regressors to every
    candidate design — the reference's multivariate SARIMAX surface
    (auto_ts/models/ar_based/build_arima_base.py:310-369, exercised by
    test_auto_ts.py:693). Fold forecasts condition on the observed
    exog values of the test rows; the final forecast takes exog from
    ``future_pdf`` when its columns carry them, else persists the last
    observed value (the fourier worker's policy)."""
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    y_all = pdf["y"].to_numpy(dtype=float)
    n = len(pdf)
    m = seasonal_period if n >= 2 * seasonal_period + 4 else 0
    exog_cols = [c for c in (exog_cols or []) if c in pdf.columns]
    exog_all = pdf[exog_cols].to_numpy(dtype=float) if exog_cols else None

    def best_fit(y: np.ndarray, exog: np.ndarray | None):
        best = None
        for d in range(max_d + 1):
            for p in range(max_p + 1):
                for q in range(max_q + 1):
                    for P in range(max_P + 1) if m else [0]:
                        if p == 0 and q == 0 and P == 0:
                            continue
                        res = _fit_ar(y, p, d, q, m, P, exog)
                        if res and (best is None or res[1] < best[1]):
                            best = res
        return best[0] if best else None

    out = []
    for fold, (train_end, test_end) in enumerate(folds):
        model = best_fit(
            y_all[:train_end], exog_all[:train_end] if exog_all is not None else None
        )
        k = test_end - train_end
        fold_exog = exog_all[train_end:test_end] if exog_all is not None else None
        yhat = (
            _forecast_fitted(model, k, fold_exog)
            if model
            else np.full(k, y_all[:train_end].mean())
        )
        out.append(
            pd.DataFrame({"ts": pdf["ts"].iloc[train_end:test_end].to_numpy(), "fold": fold, "yhat": yhat})
        )
    fut_exog = None
    if future_pdf is not None and len(future_pdf):
        # unseen frame supplies the forecast timestamps and, when its
        # columns carry them, the known future exog values (reference
        # predict(testdata=X_exogen), build_arima_base.py:310-369)
        future_pdf = future_pdf.sort_values("ts")
        horizon = len(future_pdf)
        future_ts = pd.DatetimeIndex(future_pdf["ts"]).to_numpy()
        if exog_cols and all(c in future_pdf.columns for c in exog_cols):
            fut_exog = future_pdf[exog_cols].to_numpy(dtype=float)
    else:
        freq_s = (
            (pdf["ts"].iloc[-1] - pdf["ts"].iloc[0]).total_seconds() / max(n - 1, 1)
            if n > 1
            else 86400.0
        )
        future_ts = future_timestamps(pdf["ts"].iloc[-1], horizon, freq_s).to_numpy()
    model = best_fit(y_all, exog_all)
    yhat = (
        _forecast_fitted(model, horizon, fut_exog)
        if model
        else np.full(horizon, y_all.mean())
    )
    out.append(pd.DataFrame({"ts": future_ts, "fold": -1, "yhat": yhat}))
    return pd.concat(out, ignore_index=True)
