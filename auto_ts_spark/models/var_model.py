"""VAR forecaster — the engine's VARMAX-family analogue.

The reference searches pairwise (target, candidate-exog) VARMAX models
by AIC (auto_ts/models/ar_based/build_var.py:53-160). This
re-expression fits the full VAR(p) system by per-equation OLS (the
classical estimator), selects lag order p by AIC, and forecasts by
recursion. Pairwise column search is preserved: each candidate pair is
one tiny OLS, all evaluated in the same worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from auto_ts_spark.models.base import future_timestamps


def _fit_var(Y: np.ndarray, p: int):
    """OLS VAR(p): returns (intercept c, coefficient mats A[1..p], aic)."""
    n, k = Y.shape
    if n <= k * p + k + 2:
        return None
    rows = np.arange(p, n)
    X = np.column_stack(
        [np.ones(len(rows))] + [Y[rows - i] for i in range(1, p + 1)]
    )  # (n-p, 1 + k*p)
    T = Y[rows]
    B, *_ = np.linalg.lstsq(X, T, rcond=None)  # (1+k*p, k)
    E = T - X @ B
    sigma = (E.T @ E) / len(rows)
    sign, logdet = np.linalg.slogdet(sigma + 1e-12 * np.eye(k))
    n_params = B.size
    score = float(len(rows) * logdet + 2 * n_params)
    return B, score


def _forecast_var(
    Y: np.ndarray, B: np.ndarray, p: int, h: int, exog_future: np.ndarray | None = None
) -> np.ndarray:
    """Recursion; ``exog_future`` (h × (k-1), NaN = unknown) conditions
    the companion equations on known future values — the VARX-style
    overlay used by predict-on-unseen."""
    hist = Y.tolist()
    preds = []
    for step in range(h):
        x = [1.0]
        for i in range(1, p + 1):
            x.extend(hist[-i])
        yhat = np.asarray(x) @ B
        if exog_future is not None and step < len(exog_future):
            known = ~np.isnan(exog_future[step])
            yhat[1:][known] = exog_future[step][known]
        preds.append(yhat)
        hist.append(yhat.tolist())
    return np.array(preds)


def forecast_var(
    pdf: pd.DataFrame,
    folds: list[tuple[int, int]],
    horizon: int,
    *,
    exog_cols: list[str] | None = None,
    max_p: int = 3,
    max_rows: int = 1000,
    future_pdf: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Per-series worker. Searches (candidate column × p) by AIC like
    the reference's pairwise scan; keeps the reference's >1000-row skip
    (falls back to persistence) as an engine policy knob."""
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    y = pdf["y"].to_numpy(dtype=float)
    n = len(pdf)
    exog_cols = [c for c in (exog_cols or []) if c in pdf.columns]
    freq_s = (
        (pdf["ts"].iloc[-1] - pdf["ts"].iloc[0]).total_seconds() / max(n - 1, 1)
        if n > 1
        else 86400.0
    )

    def best_forecast(
        train_n: int, h: int, future_exog: dict[str, np.ndarray] | None = None
    ) -> np.ndarray:
        ytr = y[:train_n]
        if train_n > max_rows or not exog_cols:
            candidates = [None]
        else:
            candidates = exog_cols
        best = None
        for cand in candidates:
            if cand is None:
                Ys = [ytr[:, None]]
            else:
                Ys = [np.column_stack([ytr, pdf[cand].to_numpy(dtype=float)[:train_n]])]
            for Y in Ys:
                for p in range(1, max_p + 1):
                    res = _fit_var(Y, p)
                    if res is None:
                        continue
                    B, score = res
                    if best is None or score < best[0]:
                        best = (score, B, p, Y, cand)
        if best is None:
            return np.full(h, ytr.mean() if train_n else 0.0)
        _, B, p, Y, cand = best
        ex_fut = None
        if future_exog and cand is not None and cand in future_exog:
            ex_fut = future_exog[cand][:, None]
        return _forecast_var(Y, B, p, h, ex_fut)[:, 0]

    out = []
    for fold, (train_end, test_end) in enumerate(folds):
        k = test_end - train_end
        yhat = best_forecast(train_end, k)
        out.append(
            pd.DataFrame({"ts": pdf["ts"].iloc[train_end:test_end].to_numpy(), "fold": fold, "yhat": yhat})
        )
    if future_pdf is not None and len(future_pdf):
        future_pdf = future_pdf.sort_values("ts").reset_index(drop=True)
        horizon = len(future_pdf)
        future_ts = pd.DatetimeIndex(future_pdf["ts"]).to_numpy()
        future_exog = {
            c: future_pdf[c].to_numpy(dtype=float)
            for c in exog_cols
            if c in future_pdf.columns
        }
    else:
        future_ts = future_timestamps(pdf["ts"].iloc[-1], horizon, freq_s).to_numpy()
        future_exog = None
    yhat = best_forecast(n, horizon, future_exog)
    out.append(pd.DataFrame({"ts": future_ts, "fold": -1, "yhat": yhat}))
    return pd.concat(out, ignore_index=True)
