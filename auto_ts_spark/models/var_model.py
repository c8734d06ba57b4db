"""VARMA forecaster — the engine's VARMAX-family analogue.

The reference searches pairwise (target, candidate-exog) VARMAX models
over a (p, q) grid by information criterion
(auto_ts/models/ar_based/build_var.py:53-160, the q axis at
build_var.py:225-247 via ``itertools.product(range(p_max+1),
range(q_max+1))`` skipping (0, 0)). This re-expression fits the system
per-equation by OLS: the AR part is the classical VAR(p) estimator,
and MA (q) terms enter through the Hannan-Rissanen two-stage device —
a long-AR fit supplies residual proxies, then each equation regresses
on [Y lags 1..p, residual lags 1..q] jointly (one ``lstsq`` with a
matrix target, the same stage ``models/ar.py`` uses univariately).
Pairwise column search is preserved: each candidate pair is a handful
of tiny OLS fits, all evaluated in the same worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from auto_ts_spark.models.base import future_timestamps


def _fit_varma(Y: np.ndarray, p: int, q: int, score_start: int | None = None):
    """Per-equation OLS VARMA(p, q); returns (B, aic, resid) or None.

    ``q == 0`` reduces exactly to the classical OLS VAR(p) estimator.
    With ``q > 0`` a long VAR(max(p, 2) + q) is fit first and its
    residuals stand in for the unobserved shocks (Hannan-Rissanen);
    stage 2 starts at ``p_long + q`` so every residual lag in the
    design is an ESTIMATED shock, never the zero placeholder (rows
    with fabricated zero proxies would shrink the MA coefficients).
    ``resid`` is the full-length stage-2 residual matrix (zeros before
    the estimable range) consumed by the forecast recursion.

    ``score_start`` pins the AIC evaluation sample: the model is
    ESTIMATED on all its usable rows, but sigma/AIC are computed on
    rows >= score_start so candidates across a (p, q) grid are scored
    on the same observations (n·logdet is not comparable across
    different sample sizes)."""
    n, k = Y.shape
    start = max(p, q, 1)
    E = None
    if q > 0:
        p_long = max(p, 2) + q
        rows_l = np.arange(p_long, n)
        if len(rows_l) <= 1 + k * p_long + 2:
            return None
        Xl = np.column_stack(
            [np.ones(len(rows_l))] + [Y[rows_l - i] for i in range(1, p_long + 1)]
        )
        Bl, *_ = np.linalg.lstsq(Xl, Y[rows_l], rcond=None)
        E = np.zeros_like(Y)
        E[rows_l] = Y[rows_l] - Xl @ Bl
        start = max(start, p_long + q)
    if n - start <= k * (p + q) + k + 2:
        return None
    rows = np.arange(start, n)
    cols = [np.ones(len(rows))]
    cols += [Y[rows - i] for i in range(1, p + 1)]
    if q > 0:
        cols += [E[rows - i] for i in range(1, q + 1)]
    X = np.column_stack(cols)  # (n-start, 1 + k*(p+q))
    T = Y[rows]
    B, *_ = np.linalg.lstsq(X, T, rcond=None)  # (1 + k*(p+q), k)
    R = T - X @ B
    sc = max(start, score_start if score_start is not None else start)
    Rs = R[sc - start:] if sc > start else R
    if len(Rs) <= 1:
        return None
    sigma = (Rs.T @ Rs) / len(Rs)
    sign, logdet = np.linalg.slogdet(sigma + 1e-12 * np.eye(k))
    n_params = B.size
    score = float(len(Rs) * logdet + 2 * n_params)
    resid = None
    if q > 0:
        # stage-2 residuals are the shock estimates the recursion
        # conditions on for the first q forecast steps
        resid = np.zeros_like(Y)
        resid[rows] = R
    return B, score, resid


def _forecast_varma(
    Y: np.ndarray,
    B: np.ndarray,
    p: int,
    q: int,
    resid: np.ndarray | None,
    h: int,
    exog_future: np.ndarray | None = None,
) -> np.ndarray:
    """Recursion; future shocks are taken at their expectation (zero),
    so MA terms only shape the first q steps. ``exog_future``
    (h × (k-1), NaN = unknown) conditions the companion equations on
    known future values — the VARX-style overlay used by
    predict-on-unseen."""
    hist = Y.tolist()
    ehist = resid.tolist() if resid is not None else None
    k = Y.shape[1]
    preds = []
    for step in range(h):
        x = [1.0]
        for i in range(1, p + 1):
            x.extend(hist[-i])
        for i in range(1, q + 1):
            x.extend(ehist[-i])
        yhat = np.asarray(x) @ B
        if exog_future is not None and step < len(exog_future):
            known = ~np.isnan(exog_future[step])
            yhat[1:][known] = exog_future[step][known]
        preds.append(yhat)
        hist.append(yhat.tolist())
        if ehist is not None:
            ehist.append([0.0] * k)
    return np.array(preds)


def forecast_var(
    pdf: pd.DataFrame,
    folds: list[tuple[int, int]],
    horizon: int,
    *,
    exog_cols: list[str] | None = None,
    max_p: int = 3,
    max_q: int = 3,
    max_rows: int = 1000,
    future_pdf: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Per-series worker. Searches (candidate column × p × q) by AIC
    like the reference's pairwise VARMAX scan (build_var.py:225-247,
    defaults p_max=3, q_max=3, (0, 0) skipped); keeps the reference's
    >1000-row skip (falls back to persistence) as an engine policy
    knob. ``max_q=0`` pins the search to pure OLS VAR(p)."""
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
        # common AIC sample across the whole grid: the latest start any
        # candidate uses (q>0 candidates start at max(p,2)+2q)
        score_start = max(
            max_p, (max(max_p, 2) + 2 * max_q) if max_q > 0 else 0, 1
        )
        for cand in candidates:
            if cand is None:
                Ys = [ytr[:, None]]
            else:
                Ys = [np.column_stack([ytr, pdf[cand].to_numpy(dtype=float)[:train_n]])]
            for Y in Ys:
                for p in range(0, max_p + 1):
                    for q in range(0, max_q + 1):
                        if p == 0 and q == 0:
                            continue  # reference skips the empty design
                        res = _fit_varma(Y, p, q, score_start=score_start)
                        if res is None:
                            continue
                        B, score, resid = res
                        if best is None or score < best[0]:
                            best = (score, B, p, q, resid, Y, cand)
        if best is None:
            return np.full(h, ytr.mean() if train_n else 0.0)
        _, B, p, q, resid, Y, cand = best
        ex_fut = None
        if future_exog and cand is not None and cand in future_exog:
            ex_fut = future_exog[cand][:, None]
        return _forecast_varma(Y, B, p, q, resid, h, ex_fut)[:, 0]

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
