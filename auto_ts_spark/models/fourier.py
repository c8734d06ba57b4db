"""Fourier-trend forecaster — the engine's Prophet-family analogue.

The reference's Prophet builder (auto_ts/models/build_prophet.py:82-346)
fits trend + seasonal components (+ exogenous regressors) per series.
This re-expression uses the same decomposition — linear trend + Fourier
seasonal basis + optional exog — fitted by ridge-stabilized least
squares in numpy. Deterministic (no MCMC), which the golden-test
strategy (SURVEY.md §5) prefers, and orders of magnitude cheaper per
series; one fit is a single ~(n × 2K+2) lstsq.

Prophet configuration surface (reference build_prophet.py:70-80,
587-649), re-expressed:
- ``growth='logistic'`` + ``cap``: y is mapped through the logit
  ``log(y/(cap-y))``, fitted linearly, and inverted — the saturating
  trend shape without Stan.
- ``seasonality_mode='multiplicative'``: fit on log y (requires y>0;
  falls back to additive otherwise) — Prophet's trend·(1+s) becomes
  additive in log space.
- ``holidays``: a list of dates (ONE shared indicator regressor — the
  coefficient is learned from past occurrences and applied to future
  ones) or a dict {name: [dates]} (one regressor per holiday name,
  Prophet's holiday-frame semantics: occurrences share a coefficient).
- ``seasonal_periods``: extra (period, k) Fourier blocks — the
  freq→add_seasonality map (build_prophet.py:587-649) that adds e.g.
  weekly + yearly terms for daily data.

Runs inside applyInPandas workers — see models/registry.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from auto_ts_spark.models.base import expanding_fold_bounds, future_timestamps


def _design(
    t: np.ndarray,
    periods: list[tuple[float, int]],
    exog: np.ndarray | None,
    holiday_ind: np.ndarray | None = None,
    changepoints: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Returns (X, n_cp) — the design matrix and how many of its
    columns (right after the [1, t] trend pair) are changepoint
    hinges, so the fitter can regularize them separately."""
    cols = [np.ones_like(t), t]
    n_cp = 0
    if changepoints is not None and changepoints.size:
        # piecewise-linear trend via hinge basis max(0, t - s_j):
        # Prophet's changepoint trend (reference build_prophet.py
        # default n_changepoints=25). Future steps extrapolate with
        # the final slope (base + all active hinge slopes) for free.
        for s in changepoints:
            cols.append(np.maximum(0.0, t - s))
        n_cp = len(changepoints)
    for period, k_fourier in periods:
        for k in range(1, k_fourier + 1):
            ang = 2.0 * np.pi * k * t / period
            cols.append(np.sin(ang))
            cols.append(np.cos(ang))
    X = np.column_stack(cols)
    if holiday_ind is not None and holiday_ind.size:
        X = np.column_stack([X, holiday_ind])
    if exog is not None and exog.size:
        X = np.column_stack([X, exog])
    return X, n_cp


def _fit_beta(
    X: np.ndarray, y: np.ndarray, ridge: float | np.ndarray = 1e-8
) -> np.ndarray:
    # ridge-stabilized normal equations: deterministic, rank-safe;
    # a per-column ridge vector lets changepoint hinges carry a
    # stronger penalty (the L2 analogue of Prophet's sparse Laplace
    # changepoint prior) than the structural columns
    r = np.full(X.shape[1], ridge) if np.isscalar(ridge) else ridge
    XtX = X.T @ X + np.diag(r)
    return np.linalg.solve(XtX, X.T @ y)


def _changepoint_grid(train_n: int, n_changepoints: int, changepoint_range: float) -> np.ndarray | None:
    """Prophet's potential-changepoint placement: ``n_changepoints``
    evenly spaced interior knots over the first ``changepoint_range``
    fraction of the training window (build_prophet.py / Prophet
    defaults n_changepoints=25, changepoint_range=0.8)."""
    if not n_changepoints or train_n < 4:
        return None
    hi = changepoint_range * (train_n - 1)
    n_cp = min(int(n_changepoints), max(train_n - 2, 1))
    return np.linspace(0.0, hi, n_cp + 2)[1:-1]


def seasonality_blocks(freq_seconds: float) -> list[tuple[float, int]]:
    """freq → default extra seasonalities, mirroring the reference's
    time_interval → add_seasonality map (build_prophet.py:587-649):
    sub-daily data gets daily+weekly blocks, daily gets weekly+yearly,
    weekly gets yearly."""
    day = 86400.0
    if freq_seconds <= 0:
        return []
    if freq_seconds < day:  # hourly/minutely
        return [(day / freq_seconds, 3), (7 * day / freq_seconds, 3)]
    if freq_seconds < 7 * day:  # daily
        return [(7 * day / freq_seconds, 3), (365.25 * day / freq_seconds, 5)]
    if freq_seconds < 28 * day:  # weekly
        return [(365.25 * day / freq_seconds, 5)]
    return []


def forecast_fourier(
    pdf: pd.DataFrame,
    folds: list[tuple[int, int]],
    horizon: int,
    *,
    seasonal_period: int = 12,
    k_fourier: int = 3,
    exog_cols: list[str] | None = None,
    growth: str = "linear",
    cap: float | None = None,
    seasonality_mode: str = "additive",
    holidays: list | None = None,
    seasonal_periods: list[tuple[float, int]] | None = None,
    n_changepoints: int = 0,
    changepoint_range: float = 0.8,
    changepoint_prior_scale: float = 0.05,
    future_pdf: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Per-series worker: CV test predictions per fold + final forecast
    (fold = -1). ``future_pdf`` (ts + known exog rows, the reference's
    make_future_dataframe-with-regressors shape, build_prophet.py:
    513-521) supplies the forecast timestamps and exog values; without
    it, exog future values are persisted (last observed) — the
    reference's univariate future-frame policy.

    ``n_changepoints`` > 0 turns on the piecewise-linear trend
    (Prophet's changepoint model, default 25 in the reference's
    build_prophet.py): hinge regressors at evenly spaced knots over
    the first ``changepoint_range`` of each training window, with a
    stronger ridge penalty ``~1/changepoint_prior_scale`` on the
    hinge slopes (L2 analogue of Prophet's Laplace prior). Off by
    default so pinned oracles stay bit-stable; forward it via
    ``AutoTimeSeries(model_config={'n_changepoints': 25})``."""
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    y_raw = pdf["y"].to_numpy(dtype=float)
    n = len(pdf)

    # --- target transform (growth / seasonality_mode), with inverse
    eps = 1e-9
    if growth == "logistic" and cap is not None and np.all(y_raw < cap) and np.all(
        y_raw > 0
    ):
        fwd = lambda v: np.log(np.clip(v, eps, cap - eps) / (cap - np.clip(v, eps, cap - eps)))  # noqa: E731
        inv = lambda v: cap / (1.0 + np.exp(-v))  # noqa: E731
    elif seasonality_mode == "multiplicative" and np.all(y_raw > 0):
        fwd, inv = np.log, np.exp
    else:
        fwd = inv = lambda v: v  # noqa: E731
    y = fwd(y_raw)

    exog = pdf[exog_cols].to_numpy(dtype=float) if exog_cols else None
    t_all = np.arange(n, dtype=float)
    periods: list[tuple[float, int]] = [(float(seasonal_period), k_fourier)] if (
        seasonal_period and seasonal_period > 1
    ) else []
    periods += list(seasonal_periods or [])

    freq_s = (
        (pdf["ts"].iloc[-1] - pdf["ts"].iloc[0]).total_seconds() / max(n - 1, 1)
        if n > 1
        else 86400.0
    )
    if isinstance(holidays, dict):
        hol_groups = [
            {pd.Timestamp(h).normalize() for h in dates}
            for _, dates in sorted(holidays.items())
        ]
    elif holidays:
        hol_groups = [{pd.Timestamp(h).normalize() for h in holidays}]
    else:
        hol_groups = []

    def holiday_matrix(ts_vals: pd.Series) -> np.ndarray | None:
        if not hol_groups:
            return None
        norm = pd.DatetimeIndex(ts_vals).normalize()
        return np.column_stack(
            [norm.isin(sorted(g)).astype(float) for g in hol_groups]
        )

    hol_all = holiday_matrix(pdf["ts"])
    out_rows: list[pd.DataFrame] = []

    def fit_predict(
        train_n: int,
        idx_pred: np.ndarray,
        ts_pred: pd.Series,
        ex_future: np.ndarray | None = None,
    ) -> np.ndarray:
        cps = _changepoint_grid(train_n, n_changepoints, changepoint_range)
        Xtr, n_cp = _design(
            t_all[:train_n],
            periods,
            exog[:train_n] if exog is not None else None,
            hol_all[:train_n] if hol_all is not None else None,
            cps,
        )
        ridge = np.full(Xtr.shape[1], 1e-8)
        if n_cp:
            # hinge slopes carry the changepoint prior; scale by the
            # training target's variance so the penalty is unitless
            y_scale = float(np.var(y[:train_n])) or 1.0
            ridge[2 : 2 + n_cp] = y_scale * 1e-3 / max(changepoint_prior_scale, 1e-9)
        beta = _fit_beta(Xtr, y[:train_n], ridge)
        ex_pred = None
        if exog is not None:
            ex_pred = exog[np.clip(idx_pred, 0, n - 1)]
            if (idx_pred >= n).any():  # persist last row for future steps
                ex_pred[idx_pred >= n] = exog[train_n - 1]
                if ex_future is not None:  # overlay known future values
                    known = ~np.isnan(ex_future)
                    fut_rows = ex_pred[idx_pred >= n]
                    fut_rows[known] = ex_future[known]
                    ex_pred[idx_pred >= n] = fut_rows
        Xp, _ = _design(
            idx_pred.astype(float), periods, ex_pred, holiday_matrix(ts_pred), cps
        )
        return inv(Xp @ beta)

    for fold, (train_end, test_end) in enumerate(folds):
        idx = np.arange(train_end, test_end)
        ts_pred = pdf["ts"].iloc[train_end:test_end]
        yhat = fit_predict(train_end, idx, ts_pred)
        out_rows.append(
            pd.DataFrame({"ts": ts_pred.to_numpy(), "fold": fold, "yhat": yhat})
        )

    ex_future = None
    if future_pdf is not None and len(future_pdf):
        future_pdf = future_pdf.sort_values("ts").reset_index(drop=True)
        horizon = len(future_pdf)
        future_ts = pd.Series(pd.DatetimeIndex(future_pdf["ts"]))
        if exog_cols:
            ex_future = np.column_stack(
                [
                    future_pdf[c].to_numpy(dtype=float)
                    if c in future_pdf.columns
                    else np.full(horizon, np.nan)
                    for c in exog_cols
                ]
            )
    else:
        future_ts = pd.Series(future_timestamps(pdf["ts"].iloc[-1], horizon, freq_s))
    future_idx = np.arange(n, n + horizon)
    yhat_future = fit_predict(n, future_idx, future_ts, ex_future)
    out_rows.append(
        pd.DataFrame({"ts": future_ts.to_numpy(), "fold": -1, "yhat": yhat_future})
    )
    return pd.concat(out_rows, ignore_index=True)
