"""Seasonal-AR forecaster — the engine's (auto-)SARIMAX-family analogue.

The reference searches SARIMAX orders two ways: a legacy AIC/BIC grid
(auto_ts/models/ar_based/param_finder.py:41-143,
build_sarimax.py:230-296) and pmdarima's stepwise auto-ARIMA with a
large-dataset reduced budget (build_autoarimax.py:35-49). This
re-expression carries both: ``search='stepwise'`` (default) picks d
by the unit-root cascade, D by seasonal strength (forced to 1 above
the 1000-row budget threshold), then walks (p, q, P) greedily under a
hard fit budget (10 fits large / 50 small, Hyndman-Khandakar shape);
``search='grid'`` is the exhaustive AIC grid. Either way the model is
fitted by OLS on lagged values (AR + seasonal-AR + drift); MA terms
are approximated by a second Hannan-Rissanen stage on lagged
residuals when ``q > 0``.

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
from auto_ts_spark.models.stats import auto_diff_order


def _lagged_design(
    y: np.ndarray,
    p: int,
    season_lags: list[int],
    q_resid: np.ndarray | None,
    q: int,
    exog: np.ndarray | None = None,
    ma_season_lags: list[int] | None = None,
):
    all_lags = [p] + season_lags + [q] + list(ma_season_lags or [])
    max_lag = max(all_lags) if any(all_lags) else 1
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
    if ma_season_lags and q_resid is not None:
        # seasonal-MA terms: residuals at seasonal lags (the Q axis of
        # pmdarima's (P,D,Q,m) seasonal order, build_autoarimax.py)
        for ml in ma_season_lags:
            cols.append(q_resid[rows - ml])
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
    D: int = 0,
    Q: int = 0,
):
    """Fit one candidate; returns (params dict, aic) or None.

    ``D`` applies seasonal differencing (lag m, pmdarima's seasonal-
    first order) before the ``d`` regular differences; both are undone
    in reverse by the forecaster. ``Q`` adds seasonal-MA terms
    (Hannan-Rissanen residuals at lags m, 2m, …)."""
    yd = y.copy()
    exd = exog.copy() if exog is not None else None
    inv_ops: list[tuple[str, np.ndarray | float]] = []
    for _ in range(int(D) if m > 1 else 0):
        if len(yd) <= m:
            return None
        inv_ops.append(("seasonal", yd[-m:].copy()))
        yd = yd[m:] - yd[:-m]
        if exd is not None:
            exd = exd[m:] - exd[:-m]
    for _ in range(d):
        inv_ops.append(("regular", yd[-1]))
        yd = np.diff(yd)
        if exd is not None:
            # simple-differencing ARIMAX: the exog channel is
            # differenced alongside the target so the regression stays
            # on a stationary pair (statsmodels SARIMAX
            # simple_differencing=True semantics)
            exd = np.diff(exd, axis=0)
    season_lags = [m * s for s in range(1, P + 1)] if m > 1 else []
    Q = int(Q) if m > 1 else 0
    ma_season_lags = [m * s for s in range(1, Q + 1)]
    resid = None
    if q > 0 or Q > 0:
        # Hannan-Rissanen stage 1: long-AR residuals; the long AR
        # includes the seasonal-AR lags so seasonal structure doesn't
        # leak into the residual proxy
        X1, t1, _ = _lagged_design(
            yd, max(p, 2) + q, [m * s for s in range(1, Q + 1)], None, 0
        )
        if X1 is None:
            return None
        b1, *_ = np.linalg.lstsq(X1, t1, rcond=None)
        fitted = X1 @ b1
        resid = np.zeros_like(yd)
        resid[len(yd) - len(fitted):] = t1 - fitted
    X, target, max_lag = _lagged_design(
        yd, p, season_lags, resid, q, exd, ma_season_lags
    )
    if X is None or len(target) <= X.shape[1] + 1:
        return None
    beta, *_ = np.linalg.lstsq(X, target, rcond=None)
    rss = float(np.sum((target - X @ beta) ** 2))
    score = aic(rss, len(target), X.shape[1] + 1)
    n_diff_rows = d + (m * int(D) if m > 1 else 0)
    return {
        "beta": beta,
        "p": p,
        "d": d,
        "q": q,
        "P": P,
        "D": int(D) if m > 1 else 0,
        "Q": Q,
        "ma_season_lags": ma_season_lags,
        "season_lags": season_lags,
        "yd": yd,
        "resid": resid,
        "inv_ops": inv_ops,
        "max_lag": max_lag,
        "n_exog": 0 if exd is None else exd.shape[1],
        "exog_levels_tail": None if exog is None else exog[-(n_diff_rows + 1):].copy(),
        "n_diff_rows": n_diff_rows,
        "m": m,
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
    tail = model["exog_levels_tail"]  # last n_diff_rows+1 observed level rows
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
    ndr = model["n_diff_rows"]
    if ndr == 0:
        return levels
    full = np.vstack([tail[-ndr:], levels])
    for _ in range(model["D"]):
        full = full[model["m"]:] - full[:-model["m"]]
    for _ in range(model["d"]):
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
        if resid is not None:
            for ml in model.get("ma_season_lags", []):
                x.append(resid[-ml] if len(resid) >= ml else 0.0)
        if exf is not None:
            x.extend(exf[step])
        yhat = float(np.dot(beta, x))
        preds_d.append(yhat)
        yd.append(yhat)
        if resid is not None:
            resid.append(0.0)  # expected future shocks are zero
    # undo differencing in reverse application order: regular diffs
    # invert as cumsum from the tail level (W4), seasonal diffs invert
    # as x_t = z_t + x_{t-m} seeded with the last m pre-forecast levels
    preds = np.array(preds_d, dtype=float)
    for kind, val in reversed(model["inv_ops"]):
        if kind == "regular":
            preds = val + np.cumsum(preds)
        else:
            buf = list(val)
            out = []
            for j, z in enumerate(preds):
                x = float(z) + buf[j]
                buf.append(x)
                out.append(x)
            preds = np.array(out, dtype=float)
    return preds


# Trailing-window cap on the series fed to the ADF differencing
# cascade: autolag(AIC) fits maxlag+1 OLS designs of n×maxlag, which at
# n=100k costs tens of seconds — orders of magnitude more than the
# budgeted candidate fits it gates. The d decision of a long series is
# carried by its recent window; 5000 rows keeps the scan < 100 ms.
ADF_SAMPLE_CAP = 5000


def model_roots_outside_unit_circle(model: dict) -> tuple[bool, bool]:
    """Stationarity/invertibility check of a fitted candidate — the
    reference's ``arroots``/``maroots`` validation
    (auto_ts/utils/val.py:163-167: all roots must lie OUTSIDE the unit
    circle; vacuously True when the corresponding order is 0).

    Computed directly from the stored ``beta``: the AR lag polynomial
    ``1 - Σ φ_l z^l`` collects the regular AND seasonal AR lags (the
    additive form this estimator actually fits), the MA polynomial
    ``1 + Σ θ_l z^l`` likewise; roots via ``np.roots``. Returns
    ``(ar_roots_ok, ma_roots_ok)``."""
    beta = np.asarray(model["beta"], dtype=float)
    p, q = int(model["p"]), int(model["q"])
    season_lags = list(model.get("season_lags") or [])
    ma_season_lags = list(model.get("ma_season_lags") or [])
    i = 1  # beta[0] is the intercept
    ar_coefs: dict[int, float] = {}
    for lag in list(range(1, p + 1)) + season_lags:
        ar_coefs[lag] = ar_coefs.get(lag, 0.0) + float(beta[i])
        i += 1
    ma_coefs: dict[int, float] = {}
    for lag in list(range(1, q + 1)) + ma_season_lags:
        ma_coefs[lag] = ma_coefs.get(lag, 0.0) + float(beta[i])
        i += 1

    def _ok(coefs: dict[int, float], sign: float) -> bool:
        if not coefs:
            return True
        deg = max(coefs)
        poly = np.zeros(deg + 1)
        poly[0] = 1.0
        for lag, c in coefs.items():
            poly[lag] = sign * c
        roots = np.roots(poly[::-1])  # np.roots wants highest power first
        if not roots.size:
            return True
        return bool(np.all(np.abs(roots) > 1.0))

    return _ok(ar_coefs, -1.0), _ok(ma_coefs, +1.0)


def search_budget(n: int, *, seasonal: bool, threshold: int = 1000) -> dict | None:
    """The reference's large-dataset search policy
    (auto_ts/models/ar_based/build_autoarimax.py:35-49): above
    ``threshold`` rows, the order search shrinks to max p,q,P ≤ 2 with
    a 10-fit stepwise budget and seasonal differencing D forced to 1
    when a seasonal period is in play; at or below it, the caller's
    bounds stand with a 50-fit budget. Returns the reduced-budget dict
    or None for the full budget."""
    if n > threshold:
        return {
            "max_p": 2,
            "max_q": 2,
            "max_P": 2,
            "max_Q": 2,
            "n_fits": 10,
            "force_D": 1 if seasonal else 0,
        }
    return None


def _seasonal_strength_wants_D(y: np.ndarray, m: int, d: int) -> bool:
    """Cheap OCSB-style stand-in: difference ``d`` times, then measure
    the lag-``m`` autocorrelation; strong positive seasonal
    persistence (> 0.5) calls for one seasonal difference."""
    yd = y.copy()
    for _ in range(d):
        yd = np.diff(yd)
    if len(yd) < 2 * m + 2:
        return False
    a = yd[m:] - yd[m:].mean()
    b = yd[:-m] - yd[:-m].mean()
    denom = float(np.sqrt((a * a).sum() * (b * b).sum()))
    return denom > 0 and float((a * b).sum()) / denom > 0.5


def select_model(
    y: np.ndarray,
    *,
    m: int,
    max_p: int,
    max_d: int,
    max_q: int,
    max_P: int,
    max_D: int = 1,
    max_Q: int | None = None,
    exog: np.ndarray | None = None,
    search: str = "stepwise",
    n_fits: int = 50,
    large_series_threshold: int = 1000,
    d_hint: int | None = None,
    check_roots: bool = True,
) -> dict | None:
    """Order search for one series. ``search='stepwise'`` is the
    pmdarima-parity path (build_autoarimax.py): d from the unit-root
    cascade (models/stats.py ADF), D from seasonal strength (forced to
    1 by the large-series budget), then a Hyndman-Khandakar-style
    greedy walk over (p, q, P, Q) scored by AIC under a hard fit
    budget. ``search='grid'`` keeps the legacy exhaustive AIC grid.
    ``max_Q`` defaults to ``max_q`` (the reference maps its q bound
    onto the seasonal Q bound the same way). The chosen model dict
    records ``search_meta`` (fits used, whether the reduced budget
    triggered) for tests and diagnostics.

    ``check_roots=True`` (the default) rejects any fitted candidate
    whose AR or MA lag-polynomial roots fall on/inside the unit circle
    (``model_roots_outside_unit_circle``) — the reference refuses
    non-stationary/non-invertible winners the same way
    (auto_ts/utils/val.py:163-167); a rejected candidate still spends
    its slot of the fit budget (the fit happened).

    ``d_hint`` pins the regular differencing order, skipping the
    autolag-AIC ADF cascade — callers fitting the same series across
    CV folds (``forecast_seasonal_ar``) decide d once per FOLD from
    that fold's own training slice (leak-free backtests) instead of
    once per candidate, because on large series the ADF autolag scan
    (maxlag+1 lstsq fits of an n×maxlag design) dominates the whole
    stepwise search, defeating the reduced fit budget. When the
    cascade does run here, its input is capped to the trailing
    ``ADF_SAMPLE_CAP`` observations for the same reason."""
    seasonal = m > 1
    if max_Q is None:
        max_Q = max_q
    budget = search_budget(len(y), seasonal=seasonal, threshold=large_series_threshold)
    force_D: int | None = None
    if budget is not None:
        max_p = min(max_p, budget["max_p"])
        max_q = min(max_q, budget["max_q"])
        max_P = min(max_P, budget["max_P"])
        max_Q = min(max_Q, budget["max_Q"])
        n_fits = budget["n_fits"]
        if seasonal:
            force_D = budget["force_D"]

    if search == "grid":
        best = None
        for D in (range(max_D + 1) if (seasonal and max_D) else [0]):
            for d in range(max_d + 1):
                for p in range(max_p + 1):
                    for q in range(max_q + 1):
                        for P in range(max_P + 1) if seasonal else [0]:
                            for Q in range(max_Q + 1) if seasonal else [0]:
                                if (
                                    p == 0 and q == 0 and P == 0 and Q == 0
                                    and exog is None
                                ):
                                    # all-zero order is empty WITHOUT exog;
                                    # with exog it's a plain regression on
                                    # the predictors — a legal SARIMAX(0,d,0)
                                    continue
                                res = _fit_ar(y, p, d, q, m, P, exog, D, Q)
                                if (
                                    res is not None
                                    and check_roots
                                    and not all(
                                        model_roots_outside_unit_circle(res[0])
                                    )
                                ):
                                    res = None
                                if res and (best is None or res[1] < best[1]):
                                    best = res
        if best:
            best[0]["search_meta"] = {"n_fits_used": -1, "budget_reduced": budget is not None}
            return best[0]
        return None

    if d_hint is not None:
        d = min(int(d_hint), max_d)
    else:
        d = min(auto_diff_order(y[-ADF_SAMPLE_CAP:]), max_d)
    if force_D is not None:
        D = force_D
    elif seasonal and max_D:
        D = 1 if _seasonal_strength_wants_D(y, m, d) else 0
    else:
        D = 0

    fits = 0
    cache: dict[tuple[int, int, int, int], tuple | None] = {}

    def try_fit(p: int, q: int, P: int, Q: int):
        nonlocal fits
        key = (p, q, P, Q)
        if key in cache:
            return cache[key]
        if (
            p < 0 or q < 0 or P < 0 or Q < 0
            or p > max_p or q > max_q or P > max_P or Q > max_Q
            or (p == 0 and q == 0 and P == 0 and Q == 0 and exog is None)
            or fits >= n_fits
        ):
            return None
        fits += 1
        res = _fit_ar(y, p, d, q, m, P, exog, D, Q)
        if (
            res is not None
            and check_roots
            and not all(model_roots_outside_unit_circle(res[0]))
        ):
            res = None
        cache[key] = res
        return res

    # pmdarima's start set, clipped to the bounds
    s_P = min(1, max_P) if seasonal else 0
    s_Q = min(1, max_Q) if seasonal else 0
    starts = sorted(
        {
            (min(2, max_p), min(2, max_q), s_P, s_Q),
            (min(1, max_p), 0, s_P, 0),
            (0, min(1, max_q), 0, s_Q),
            (min(1, max_p), 0, 0, 0),
        }
    )
    best = None
    best_order = None
    for cand in starts:
        res = try_fit(*cand)
        if res and (best is None or res[1] < best[1]):
            best, best_order = res, cand
    improved = True
    while improved and best is not None and fits < n_fits:
        improved = False
        p0, q0, P0, Q0 = best_order
        for dp, dq, dP, dQ in (
            (1, 0, 0, 0), (-1, 0, 0, 0), (0, 1, 0, 0), (0, -1, 0, 0),
            (0, 0, 1, 0), (0, 0, -1, 0), (0, 0, 0, 1), (0, 0, 0, -1),
            (1, 1, 0, 0), (-1, -1, 0, 0), (0, 0, 1, 1), (0, 0, -1, -1),
        ):
            res = try_fit(p0 + dp, q0 + dq, P0 + dP, Q0 + dQ)
            if res and res[1] < best[1] - 1e-12:
                best, best_order = res, (p0 + dp, q0 + dq, P0 + dP, Q0 + dQ)
                improved = True
                break
    if best is None:
        return None
    best[0]["search_meta"] = {
        "n_fits_used": fits,
        "budget_reduced": budget is not None,
    }
    return best[0]


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
    max_D: int = 1,
    max_Q: int | None = None,
    search: str = "stepwise",
    large_series_threshold: int = 1000,
    exog_cols: list[str] | None = None,
    future_pdf: pd.DataFrame | None = None,
    order: tuple[int, int, int] | None = None,
    seasonal_order: tuple[int, int, int] | None = None,
) -> pd.DataFrame:
    """Per-series worker: AIC grid over (p,d,q,P), per-fold h-step
    forecasts from the fold-local best model, final forecast fold=-1.

    ``order=(p, d, q)`` / ``seasonal_order=(P, D, Q)`` pin the model
    to one explicitly chosen candidate (statsmodels
    ``SARIMAX(order=...)`` semantics), bypassing the search entirely —
    the deterministic path the pinned oracle queries use.

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
    exog_all = None
    if exog_cols:
        # NULL cells must not reach lstsq (SVD does not converge on
        # NaN): forward-fill, back-fill, then 0 for all-null columns —
        # the same persistence policy _future_exog_diffed applies to
        # future rows
        exog_all = (
            pdf[exog_cols].ffill().bfill().fillna(0.0).to_numpy(dtype=float)
        )

    # decide the regular differencing order ONCE per fit, from the
    # fit's own training slice (reference also tests stationarity up
    # front, eda.py:276-314): one capped ADF per fold keeps the
    # per-candidate ADF savings of the stepwise search WITHOUT letting
    # post-train_end observations leak into a fold's differencing
    # decision (fold metrics stay honest backtests)
    def d_hint_for(y: np.ndarray) -> int | None:
        if search != "stepwise" or order is not None:
            return None
        y_obs = y[~np.isnan(y)][-ADF_SAMPLE_CAP:]
        return min(auto_diff_order(y_obs), max_d)

    def best_fit(y: np.ndarray, exog: np.ndarray | None):
        if order is not None:
            p, d, q = order
            P, D, Q = seasonal_order or (0, 0, 0)
            res = _fit_ar(y, p, d, q, m, P, exog, D, Q)
            if res is None:
                return None
            res[0]["search_meta"] = {"n_fits_used": 1, "budget_reduced": False}
            return res[0]
        return select_model(
            y,
            m=m,
            max_p=max_p,
            max_d=max_d,
            max_q=max_q,
            max_P=max_P,
            max_D=max_D,
            max_Q=max_Q,
            exog=exog,
            search=search,
            large_series_threshold=large_series_threshold,
            d_hint=d_hint_for(y),
        )

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
        if exog_cols and any(c in future_pdf.columns for c in exog_cols):
            # per-column overlay (same policy as the fourier worker):
            # columns the future frame supplies are taken as known
            # future values; missing columns stay NaN and
            # _future_exog_diffed persists their last observed level
            fut_exog = np.full((len(future_pdf), len(exog_cols)), np.nan)
            for j, c in enumerate(exog_cols):
                if c in future_pdf.columns:
                    fut_exog[:, j] = future_pdf[c].to_numpy(dtype=float)
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
