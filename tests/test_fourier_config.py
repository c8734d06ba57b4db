"""Prophet configuration surface on the fourier worker (reference
build_prophet.py:70-80, 587-649): growth, seasonality_mode, holidays,
multi-seasonality — each must measurably change/improve the fit on a
series constructed to need it."""

import numpy as np
import pandas as pd

from auto_ts_spark.models.base import expanding_fold_bounds
from auto_ts_spark.models.fourier import forecast_fourier, seasonality_blocks


def _cv_rmse(pred_df, pdf):
    merged = pred_df[pred_df["fold"] >= 0].merge(pdf, on="ts")
    return float(np.sqrt(((merged["y"] - merged["yhat"]) ** 2).mean()))


def test_multiplicative_mode_wins_on_multiplicative_series():
    rng = np.random.RandomState(2)
    n = 120
    t = np.arange(n, dtype=float)
    trend = 10 * np.exp(0.02 * t)
    seasonal = 1 + 0.4 * np.sin(2 * np.pi * t / 12)
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2010-01-31", periods=n, freq="ME"),
            "y": trend * seasonal * np.exp(rng.randn(n) * 0.01),
        }
    )
    folds = expanding_fold_bounds(n, 3, 8)
    add = forecast_fourier(pdf, folds, 8, seasonal_period=12)
    mult = forecast_fourier(
        pdf, folds, 8, seasonal_period=12, seasonality_mode="multiplicative"
    )
    assert _cv_rmse(mult, pdf) < _cv_rmse(add, pdf) * 0.5


def test_logistic_growth_respects_cap():
    rng = np.random.RandomState(4)
    n = 150
    t = np.arange(n, dtype=float)
    cap = 100.0
    y = cap / (1 + np.exp(-(t - 60) / 12)) + rng.randn(n) * 0.5
    y = np.clip(y, 1.0, cap - 1.0)
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2015-01-01", periods=n, freq="D"), "y": y}
    )
    folds = expanding_fold_bounds(n, 2, 10)
    out = forecast_fourier(
        pdf, folds, 30, seasonal_period=0, growth="logistic", cap=cap
    )
    fut = out[out["fold"] == -1]["yhat"].to_numpy()
    assert (fut <= cap).all()  # saturating, never overshoots
    assert fut[-1] > 90  # approaches the plateau


def test_holiday_regressor_captures_spikes():
    rng = np.random.RandomState(6)
    n = 200
    ts = pd.date_range("2019-01-01", periods=n, freq="D")
    y = 50 + rng.randn(n) * 0.5
    holidays = [str(ts[i].date()) for i in (30, 90, 150, 180)]
    for h in holidays:
        y[ts.get_loc(pd.Timestamp(h))] += 40
    pdf = pd.DataFrame({"ts": ts, "y": y})
    folds = expanding_fold_bounds(n, 2, 30)
    plain = forecast_fourier(pdf, folds, 5, seasonal_period=7)
    with_hol = forecast_fourier(
        pdf, folds, 5, seasonal_period=7, holidays=holidays
    )
    # fold windows include holidays 150 and 180 — the regressor must
    # explain the spikes the plain model can't
    assert _cv_rmse(with_hol, pdf) < _cv_rmse(plain, pdf) * 0.5


def test_extra_seasonality_blocks():
    rng = np.random.RandomState(8)
    n = 400
    t = np.arange(n, dtype=float)
    # daily data with weekly AND ~monthly structure
    y = (
        10
        + 5 * np.sin(2 * np.pi * t / 7)
        + 3 * np.sin(2 * np.pi * t / 30)
        + rng.randn(n) * 0.3
    )
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2018-01-01", periods=n, freq="D"), "y": y}
    )
    folds = expanding_fold_bounds(n, 2, 20)
    weekly_only = forecast_fourier(pdf, folds, 5, seasonal_period=7)
    both = forecast_fourier(
        pdf, folds, 5, seasonal_period=7, seasonal_periods=[(30.0, 3)]
    )
    assert _cv_rmse(both, pdf) < _cv_rmse(weekly_only, pdf) * 0.7


def test_seasonality_blocks_map():
    assert seasonality_blocks(3600.0) == [(24.0, 3), (168.0, 3)]  # hourly
    day = 86400.0
    assert seasonality_blocks(day) == [(7.0, 3), (365.25, 5)]  # daily
    assert seasonality_blocks(7 * day) == [(365.25 / 7, 5)]  # weekly
    assert seasonality_blocks(30 * day) == []  # monthly+: base only


def test_default_config_matches_independent_lstsq():
    """Pin the default additive/linear semantics against an
    INDEPENDENT re-derivation (ridge-stabilized normal equations on
    intercept + trend + K=3 Fourier pairs) — guards the
    automl_forecast oracle against silent regressions of the default
    path, which a self-vs-self determinism check cannot."""
    rng = np.random.RandomState(1)
    n = 96
    t = np.arange(n, dtype=float)
    y = 10 + 0.5 * t + 8 * np.sin(2 * np.pi * t / 12) + rng.randn(n) * 0.5
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2015-01-31", periods=n, freq="ME"), "y": y}
    )
    folds = expanding_fold_bounds(n, 3, 8)
    got = forecast_fourier(pdf, folds, 8, seasonal_period=12)

    def design(tv):
        cols = [np.ones_like(tv), tv]
        for k in range(1, 4):
            ang = 2 * np.pi * k * tv / 12.0
            cols += [np.sin(ang), np.cos(ang)]
        return np.column_stack(cols)

    def fit_predict(train_n, idx):
        X = design(t[:train_n])
        beta = np.linalg.solve(
            X.T @ X + 1e-8 * np.eye(X.shape[1]), X.T @ y[:train_n]
        )
        return design(idx.astype(float)) @ beta

    for fold, (tr, te) in enumerate(folds):
        want = fit_predict(tr, np.arange(tr, te))
        have = got[got["fold"] == fold].sort_values("ts")["yhat"].to_numpy()
        assert np.allclose(have, want, atol=1e-8), f"fold {fold}"
    want_fut = fit_predict(n, np.arange(n, n + 8))
    have_fut = got[got["fold"] == -1].sort_values("ts")["yhat"].to_numpy()
    assert np.allclose(have_fut, want_fut, atol=1e-8)


def test_changepoints_capture_trend_break():
    """Piecewise-linear trend (Prophet changepoints, reference
    build_prophet.py default n_changepoints=25): a series whose slope
    flips sign mid-history must forecast materially better with
    changepoints on than with the single global trend."""
    rng = np.random.RandomState(6)
    n = 160
    t = np.arange(n, dtype=float)
    brk = 100
    trend = np.where(t < brk, 5 + 0.8 * t, 5 + 0.8 * brk - 0.6 * (t - brk))
    y = trend + 3 * np.sin(2 * np.pi * t / 12) + rng.randn(n) * 0.5
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2010-01-31", periods=n, freq="ME"), "y": y}
    )
    folds = expanding_fold_bounds(n, 3, 10)
    flat = forecast_fourier(pdf, folds, 10, seasonal_period=12)
    cp = forecast_fourier(
        pdf, folds, 10, seasonal_period=12, n_changepoints=25
    )
    rmse_flat, rmse_cp = _cv_rmse(flat, pdf), _cv_rmse(cp, pdf)
    assert rmse_cp < 0.5 * rmse_flat, (rmse_cp, rmse_flat)
    # future forecast must continue the POST-break slope (downhill),
    # not the global average slope
    fut = cp[cp["fold"] == -1].sort_values("ts")["yhat"].to_numpy()
    assert fut[-1] < fut[0]


def test_changepoints_off_is_bit_stable():
    """Default n_changepoints=0 must reproduce the exact pre-feature
    fit — pinned oracles depend on it."""
    rng = np.random.RandomState(2)
    n = 96
    t = np.arange(n, dtype=float)
    y = 10 + 0.5 * t + 8 * np.sin(2 * np.pi * t / 12) + rng.randn(n) * 0.5
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2015-01-31", periods=n, freq="ME"), "y": y}
    )
    folds = expanding_fold_bounds(n, 2, 8)
    a = forecast_fourier(pdf, folds, 8, seasonal_period=12)
    b = forecast_fourier(
        pdf, folds, 8, seasonal_period=12, n_changepoints=0
    )
    assert np.array_equal(a["yhat"].to_numpy(), b["yhat"].to_numpy())


def test_changepoints_forward_through_auto_config():
    """AutoTimeSeries(model_config={'n_changepoints': ...}) reaches the
    fourier worker (the reference's Prophet defaults travel through
    setup_prophet_model the same way)."""
    import inspect

    from auto_ts_spark.models.registry import model_registry

    reg = model_registry(fourier_config={"n_changepoints": 25})
    fn = reg["fourier"]
    assert fn.keywords.get("n_changepoints") == 25
    assert "n_changepoints" in inspect.signature(forecast_fourier).parameters
