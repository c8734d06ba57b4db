"""Property-based invariants for the seasonal-AR fit/forecast math —
the differencing inverse and the search contract must hold for ANY
series shape, not just the hand-picked fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from auto_ts_spark.models.ar import _fit_ar, _forecast_fitted, select_model


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    d=st.integers(0, 2),
    D=st.integers(0, 1),
    m=st.sampled_from([4, 7, 12]),
    h=st.integers(1, 20),
)
def test_difference_inverse_is_exact_on_zero_forecast(seed, d, D, m, h):
    """If the differenced-scale forecast is identically zero, undoing
    D seasonal + d regular differences must reproduce the
    deterministic continuation implied by the stored tails — i.e. the
    inverse transform alone, exercised at every (d, D, m) combination.
    Verified against an independent pandas-free replay."""
    rng = np.random.RandomState(seed)
    n = 6 * m + 10 * (d + 1)
    y = np.cumsum(rng.randn(n)) + 5.0 * np.sin(2 * np.pi * np.arange(n) / m)
    model, _ = _fit_ar(y, p=1, d=d, q=0, m=m, P=0, D=D)
    # replace the fitted AR with an all-zero forecast in diff scale
    model = dict(model)
    model["beta"] = np.zeros_like(model["beta"])
    got = _forecast_fitted(model, h)

    # independent check via the FORWARD transform only: seasonal-then-
    # regular differencing of [history ++ forecast] must put exactly
    # zeros where the forecast rows land — no shared inverse-loop code,
    # so a bug in _forecast_fitted's inversion cannot self-confirm
    full = np.concatenate([y, got])
    for _ in range(D if m > 1 else 0):
        full = full[m:] - full[:-m]
    for _ in range(d):
        full = np.diff(full)
    assert np.allclose(full[-h:], 0.0, atol=1e-9)
    # and the inverse must actually extend the level series (finite,
    # correct length) rather than degenerate
    assert got.shape == (h,) and np.isfinite(got).all()


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(40, 400),
    m=st.sampled_from([0, 7, 12]),
)
def test_select_model_respects_budget_and_bounds(seed, n, m):
    """For any series: the chosen orders stay inside the bounds, the
    fit count respects the budget, and the reduced budget triggers
    exactly when n > threshold."""
    rng = np.random.RandomState(seed)
    y = np.cumsum(rng.randn(n)) * 0.1 + rng.randn(n)
    model = select_model(
        y, m=m, max_p=3, max_d=1, max_q=1, max_P=1, large_series_threshold=200
    )
    if model is None:
        return  # degenerate series; nothing to assert
    meta = model["search_meta"]
    assert meta["budget_reduced"] == (n > 200)
    cap = 10 if n > 200 else 50
    assert 0 < meta["n_fits_used"] <= cap
    assert model["p"] <= (2 if n > 200 else 3)
    assert model["q"] <= 1 and model["P"] <= 1
    if m == 0:
        assert model["D"] == 0 and model["Q"] == 0 and not model["season_lags"]
    if n > 200 and m > 1:
        assert model["D"] == 1  # forced by the reference's large-data policy
    h = 5
    fc = _forecast_fitted(model, h)
    assert fc.shape == (h,) and np.isfinite(fc).all()
