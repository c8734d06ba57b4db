"""Statistical tests: ADF stationarity + auto-differencing order.

Reference parity: W16 (auto_ts/utils/eda.py:204-314) runs
``smt.adfuller`` and differences the series until p < 0.05 (max 2
rounds). statsmodels isn't in this container, so the test is
implemented directly: the standard ADF regression
``Δy_t = α + γ·y_{t-1} + Σ δ_i Δy_{t-i} + ε`` fitted by OLS, with the
t-statistic on γ compared against the published MacKinnon (2010)
asymptotic critical values for the constant-only case. The decision
(stationary at 5%) is what drives differencing — identical decision
procedure, not identical p-values.

Runs per-series inside applyInPandas (see registry.adf_table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# MacKinnon (2010) asymptotic critical values, constant, no trend.
ADF_CRIT = {"1%": -3.43, "5%": -2.86, "10%": -2.57}


def adf_statistic(y: np.ndarray, max_lag: int | None = None) -> float:
    y = np.asarray(y, dtype=float)
    y = y[~np.isnan(y)]
    n = len(y)
    if n < 10:
        return 0.0
    if max_lag is None:
        max_lag = min(int(np.ceil(12.0 * (n / 100.0) ** 0.25)), n // 2 - 2)
    dy = np.diff(y)
    best_stat = 0.0
    # fixed-lag regression (Schwert rule lag); one OLS
    k = max_lag
    rows = np.arange(k, len(dy))
    if len(rows) < 5:
        return 0.0
    X = np.column_stack(
        [np.ones(len(rows)), y[rows]]
        + [dy[rows - j] for j in range(1, k + 1)]
    )
    t = dy[rows]
    beta, *_ = np.linalg.lstsq(X, t, rcond=None)
    resid = t - X @ beta
    dof = max(len(rows) - X.shape[1], 1)
    sigma2 = float(resid @ resid) / dof
    XtX_inv = np.linalg.pinv(X.T @ X)
    se_gamma = float(np.sqrt(sigma2 * XtX_inv[1, 1]))
    best_stat = float(beta[1] / se_gamma) if se_gamma > 0 else 0.0
    return best_stat


def is_stationary(y: np.ndarray, alpha: str = "5%") -> bool:
    return adf_statistic(y) < ADF_CRIT[alpha]


def auto_diff_order(y: np.ndarray, max_diff: int = 2, alpha: str = "5%") -> int:
    """Number of differencing rounds until stationary (reference's
    diff_limit logic, auto_ts/utils/eda.py:276-314)."""
    yd = np.asarray(y, dtype=float)
    for d in range(max_diff + 1):
        if is_stationary(yd, alpha):
            return d
        yd = np.diff(yd)
    return max_diff
