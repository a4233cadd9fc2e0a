"""Kernel Inception Distance (polynomial-kernel MMD).

Reference: metric/kid_score.py — KID is the mean (± std) of the unbiased
MMD^2 estimator with kernel k(x,y) = (xᵀy/d + 1)^3 over ``n_subsets``
random subsets of ``subset_size`` activations (the shipped evaluate scripts
use 100 subsets of 100 — kid_score.py:141-143).

The reference also computes a U-statistic variance estimate per subset
(kid_score.py:205-283) that is never reported by the shipped flows; the
reported quantities are exactly the subset mean/std produced here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def polynomial_kernel(
    x: np.ndarray,
    y: Optional[np.ndarray] = None,
    degree: int = 3,
    gamma: Optional[float] = None,
    coef0: float = 1.0,
) -> np.ndarray:
    # float64 like the reference's sklearn polynomial_kernel (large
    # activations cubed overflow float32)
    x = np.asarray(x, np.float64)
    y = x if y is None else np.asarray(y, np.float64)
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def polynomial_mmd(
    codes_g: np.ndarray,
    codes_r: np.ndarray,
    degree: int = 3,
    gamma: Optional[float] = None,
    coef0: float = 1.0,
) -> float:
    """Unbiased MMD^2 estimate between two activation sets."""
    k_xx = polynomial_kernel(codes_g, degree=degree, gamma=gamma, coef0=coef0)
    k_yy = polynomial_kernel(codes_r, degree=degree, gamma=gamma, coef0=coef0)
    k_xy = polynomial_kernel(codes_g, codes_r, degree=degree, gamma=gamma, coef0=coef0)
    m = k_xx.shape[0]
    kt_xx_sum = k_xx.sum() - np.trace(k_xx)
    kt_yy_sum = k_yy.sum() - np.trace(k_yy)
    mmd2 = (kt_xx_sum + kt_yy_sum) / (m * (m - 1)) - 2 * k_xy.sum() / (m * m)
    return float(mmd2)


def kid_score(
    codes_g: np.ndarray,
    codes_r: np.ndarray,
    n_subsets: int = 100,
    subset_size: int = 100,
    seed: Optional[int] = None,
    **kernel_args,
) -> Tuple[float, float]:
    """(mean, std) of MMD^2 over random subsets — the reported KID."""
    rng = np.random.RandomState(seed)
    subset_size = min(subset_size, len(codes_g), len(codes_r))
    mmds = np.zeros(n_subsets)
    for i in range(n_subsets):
        g = codes_g[rng.choice(len(codes_g), subset_size, replace=False)]
        r = codes_r[rng.choice(len(codes_r), subset_size, replace=False)]
        mmds[i] = polynomial_mmd(g, r, **kernel_args)
    return float(mmds.mean()), float(mmds.std())
