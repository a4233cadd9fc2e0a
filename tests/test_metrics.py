"""Metrics: Fréchet distance, KID MMD, mIoU histogram, Inception judge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.metrics.fid import (
    calculate_frechet_distance,
    compute_statistics,
    get_fid,
    tensor2im_batch,
)
from cat_tpu.metrics.inception import InceptionV3FID
from cat_tpu.metrics.kid import kid_score, polynomial_mmd
from cat_tpu.metrics.miou import fast_hist, mean_iou, per_class_iou


# --------------------------------------------------------------------- FID


def test_frechet_identical_is_zero(rng):
    act = rng.randn(500, 8)
    mu, sigma = compute_statistics(act)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_mean_shift_analytic():
    # N(0, I) vs N(m, I): d^2 = |m|^2
    d = 6
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    sigma = np.eye(d)
    got = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(got, d * 4.0, rtol=1e-6)


def test_frechet_variance_analytic():
    # N(0, a I) vs N(0, b I): d^2 = d*(a + b - 2 sqrt(ab))
    d = 4
    a, b = 2.0, 0.5
    got = calculate_frechet_distance(
        np.zeros(d), a * np.eye(d), np.zeros(d), b * np.eye(d)
    )
    np.testing.assert_allclose(got, d * (a + b - 2 * np.sqrt(a * b)), rtol=1e-6)


def test_frechet_singular_retry(rng):
    # rank-deficient covariances trigger the eps-offset path
    d = 5
    act1 = rng.randn(3, d)  # fewer samples than dims => singular cov
    act2 = rng.randn(3, d)
    mu1, s1 = compute_statistics(act1)
    mu2, s2 = compute_statistics(act2)
    val = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert np.isfinite(val)


def test_tensor2im_roundtrip():
    x = np.array([-1.0, 0.0, 1.0]).reshape(1, 1, 3, 1)
    out = tensor2im_batch(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out.ravel(), [0, 127, 255])


# --------------------------------------------------------------------- KID


def test_mmd_identical_distributions_near_zero(rng):
    x = rng.randn(400, 16)
    y = rng.randn(400, 16)
    near = polynomial_mmd(x, y)
    far = polynomial_mmd(x, y + 3.0)
    assert abs(near) < 0.5
    assert far > 10 * abs(near)


def test_kid_score_subsets(rng):
    x = rng.randn(300, 8)
    y = rng.randn(300, 8) + 1.0
    mean, std = kid_score(x, y, n_subsets=10, subset_size=50, seed=0)
    assert mean > 0
    assert std >= 0


def test_kid_variance_estimator_monte_carlo(rng):
    """The U-statistic variance estimate (reference kid_score.py:205-283)
    must track the TRUE sampling variance of the unbiased MMD^2: draw many
    independent (X, Y) pairs from fixed distributions, compare the mean
    variance estimate against the empirical variance of the MMD^2 values —
    a genuine numpy oracle, not a formula transcription."""
    m, d, reps = 50, 4, 300
    mmds = np.zeros(reps)
    var_ests = np.zeros(reps)
    for i in range(reps):
        x = rng.randn(m, d)
        y = rng.randn(m, d) * 1.2 + 0.3
        mmds[i], var_ests[i] = polynomial_mmd(x, y, ret_var=True)
    true_var = mmds.var(ddof=1)
    est = var_ests.mean()
    assert est > 0
    assert 0.4 < est / true_var < 2.5, (est, true_var)
    # var_at_m scaling: the estimate at a larger M must be smaller (the
    # reference evaluates subsets of 100 but reports variance at the full
    # activation count m — kid_score.py:236,249-250)
    x = rng.randn(m, d)
    y = rng.randn(m, d) + 0.5
    _, v_small = polynomial_mmd(x, y, ret_var=True, var_at_m=m)
    _, v_large = polynomial_mmd(x, y, ret_var=True, var_at_m=10 * m)
    assert v_large < v_small
    # ret_var plumbs through kid_score
    out = kid_score(x, y, n_subsets=5, subset_size=32, seed=0, ret_var=True)
    assert len(out) == 3 and out[2].shape == (5,)


# --------------------------------------------------------------------- mIoU


def test_fast_hist_and_miou():
    pred = np.array([0, 1, 2, 1])
    label = np.array([0, 1, 1, 255])  # 255 = ignore
    hist = fast_hist(pred, label, 3)
    assert hist.sum() == 3  # ignored pixel dropped
    assert hist[0, 0] == 1 and hist[1, 1] == 1 and hist[1, 2] == 1
    ious = per_class_iou(hist)
    np.testing.assert_allclose(ious[0], 1.0)
    np.testing.assert_allclose(ious[1], 0.5)
    perfect = fast_hist(np.arange(3), np.arange(3), 3)
    assert mean_iou(perfect) == 100.0


# ---------------------------------------------------------------- Inception


@pytest.mark.slow
def test_inception_forward_shapes():
    model = InceptionV3FID(output_blocks=(0, 3))
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    f0, f3 = model.apply(variables, x)
    assert f0.shape[0] == 2 and f0.shape[-1] == 64
    assert f3.shape == (2, 2048)


def test_median_iou():
    from cat_tpu.metrics.miou import median_iou

    hist = np.zeros((3, 3), dtype=np.int64)
    hist[0, 0] = 10          # class 0: IoU 1.0
    hist[1, 1] = 1
    hist[1, 2] = 1           # class 1: IoU 0.5, class 2: 0/(1) = 0
    assert median_iou(hist) == 50.0


@pytest.mark.slow
def test_get_fid_direct(rng):
    from cat_tpu.metrics.fid import get_fid_direct
    from cat_tpu.metrics.inception import InceptionV3FID

    model = InceptionV3FID(output_blocks=(3,))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    a = rng.uniform(-1, 1, size=(6, 32, 32, 3)).astype(np.float32)
    same = get_fid_direct(a, a.copy(), model, variables, batch_size=3)
    assert abs(same) < 1e-2
    robust = get_fid_direct(a, a.copy(), model, variables, batch_size=3, robust=True)
    assert abs(robust) < 1e-2


@pytest.mark.slow
def test_get_fid_pipeline(rng):
    """End-to-end FID with a random-weight judge: same set ~ 0, disjoint > 0."""
    model = InceptionV3FID(output_blocks=(3,))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    fakes = rng.uniform(-1, 1, size=(8, 32, 32, 3)).astype(np.float32)
    act = tensor2im_batch(fakes)
    from cat_tpu.metrics.fid import get_activations

    feats = get_activations(act, model, variables, batch_size=4)
    mu, sigma = compute_statistics(feats)
    fid_same = get_fid(fakes, model, variables, {"mu": mu, "sigma": sigma}, batch_size=4)
    assert abs(fid_same) < 1e-2
