"""Primitive ops: norm math, padding, torch-geometry transposed conv,
spectral norm.  (The counterpart of the reference's sync-BN numerical test
fixtures, models/modules/sync_batchnorm/{batchnorm_reimpl,unittest}.py.)"""

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.core.config import NormConfig
from cat_tpu.ops.nn import ConvTranspose2d, Norm2d, spatial_pad
from cat_tpu.ops.spectral import SpectralConv


def manual_batchnorm(x, scale, bias, eps):
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def test_batchnorm_matches_manual(rng):
    x = rng.randn(4, 6, 6, 5).astype(np.float32)
    cfg = NormConfig(kind="batch", affine=True, track_running_stats=True, eps=1e-5)
    norm = Norm2d(cfg)
    variables = norm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    scale = rng.rand(5).astype(np.float32) + 0.5
    bias = rng.randn(5).astype(np.float32)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }
    out, new_state = norm.apply(variables, jnp.asarray(x), train=True,
                                mutable=["batch_stats"])
    ref = manual_batchnorm(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-5)
    # running stats: torch momentum semantics with unbiased batch var
    n = x.shape[0] * x.shape[1] * x.shape[2]
    exp_mean = 0.1 * x.mean(axis=(0, 1, 2))
    exp_var = 0.9 * 1.0 + 0.1 * x.var(axis=(0, 1, 2)) * n / (n - 1)
    np.testing.assert_allclose(new_state["batch_stats"]["mean"], exp_mean, rtol=1e-4)
    np.testing.assert_allclose(new_state["batch_stats"]["var"], exp_var, rtol=1e-4)
    # eval mode uses the running stats
    ev = norm.apply({"params": variables["params"],
                     "batch_stats": new_state["batch_stats"]},
                    jnp.asarray(x), train=False)
    ref_eval = (x - np.asarray(exp_mean)) / np.sqrt(np.asarray(exp_var) + 1e-5)
    ref_eval = ref_eval * scale + bias
    np.testing.assert_allclose(np.asarray(ev), ref_eval, rtol=2e-4, atol=1e-5)


def test_instance_norm_per_sample(rng):
    x = rng.randn(3, 8, 8, 4).astype(np.float32)
    cfg = NormConfig(kind="instance", affine=False)
    out = Norm2d(cfg).apply({}, jnp.asarray(x))
    out = np.asarray(out)
    # each (sample, channel) plane is standardised independently
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.var(axis=(1, 2)), 1.0, atol=1e-3)


def test_spatial_pad_modes():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    r = spatial_pad(x, 1, "reflect")
    assert r.shape == (1, 4, 4, 1)
    assert float(r[0, 0, 0, 0]) == 3.0  # reflect of [1,1]
    z = spatial_pad(x, 1, "zero")
    assert float(z[0, 0, 0, 0]) == 0.0
    e = spatial_pad(x, 1, "replicate")
    assert float(e[0, 0, 0, 0]) == 0.0  # edge copy of corner


def test_conv_transpose_torch_geometry(rng):
    mod = ConvTranspose2d(features=6, kernel=3, stride=2, padding=1, output_padding=1)
    x = jnp.asarray(rng.randn(2, 5, 7, 4), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)
    assert y.shape == (2, 10, 14, 6)  # exact 2x like torch ConvT(k3,s2,p1,op1)


def test_spectral_conv_power_iteration(rng):
    mod = SpectralConv(features=8, kernel=3, padding=1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert "spectral" in variables
    # training updates the power-iteration vector
    _, new_state = mod.apply(variables, x, train=True, mutable=["spectral"])
    assert not np.allclose(np.asarray(new_state["spectral"]["u"]),
                           np.asarray(variables["spectral"]["u"]))
    # the normalised kernel has spectral norm ~1 (after a few iterations)
    v = {"params": variables["params"], "spectral": new_state["spectral"]}
    for _ in range(20):
        _, s = mod.apply(v, x, train=True, mutable=["spectral"])
        v = {"params": variables["params"], "spectral": s["spectral"]}
    kernel = np.asarray(variables["params"]["kernel"])
    w = kernel.transpose(3, 0, 1, 2).reshape(8, -1)
    u = np.asarray(v["spectral"]["u"])
    vv = w.T @ u / np.linalg.norm(w.T @ u)
    sigma_est = u @ (w @ vv)
    sigma_true = np.linalg.svd(w, compute_uv=False)[0]
    np.testing.assert_allclose(sigma_est, sigma_true, rtol=1e-3)
