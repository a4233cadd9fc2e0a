"""Fréchet Inception Distance.

Reference: metric/fid_score.py (activation harvesting 152-214, Fréchet
distance with singular-covariance retry 217-274, stats caching 277-350) and
the get_fid façade (metric/__init__.py:11-21).

Device work (Inception features) is jitted and batched; the Fréchet distance
itself is host-side numpy/scipy (matrix sqrtm has no TPU-friendly form and
is a one-off 2048x2048 computation).

Parity note: the reference quantises generated images to uint8 via
tensor2im before feeding the judge (metric/__init__.py:13-14).  ``get_fid``
reproduces that round-trip so scores are comparable bit-for-bit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from cat_tpu.metrics.inception import InceptionV3FID


def tensor2im_batch(images: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 NHWC (reference utils/util.py:58-88)."""
    arr = (np.asarray(images) + 1.0) / 2.0 * 255.0
    return np.clip(arr, 0, 255).astype(np.uint8)


def make_activation_fn(model: InceptionV3FID, variables: Dict):
    @jax.jit
    def run(x01: jnp.ndarray) -> jnp.ndarray:
        feats = model.apply(variables, x01)
        return feats[-1]

    return run


def get_activations(
    images_u8: np.ndarray,
    model: InceptionV3FID,
    variables: Dict,
    batch_size: int = 32,
    mesh=None,
) -> np.ndarray:
    """Inception features for a uint8 NHWC image stack (values 0..255).

    ``mesh``: shard each judge batch over the data axis — the forward
    compiles once as an SPMD program over the mesh (the judge's weights are
    replicated by GSPMD), so an 8-chip eval runs the InceptionV3 sweep 8x
    wide while the Fréchet reduction stays host-side (SURVEY §5.8).
    """
    run = make_activation_fn(model, variables)
    n = images_u8.shape[0]
    outs = []
    for i in range(0, n, batch_size):
        chunk = images_u8[i : i + batch_size]
        if mesh is not None:
            from cat_tpu.parallel.mesh import shard_eval_array

            x01, real = shard_eval_array(
                np.asarray(chunk, np.float32) / 255.0, mesh,
                pad_to=batch_size if n > batch_size else 0,
            )
            outs.append(np.asarray(run(x01))[:real])
            continue
        pad = 0
        if chunk.shape[0] < batch_size and n > batch_size:
            # keep a single compiled shape
            pad = batch_size - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
        feats = np.asarray(run(jnp.asarray(chunk, jnp.float32) / 255.0))
        if pad:
            feats = feats[: batch_size - pad]
        outs.append(feats)
    return np.concatenate(outs, axis=0)


def compute_statistics(act: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def calculate_frechet_distance(
    mu1: np.ndarray,
    sigma1: np.ndarray,
    mu2: np.ndarray,
    sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)), with the reference's
    eps-offset retry for near-singular products and imaginary-part check."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        print(
            "fid calculation produces singular product; "
            f"adding {eps} to diagonal of cov estimates"
        )
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            # reference semantics (fid_score.py:255-270): warn, keep the
            # real part — do NOT raise
            print("Warning: the fid may be incorrect!")
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def get_fid(
    fakes: np.ndarray,
    model: InceptionV3FID,
    variables: Dict,
    real_stats: Dict[str, np.ndarray],
    batch_size: int = 32,
    mesh=None,
    moments_reduce=None,
) -> float:
    """FID of generated images ([-1,1] float NHWC) vs cached real statistics
    ({'mu','sigma'} npz, produced by get_real_stat).

    ``moments_reduce``: cross-process hook for multi-host eval sharding
    (parallel.multihost.reduce_moments) — this process contributes the
    additive moments (n, Σa, Σaaᵀ) of ITS activations, the hook returns the
    global sums, and mu/sigma are recovered from them (identical to np.cov
    over the concatenated activations, ddof=1).  ``fakes`` may be empty on
    a process whose batch share was empty."""
    if fakes.shape[0]:
        ims = tensor2im_batch(fakes)
        act = get_activations(ims, model, variables, batch_size, mesh=mesh)
    else:
        act = np.zeros((0, 0), np.float32)
    if moments_reduce is None:
        mu, sigma = compute_statistics(act)
    else:
        a64 = np.asarray(act, np.float64)
        n = a64.shape[0]
        s1 = a64.sum(axis=0) if n else None
        s2 = a64.T @ a64 if n else None
        n, s1, s2 = moments_reduce(n, s1, s2)
        mu = s1 / n
        sigma = (s2 - np.outer(s1, s1) / n) / (n - 1)
    return calculate_frechet_distance(
        mu, sigma, real_stats["mu"], real_stats["sigma"]
    )


def get_fid_direct(
    reals: np.ndarray,
    fakes: np.ndarray,
    model: InceptionV3FID,
    variables: Dict,
    batch_size: int = 32,
    robust: bool = False,
) -> float:
    """FID between two [-1,1] image sets without cached statistics
    (reference get_fid_new, metric/__init__.py:75-113).  ``robust`` uses the
    coordinate-wise median instead of the mean for the activation centres —
    the reference's 'median' FID variant."""
    act_r = get_activations(tensor2im_batch(reals), model, variables, batch_size)
    act_f = get_activations(tensor2im_batch(fakes), model, variables, batch_size)
    centre = np.median if robust else np.mean
    mu1, mu2 = centre(act_r, axis=0), centre(act_f, axis=0)
    s1, s2 = np.cov(act_r, rowvar=False), np.cov(act_f, rowvar=False)
    return calculate_frechet_distance(mu1, s1, mu2, s2)


def compute_real_stats(
    images_m11: np.ndarray,
    model: InceptionV3FID,
    variables: Dict,
    batch_size: int = 32,
) -> Dict[str, np.ndarray]:
    """{'mu','sigma'} of a real-image set (= get_real_stat.py:24-48)."""
    ims = tensor2im_batch(images_m11)
    act = get_activations(ims, model, variables, batch_size)
    mu, sigma = compute_statistics(act)
    return {"mu": mu, "sigma": sigma}
