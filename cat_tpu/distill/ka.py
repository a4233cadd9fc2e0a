"""Kernel Alignment (KA) — the CAT distillation loss.

    KA(X, Y) = <XXᵀ, YYᵀ> / (‖XXᵀ‖_F · ‖YYᵀ‖_F)

on batch-flattened activations (reference: utils/common.py:38-46).  The
distiller *maximises* KA between student and teacher activations at mapped
layers (loss = -KA).

TPU implementation notes:
  * Both Gram matrices are produced by ONE fused Pallas kernel streaming X
    and Y tile-by-tile over the feature axis — a single HBM pass over each
    operand, accumulating the (tiny) B x B Grams in VMEM.  The normalised
    inner product on the Grams is scalar work.
  * The backward pass needs only the saved Grams plus one more read of X/Y:
    dKA/dX = 2 (G_Y - (s/n_x) G_X) X / sqrt(n_x n_y)  — a (B x B)(B x F)
    matmul that XLA handles optimally; exposed via jax.custom_vjp so the
    Grams are not recomputed.
  * KA is invariant to permutations/zero-padding of the feature axis, so the
    NHWC flatten order (vs the reference's NCHW) and lane padding are
    harmless.

Under data parallelism KA is computed per shard and the scalar losses are
summed — matching the reference's multi-GPU behaviour
(distillers/inception_distiller.py:135-148), and keeping ICI traffic to one
scalar instead of an all-gather of activations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_SUBLANE = 8
_LANE = 128
_DEFAULT_TILE = 2048


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Fused Gram-pair kernel
# ---------------------------------------------------------------------------


def _gram_kernel(x_ref, g_ref):
    import jax.experimental.pallas as pl  # local import: TPU-only dependency

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        g_ref[:] = jnp.zeros_like(g_ref)

    # Stream in the input's own dtype; the MXU computes bf16xbf16->f32
    # products exactly, so this equals upcasting to f32 first at half the
    # HBM traffic.
    x = x_ref[:]
    g_ref[:] += jax.lax.dot_general(
        x, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _gram_pallas(
    x: jnp.ndarray, tile: int = _DEFAULT_TILE, interpret: bool = False
) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f = x.shape
    bp = max(_round_up(b, _SUBLANE), _SUBLANE)
    fp = _round_up(f, tile)
    if (bp, fp) != (b, f):
        # pad in the input dtype (zero rows/columns contribute nothing)
        x = jnp.zeros((bp, fp), x.dtype).at[:b, :f].set(x)

    grid = (fp // tile,)
    spec = pl.BlockSpec((bp, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bp, bp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    g = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bp, bp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * bp * fp,
            bytes_accessed=bp * fp * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return g[:b, :b]


def _gram_pair_pallas(
    x: jnp.ndarray, y: jnp.ndarray, tile: int = _DEFAULT_TILE, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return _gram_pallas(x, tile, interpret), _gram_pallas(y, tile, interpret)


def _gram_pair_xla(x: jnp.ndarray, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    def gram(a):
        return jax.lax.dot_general(
            a, a, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    return gram(x), gram(y)


def gram_pair(
    x: jnp.ndarray, y: jnp.ndarray, use_pallas: str = "auto", interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(XXᵀ, YYᵀ) for 2-D batch-major operands."""
    assert x.ndim == 2 and y.ndim == 2 and x.shape[0] == y.shape[0]
    if use_pallas == "auto":
        use_pallas = "yes" if jax.default_backend() == "tpu" else "no"
    if use_pallas == "yes" or interpret:
        return _gram_pair_pallas(x, y, interpret=interpret)
    return _gram_pair_xla(x, y)


# ---------------------------------------------------------------------------
# KA with custom VJP
# ---------------------------------------------------------------------------


def _flatten(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ka(x: jnp.ndarray, y: jnp.ndarray, use_pallas: str = "auto") -> jnp.ndarray:
    """Kernel alignment of two activation batches (any trailing shape)."""
    val, _ = _ka_fwd(x, y, use_pallas)
    return val


def _ka_parts(gx, gy):
    s = jnp.sum(gx * gy)
    nx = jnp.sum(gx * gx)
    ny = jnp.sum(gy * gy)
    return s, nx, ny


def _ka_fwd(x, y, use_pallas):
    xf, yf = _flatten(x), _flatten(y)
    if xf.shape[0] != yf.shape[0]:
        raise ValueError(
            f"X and Y must share the batch dimension, got {xf.shape[0]} vs {yf.shape[0]}"
        )
    gx, gy = gram_pair(xf, yf, use_pallas=use_pallas)
    s, nx, ny = _ka_parts(gx, gy)
    val = s * lax.rsqrt(nx * ny)
    return val, (x, y, gx, gy, s, nx, ny)


def _ka_bwd(use_pallas, res, g):
    x, y, gx, gy, s, nx, ny = res
    xf, yf = _flatten(x), _flatten(y)
    inv = lax.rsqrt(nx * ny)
    # dKA/dG_X = (G_Y - (s/n_x) G_X) / sqrt(n_x n_y); dG_X/dX pulls back as 2 M X
    mx = (gy - (s / nx) * gx) * inv
    my = (gx - (s / ny) * gy) * inv
    dx = (2.0 * g) * (mx @ xf)
    dy = (2.0 * g) * (my @ yf)
    return dx.reshape(x.shape).astype(x.dtype), dy.reshape(y.shape).astype(y.dtype)


ka.defvjp(_ka_fwd, _ka_bwd)
