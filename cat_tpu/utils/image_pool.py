"""Device-resident image replay buffer for CycleGAN discriminators.

Reference semantics (utils/image_pool.py:22-53): for each incoming image, if
the pool is not full it is stored and returned as-is; otherwise with p=0.5 a
random pool entry is returned and replaced by the incoming image, else the
incoming image passes through.

TPU-native redesign: the reference buffer is a Python list manipulated on
host every step.  Here the pool is a fixed-shape array *inside the training
state*, and ``query`` is a pure jit-compatible function (lax.scan over the
batch, dynamic_update_slice writes) — no host round-trip for the fake-image
batch.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax


@flax.struct.dataclass
class PoolState:
    buffer: jnp.ndarray  # (pool_size, H, W, C)
    count: jnp.ndarray  # scalar int32: number of filled slots


def pool_init(pool_size: int, h: int, w: int, c: int, dtype=jnp.float32) -> PoolState:
    return PoolState(
        buffer=jnp.zeros((pool_size, h, w, c), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def pool_query(
    state: PoolState, images: jnp.ndarray, rng: jax.Array
) -> Tuple[PoolState, jnp.ndarray]:
    """Mix the incoming batch with buffered history (sequential semantics)."""
    pool_size = state.buffer.shape[0]
    if pool_size == 0:
        return state, images
    keys = jax.random.split(rng, images.shape[0])

    def step(carry, inp):
        buffer, count = carry
        img, key = inp
        k_swap, k_idx = jax.random.split(key)

        def insert(_):
            buf = lax.dynamic_update_index_in_dim(buffer, img, count, 0)
            return buf, count + 1, img

        def full(_):
            swap = jax.random.uniform(k_swap) > 0.5
            idx = jax.random.randint(k_idx, (), 0, pool_size)
            old = buffer[idx]

            def do_swap(_):
                return lax.dynamic_update_index_in_dim(buffer, img, idx, 0), count, old

            def no_swap(_):
                return buffer, count, img

            return lax.cond(swap, do_swap, no_swap, None)

        buffer, count, out = lax.cond(count < pool_size, insert, full, None)
        return (buffer, count), out

    (buffer, count), outs = lax.scan(step, (state.buffer, state.count), (images, keys))
    return PoolState(buffer=buffer, count=count), outs
