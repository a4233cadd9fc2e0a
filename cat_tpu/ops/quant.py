"""Dynamic int8 quantized execution for frozen (inference-only) networks.

VERDICT r4 #3: the frozen teacher is ~48% of the inception distill step and
is pure inference; the v5e MXU doubles its peak rate at int8.  This module
executes an UNMODIFIED forward function with every dense convolution
rewritten to int8:

  * weights: per-output-channel symmetric scales (max|w| over HWI -> O),
  * activations: per-tensor dynamic symmetric scale (max|x| computed on
    device each call),
  * accumulation in int32 on the MXU, dequantised to f32 with the product
    of the two scales.

Implementation is a jaxpr interpreter (``int8_call``), not a model fork:
the teacher's forward is traced once, conv_general_dilated equations are
re-emitted through ``int8_conv``, and everything else (norms, activations,
pads, the taps the KA loss reads) runs exactly as traced — so the taps come
back dequantised f32 automatically.  Reference counterpart: the teacher
forward under no_grad, distillers/inception_distiller.py:100-104 (the
reference has no quantised path; this is a TPU-native extension).

Opt in with ``--teacher_compute_dtype int8`` (distill verb).  Measured
numbers and the quality gate live in PARITY.md.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.extend import core

try:  # the conv primitive moved between jax versions
    from jax._src.lax.convolution import conv_general_dilated_p
except ImportError:  # pragma: no cover
    conv_general_dilated_p = lax.conv_general_dilated_p  # type: ignore


def int8_conv(x: jnp.ndarray, w: jnp.ndarray, **params) -> jnp.ndarray:
    """conv_general_dilated with dynamic int8 operands, int32 MXU
    accumulation, and f32 dequantisation.

    ``params`` are the original equation's parameters; output-feature and
    kernel-output dims come from its dimension_numbers, so any layout the
    tracer used is handled.
    """
    dn = params["dimension_numbers"]
    out_c_dim = dn.out_spec[1]  # position of the feature dim in the output
    ker_o_dim = dn.rhs_spec[0]  # kernel output-feature dim
    f32 = jnp.float32
    x = x.astype(f32)
    w = w.astype(f32)

    # per-tensor dynamic activation scale; per-output-channel weight scale
    qx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    reduce_dims = tuple(i for i in range(w.ndim) if i != ker_o_dim)
    qw = jnp.maximum(jnp.max(jnp.abs(w), axis=reduce_dims), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / qx), -127, 127).astype(jnp.int8)
    qw_b = jnp.expand_dims(qw, tuple(i for i in range(w.ndim) if i != ker_o_dim))
    wq = jnp.clip(jnp.round(w / qw_b), -127, 127).astype(jnp.int8)

    # re-emit through the public API (primitive-level params grow version-
    # specific fields like out_sharding; the public wrapper fills them)
    conv_kwargs = {
        k: params[k]
        for k in ("window_strides", "padding", "lhs_dilation",
                  "rhs_dilation", "dimension_numbers",
                  "feature_group_count", "batch_group_count", "precision")
        if k in params
    }
    acc = lax.conv_general_dilated(
        xq, wq, preferred_element_type=jnp.int32, **conv_kwargs)

    scale = qx * qw  # (O,)
    shape = [1] * acc.ndim
    shape[out_c_dim] = qw.shape[0]
    return acc.astype(f32) * scale.reshape(shape)


_CALL_JAXPR_KEYS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _inner_jaxpr(eqn) -> Any:
    for k in _CALL_JAXPR_KEYS:
        if k in eqn.params:
            return eqn.params[k]
    return None


def _eval_jaxpr(jaxpr, consts: Sequence[Any], args: Sequence[Any]):
    env = {}

    def read(v):
        return v.val if isinstance(v, core.Literal) else env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        inner = _inner_jaxpr(eqn)
        if eqn.primitive is conv_general_dilated_p:
            outs = [int8_conv(invals[0], invals[1], **eqn.params)]
        elif inner is not None and eqn.primitive.name in (
            "pjit", "closed_call", "core_call", "remat", "checkpoint",
            "custom_jvp_call", "custom_vjp_call",
        ):
            # recurse so convs inside inner jits / remat / custom-grad
            # wrappers are rewritten too (inference path: the custom-grad
            # rule is irrelevant, only the primal matters)
            closed = inner
            if hasattr(closed, "jaxpr"):  # ClosedJaxpr
                outs = _eval_jaxpr(closed.jaxpr, closed.consts, invals)
            else:
                outs = _eval_jaxpr(closed, (), invals)
        else:
            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
            ans = eqn.primitive.bind(*subfuns, *invals, **bind_params)
            outs = ans if eqn.primitive.multiple_results else [ans]
        for v, o in zip(eqn.outvars, outs):
            write(v, o)
    return [read(v) for v in jaxpr.outvars]


def int8_call(fn: Callable, *args):
    """Run ``fn(*args)`` with every dense convolution executed in dynamic
    int8 (see module docstring).  ``fn`` must be side-effect free (an
    inference forward); pytree inputs/outputs are supported."""
    flat, in_tree = jax.tree_util.tree_flatten(args)

    def wrapped(*leaves):
        return fn(*jax.tree_util.tree_unflatten(in_tree, leaves))

    closed, out_shape = jax.make_jaxpr(wrapped, return_shape=True)(*flat)
    out_tree = jax.tree_util.tree_structure(out_shape)
    out_flat = _eval_jaxpr(closed.jaxpr, closed.consts, flat)
    return jax.tree_util.tree_unflatten(out_tree, out_flat)
