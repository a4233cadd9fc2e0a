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


def int8_conv(x: jnp.ndarray, w: jnp.ndarray, act_scale=None,
              **params) -> jnp.ndarray:
    """conv_general_dilated with int8 operands, int32 MXU accumulation,
    and f32 dequantisation.

    ``act_scale``: optional fixed (calibrated) per-tensor activation scale.
    When given, the dynamic abs-max pass over ``x`` is skipped entirely —
    the quantise becomes a pure elementwise op that XLA fuses into the
    producer of ``x``, so the activation is written once as int8 instead
    of read-bf16 + read-again-for-max + write-int8.  When ``None`` the
    scale is computed dynamically on device each call.

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

    # per-tensor activation scale (dynamic or calibrated); per-output-channel
    # weight scale
    if act_scale is None:
        qx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    else:
        qx = jnp.asarray(act_scale, f32)
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


class _QuantCtx:
    """Per-call interpreter state: fixed scales to consume and/or dynamic
    scales to record, with a conv counter shared across recursion (convs
    are visited in deterministic jaxpr order, so calibrate and execute
    passes over the same traced fn index identically)."""

    def __init__(self, act_scales=None, collect=None):
        self.act_scales = act_scales
        self.collect = collect
        self.idx = 0


def _eval_jaxpr(jaxpr, consts: Sequence[Any], args: Sequence[Any],
                ctx: _QuantCtx):
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
            scale = None
            if ctx.act_scales is not None:
                if ctx.idx >= len(ctx.act_scales):
                    raise ValueError(
                        f"act_scales has only {len(ctx.act_scales)} entries "
                        f"but the traced forward contains more convolutions "
                        f"(at conv #{ctx.idx})")
                scale = ctx.act_scales[ctx.idx]
            if ctx.collect is not None:
                ctx.collect.append(
                    jnp.maximum(jnp.max(jnp.abs(invals[0].astype(
                        jnp.float32))), 1e-8) / 127.0)
            ctx.idx += 1
            # cast back to the traced output dtype: when the forward is
            # traced in bf16, downstream (eagerly bound) ops must keep
            # seeing bf16 or the whole tail silently re-runs in f32 —
            # the first e2e measurement lost 30% exactly this way
            out = int8_conv(invals[0], invals[1], act_scale=scale,
                            **eqn.params)
            outs = [out.astype(eqn.outvars[0].aval.dtype)]
        elif inner is not None and eqn.primitive.name in (
            "pjit", "closed_call", "core_call", "remat", "checkpoint",
            "custom_jvp_call", "custom_vjp_call",
        ):
            # recurse so convs inside inner jits / remat / custom-grad
            # wrappers are rewritten too (inference path: the custom-grad
            # rule is irrelevant, only the primal matters)
            closed = inner
            if hasattr(closed, "jaxpr"):  # ClosedJaxpr
                outs = _eval_jaxpr(closed.jaxpr, closed.consts, invals, ctx)
            else:
                outs = _eval_jaxpr(closed, (), invals, ctx)
        else:
            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
            ans = eqn.primitive.bind(*subfuns, *invals, **bind_params)
            outs = ans if eqn.primitive.multiple_results else [ans]
        for v, o in zip(eqn.outvars, outs):
            write(v, o)
    return [read(v) for v in jaxpr.outvars]


def int8_call(fn: Callable, *args, act_scales=None):
    """Run ``fn(*args)`` with every dense convolution executed in int8
    (see module docstring).  ``fn`` must be side-effect free (an
    inference forward); pytree inputs/outputs are supported.

    ``act_scales``: optional sequence of per-conv activation scales (from
    ``int8_calibrate`` over a representative batch), indexed in jaxpr conv
    order.  When given, every dynamic abs-max pass is elided — static-range
    quantisation.  When ``None``, scales are computed dynamically.
    """
    flat, in_tree = jax.tree_util.tree_flatten(args)

    def wrapped(*leaves):
        return fn(*jax.tree_util.tree_unflatten(in_tree, leaves))

    closed, out_shape = jax.make_jaxpr(wrapped, return_shape=True)(*flat)
    out_tree = jax.tree_util.tree_structure(out_shape)
    ctx = _QuantCtx(act_scales=act_scales)
    out_flat = _eval_jaxpr(closed.jaxpr, closed.consts, flat, ctx)
    if act_scales is not None and ctx.idx != len(act_scales):
        raise ValueError(
            f"act_scales has {len(act_scales)} entries but the traced "
            f"forward contains {ctx.idx} convolutions")
    return jax.tree_util.tree_unflatten(out_tree, out_flat)


def int8_calibrate(fn: Callable, *args):
    """Run ``fn(*args)`` in dynamic int8 and return
    ``(outputs, act_scales)`` where ``act_scales`` is the tuple of
    per-conv dynamic activation scales observed on this batch, in jaxpr
    conv order — feed it back as ``int8_call(..., act_scales=...)`` (as
    host floats, so they bake into the step executable as constants) for
    static-range execution with no per-step abs-max passes."""
    flat, in_tree = jax.tree_util.tree_flatten(args)

    def wrapped(*leaves):
        return fn(*jax.tree_util.tree_unflatten(in_tree, leaves))

    closed, out_shape = jax.make_jaxpr(wrapped, return_shape=True)(*flat)
    out_tree = jax.tree_util.tree_structure(out_shape)
    ctx = _QuantCtx(collect=[])
    out_flat = _eval_jaxpr(closed.jaxpr, closed.consts, flat, ctx)
    return (jax.tree_util.tree_unflatten(out_tree, out_flat),
            tuple(ctx.collect))
