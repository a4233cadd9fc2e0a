"""Packed SPADE blocks: parity with the unpacked path.

The packed path must be a pure execution-strategy change: identical
parameter/variable trees, identical outputs, identical gradients,
identical running-stat and spectral-u updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.core.spade_config import (
    SPADEBlockConfig,
    SPADEGeneratorConfig,
    SPADELayerConfig,
)
from cat_tpu.models.spade import SPADEBlock, SPADEGenerator
from cat_tpu.train.spade_model import preprocess_input

NC = 5


def block_cfg(spectral=False, fin=6, fout=6):
    spade = SPADELayerConfig(
        norm_nc=fin, label_nc=NC + 1,
        res_channels=(3, 4), dw_channels=(2, 3),
        res_kernels=(1, 3), dw_kernels=(3, 5),
    )
    return SPADEBlockConfig(
        fin=fin, fout=fout,
        res_channels=(4, 3), dw_channels=(3, 2),
        res_kernels=(1, 3), dw_kernels=(3, 5),
        spade=spade, spectral=spectral,
    )


def trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (pa, xa), (_, xb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb), err_msg=str(pa))


@pytest.mark.parametrize("spectral", [False, True])
def test_block_packed_parity(rng, spectral):
    cfg = block_cfg(spectral)
    x = jnp.asarray(rng.randn(2, 8, 8, cfg.fin), jnp.float32)
    seg = jnp.asarray(rng.rand(2, 8, 8, NC + 1) > 0.7, jnp.float32)

    ref_m = SPADEBlock(cfg, packed=False)
    pk_m = SPADEBlock(cfg, packed=True)
    v_ref = ref_m.init(jax.random.PRNGKey(3), x, seg, train=False)
    v_pk = pk_m.init(jax.random.PRNGKey(3), x, seg, train=False)
    trees_equal(v_ref, v_pk)  # identical init: params, stats, spectral u

    # eval forward (running stats)
    y_ref = ref_m.apply(v_ref, x, seg, train=False)
    y_pk = pk_m.apply(v_ref, x, seg, train=False)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    # train forward: outputs + mutated batch_stats (+ spectral u) match
    muts = ["batch_stats"] + (["spectral"] if spectral else [])
    y_ref, m_ref = ref_m.apply(v_ref, x, seg, train=True, mutable=muts)
    y_pk, m_pk = pk_m.apply(v_ref, x, seg, train=True, mutable=muts)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    for pa, xa in jax.tree_util.tree_leaves_with_path(m_ref):
        xb = m_pk
        for k in pa:
            xb = xb[k.key]
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=2e-5, atol=2e-5, err_msg=str(pa))

    # gradients match
    def loss(params, mod, vars_):
        out = mod.apply({**vars_, "params": params}, x, seg, train=True,
                        mutable=muts)[0]
        return jnp.sum(jnp.square(out))

    g_ref = jax.grad(loss)(v_ref["params"], ref_m, v_ref)
    g_pk = jax.grad(loss)(v_ref["params"], pk_m, v_ref)
    for (pa, xa), (_, xb) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pk),
    ):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=2e-3, atol=2e-3, err_msg=str(pa))


def test_block_packed_shortcut(rng):
    cfg = block_cfg(fin=6, fout=4)
    x = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
    seg = jnp.asarray(rng.rand(2, 8, 8, NC + 1) > 0.7, jnp.float32)
    ref_m, pk_m = SPADEBlock(cfg, packed=False), SPADEBlock(cfg, packed=True)
    v = ref_m.init(jax.random.PRNGKey(0), x, seg, train=False)
    trees_equal(v, pk_m.init(jax.random.PRNGKey(0), x, seg, train=False))
    np.testing.assert_allclose(
        np.asarray(pk_m.apply(v, x, seg, train=False)),
        np.asarray(ref_m.apply(v, x, seg, train=False)),
        rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_generator_packed_parity(rng):
    # slow lane: block-level parity above carries the math guarantee;
    # this is the whole-generator integration twin
    cfg = SPADEGeneratorConfig.make(
        semantic_nc=NC, ngf=4, channels=None, channels_reduction_factor=4,
        kernel_sizes=(1, 3), num_upsampling_layers="normal",
        crop_size=32, aspect_ratio=1.0, nhidden=16,
    )
    label = rng.randint(0, NC, size=(2, 32, 32)).astype(np.float32)
    seg = preprocess_input(jnp.asarray(label), None, NC)
    ref_m = SPADEGenerator(cfg)
    pk_m = SPADEGenerator(cfg, packed_blocks=True)
    v = ref_m.init(jax.random.PRNGKey(1), seg, train=False)
    trees_equal(v, pk_m.init(jax.random.PRNGKey(1), seg, train=False))
    y_ref, m_ref = ref_m.apply(v, seg, train=True, mutable=["batch_stats"])
    y_pk, m_pk = pk_m.apply(v, seg, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               rtol=5e-5, atol=5e-5)
    for (pa, xa), (_, xb) in zip(
        jax.tree_util.tree_leaves_with_path(m_ref),
        jax.tree_util.tree_leaves_with_path(m_pk),
    ):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=5e-5, atol=5e-5, err_msg=str(pa))
