"""Weight transfer: magnitude top-k channel selection threaded through the net."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.compress.transfer import _topk_desc, transfer_generator_params
from cat_tpu.models.generator import InceptionGenerator


def make_cfg(ngf):
    return InceptionGeneratorConfig.make(
        ngf=ngf,
        channels=None,
        channels_reduction_factor=2,
        kernel_sizes=(1, 3),
        n_blocks=3,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )


def test_topk_order_matches_torch_topk():
    q = np.array([0.1, 5.0, 3.0, 4.0])
    assert list(_topk_desc(q, 3)) == [1, 3, 2]  # descending-value order


def test_transfer_shapes_and_identity():
    src_cfg, dst_cfg = make_cfg(8), make_cfg(4)
    src = InceptionGenerator(src_cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    dst_params = transfer_generator_params(src, src_cfg, dst_cfg)

    model = InceptionGenerator(dst_cfg)
    ref = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, dst_params)
    assert ref_shapes == got_shapes

    # self-transfer with equal widths must reproduce a channel permutation of
    # the stem output selected purely by magnitude
    same = transfer_generator_params(src, src_cfg, src_cfg)
    q = np.abs(np.asarray(src["stem"]["conv"]["kernel"])).sum(axis=(0, 1, 2))
    order = np.argsort(-q, kind="stable")
    np.testing.assert_allclose(
        np.asarray(same["stem"]["conv"]["kernel"]),
        np.asarray(src["stem"]["conv"]["kernel"])[:, :, :, order],
    )

    # forward runs with transferred params
    y = model.apply({"params": dst_params}, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_transfer_head_keeps_output_channels():
    src_cfg, dst_cfg = make_cfg(8), make_cfg(4)
    src = InceptionGenerator(src_cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    dst = transfer_generator_params(src, src_cfg, dst_cfg)
    # output channels untouched, bias copied verbatim
    np.testing.assert_allclose(
        np.asarray(dst["head"]["bias"]), np.asarray(src["head"]["bias"])
    )
    assert np.asarray(dst["head"]["kernel"]).shape == (7, 7, 4, 3)


def test_transfer_into_pruned_config(rng):
    """Reference parity: --restore_pretrained_G_path fires TOGETHER with
    --target_flops (train_inception_student_2p6B.sh passes both;
    inception_distiller.py:194-200 always transfers) — the magnitude
    transfer must accept a shrink-pruned (irregular-width) student."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cat_tpu.compress.profiling import profile_generator
    from cat_tpu.compress.shrink import PruneBounds, shrink_generator
    from cat_tpu.models.generator import InceptionGenerator

    cfg = make_cfg(ngf=8)
    gen = InceptionGenerator(cfg)
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rs = np.random.RandomState(0)
    v = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jnp.asarray(rs.uniform(0.05, 2.0, x.shape), jnp.float32)
            if path[-1].key == "scale" else x
        ), v)
    full = profile_generator(cfg, 32, 32).macs
    res = shrink_generator(cfg, v, full * 0.5, 32, 32, PruneBounds(cin_lb=2))
    sp = transfer_generator_params(v["params"], cfg, res.config)
    sv = InceptionGenerator(res.config).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    for a, b in zip(jax.tree.leaves(sp), jax.tree.leaves(sv["params"])):
        assert np.asarray(a).shape == np.asarray(b).shape


# ---------------------------------------------------------------------------
# SPADE (inception_spade) transfer — reference weight_transfer.py:97-288
# ---------------------------------------------------------------------------

from cat_tpu.compress.transfer import transfer_spade_generator_params  # noqa: E402
from cat_tpu.core.spade_config import SPADEGeneratorConfig  # noqa: E402
from cat_tpu.models.spade import SPADEGenerator  # noqa: E402

S_NC = 5
S_SIZE = 32


def spade_cfg(ngf):
    return SPADEGeneratorConfig.make(
        semantic_nc=S_NC, ngf=ngf, channels=None, channels_reduction_factor=4,
        kernel_sizes=(1, 3), num_upsampling_layers="normal",
        crop_size=S_SIZE, aspect_ratio=1.0, nhidden=16,
    )


def _spade_init(cfg, seed=0):
    # zero-XLA init (tests/conftest.fast_init): transfer only needs valid
    # magnitudes, not the threefry stream — the SPADE generator's flax init
    # is the compile-bound part of this file (~40s per distinct config on
    # the 1-core host)
    from tests.conftest import fast_init

    return fast_init(SPADEGenerator(cfg),
                     jnp.zeros((1, S_SIZE, S_SIZE, S_NC)), seed=seed)


def test_spade_transfer_shapes_and_forward():
    src_cfg, dst_cfg = spade_cfg(4), spade_cfg(2)
    src = _spade_init(src_cfg)["params"]
    dst_params = transfer_spade_generator_params(src, src_cfg, dst_cfg)

    ref_vars = _spade_init(dst_cfg, seed=1)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, dst_params)
    assert ref_shapes == got_shapes

    # forward traces with transferred params (fresh batch_stats); the slow
    # twin below executes it for real
    variables = {**ref_vars, "params": dst_params}
    y = jax.eval_shape(SPADEGenerator(dst_cfg).apply, variables,
                       jnp.zeros((2, S_SIZE, S_SIZE, S_NC)))
    assert y.shape == (2, S_SIZE, S_SIZE, 3)


@pytest.mark.slow
def test_spade_transfer_forward_executes():
    """Full-fidelity twin: transferred SPADE params really run forward."""
    src_cfg, dst_cfg = spade_cfg(4), spade_cfg(2)
    src = SPADEGenerator(src_cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, S_SIZE, S_SIZE, S_NC))
    )["params"]
    dst_params = transfer_spade_generator_params(src, src_cfg, dst_cfg)
    ref_vars = SPADEGenerator(dst_cfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, S_SIZE, S_SIZE, S_NC))
    )
    y = SPADEGenerator(dst_cfg).apply(
        {**ref_vars, "params": dst_params},
        jnp.zeros((2, S_SIZE, S_SIZE, S_NC))
    )
    assert y.shape == (2, S_SIZE, S_SIZE, 3)
    assert bool(jnp.isfinite(y).all())


def test_spade_transfer_value_semantics():
    """Self-transfer with equal widths = pure magnitude permutation of the
    fc trunk, threaded through fc_norm and the γ/β-producing convs."""
    cfg = spade_cfg(2)
    src = _spade_init(cfg)["params"]
    same = transfer_spade_generator_params(src, cfg, cfg)

    q = np.abs(np.asarray(src["fc"]["kernel"])).sum(axis=(0, 1, 2))
    order = np.argsort(-q, kind="stable")
    np.testing.assert_allclose(
        np.asarray(same["fc"]["kernel"]),
        np.asarray(src["fc"]["kernel"])[:, :, :, order],
    )
    np.testing.assert_allclose(
        np.asarray(same["fc_norm"]["scale"]),
        np.asarray(src["fc_norm"]["scale"])[order],
    )
    # head_0 has fin == fout and no learned shortcut: the γ and β halves of
    # the SPADE mlp's final conv rows follow the SAME trunk permutation
    # (the coherent version of the reference's
    # `transfer(layer1, layer2, idxs, input_index)` at
    # weight_transfer.py:193-213 — see compress/transfer.py docstring)
    nc = cfg.blocks[0].spade.norm_nc
    src_out = np.asarray(src["head_0"]["spade"]["res0_out"]["kernel"])
    got_out = np.asarray(same["head_0"]["spade"]["res0_out"]["kernel"])
    mid_q = np.abs(
        np.asarray(src["head_0"]["spade"]["res0_in"]["conv"]["kernel"])
    ).sum(axis=(0, 1, 2))
    mid_order = np.argsort(-mid_q, kind="stable")
    expect = src_out[:, :, mid_order, :][:, :, :, np.concatenate([order, order + nc])]
    np.testing.assert_allclose(got_out, expect)
    # conv_img inputs follow the final trunk index; outputs (RGB) untouched
    np.testing.assert_allclose(
        np.asarray(same["conv_img"]["bias"]), np.asarray(src["conv_img"]["bias"])
    )


def test_transfer_matches_branches_by_index_not_position():
    """Regression: with teacher kernels (1, 3) and the student's branch 0
    pruned away, positional zipping of the ACTIVE lists would write the 1x1
    teacher kernel into the student's 3x3 slot (seen live as a
    ScopeParamShapeError at up_3/dw2_mid with the 1/3/5 recipe).  Branches
    must pair by original index."""
    import dataclasses

    src_cfg = make_cfg(8)
    blocks = tuple(
        dataclasses.replace(
            b,
            res_channels=(0,) + b.res_channels[1:],
            dw_channels=(0,) + b.dw_channels[1:],
        )
        for b in src_cfg.blocks
    )
    dst_cfg = dataclasses.replace(src_cfg, blocks=blocks)
    src = InceptionGenerator(src_cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    sp = transfer_generator_params(src, src_cfg, dst_cfg)
    sv = InceptionGenerator(dst_cfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3))
    )["params"]
    assert jax.tree.map(lambda x: np.asarray(x).shape, sp) == jax.tree.map(
        lambda x: x.shape, sv
    )
    # the surviving branch keeps its own (3x3) teacher kernel, channel-sliced
    k_src = np.asarray(src["block0"]["res1_in"]["conv"]["kernel"])
    k_dst = np.asarray(sp["block0"]["res1_in"]["conv"]["kernel"])
    assert k_src.shape[:2] == k_dst.shape[:2] == (3, 3)


def test_spade_transfer_matches_branches_by_index():
    """Same regression for the SPADE chain (block branches AND the nested
    γ/β net), with the reference 5p6B recipe's 3-kernel layout (1, 3, 5)."""
    import dataclasses

    src_cfg = SPADEGeneratorConfig.make(
        semantic_nc=S_NC, ngf=2, channels=None, channels_reduction_factor=4,
        kernel_sizes=(1, 3, 5), num_upsampling_layers="normal",
        crop_size=S_SIZE, aspect_ratio=1.0, nhidden=16,
    )

    def prune_first(t):
        return (0,) + t[1:]

    blocks = tuple(
        dataclasses.replace(
            b,
            res_channels=prune_first(b.res_channels),
            dw_channels=prune_first(b.dw_channels),
            spade=dataclasses.replace(
                b.spade,
                res_channels=prune_first(b.spade.res_channels),
                dw_channels=prune_first(b.spade.dw_channels),
            ),
        )
        for b in src_cfg.blocks
    )
    dst_cfg = dataclasses.replace(src_cfg, blocks=blocks)
    src = _spade_init(src_cfg)["params"]
    sp = transfer_spade_generator_params(src, src_cfg, dst_cfg)
    sv = _spade_init(dst_cfg, seed=1)
    assert jax.tree.map(lambda x: np.asarray(x).shape, sp) == jax.tree.map(
        lambda x: x.shape, sv["params"]
    )
    # dw branch 2 keeps its 5x5 depthwise kernel (this was the live crash:
    # a 3x3 kernel transferred into the 5x5 dw2_mid slot)
    b0 = src_cfg.block_names[0]
    assert np.asarray(sp[b0]["dw2_mid"]["conv"]["kernel"]).shape[:2] == (5, 5)
    y = jax.eval_shape(SPADEGenerator(dst_cfg).apply,
                       {**sv, "params": sp},
                       jnp.zeros((1, S_SIZE, S_SIZE, S_NC)))
    assert y.shape == (1, S_SIZE, S_SIZE, 3)


def test_spade_transfer_into_pruned_student():
    from cat_tpu.compress.shrink import PruneBounds
    from cat_tpu.compress.spade import profile_spade_generator, shrink_spade_generator

    cfg = spade_cfg(8)
    v = _spade_init(cfg)
    rs = np.random.RandomState(0)
    v = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jnp.asarray(rs.uniform(0.05, 2.0, x.shape), jnp.float32)
            if path[-1].key == "scale" else x
        ), v)
    full = profile_spade_generator(cfg, S_SIZE, S_SIZE).macs
    res = shrink_spade_generator(cfg, v, full * 0.5, S_SIZE, S_SIZE,
                                 PruneBounds(cin_lb=1))
    sp = transfer_spade_generator_params(v["params"], cfg, res.config)
    sv = _spade_init(res.config, seed=1)
    ref_shapes = jax.tree.map(lambda x: x.shape, sv["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, sp)
    assert ref_shapes == got_shapes
    y = jax.eval_shape(SPADEGenerator(res.config).apply,
                       {**sv, "params": sp},
                       jnp.zeros((1, S_SIZE, S_SIZE, S_NC)))
    assert y.shape == (1, S_SIZE, S_SIZE, 3)
