"""Weight transfer: magnitude top-k channel selection threaded through the net."""

import jax
import jax.numpy as jnp
import numpy as np

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
