"""SPADE stack: generator/discriminator, task step, distiller step, shrink."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.compress.shrink import PruneBounds
from cat_tpu.compress.spade import (
    collect_spade_gammas,
    profile_spade_generator,
    shrink_spade_generator,
)
from cat_tpu.core.spade_config import MultiscaleDiscriminatorConfig, SPADEGeneratorConfig
from cat_tpu.distill.spade_distiller import SPADEDistillHParams, SPADEDistiller
from cat_tpu.models.spade import SPADEGenerator
from cat_tpu.train.spade_model import (
    SPADEHParams,
    SPADETask,
    instance_edges,
    preprocess_input,
)

SIZE = 32
NC = 5  # semantic channels


def tiny_cfg(ngf=4):
    return SPADEGeneratorConfig.make(
        semantic_nc=NC, ngf=ngf, channels=None, channels_reduction_factor=4,
        kernel_sizes=(1, 3), num_upsampling_layers="normal",
        crop_size=SIZE, aspect_ratio=1.0, nhidden=16,
    )


def batch(rng, n=2):
    label = rng.randint(0, NC, size=(n, SIZE, SIZE)).astype(np.float32)
    sem = preprocess_input(jnp.asarray(label), None, NC)
    img = jnp.asarray(rng.randn(n, SIZE, SIZE, 3), jnp.float32)
    return {"semantics": sem, "image": img}


def test_preprocess_input_one_hot():
    label = jnp.asarray([[[0, 2], [1, 2]]], jnp.float32)
    sem = preprocess_input(label, None, 3)
    assert sem.shape == (1, 2, 2, 3)
    np.testing.assert_allclose(sem.sum(axis=-1), 1.0)
    # dontcare: id >= nc goes to the extra channel
    label255 = jnp.asarray([[[255, 1]]], jnp.float32)
    sem = preprocess_input(label255, None, 3, contain_dontcare_label=True)
    assert sem.shape == (1, 1, 2, 4)
    assert sem[0, 0, 0, 3] == 1.0


def test_nearest_resize_fast_paths_match_gather():
    """Integer-factor slice/broadcast fast paths are bit-exact vs the
    general floor-convention gather (the torch F.interpolate(nearest)
    semantics every segmap resize must keep — reference
    models/modules/spade_modules/spade.py F.interpolate calls)."""
    from cat_tpu.models.spade import nearest_resize

    def gather_ref(x, h, w):
        in_h, in_w = x.shape[1], x.shape[2]
        rows = (jnp.arange(h) * in_h // h).astype(jnp.int32)
        cols = (jnp.arange(w) * in_w // w).astype(jnp.int32)
        return x[:, rows][:, :, cols]

    rng = np.random.default_rng(0)
    cases = [
        (64, 128, 32, 64),    # integer downscale -> strided slice
        (64, 128, 4, 8),      # deep pyramid downscale
        (4, 8, 32, 64),       # integer upscale -> broadcast+reshape
        (8, 16, 8, 16),       # identity
        (50, 100, 32, 64),    # non-integer: gather fallback
        (32, 64, 50, 100),    # non-integer upscale fallback
    ]
    for ih, iw, h, w in cases:
        x = jnp.asarray(rng.normal(size=(2, ih, iw, 3)).astype(np.float32))
        got = np.asarray(nearest_resize(x, h, w))
        want = np.asarray(gather_ref(x, h, w))
        assert got.shape == want.shape == (2, h, w, 3)
        np.testing.assert_array_equal(got, want, err_msg=f"{(ih, iw, h, w)}")


def test_instance_edges():
    inst = jnp.asarray([[[1, 1, 2], [1, 1, 2], [3, 3, 3]]], jnp.float32)
    e = instance_edges(inst)
    assert e.shape == (1, 3, 3, 1)
    assert e[0, 0, 1, 0] == 1.0 and e[0, 0, 2, 0] == 1.0  # vertical boundary
    assert e[0, 2, 0, 0] == 1.0  # horizontal boundary
    assert e[0, 0, 0, 0] == 0.0


@pytest.mark.slow
def test_spade_task_step(rng):
    task = SPADETask(
        tiny_cfg(),
        MultiscaleDiscriminatorConfig(input_nc=NC + 3, ndf=4, n_layers=3, num_D=2),
        SPADEHParams(lambda_vgg=0.0),
    )
    state = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    b = batch(rng)
    state, metrics = task.train_step(state, b, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    assert metrics["G_loss/feat"] > 0
    out = task.generate(state, b["semantics"])
    assert out.shape == (2, SIZE, SIZE, 3)
    # TTUR multipliers
    assert task.lr_mults == (0.5, 2.0)


@pytest.mark.slow
def test_spade_distiller_step(rng):
    hp = SPADEDistillHParams(distill_loss_type="ka", lambda_vgg=0.0,
                             mapping_layers=("head_0", "up_1"))
    dist = SPADEDistiller(tiny_cfg(8), tiny_cfg(4),
                          MultiscaleDiscriminatorConfig(input_nc=NC + 3, ndf=4,
                                                        n_layers=3, num_D=2),
                          hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7),
                                jnp.zeros((1, SIZE, SIZE, NC)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    b = batch(rng)
    state, metrics = dist.train_step(state, tv, b, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    assert "Specific_loss/distill0" in metrics
    out = dist.generate_student(state, b["semantics"])
    assert out.shape == (2, SIZE, SIZE, 3)


@pytest.mark.slow
def test_spade_distiller_ema_and_wgangp(rng):
    """SPADE distiller parity with the inception path for the EMA flag
    (real consumption of --moving_average_decay) and the wgangp gradient
    penalty (reference declares both, consumes neither)."""
    hp = SPADEDistillHParams(distill_loss_type="ka", lambda_vgg=0.0,
                             mapping_layers=("head_0", "up_1"),
                             gan_mode="wgangp", ema_decay=0.9)
    dist = SPADEDistiller(tiny_cfg(8), tiny_cfg(4),
                          MultiscaleDiscriminatorConfig(input_nc=NC + 3, ndf=4,
                                                        n_layers=3, num_D=2),
                          hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7),
                                jnp.zeros((1, SIZE, SIZE, NC)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    assert isinstance(state.extra, dict) and "ema_G" in state.extra
    init_g = jax.tree.map(np.asarray, state.g.params["G"])
    b = batch(rng)
    state, metrics = dist.train_step(state, tv, b, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    # ema == d*init + (1-d)*trained after one step
    expected = jax.tree.map(
        lambda i, p: 0.9 * i + 0.1 * np.asarray(p), init_g, state.g.params["G"]
    )
    for e, x in zip(jax.tree.leaves(state.extra["ema_G"]),
                    jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(e), x, rtol=1e-6, atol=1e-7)
    # evaluation consumes the EMA weights
    ema_out = dist.generate_student(state, b["semantics"])
    raw_out = dist._gen_student(state.g.params["G"], state.g.stats,
                                b["semantics"])
    assert not np.allclose(np.asarray(ema_out), np.asarray(raw_out))


@pytest.mark.slow
def test_spade_distiller_mse_adaptors(rng):
    hp = SPADEDistillHParams(distill_loss_type="mse", lambda_vgg=0.0,
                             mapping_layers=("head_0", "up_1"))
    dist = SPADEDistiller(tiny_cfg(8), tiny_cfg(4), None, hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7),
                                jnp.zeros((1, SIZE, SIZE, NC)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    # adaptor A0 maps student head width -> teacher head width
    k = state.g.params["A"]["A0"]["conv"]["kernel"]
    assert k.shape[-2:] == (64, 128)  # 16*4 -> 16*8
    state, metrics = dist.train_step(state, tv, batch(rng), 2e-4)
    assert metrics["G_loss/distill"] >= 0


def _shrunk_half(rng, ngf=8):
    from tests.conftest import fast_init

    cfg = tiny_cfg(ngf)
    gen = SPADEGenerator(cfg)
    variables = fast_init(gen, jnp.zeros((1, SIZE, SIZE, NC)))
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jnp.asarray(rng.uniform(0.05, 2.0, x.shape), jnp.float32)
            if path[-1].key == "scale" else x
        ),
        variables,
    )
    full = profile_spade_generator(cfg, SIZE, SIZE).macs
    res = shrink_spade_generator(cfg, variables, full * 0.5, SIZE, SIZE,
                                 PruneBounds(cin_lb=1))
    return cfg, full, res


def test_spade_shrink(rng):
    cfg, full, res = _shrunk_half(rng)
    assert res.searched_macs <= full * 0.5
    assert res.config.fc_channels % 16 == 0
    # fin/fout follow the trunk
    assert res.config.blocks[0].fin == res.config.fc_channels
    up_blocks = [b for n, b in zip(res.config.block_names, res.config.blocks)
                 if n.startswith("up")]
    assert up_blocks[0].fout == up_blocks[0].fin // 2
    # the pruned architecture builds (traced shapes consistent end to end;
    # pruning bugs surface as ScopeParamShapeError here).  The slow twin
    # below actually executes it.
    from tests.conftest import fast_init

    student = SPADEGenerator(res.config)
    sv = fast_init(student, jnp.zeros((1, SIZE, SIZE, NC)), seed=1)
    y = jax.eval_shape(student.apply, sv, jnp.zeros((2, SIZE, SIZE, NC)))
    assert y.shape == (2, SIZE, SIZE, 3)


@pytest.mark.slow
def test_spade_shrink_executes(rng):
    """Full-fidelity twin: the pruned student really initialises (flax
    threefry stream) and runs forward."""
    _, _, res = _shrunk_half(rng)
    student = SPADEGenerator(res.config)
    sv = student.init(jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, NC)))
    y = student.apply(sv, jnp.zeros((2, SIZE, SIZE, NC)))
    assert y.shape == (2, SIZE, SIZE, 3)
    assert bool(jnp.isfinite(y).all())


@pytest.mark.slow
def test_spade_distill_cli_prune_only(tmp_path):
    """SPADE distill verb: shrink preamble + student-config emission
    (prune_only path, synthetic teacher)."""
    import os

    from cat_tpu.entry import distill_main
    from cat_tpu.utils import checkpoint as ckpt

    cfg = tiny_cfg(8)
    gen = SPADEGenerator(cfg)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, NC)))
    rng = np.random.RandomState(0)
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jnp.asarray(rng.uniform(0.05, 2.0, x.shape), jnp.float32)
            if path[-1].key == "scale" else x
        ),
        variables,
    )
    tdir = str(tmp_path / "teacher")
    ckpt.save_net(tdir, "best", "G", variables, cfg)
    full = profile_spade_generator(cfg, SIZE, SIZE).macs
    log_dir = str(tmp_path / "logs")
    distill_main([
        "--dataroot", str(tmp_path),
        "--distiller", "spade",
        "--dataset_mode", "cityscapes",
        "--restore_teacher_G_path", os.path.join(tdir, "best_net_G.msgpack"),
        "--target_flops", str(full * 0.5),
        "--prune_cin_lb", "1",
        "--input_nc", "4",  # + instance edge = 5 semantic channels
        "--num_upsampling_layers", "normal",
        "--crop_size", str(SIZE), "--load_size", str(SIZE),
        "--aspect_ratio", "1.0",
        "--log_dir", log_dir,
        "--prune_only",
        "--inception_path", "/nonexistent.pth",
    ])
    assert os.path.exists(os.path.join(log_dir, "student_config.json"))
    log = open(os.path.join(log_dir, "log.txt")).read()
    assert "scale threshold" in log


def test_spade_gamma_collection():
    from tests.conftest import fast_init

    cfg = tiny_cfg(4)
    gen = SPADEGenerator(cfg)
    variables = fast_init(gen, jnp.zeros((1, SIZE, SIZE, NC)))
    g = collect_spade_gammas(variables["params"], cfg)
    assert g.fc.shape == (cfg.fc_channels,)
    assert len(g.blocks) == len(cfg.blocks)
    # every active branch contributes one gamma vector
    b0, c0 = g.blocks[0], cfg.blocks[0]
    assert len(b0.res) == len(c0.active_res)
    assert len(b0.sp_res) == len(c0.spade.active_res)


@pytest.mark.slow
def test_spade_distiller_step_bf16(rng):
    """bf16 compute path: finite metrics, close to the f32 step's losses,
    and f32 master params/moments preserved."""
    mk = lambda dt: SPADEDistiller(
        tiny_cfg(8), tiny_cfg(4),
        MultiscaleDiscriminatorConfig(input_nc=NC + 3, ndf=4, n_layers=3, num_D=2),
        SPADEDistillHParams(distill_loss_type="ka", lambda_vgg=0.0,
                            mapping_layers=("head_0", "up_1"),
                            compute_dtype=dt),
    )
    tv_init = mk("float32").netG_teacher.init(
        jax.random.PRNGKey(7), jnp.zeros((1, SIZE, SIZE, NC))
    )
    b = batch(rng)
    metrics = {}
    for dt in ("float32", "bfloat16"):
        dist = mk(dt)
        state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv_init)
        state, m = dist.train_step(state, tv, b, 2e-4)
        assert all(np.isfinite(v) for v in jax.tree.leaves(m))
        assert all(
            p.dtype == jnp.float32
            for p in jax.tree.leaves(state.g.params)
        ), "master weights must stay f32"
        metrics[dt] = m
    for k in metrics["float32"]:
        a, c = float(metrics["float32"][k]), float(metrics["bfloat16"][k])
        assert abs(a - c) < 0.15 * (1.0 + abs(a)), (k, a, c)


@pytest.mark.slow
def test_spade_task_step_bf16(rng):
    """compute_dtype='bfloat16' in SPADEHParams (regression: setup_train_spade
    passes it; it must exist and keep f32 master weights)."""
    task = SPADETask(
        tiny_cfg(),
        MultiscaleDiscriminatorConfig(input_nc=NC + 3, ndf=4, n_layers=3, num_D=2),
        SPADEHParams(lambda_vgg=0.0, compute_dtype="bfloat16"),
    )
    state = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    state, metrics = task.train_step(state, batch(rng), 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.g.params))


@pytest.mark.slow
def test_spade_distiller_step_with_vgg(rng):
    """λ_vgg > 0 (the GauGAN default) computes a real perceptual gradient:
    the whole G loss — including the VGG term — must update the student and
    stay finite.  Uses a tiny random-weights VGG19 in the real layout
    (tools/make_fixtures.make_fake_vgg19 via convert_torch_vgg19)."""
    import sys

    sys.path.insert(0, "tools")
    import tempfile

    from make_fixtures import make_fake_vgg19

    from cat_tpu.models.vgg import load_vgg19

    with tempfile.TemporaryDirectory() as td:
        _, vgg_vars = load_vgg19(make_fake_vgg19(td + "/vgg.pth"))
    hp = SPADEDistillHParams(distill_loss_type="ka", lambda_vgg=10.0,
                             mapping_layers=("head_0", "up_1"))
    dist = SPADEDistiller(tiny_cfg(8), tiny_cfg(4), None, hp,
                          vgg_variables=vgg_vars)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7),
                                jnp.zeros((1, SIZE, SIZE, NC)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    b = batch(rng)
    state1, metrics = dist.train_step(state, tv, b, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    assert float(metrics["G_loss/vgg"]) > 0.0

    # and the term is load-bearing: λ_vgg=0 yields a different G update
    hp0 = SPADEDistillHParams(distill_loss_type="ka", lambda_vgg=0.0,
                              mapping_layers=("head_0", "up_1"))
    dist0 = SPADEDistiller(tiny_cfg(8), tiny_cfg(4), None, hp0)
    state0, tv0 = dist0.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    state0b, m0 = dist0.train_step(state0, tv0, b, 2e-4)
    assert float(m0["G_loss/vgg"]) == 0.0
    a = jax.tree.leaves(state1.g.params["G"])[0]
    c = jax.tree.leaves(state0b.g.params["G"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_spade_distiller_remat_parity(rng):
    """--remat must be numerics-preserving for the SPADE distill step."""
    b = batch(rng)
    states = []
    for remat in (False, True):
        hp = SPADEDistillHParams(distill_loss_type="ka", lambda_vgg=0.0,
                                 mapping_layers=("head_0", "up_1"),
                                 remat=remat)
        dist = SPADEDistiller(tiny_cfg(8), tiny_cfg(4), None, hp)
        tv = dist.netG_teacher.init(jax.random.PRNGKey(7),
                                    jnp.zeros((1, SIZE, SIZE, NC)))
        state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
        state, _ = dist.train_step(state, tv, b, 2e-4)
        states.append(state)
    for a, c in zip(jax.tree.leaves(states[0].g.params),
                    jax.tree.leaves(states[1].g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-5)
