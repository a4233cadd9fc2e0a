"""Smoke + semantics tests for the jitted GAN train steps."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.core.config import InceptionGeneratorConfig, NLayerDiscriminatorConfig, NormConfig
from cat_tpu.distill.inception_distiller import DistillHParams, InceptionDistiller
from cat_tpu.train.cyclegan import CycleGANHParams, CycleGANTask
from cat_tpu.train.pix2pix import Pix2PixHParams, Pix2PixTask
from cat_tpu.utils.image_pool import pool_init, pool_query

SIZE = 32


def tiny_gen(ngf=4):
    return InceptionGeneratorConfig.make(
        ngf=ngf,
        channels=None,
        channels_reduction_factor=2,
        kernel_sizes=(1, 3),
        n_blocks=3,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )


def fake_batch(rng, n=2):
    return {
        "A": jnp.asarray(rng.randn(n, SIZE, SIZE, 3), jnp.float32),
        "B": jnp.asarray(rng.randn(n, SIZE, SIZE, 3), jnp.float32),
    }


def leaves_changed(a, b):
    return any(
        not np.allclose(x, y)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_pix2pix_step(rng):
    task = Pix2PixTask(tiny_gen(), NLayerDiscriminatorConfig(input_nc=6, ndf=4))
    state = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    g0 = jax.tree.map(np.asarray, state.g.params)
    batch = fake_batch(rng)
    state, metrics = task.train_step(state, batch, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    assert set(metrics) == {"G_loss/gan", "G_loss/recon", "D_loss/fake", "D_loss/real"}
    assert leaves_changed(g0, state.g.params)
    assert int(state.step) == 1
    out = task.generate(state, batch["A"])
    assert out.shape == batch["A"].shape


def test_cyclegan_step(rng):
    task = CycleGANTask(
        tiny_gen(), NLayerDiscriminatorConfig(input_nc=3, ndf=4), CycleGANHParams()
    )
    state = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    batch = fake_batch(rng)
    state, metrics = task.train_step(state, batch, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    for key in ("G_loss/cycle_A", "G_loss/idt_A", "D_loss/A", "D_loss/B"):
        assert key in metrics
    # pools absorbed the first fakes
    assert int(state.extra.fake_A.count) == 2
    state, _ = task.train_step(state, fake_batch(rng), 2e-4)
    assert int(state.extra.fake_A.count) == 4
    out = task.generate(state, batch["A"], "AtoB")
    assert out.shape == batch["A"].shape


def _distill(loss_type, rng, mode="aligned"):
    teacher_cfg = tiny_gen(ngf=8)
    student_cfg = tiny_gen(ngf=4)
    hp = DistillHParams(
        dataset_mode=mode,
        gan_mode="lsgan",
        distill_loss_type=loss_type,
        lambda_recon=5.0,
        lambda_distill=1.0,
        mapping_layers=("encode", "block1"),
    )
    dist = InceptionDistiller(teacher_cfg, student_cfg, hp=hp)
    teacher_vars = dist.netG_teacher.init(
        jax.random.PRNGKey(7), jnp.zeros((1, SIZE, SIZE, 3))
    )
    state, teacher_vars = dist.init_state(
        jax.random.PRNGKey(0), SIZE, SIZE, teacher_vars
    )
    batch = fake_batch(rng)
    state, metrics = dist.train_step(state, teacher_vars, batch, 2e-4)
    return dist, state, teacher_vars, metrics, batch


def test_distiller_ka_step(rng):
    dist, state, tv, metrics, batch = _distill("ka", rng)
    assert np.isfinite(metrics["G_loss/distill"])
    # KA of random independent activations is small but positive => -KA < 0
    assert metrics["Specific_loss/distill0"] < 0.5
    out = dist.generate_student(state, batch["A"])
    assert out.shape == batch["A"].shape


def test_distiller_mse_step(rng):
    dist, state, tv, metrics, _ = _distill("mse", rng)
    assert metrics["G_loss/distill"] > 0  # MSE is nonnegative
    # adaptor params received gradients
    a0 = state.g.params["A"]["A0"]["conv"]["kernel"]
    assert np.isfinite(np.asarray(a0)).all()


def test_distiller_unaligned_step(rng):
    _, state, _, metrics, _ = _distill("ka", rng, mode="unaligned")
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))


def test_distiller_bf16_compute(rng):
    from cat_tpu.distill.inception_distiller import DistillHParams, InceptionDistiller

    hp = DistillHParams(
        dataset_mode="aligned", gan_mode="lsgan", distill_loss_type="ka",
        lambda_recon=5.0, mapping_layers=("encode", "block1"),
        compute_dtype="bfloat16",
    )
    dist = InceptionDistiller(tiny_gen(8), tiny_gen(4), hp=hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7), jnp.zeros((1, SIZE, SIZE, 3)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    state, metrics = dist.train_step(state, tv, fake_batch(rng), 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    # master weights stay f32 (mixed precision, not a dtype change)
    leaves = jax.tree.leaves(state.g.params)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_image_pool_semantics():
    pool = pool_init(4, 2, 2, 1)
    imgs = jnp.arange(8, dtype=jnp.float32).reshape(8, 1, 1, 1) * jnp.ones((8, 2, 2, 1))
    # first 4 pass through and fill the pool
    pool, out = pool_query(pool, imgs[:4], jax.random.PRNGKey(0))
    np.testing.assert_allclose(out, imgs[:4])
    assert int(pool.count) == 4
    # afterwards outputs are either the incoming image or a buffered one
    pool2, out2 = pool_query(pool, imgs[4:], jax.random.PRNGKey(1))
    assert int(pool2.count) == 4
    buffered = set(float(v) for v in np.asarray(pool.buffer)[:, 0, 0, 0])
    for i, v in enumerate(np.asarray(out2)[:, 0, 0, 0]):
        assert float(v) == float(imgs[4 + i, 0, 0, 0]) or float(v) in buffered
        buffered = set(float(x) for x in np.asarray(pool2.buffer)[:, 0, 0, 0]) | buffered


def test_wgangp_step_pix2pix(rng):
    """--gan_mode wgangp trains WITH the Lipschitz gradient penalty in the
    D update (the reference implements cal_gradient_penalty but never calls
    it — an unconstrained wgangp critic diverges).  Core lane: one family;
    the slow twin below covers cyclegan + the bf16 distiller."""
    batch = fake_batch(rng)
    task = Pix2PixTask(tiny_gen(), NLayerDiscriminatorConfig(input_nc=6, ndf=4),
                       Pix2PixHParams(gan_mode="wgangp"))
    state = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    state, metrics = task.train_step(state, batch, 2e-4)
    assert np.isfinite(metrics["D_loss/gp"]) and metrics["D_loss/gp"] > 0


@pytest.mark.slow
def test_wgangp_steps(rng):
    """Slow twin: the gp term in the remaining families (cyclegan's two
    critics; the distiller under bf16 compute, where the penalty norm must
    stay f32)."""
    batch = fake_batch(rng)

    cyc = CycleGANTask(tiny_gen(), NLayerDiscriminatorConfig(input_nc=3, ndf=4),
                       CycleGANHParams(gan_mode="wgangp"))
    cstate = cyc.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    cstate, cmetrics = cyc.train_step(cstate, batch, 2e-4)
    for k in ("D_loss/gp_A", "D_loss/gp_B"):
        assert np.isfinite(cmetrics[k]) and cmetrics[k] > 0

    hp = DistillHParams(
        dataset_mode="aligned", gan_mode="wgangp", distill_loss_type="ka",
        lambda_recon=5.0, mapping_layers=("encode", "block1"),
        compute_dtype="bfloat16",  # exercises the f32 norm path in the gp
    )
    dist = InceptionDistiller(tiny_gen(8), tiny_gen(4), hp=hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7), jnp.zeros((1, SIZE, SIZE, 3)))
    dstate, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    d0 = jax.tree.map(np.asarray, dstate.d.params)
    dstate, dmetrics = dist.train_step(dstate, tv, batch, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(dmetrics))
    assert leaves_changed(d0, dstate.d.params)


def test_distiller_ema(rng):
    """--moving_average_decay keeps an EMA of the student-G weights (the
    reference declares the flag but never consumes it; here it is real):
    after one step ema == d*init + (1-d)*trained, and evaluation uses the
    EMA weights while the optimizer keeps training the raw ones."""
    hp = DistillHParams(
        dataset_mode="aligned", gan_mode="lsgan", distill_loss_type="ka",
        lambda_recon=5.0, mapping_layers=("encode", "block1"),
        ema_decay=0.9,
    )
    dist = InceptionDistiller(tiny_gen(8), tiny_gen(4), hp=hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7), jnp.zeros((1, SIZE, SIZE, 3)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv)
    init_g = jax.tree.map(np.asarray, state.g.params["G"])
    assert isinstance(state.extra, dict) and "ema_G" in state.extra
    # at init the EMA equals the raw weights
    for e, p in zip(jax.tree.leaves(state.extra["ema_G"]), jax.tree.leaves(init_g)):
        np.testing.assert_allclose(np.asarray(e), p)

    batch = fake_batch(rng)
    state, _ = dist.train_step(state, tv, batch, 2e-4)
    expected = jax.tree.map(
        lambda i, p: 0.9 * i + 0.1 * np.asarray(p), init_g, state.g.params["G"]
    )
    for e, x in zip(jax.tree.leaves(state.extra["ema_G"]), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(e), x, rtol=1e-6, atol=1e-7)

    # evaluation path consumes the EMA weights, not the raw trained ones
    ema_out = dist.generate_student(state, batch["A"])
    raw_out = dist._gen_student(state.g.params["G"], state.g.stats, batch["A"])
    assert not np.allclose(np.asarray(ema_out), np.asarray(raw_out))

    # decay 0 (the default) keeps extra empty and evaluates raw weights
    hp0 = DistillHParams(
        dataset_mode="aligned", gan_mode="lsgan", distill_loss_type="ka",
        lambda_recon=5.0, mapping_layers=("encode", "block1"),
    )
    dist0 = InceptionDistiller(tiny_gen(8), tiny_gen(4), hp=hp0)
    tv0 = dist0.netG_teacher.init(jax.random.PRNGKey(7), jnp.zeros((1, SIZE, SIZE, 3)))
    state0, _ = dist0.init_state(jax.random.PRNGKey(0), SIZE, SIZE, tv0)
    assert state0.extra is None
    assert dist0.student_eval_params(state0) is state0.g.params["G"]


@pytest.mark.slow
def test_cyclegan_remat_step_matches(rng):
    """hp.remat=True must be numerically identical (jax.checkpoint only
    changes what is stored vs recomputed)."""
    mk = lambda remat: CycleGANTask(
        tiny_gen(), NLayerDiscriminatorConfig(input_nc=3, ndf=4),
        CycleGANHParams(remat=remat),
    )
    t0, t1 = mk(False), mk(True)
    s0 = t0.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    s1 = t1.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    batch = fake_batch(rng)
    s0, m0 = t0.train_step(s0, batch, 2e-4)
    s1, m1 = t1.train_step(s1, batch, 2e-4)
    for k in m0:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m0[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for x, y in zip(jax.tree.leaves(s0.g.params), jax.tree.leaves(s1.g.params)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)
