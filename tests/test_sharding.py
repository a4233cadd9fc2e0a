"""Multi-device data-parallel semantics on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.core.config import InceptionGeneratorConfig, NLayerDiscriminatorConfig, NormConfig
from cat_tpu.distill.inception_distiller import DistillHParams, InceptionDistiller
from cat_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cat_tpu.train.pix2pix import Pix2PixTask

SIZE = 32


def tiny_gen(ngf=4, norm=None):
    return InceptionGeneratorConfig.make(
        ngf=ngf,
        channels=None,
        channels_reduction_factor=2,
        kernel_sizes=(1, 3),
        n_blocks=3,
        norm=norm or NormConfig(kind="instance", affine=True, track_running_stats=False),
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_pix2pix_sharded_step_matches_single_device(rng):
    """The GSPMD step over a sharded batch reproduces single-device math.

    Slow lane: compiles the full step twice; the driver gate
    (__graft_entry__.dryrun_multichip) executes the same dp sharding every
    round, and the core lane keeps the sync-BN variant below (the one with
    cross-device numerics GSPMD alone doesn't guarantee)."""
    task = Pix2PixTask(tiny_gen(), NLayerDiscriminatorConfig(input_nc=6, ndf=4))
    state = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    batch = {
        "A": jnp.asarray(rng.randn(8, SIZE, SIZE, 3), jnp.float32),
        "B": jnp.asarray(rng.randn(8, SIZE, SIZE, 3), jnp.float32),
    }
    # single-device reference (train_step donates its input state, so the
    # sharded run re-initialises with the same seed)
    _, metrics_ref = task.train_step(state, batch, 2e-4)

    mesh = make_mesh()
    state2 = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    state_sh = replicate(state2, mesh)
    batch_sh = shard_batch(batch, mesh)
    _, metrics_sh = task.train_step(state_sh, batch_sh, 2e-4)
    for k in metrics_ref:
        np.testing.assert_allclose(
            np.asarray(metrics_ref[k]), np.asarray(metrics_sh[k]), rtol=2e-4, atol=1e-5
        )


def test_distiller_sharded_step_with_syncbatchnorm(rng):
    """Batch-norm student under a sharded batch: GSPMD makes the batch stats
    global (the reference needs its hand-rolled SynchronizedBatchNorm for
    this — models/modules/sync_batchnorm/batchnorm.py)."""
    norm = NormConfig(kind="syncbatch", affine=True, track_running_stats=True)
    teacher_cfg = tiny_gen(ngf=8, norm=norm)
    student_cfg = tiny_gen(ngf=4, norm=norm)
    hp = DistillHParams(
        dataset_mode="aligned",
        gan_mode="lsgan",
        distill_loss_type="ka",
        mapping_layers=("encode", "block1"),
    )
    dist = InceptionDistiller(teacher_cfg, student_cfg, hp=hp)
    teacher_vars = dist.netG_teacher.init(
        jax.random.PRNGKey(7), jnp.zeros((1, SIZE, SIZE, 3))
    )
    state, teacher_vars = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, teacher_vars)
    batch = {
        "A": jnp.asarray(rng.randn(8, SIZE, SIZE, 3), jnp.float32),
        "B": jnp.asarray(rng.randn(8, SIZE, SIZE, 3), jnp.float32),
    }
    _, metrics_ref = dist.train_step(state, teacher_vars, batch, 2e-4)

    mesh = make_mesh()
    state2, _ = dist.init_state(jax.random.PRNGKey(0), SIZE, SIZE, teacher_vars)
    state_sh = replicate(state2, mesh)
    tv_sh = replicate(teacher_vars, mesh)
    batch_sh = shard_batch(batch, mesh)
    state_sh, metrics_sh = dist.train_step(state_sh, tv_sh, batch_sh, 2e-4)
    for k in metrics_ref:
        np.testing.assert_allclose(
            np.asarray(metrics_ref[k]), np.asarray(metrics_sh[k]), rtol=5e-4, atol=1e-5
        )
    # student batch stats were updated and stay replicated/finite
    leaves = jax.tree.leaves(state_sh.g.stats)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_spatial_sharding(rng):
    """(data=4, spatial=2) mesh: image height sharded across devices.
    Slow lane: the dp x sp gate pass covers execution every round.

    GSPMD inserts the convolution halo exchanges and makes the
    instance-norm spatial reductions cross-device; the step must reproduce
    single-device numerics bit-for-tolerance."""
    task = Pix2PixTask(tiny_gen(), NLayerDiscriminatorConfig(input_nc=6, ndf=4))
    state = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    batch = {
        "A": jnp.asarray(rng.randn(4, SIZE, SIZE, 3), jnp.float32),
        "B": jnp.asarray(rng.randn(4, SIZE, SIZE, 3), jnp.float32),
    }
    _, metrics_ref = task.train_step(state, batch, 2e-4)

    mesh = make_mesh(n_spatial=2)
    assert mesh.devices.shape == (4, 2)
    state2 = task.init_state(jax.random.PRNGKey(0), SIZE, SIZE)
    state_sh = replicate(state2, mesh)
    batch_sh = shard_batch(batch, mesh)
    # height really is sharded over the spatial axis
    a = batch_sh["A"]
    assert a.sharding.spec == ("data", "spatial")
    _, metrics_sh = task.train_step(state_sh, batch_sh, 2e-4)
    for k in metrics_ref:
        np.testing.assert_allclose(
            np.asarray(metrics_ref[k]), np.asarray(metrics_sh[k]),
            rtol=2e-4, atol=1e-5, err_msg=k,
        )


class _LinearJudge:
    """InceptionV3FID stand-in: apply(variables, x01) -> [features]."""

    def apply(self, variables, x01):
        flat = jnp.reshape(x01, (x01.shape[0], -1)).astype(jnp.float32)
        return [flat @ variables["w"]]


def test_sharded_eval_fid_identical(rng):
    """The evaluation sweep over the data mesh (SURVEY §5.8) must produce
    EXACTLY the same FID as the single-device sweep: generator inputs are
    padded+batch-sharded, the judge runs sharded, and the Fréchet reduction
    stays host-side.  Ragged tail batches exercise the padding path."""
    from cat_tpu.train.evaluation import FIDEvaluator, shard_eval_input

    d = 6
    judge = _LinearJudge()
    jvars = {"w": jnp.asarray(rng.randn(SIZE * SIZE * 3, d), jnp.float32)}
    a = rng.randn(d, d)
    stats = {"mu": rng.randn(d), "sigma": a @ a.T + np.eye(d)}

    # deterministic "generator"; jit partitions it over the mesh whenever
    # its input arrives committed to the mesh's data sharding
    generate = jax.jit(lambda x: jnp.tanh(-jnp.asarray(x, jnp.float32)))

    def loader():
        r = np.random.RandomState(0)
        # ragged tail (11 = 4 + 4 + 3) exercises pad_to on an 8-way mesh
        return [{"A": r.randn(n, SIZE, SIZE, 3).astype(np.float32)}
                for n in (4, 4, 3)]

    ev1 = FIDEvaluator(generate, loader(), judge, jvars, stats,
                       log_dir=None, eval_batch_size=4)
    fid1 = ev1(0)[0]["metric/fid"]

    mesh = make_mesh()
    ev8 = FIDEvaluator(generate, loader(), judge, jvars, stats,
                       log_dir=None, eval_batch_size=4, mesh=mesh)
    fid8 = ev8(0)[0]["metric/fid"]
    assert np.isfinite(fid1)
    np.testing.assert_allclose(fid8, fid1, rtol=1e-5)

    # dict inputs (SPADE label/instance batches): arrays shard, paths pass
    batch = {"label": np.zeros((3, 8, 8), np.float32), "path": ["a", "b", "c"]}
    sharded, n = shard_eval_input(batch, mesh)
    assert n == 3
    assert sharded["label"].shape[0] == 8  # padded to the mesh size
    assert sharded["path"] == ["a", "b", "c"]
