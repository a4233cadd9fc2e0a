"""profile / export verbs on a tiny model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.export import export_stablehlo, load_stablehlo
from cat_tpu.models.generator import InceptionGenerator

pytestmark = pytest.mark.slow


def tiny_cfg():
    return InceptionGeneratorConfig.make(
        ngf=4, channels=None, channels_reduction_factor=2,
        kernel_sizes=(1, 3), n_blocks=2,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )


def test_stablehlo_export_roundtrip(tmp_path):
    cfg = tiny_cfg()
    model = InceptionGenerator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    path = str(tmp_path / "student.stablehlo")
    export_stablehlo(cfg, variables, 32, 32, path)
    assert os.path.getsize(path) > 0

    exported = load_stablehlo(path)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 32, 32, 3), jnp.float32)
    out = exported.call(x)  # dynamic batch: 3 != export-time batch
    ref = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_export_verb(tmp_path):
    """export.py CLI: student checkpoint -> StableHLO artifact."""
    from cat_tpu.entry import export_main
    from cat_tpu.utils import checkpoint as ckpt

    cfg = tiny_cfg()
    model = InceptionGenerator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sdir = str(tmp_path / "student")
    ckpt.save_net(sdir, "best", "G", variables, cfg)
    out_path = str(tmp_path / "student.stablehlo")
    export_main([
        "--dataroot", str(tmp_path),
        "--restore_teacher_G_path", "/unused.msgpack",
        "--pretrained_student_G_path", os.path.join(sdir, "best_net_G.msgpack"),
        "--crop_size", "32",
        "--log_dir", str(tmp_path / "logs"),
        "--export_path", out_path,
        "--export_format", "stablehlo",
        "--inception_path", "/nonexistent.pth",
    ])
    assert os.path.getsize(out_path) > 0


def test_export_verb_spade(tmp_path):
    """gaugan export: SPADE student checkpoint -> StableHLO with symbolic
    batch (reference onnx_exporter.py:134-163 is generator-agnostic)."""
    from cat_tpu.core.spade_config import SPADEGeneratorConfig
    from cat_tpu.entry import export_main
    from cat_tpu.models.spade import SPADEGenerator
    from cat_tpu.utils import checkpoint as ckpt

    cfg = SPADEGeneratorConfig.make(
        semantic_nc=5, ngf=4, channels=None, channels_reduction_factor=4,
        kernel_sizes=(1, 3), num_upsampling_layers="normal",
        crop_size=32, aspect_ratio=1.0, nhidden=16,
    )
    model = SPADEGenerator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)))
    sdir = str(tmp_path / "student")
    ckpt.save_net(sdir, "best", "G", variables, cfg)
    out_path = str(tmp_path / "student.stablehlo")
    export_main([
        "--dataroot", str(tmp_path),
        "--distiller", "spade",
        "--restore_teacher_G_path", "/unused.msgpack",
        "--pretrained_student_G_path", os.path.join(sdir, "best_net_G.msgpack"),
        "--crop_size", "32", "--aspect_ratio", "1.0",
        "--log_dir", str(tmp_path / "logs"),
        "--export_path", out_path,
        "--export_format", "stablehlo",
        "--inception_path", "/nonexistent.pth",
    ])
    assert os.path.getsize(out_path) > 0

    from cat_tpu.export import load_stablehlo

    exported = load_stablehlo(out_path)
    sem = jnp.zeros((2, 32, 32, 5), jnp.float32)  # batch 2 != export batch
    out = exported.call(sem)
    ref = model.apply(variables, sem)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_profile_verb(tmp_path):
    from cat_tpu.entry import profile_main
    from cat_tpu.utils import checkpoint as ckpt
    from cat_tpu.compress.profiling import profile_generator
    from PIL import Image

    cfg = tiny_cfg()
    model = InceptionGenerator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(0)
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jnp.asarray(rng.uniform(0.05, 2.0, x.shape), jnp.float32)
            if path[-1].key == "scale" else x
        ),
        variables,
    )
    tdir = str(tmp_path / "t")
    ckpt.save_net(tdir, "best", "G", variables, cfg)
    # aligned micro val set (AB side-by-side) for the final eval sweep
    db = tmp_path / "db"
    os.makedirs(db / "val")
    for i in range(3):
        arr = rng.randint(0, 255, size=(32, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(db / "val" / f"{i}.png")
    target = profile_generator(cfg, 32, 32).macs * 0.6
    profile_main([
        "--dataroot", str(db),
        "--restore_teacher_G_path", os.path.join(tdir, "best_net_G.msgpack"),
        "--target_flops", str(target),
        "--prune_cin_lb", "2",
        "--crop_size", "32", "--load_size", "32",
        "--log_dir", str(tmp_path / "logs"),
        "--inception_path", "/nonexistent.pth",
        "--times", "3",
        "--num_test", "2",
    ])
    log = open(os.path.join(tmp_path, "logs", "log.txt")).read()
    assert "mean pruning time" in log
    assert "student MACs" in log
    # the evaluate contract: Sfake/Tfake/input/real dumps under eval/latest
    # (these feed tools/kid_score.py — reference profiler.py:154-164)
    dump = tmp_path / "logs" / "eval" / "latest"
    for sub in ("Sfake", "Tfake", "input", "real"):
        pngs = os.listdir(dump / sub)
        assert len(pngs) == 2, (sub, pngs)  # num_test capped the sweep
