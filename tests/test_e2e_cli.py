"""End-to-end CLI runs on synthetic micro-datasets (CPU, tiny configs) —
the counterpart of the reference's scripts/ integration contract."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.models.generator import InceptionGenerator
from cat_tpu.utils import checkpoint as ckpt

pytestmark = pytest.mark.slow


def make_images(directory, n, size=(64, 64), rng=None):
    os.makedirs(directory, exist_ok=True)
    rng = rng or np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(directory, f"{i:03d}.png"))


def tiny_teacher_cfg():
    return InceptionGeneratorConfig.make(
        ngf=8, channels=None, channels_reduction_factor=2,
        kernel_sizes=(1, 3), n_blocks=3,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )


@pytest.fixture
def unaligned_root(tmp_path):
    root = tmp_path / "db"
    rng = np.random.RandomState(0)
    make_images(root / "trainA", 6, rng=rng)
    make_images(root / "trainB", 6, rng=rng)
    make_images(root / "valA", 2, rng=rng)
    make_images(root / "valB", 2, rng=rng)
    return str(root)


@pytest.fixture
def aligned_root(tmp_path):
    root = tmp_path / "db"
    rng = np.random.RandomState(0)
    make_images(root / "train", 8, size=(128, 64), rng=rng)
    make_images(root / "val", 2, size=(128, 64), rng=rng)
    return str(root)


def test_distill_cli_end_to_end(aligned_root, tmp_path):
    from cat_tpu.entry import distill_main

    # teacher checkpoint (randomly-initialised tiny generator)
    cfg = tiny_teacher_cfg()
    model = InceptionGenerator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # spread the norm scales so the FLOPs search has signal
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
    teacher_path = os.path.join(tdir, "best_net_G.msgpack")

    from cat_tpu.compress.profiling import profile_generator

    target = profile_generator(cfg, 32, 32).macs * 0.5
    log_dir = str(tmp_path / "logs")
    distill_main([
        "--dataroot", aligned_root,
        "--dataset_mode", "aligned",
        "--restore_teacher_G_path", teacher_path,
        "--target_flops", str(target),
        "--prune_cin_lb", "2",
        "--log_dir", log_dir,
        "--batch_size", "2",
        "--crop_size", "32", "--load_size", "36",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--gan_mode", "lsgan",
        "--distill_G_loss_type", "ka",
        "--lambda_recon", "5",
        "--ndf", "8",
        "--inception_path", "/nonexistent.pth",
    ])
    # student architecture + checkpoints were written
    assert os.path.exists(os.path.join(log_dir, "student_config.json"))
    saved = glob.glob(os.path.join(log_dir, "checkpoints", "1_net_G.*"))
    assert saved, "per-epoch student checkpoint missing"
    with open(os.path.join(log_dir, "student_config.json")) as f:
        student = json.load(f)
    assert student["__type__"] == "InceptionGeneratorConfig"


def test_distill_cli_data_parallel(aligned_root, tmp_path):
    """distill verb over the 8-virtual-device mesh (--n_devices 0 = all)."""
    from cat_tpu.entry import distill_main

    cfg = tiny_teacher_cfg()
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
    tdir = str(tmp_path / "teacher")
    ckpt.save_net(tdir, "best", "G", variables, cfg)

    from cat_tpu.compress.profiling import profile_generator

    target = profile_generator(cfg, 32, 32).macs * 0.6
    log_dir = str(tmp_path / "logs")
    distill_main([
        "--dataroot", aligned_root,
        "--dataset_mode", "aligned",
        "--restore_teacher_G_path", os.path.join(tdir, "best_net_G.msgpack"),
        "--target_flops", str(target),
        "--prune_cin_lb", "2",
        "--log_dir", log_dir,
        "--batch_size", "8",  # shards 1 sample per virtual device
        "--n_devices", "0",
        "--crop_size", "32", "--load_size", "36",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--gan_mode", "lsgan",
        "--distill_G_loss_type", "ka",
        "--lambda_recon", "5",
        "--ndf", "8",
        "--inception_path", "/nonexistent.pth",
    ])
    assert glob.glob(os.path.join(log_dir, "checkpoints", "1_net_G.*"))


def test_train_cli_cyclegan(unaligned_root, tmp_path):
    from cat_tpu.entry import train_main

    log_dir = str(tmp_path / "logs")
    train_main([
        "--dataroot", unaligned_root,
        "--model", "cycle_gan",
        "--dataset_mode", "unaligned",
        "--log_dir", log_dir,
        "--batch_size", "2",
        "--crop_size", "32", "--load_size", "36",
        "--ngf", "8", "--ndf", "8",
        "--n_blocks", "2",
        "--channels_reduction_factor", "2",
        "--kernel_sizes", "1", "3",
        "--norm_affine",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--inception_path", "/nonexistent.pth",
    ])
    assert glob.glob(os.path.join(log_dir, "checkpoints", "1_net_G_A.*"))
    assert os.path.exists(os.path.join(log_dir, "log.txt"))


def test_distill_cli_on_device_data(unaligned_root, tmp_path):
    """--on_device_data: HBM-resident image bank feeds the distill loop."""
    from cat_tpu.entry import distill_main

    cfg = tiny_teacher_cfg()
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
    tdir = str(tmp_path / "teacher")
    ckpt.save_net(tdir, "best", "G", variables, cfg)

    # a matching teacher discriminator checkpoint (reference recipes pass
    # --restore_D_path; weights-only warm start)
    from cat_tpu.core.config import NLayerDiscriminatorConfig
    from cat_tpu.models.discriminators import NLayerDiscriminator

    d_cfg = NLayerDiscriminatorConfig(input_nc=3, ndf=8)
    d_vars = NLayerDiscriminator(d_cfg).init(
        jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    ckpt.save_net(tdir, "best", "D", d_vars, d_cfg)

    from cat_tpu.compress.profiling import profile_generator

    target = profile_generator(cfg, 32, 32).macs * 0.5
    log_dir = str(tmp_path / "logs")
    distill_main([
        "--dataroot", unaligned_root,
        "--dataset_mode", "unaligned",
        "--on_device_data", "1",
        "--restore_teacher_G_path", os.path.join(tdir, "best_net_G.msgpack"),
        "--restore_pretrained_G_path", os.path.join(tdir, "best_net_G.msgpack"),
        "--restore_D_path", os.path.join(tdir, "best_net_D.msgpack"),
        "--target_flops", str(target),
        "--prune_cin_lb", "2",
        "--log_dir", log_dir,
        "--batch_size", "2",
        "--crop_size", "32", "--load_size", "36",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--gan_mode", "lsgan",
        "--distill_G_loss_type", "ka",
        "--lambda_recon", "5",
        "--ndf", "8",
        "--inception_path", "/nonexistent.pth",
    ])
    saved = glob.glob(os.path.join(log_dir, "checkpoints", "1_net_G.*"))
    assert saved, "per-epoch student checkpoint missing (device-data path)"
    # reference parity: the pretrained transfer fires together with
    # --target_flops (the shipped student recipes pass both)
    log = open(os.path.join(log_dir, "log.txt")).read()
    assert "Pretrained weights transferred" in log


def make_cityscapes_root(tmp_path):
    rng = np.random.RandomState(0)
    city = tmp_path / "gtFine" / "train" / "cityA"
    photos = tmp_path / "leftImg8bit" / "train" / "cityA"
    os.makedirs(city)
    os.makedirs(photos)
    for i in range(2):
        base = f"cityA_{i:06d}_000019"
        lab = rng.randint(0, 4, size=(64, 64), dtype=np.uint8)
        Image.fromarray(lab).save(city / f"{base}_gtFine_labelIds.png")
        Image.fromarray(lab).save(city / f"{base}_gtFine_instanceIds.png")
        img = rng.randint(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(photos / f"{base}_leftImg8bit.png")


def test_train_cli_spade(tmp_path):
    """train --model spade end to end (regression: compute_dtype was only
    defined on the distill parser and setup_train_spade crashed)."""
    from cat_tpu.entry import train_main

    make_cityscapes_root(tmp_path)
    log_dir = str(tmp_path / "logs")
    train_main([
        "--dataroot", str(tmp_path),
        "--model", "spade",
        "--dataset_mode", "cityscapes",
        "--input_nc", "4",
        "--netG", "inception_spade",
        "--num_upsampling_layers", "normal",
        "--crop_size", "64", "--load_size", "64",
        "--aspect_ratio", "1.0",
        "--ngf", "4", "--ndf", "4", "--num_D", "2",
        "--batch_size", "2",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--lambda_vgg", "0",
        "--compute_dtype", "bfloat16",
        "--log_dir", log_dir,
        "--inception_path", "/nonexistent.pth",
    ])
    assert glob.glob(os.path.join(log_dir, "checkpoints", "1_net_G.*"))


def test_distill_cli_spade_teacher_D_restore(tmp_path):
    """GauGAN recipe chain: teacher train, then distill restoring the
    teacher's D (--restore_D_path) and transferring the pretrained G
    (--restore_pretrained_G_path) — both stages at the per-model default
    n_layers_D.  Regression: setup_distill_spade built its D from the
    config defaults instead of the CLI flags, so the teacher's D tree
    never matched the distiller's (reference builds both from the same
    opt, distillers/spade_distiller.py:72, models/spade_model.py:82)."""
    from cat_tpu.entry import distill_main, train_main

    make_cityscapes_root(tmp_path)
    tdir = str(tmp_path / "teacher")
    common = [
        "--dataroot", str(tmp_path),
        "--dataset_mode", "cityscapes",
        "--input_nc", "4",
        "--num_upsampling_layers", "normal",
        "--crop_size", "64", "--load_size", "64",
        "--aspect_ratio", "1.0",
        "--ndf", "4", "--num_D", "2",
        "--batch_size", "2",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--lambda_vgg", "0",
        "--inception_path", "/nonexistent.pth",
    ]
    train_main(common + [
        "--model", "spade",
        "--netG", "inception_spade",
        "--ngf", "4",
        "--log_dir", tdir,
    ])
    tg = os.path.join(tdir, "checkpoints", "latest_net_G.msgpack")
    td = os.path.join(tdir, "checkpoints", "latest_net_D.msgpack")
    assert os.path.exists(tg) and os.path.exists(td)

    log_dir = str(tmp_path / "student")
    distill_main(common + [
        "--distiller", "spade",
        "--teacher_netG", "inception_spade",
        "--student_netG", "inception_spade",
        "--teacher_ngf", "4", "--student_ngf", "4",
        "--restore_teacher_G_path", tg,
        "--restore_pretrained_G_path", tg,
        "--restore_D_path", td,
        "--log_dir", log_dir,
    ])
    assert glob.glob(os.path.join(log_dir, "checkpoints", "1_net_G.*"))
    log = open(os.path.join(log_dir, "log.txt")).read()
    assert "Pretrained weights transferred" in log


def test_distill_cli_spade_shrink_transfer(tmp_path):
    """5p6B-recipe chain: --target_flops drives shrink_spade INSIDE distill
    while --restore_pretrained_G_path transfers into the searched student
    (reference train_inception_student_5p6B.sh passes both, with
    --kernel_sizes 1 3 5).  Regression: the transfer paired active branches
    positionally, so when shrink pruned a leading branch the next branch
    inherited the wrong-sized teacher kernel (live ScopeParamShapeError at
    up_3/dw2_mid: 3x3 written into the 5x5 slot)."""
    from cat_tpu.compress.spade import profile_spade_generator
    from cat_tpu.entry import distill_main, load_spade_checkpoint, train_main

    make_cityscapes_root(tmp_path)
    tdir = str(tmp_path / "teacher")
    common = [
        "--dataroot", str(tmp_path),
        "--dataset_mode", "cityscapes",
        "--input_nc", "4",
        "--num_upsampling_layers", "normal",
        "--kernel_sizes", "1", "3", "5",
        "--channels_reduction_factor", "2",
        "--crop_size", "64", "--load_size", "64",
        "--aspect_ratio", "1.0",
        "--ndf", "4", "--num_D", "2",
        "--batch_size", "2",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--lambda_vgg", "0",
        "--inception_path", "/nonexistent.pth",
    ]
    train_main(common + [
        "--model", "spade",
        "--netG", "inception_spade",
        "--ngf", "4",
        "--log_dir", tdir,
    ])
    tg = os.path.join(tdir, "checkpoints", "latest_net_G.msgpack")
    cfg, _ = load_spade_checkpoint(tg)
    budget = profile_spade_generator(cfg, 64, 64).macs // 2

    log_dir = str(tmp_path / "student")
    distill_main(common + [
        "--distiller", "spade",
        "--teacher_netG", "inception_spade",
        "--student_netG", "inception_spade",
        "--teacher_ngf", "4", "--student_ngf", "4",
        "--restore_teacher_G_path", tg,
        "--restore_pretrained_G_path", tg,
        "--target_flops", str(budget),
        "--prune_cin_lb", "1",
        "--log_dir", log_dir,
    ])
    assert glob.glob(os.path.join(log_dir, "checkpoints", "1_net_G.*"))
    log = open(os.path.join(log_dir, "log.txt")).read()
    assert "Pretrained weights transferred" in log
    assert "searched flops" in log


def test_train_cli_resume_from_state(unaligned_root, tmp_path):
    """--restore_state_path resumes the full train state (was parsed but
    dead); --epoch_base continues the numbering."""
    from cat_tpu.entry import train_main

    log_dir = str(tmp_path / "logs")
    args = [
        "--dataroot", unaligned_root,
        "--model", "cycle_gan",
        "--dataset_mode", "unaligned",
        "--ngf", "4", "--ndf", "4",
        "--channels_reduction_factor", "2",
        "--kernel_sizes", "1", "3",
        "--n_blocks", "3",
        "--batch_size", "2",
        "--crop_size", "32", "--load_size", "36",
        "--nepochs", "1", "--nepochs_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "1",
        "--gan_mode", "lsgan",
        "--log_dir", log_dir,
        "--inception_path", "/nonexistent.pth",
    ]
    train_main(args)
    state_path = os.path.join(log_dir, "checkpoints", "1_state.msgpack")
    assert os.path.exists(state_path)

    log_dir2 = str(tmp_path / "logs2")
    train_main(args[:-2] + [
        "--inception_path", "/nonexistent.pth",
        "--log_dir", log_dir2,
        "--restore_state_path", state_path,
        "--epoch_base", "2",
    ])
    assert glob.glob(os.path.join(log_dir2, "checkpoints", "2_net_G_A.*")), \
        "resumed run should save epoch-2 checkpoints"
