"""Reference-scale GauGAN (SPADE) KA-distill step timing on the attached chip.

Builds the flagship configuration of the reference's shipped recipe
(scripts/gaugan/cityscapes/train_inception_student_5p6B.sh: teacher ngf 64,
student ngf 48 shrunk to --target_flops 5.6e9 with --prune_cin_lb 16,
cityscapes 512x256 crops, global batch 16, lambda_distill 0.5, hinge +
feature-matching + VGG losses, spadesyncbatch norms) and times the fused
train step end to end, plus isolated teacher-forward / student-fwd+bwd
components so step-time regressions can be attributed.

The reference runs this recipe on TWO GPUs (--gpu_ids 0,1), i.e. a
per-device batch of 8; ``--batch`` here is the PER-CHIP batch.

Usage:
  python tools/spade_perf.py                 # full step, batch 16
  python tools/spade_perf.py --batch 8
  python tools/spade_perf.py --no-packed     # unpacked SPADE blocks
  python tools/spade_perf.py --no-remat      # no student rematerialisation
  python tools/spade_perf.py --no-vgg        # drop the VGG term
  python tools/spade_perf.py --components    # also time step pieces

Writes one JSON line per measurement to stdout; progress to stderr.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("CAT_TPU_HOST_INIT", "1")  # zero-XLA numpy init

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_T0 = time.perf_counter()


def log(msg):
    print(f"[spade_perf +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _spread_scales(tree, rs):
    """Spread norm scales so the shrink search has signal (a trained
    teacher's gammas are naturally spread; see bench.py)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _spread_scales(v, rs)
        elif k == "scale":
            out[k] = rs.uniform(0.05, 2.0, np.asarray(v).shape).astype(np.float32)
        else:
            out[k] = v
    return out


def build(args):
    from cat_tpu.compress.shrink import PruneBounds
    from cat_tpu.compress.spade import shrink_spade_generator
    from cat_tpu.core.spade_config import SPADEGeneratorConfig
    from cat_tpu.distill.spade_distiller import SPADEDistillHParams, SPADEDistiller
    from cat_tpu.models.vgg import VGG19Features
    from cat_tpu.train.common import init_on_cpu

    H, W = args.width // 2, args.width
    NC = 36  # 35 cityscapes classes + instance-edge channel

    def cfg(ngf):
        return SPADEGeneratorConfig.make(
            semantic_nc=NC, ngf=ngf, channels=None,
            channels_reduction_factor=6, kernel_sizes=(1, 3, 5),
            num_upsampling_layers=getattr(args, "ups", "normal"),
            crop_size=args.width, aspect_ratio=2.0,
        )

    teacher_cfg = cfg(64)
    supernet_cfg = cfg(48)  # reference --student_ngf 48 supernet
    log("configs built; initialising ngf-48 supernet for the shrink search")
    sup = init_on_cpu(
        lambda: SPADEGenerator_init(supernet_cfg, H, W)
    )
    sup = {"params": _spread_scales(sup["params"], np.random.RandomState(0)),
           **{k: v for k, v in sup.items() if k != "params"}}
    res = shrink_spade_generator(
        supernet_cfg, sup, args.target_flops, H, W,
        PruneBounds(cin_lb=16),
    )
    log(f"shrink done: student {res.searched_macs:,} MACs "
        f"(target {args.target_flops:g})")

    vgg_variables = None
    if args.vgg:
        vgg_variables = init_on_cpu(
            lambda: VGG19Features().init(
                np.array([0, 9], np.uint32), jnp.zeros((1, 32, 32, 3)))
        )

    hp = SPADEDistillHParams(
        gan_mode="hinge",
        distill_loss_type="ka",
        lambda_distill=0.5,
        lambda_feat=10.0,
        lambda_vgg=10.0 if args.vgg else 0.0,
        compute_dtype=args.dtype,
        vgg_compute_dtype=args.vgg_dtype,
        packed_blocks=args.packed,
        remat=args.remat,
        remat_policy=getattr(args, "remat_policy", "") or "",
        teacher_compute_dtype=getattr(args, "teacher_dtype", "") or "",
    )
    dist = SPADEDistiller(teacher_cfg, res.config, hp=hp,
                          vgg_variables=vgg_variables)
    log("initialising train state (host numpy)")
    teacher_vars = init_on_cpu(lambda: SPADEGenerator_init(teacher_cfg, H, W))
    state, teacher_vars = dist.init_state(
        np.array([0, 1], np.uint32), H, W, teacher_vars
    )
    return dist, state, teacher_vars, res


def SPADEGenerator_init(cfg, h, w):
    from cat_tpu.models.spade import SPADEGenerator

    return SPADEGenerator(cfg).init(
        np.array([0, 7], np.uint32), jnp.zeros((1, h, w, cfg.semantic_nc))
    )


@jax.jit
def _scalar_probe(tree):
    leaves = [jnp.sum(x.astype(jnp.float32))
              for x in jax.tree_util.tree_leaves(tree)]
    return sum(leaves[:1])


def timed(fn, warmup, iters, name, imgs=None):
    for _ in range(warmup):
        out = fn()
    float(_scalar_probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(_scalar_probe(out))
    dt = (time.perf_counter() - t0) / iters
    line = {"name": name, "ms": round(dt * 1e3, 3)}
    if imgs:
        line["img_per_s"] = round(imgs / dt, 3)
    print(json.dumps(line), flush=True)
    return dt


def build_task(args):
    """SPADE TEACHER-training step (train.py --model spade) at the same
    reference scale — the quality loop's longest stage."""
    from cat_tpu.core.spade_config import (
        MultiscaleDiscriminatorConfig, SPADEGeneratorConfig,
    )
    from cat_tpu.models.vgg import VGG19Features
    from cat_tpu.train.common import init_on_cpu
    from cat_tpu.train.spade_model import SPADEHParams, SPADETask

    H, W = args.width // 2, args.width
    NC = 36
    cfg = SPADEGeneratorConfig.make(
        semantic_nc=NC, ngf=64, channels=None,
        channels_reduction_factor=6, kernel_sizes=(1, 3, 5),
        num_upsampling_layers=getattr(args, "ups", "normal"),
        crop_size=args.width, aspect_ratio=2.0,
    )
    vgg_variables = None
    if args.vgg:
        vgg_variables = init_on_cpu(
            lambda: VGG19Features().init(
                np.array([0, 9], np.uint32), jnp.zeros((1, 32, 32, 3)))
        )
    hp = SPADEHParams(
        gan_mode="hinge", lambda_feat=10.0,
        lambda_vgg=10.0 if args.vgg else 0.0,
        compute_dtype=args.dtype, vgg_compute_dtype=args.vgg_dtype,
        packed_blocks=args.packed, remat=args.remat,
    )
    task = SPADETask(
        cfg,
        MultiscaleDiscriminatorConfig(input_nc=NC + 3),
        hp, vgg_variables=vgg_variables, input_nc=NC - 1,
    )
    log("initialising teacher-train state (host numpy)")
    state = task.init_state(np.array([0, 1], np.uint32), H, W)
    return task, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--task", action="store_true",
                    help="time the SPADE TEACHER-training step instead")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--ups", default="more",
                    choices=["normal", "more", "most"],
                    help="num_upsampling_layers (reference SPADE default: "
                         "more, spade_model.py:33-38)")
    ap.add_argument("--target_flops", type=float, default=5.6e9)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--vgg_dtype", default="float32")
    ap.add_argument("--packed", action="store_true", default=True,
                    help="branch-packed SPADE blocks (the framework default "
                         "since round 4 — entry.py _packed(opt, True))")
    ap.add_argument("--no-packed", dest="packed", action="store_false")
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--remat-policy", dest="remat_policy", default="",
                    help="jax.checkpoint_policies name for SELECTIVE remat "
                         "(e.g. dots_with_no_batch_dims_saveable); only "
                         "meaningful with remat on")
    ap.add_argument("--teacher-dtype", dest="teacher_dtype", default="",
                    help="frozen-teacher compute override ('int8' = dynamic "
                         "int8 convs, ops/quant.py)")
    ap.add_argument("--no-vgg", dest="vgg", action="store_false")
    ap.add_argument("--components", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.task:
        task, tstate = build_task(args)
    else:
        dist, state, teacher_vars, res = build(args)
    B, H, W = args.batch, args.width // 2, args.width
    log(f"backend={jax.default_backend()}; batch {B} at {W}x{H}, "
        f"dtype {args.dtype}, packed={args.packed}, remat={args.remat}, "
        f"vgg={args.vgg}")

    # synthetic batch generated ON DEVICE in one program (a host device_put
    # of ~100MB costs minutes through the axon tunnel)
    @jax.jit
    def make_batch(key):
        kl, ki, km = jax.random.split(key, 3)
        return {
            "label": jax.random.randint(kl, (B, H, W), 0, 35).astype(jnp.float32),
            "instance": jax.random.randint(ki, (B, H, W), 0, 4).astype(jnp.float32),
            "image": jax.random.normal(km, (B, H, W, 3), jnp.float32),
        }

    batch = make_batch(np.array([0, 3], np.uint32))
    float(_scalar_probe(batch))
    log("batch resident; compiling the fused train step (cold: minutes)")

    suffix = (f"{' packed' if args.packed else ''}"
              f"{' remat' if args.remat else ''}"
              f"{'' if args.vgg else ' novgg'}"
              f"{' vgg-bf16' if args.vgg and args.vgg_dtype == 'bfloat16' else ''}")

    if args.task:
        tbox = [tstate]

        def step():
            s, metrics = task.train_step(tbox[0], batch, 2e-4)
            tbox[0] = s
            return metrics

        kind, desc = "spade-teacher-step", "teacher-training step (ngf64)"
    else:
        box = [state]

        def step():
            s, metrics = dist.train_step(box[0], teacher_vars, batch, 2e-4)
            box[0] = s
            return metrics

        kind = "spade-distill-step"
        desc = (f"KA-distill step (teacher ngf64 + student "
                f"@{res.searched_macs / 1e9:.2f}e9 MACs)")

    t_first = time.perf_counter()
    m = step()
    float(_scalar_probe(m))
    log(f"first step done ({time.perf_counter() - t_first:.1f}s incl. compile)")
    dt = timed(step, warmup=1, iters=args.iters,
               name=f"{kind} b{B} {W}x{H} {args.dtype}{suffix}",
               imgs=B)
    print(json.dumps({
        "metric": f"gaugan-cityscapes {desc} throughput "
                  f"({W}x{H}, batch {B}, {args.dtype})",
        "value": round(B / dt, 3),
        "unit": "images/sec/chip",
    }), flush=True)

    if args.components and not args.task:
        sem_fn = jax.jit(lambda b: dist._semantics(b))
        sem = sem_fn(batch)
        float(_scalar_probe(sem))

        from cat_tpu.train.common import cast_floats
        cdt = jnp.dtype(args.dtype)

        tfwd = jax.jit(lambda tv, s: dist._apply(
            dist.netG_teacher, cast_floats(tv["params"], cdt),
            {k: v for k, v in tv.items() if k != "params"},
            cast_floats(s, cdt), False, dist.hp.mapping_layers)[0])
        timed(lambda: tfwd(teacher_vars, sem), 2, args.iters,
              "teacher fwd (taps)", imgs=B)

        sfwd = jax.jit(lambda p, st, s: dist._apply(
            dist.netG_student, cast_floats(p, cdt), st,
            cast_floats(s, cdt), False, dist.hp.mapping_layers)[0])
        timed(lambda: sfwd(box[0].g.params["G"], box[0].g.stats, sem),
              2, args.iters, "student fwd (taps)", imgs=B)


if __name__ == "__main__":
    main()
