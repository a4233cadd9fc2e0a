"""End-to-end task assembly for the CLI verbs (train / distill / profile /
export / get_real_stat).

Mirrors the reference driver layer (trainer.py, profiler.py,
onnx_exporter.py): build loaders + task + evaluator from parsed options, run
the distill preamble (shrink -> re-init -> optional restores), and hand a
uniform (step_fn, state, evaluate_fn, save_fn) bundle to the Trainer.
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

from cat_tpu import cli
from cat_tpu.compress.profiling import profile_generator
from cat_tpu.compress.shrink import PruneBounds, shrink_generator
from cat_tpu.core.config import config_to_json
from cat_tpu.data.datasets import create_dataloader, create_eval_dataloader
from cat_tpu.train.evaluation import FIDEvaluator, combine_evaluators
from cat_tpu.train.trainer import Trainer
from cat_tpu.utils import checkpoint as ckpt
from cat_tpu.utils.logger import Logger


def _packed(opt, family_default: bool) -> bool:
    """--packed_blocks tri-state: None keeps the family default (ON for both
    families since round 4: at the reference's production scale 512x256 the
    SPADE step measures +11% distill / +29% teacher-train with packing —
    the earlier 'neutral' result was a 256x128 probe artifact; PARITY.md)."""
    v = getattr(opt, "packed_blocks", None)
    return family_default if v is None else bool(v)


def _ema_decay(opt) -> float:
    """Effective student-G EMA decay (reference declares the trio at
    distill_options.py:160-172 but never reads it; here it is real).
    --moving_average_decay_adjust rescales the per-step decay for the
    actual batch size as d**(B/B_base): larger batches take fewer steps
    per epoch, so the per-step decay must shrink to keep the averaging
    horizon constant in epochs."""
    d = getattr(opt, "moving_average_decay", 0.0)
    if d > 0 and getattr(opt, "moving_average_decay_adjust", False):
        base = max(int(getattr(opt, "moving_average_decay_base_batch", 32)), 1)
        d = float(d) ** (float(opt.batch_size) / base)
    return float(d)


def _maybe_restore_state(opt, state):
    """--restore_state_path: resume the FULL train state (params, Adam
    moments, norm stats, RNG, pools) saved by every save_fn as
    <tag>_state.msgpack; pair with --epoch_base/--iter_base to continue
    the schedule (reference epoch_base semantics).  --restore_G_path /
    --restore_A_path load individual nets where wired; --restore_O_path
    is subsumed by the full-state restore."""
    p = getattr(opt, "restore_state_path", None)
    if p:
        state = ckpt.load_pytree(p, state)
        print(f"restored full train state from {p}")
    if getattr(opt, "restore_O_path", None):
        print("WARNING: --restore_O_path is subsumed by --restore_state_path "
              "(full-state checkpoints carry optimizer moments); ignored.")
    return state


def _init_multihost(opt) -> Tuple[bool, Optional[Tuple[int, int]]]:
    """Multi-host (DCN) init for the CLI verbs: jax.distributed over all
    participating processes (SURVEY.md §2.1 — the reference counterpart is
    the DataParallel wiring its drivers invoke, models/networks.py:157-161;
    here the SPMD program is unchanged and the mesh simply spans every
    host's devices).

    Returns ``(primary, process_shard)``: ``primary`` is True on process 0
    (the only process that writes logs/checkpoints/eval dumps);
    ``process_shard=(index, count)`` feeds the DataLoader so each host
    decodes only its slice of the GLOBAL --batch_size.  Idempotent — the
    mains call it before print_options and the setups call it again.
    """
    nproc = getattr(opt, "num_processes", -1) or -1
    if not (getattr(opt, "multihost", 0) or nproc > 1):
        return True, None
    from cat_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=getattr(opt, "coordinator_address", None),
        num_processes=nproc if nproc > 0 else None,
        process_id=(opt.process_id
                    if getattr(opt, "process_id", -1) >= 0 else None),
    )
    if jax.process_count() == 1:
        return True, None
    return jax.process_index() == 0, multihost.process_shard()


def _mesh_or_none(opt):
    sp = getattr(opt, "n_spatial", 1)
    if jax.process_count() > 1:
        # multi-host: every process must participate in every collective —
        # the mesh always spans ALL global devices; spatial sharding of
        # host-fed batches is single-process-only for now
        if sp > 1:
            raise SystemExit("--n_spatial > 1 is not supported together "
                             "with --multihost")
        from cat_tpu.parallel import multihost

        return multihost.global_mesh()
    n = opt.n_devices if opt.n_devices > 0 else len(jax.devices()) // max(sp, 1)
    if n * max(sp, 1) <= 1:
        return None
    from cat_tpu.parallel.mesh import make_mesh

    return make_mesh(n, n_spatial=sp)


def _place(state, aux, mesh):
    """Replicate state/aux over the mesh; return a per-batch placement fn.

    Data parallelism is transparent to the tasks: params replicated, batch
    sharded on the leading axis, XLA emits the collectives (see
    cat_tpu/parallel/mesh.py and tests/test_sharding.py).  The returned fn
    feeds the Trainer's device_prefetch so H2D copies overlap compute.

    Multi-host: replication feeds local devices from each process's own
    (same-seed/same-checkpoint) copy and the per-batch fn assembles the
    GLOBAL array from this host's slice (parallel/multihost.py) — no
    cross-host data movement.
    """
    if mesh is None:
        return state, aux, jax.device_put
    if jax.process_count() > 1:
        from cat_tpu.parallel import multihost

        state = multihost.replicate(state, mesh)
        aux = multihost.replicate(aux, mesh) if aux is not None else None
        return state, aux, (lambda b: multihost.shard_host_batch(b, mesh))
    from cat_tpu.parallel.mesh import replicate, shard_batch

    state = replicate(state, mesh)
    aux = replicate(aux, mesh) if aux is not None else None
    return state, aux, (lambda b: shard_batch(b, mesh))


def make_miou_evaluator(opt, generate, eval_loader, mesh=None,
                        process_shard=None):
    """mIoU judge when evaluating cityscapes photos (reference condition:
    'cityscapes' in dataroot and direction BtoA —
    distillers/inception_distiller.py:262-279)."""
    if "cityscapes" not in opt.dataroot or opt.direction != "BtoA":
        return None
    if not (opt.drn_path and os.path.exists(opt.drn_path)):
        print(f"WARNING: DRN weights not found at {opt.drn_path!r}; mIoU disabled.")
        return None
    if not os.path.exists(opt.table_path):
        print(f"WARNING: table file not found at {opt.table_path!r}; mIoU disabled.")
        return None
    from cat_tpu.metrics.drn import load_drnseg
    from cat_tpu.train.evaluation import MIoUEvaluator

    model, variables = load_drnseg(opt.drn_path)
    return MIoUEvaluator(
        generate, eval_loader, model, variables, opt.table_path,
        data_dir=opt.cityscapes_path, batch_size=opt.eval_batch_size,
        mesh=mesh, process_shard=process_shard,
    )


def _eval_mesh(mesh):
    """Mesh for the evaluation sweep (SURVEY §5.8): the training mesh on a
    single process; under multi-host, the process-LOCAL device mesh — each
    host sweeps its round-robin share of the val batches as an independent
    program (device_put of host-local eval batches to a global sharding is
    not possible), and the Fréchet / fast_hist reductions merge host-side
    (parallel.multihost.reduce_moments / reduce_hist)."""
    if mesh is None:
        return None
    if jax.process_count() == 1:
        return mesh
    from cat_tpu.parallel import multihost

    return multihost.local_mesh()


def _eval_pshard() -> Optional[Tuple[int, int]]:
    """(process_index, process_count) for evaluator batch sharding under
    multi-host; None single-process (reference analogue: the full-sweep
    semantics of metric/__init__.py:11-46, kept but distributed)."""
    if jax.process_count() == 1:
        return None
    from cat_tpu.parallel import multihost

    return multihost.process_shard()


def _eval_state_fn(fn, state_supplier, eval_mesh):
    """Wrap ``fn(state_like, x)`` for the eval sweep.

    Single-process: call with the live (possibly mesh-replicated) value.
    Multi-host: the sweep runs as independent per-host programs — fetch
    the (replicated, hence host-addressable) value to numpy once per new
    state object and re-place it on the local eval mesh, so the generator
    forward never references the global mesh with per-host inputs."""
    if jax.process_count() == 1:
        return lambda x: fn(state_supplier(), x)
    from cat_tpu.parallel import multihost
    from cat_tpu.parallel.mesh import replicate as replicate_local

    cache: Dict[str, Any] = {}

    def gen(x):
        src = state_supplier()
        if cache.get("src") is not src:
            cache["src"] = src
            local = multihost.localize(src)
            cache["local"] = (replicate_local(local, eval_mesh)
                              if eval_mesh is not None else local)
        return fn(cache["local"], x)

    return gen


def _real_stats(path: Optional[str]) -> Optional[Dict[str, np.ndarray]]:
    if path and os.path.exists(path):
        npz = np.load(path)
        return {"mu": npz["mu"], "sigma": npz["sigma"]}
    if path:
        print(f"WARNING: real stats not found at {path!r}; FID disabled.")
    return None


# ---------------------------------------------------------------------------
# train verb
# ---------------------------------------------------------------------------


def _make_train_loader(opt, spec, process_shard=None):
    """Host DataLoader, or the HBM-resident bank when --on_device_data.

    The device path uploads the decoded+resized uint8 image set once and
    samples crop/flip/normalised batches inside jit (data/device_data.py)
    — zero steady-state host->device traffic.  Supported for the unaligned
    (CycleGAN/distill) mode; other modes fall back to the host loader.
    """
    if getattr(opt, "on_device_data", 0):
        supported = (opt.dataset_mode == "unaligned"
                     and spec.preprocess == "resize_and_crop"
                     and not spec.grayscale
                     and not opt.serial_batches
                     and process_shard is None)
        if not supported:
            print("WARNING: --on_device_data supports unaligned "
                  "resize_and_crop without --serial_batches; using the "
                  "host loader instead.")
        else:
            from cat_tpu.data.device_data import DeviceData, DeviceDataLoader

            dd, n = DeviceData.from_unaligned(
                opt.dataroot, opt.phase, spec.load_size, spec.crop_size,
                no_flip=spec.no_flip, max_size=opt.max_dataset_size,
            )
            return DeviceDataLoader(dd, opt.batch_size,
                                    max(n // opt.batch_size, 1), seed=opt.seed)
    return create_dataloader(
        opt.dataset_mode, opt.dataroot, opt.batch_size, spec,
        phase=opt.phase, direction=opt.direction,
        serial_batches=opt.serial_batches, max_size=opt.max_dataset_size,
        seed=opt.seed, load_in_memory=opt.load_in_memory,
        num_workers=opt.num_threads,
        worker_mode=getattr(opt, "data_backend", "thread"),
        process_shard=process_shard,
    )


def setup_train(opt) -> Tuple[Trainer, Any]:
    if opt.model == "spade":
        return setup_train_spade(opt)
    cli.set_seed(opt.seed)
    primary, pshard = _init_multihost(opt)
    spec = cli.transform_spec(opt)
    loader = _make_train_loader(opt, spec, pshard)
    logger = Logger(opt.log_dir, opt.tensorboard_dir, mute=not primary)
    gen_cfg = cli.generator_config(opt, opt.ngf)
    judge = cli.make_fid_judge(opt)
    mesh = _mesh_or_none(opt)
    save_dir = os.path.join(opt.log_dir, "checkpoints")

    if opt.model == "pix2pix":
        from cat_tpu.train.pix2pix import Pix2PixHParams, Pix2PixTask

        hp = Pix2PixHParams(
            gan_mode=opt.gan_mode, recon_loss_type=opt.recon_loss_type,
            lambda_gan=opt.lambda_gan, lambda_recon=opt.lambda_recon,
            beta1=opt.beta1, init_type=opt.init_type, init_gain=opt.init_gain,
            packed_blocks=_packed(opt, True),
            remat=bool(getattr(opt, "remat", 0)),
        )
        d_cfg = cli.discriminator_config(opt, opt.input_nc + opt.output_nc)
        task = Pix2PixTask(gen_cfg, d_cfg, hp)
        state = task.init_state(jax.random.PRNGKey(opt.seed), opt.crop_size, opt.crop_size)
        if opt.restore_G_path:
            gv = ckpt.load_pytree(opt.restore_G_path,
                                  {"params": state.g.params,
                                   "batch_stats": state.g.stats})
            state = state.replace(g=state.g.replace(
                params=gv["params"], stats=gv.get("batch_stats", state.g.stats)))
            print(f"restored G from {opt.restore_G_path}")
        state = _maybe_restore_state(opt, state)
        state, _, shard = _place(state, None, mesh)

        eval_loader = create_eval_dataloader(
            opt.dataset_mode, opt.dataroot, opt.eval_batch_size, spec, opt.direction
        )
        stats = _real_stats(opt.real_stat_path)
        evaluate_fn = None
        evs = []
        em = _eval_mesh(mesh)
        generate = _eval_state_fn(task.generate, lambda: task_state_box[0], em)
        if judge and stats:
            evs.append(FIDEvaluator(
                generate, eval_loader, judge[0], judge[1], stats,
                opt.log_dir if primary else None, opt.eval_batch_size,
                mesh=em, process_shard=_eval_pshard(),
            ))
        miou_ev = make_miou_evaluator(opt, generate, eval_loader,
                                      mesh=em, process_shard=_eval_pshard())
        if miou_ev:
            evs.append(miou_ev)
        if evs:
            evaluate_fn = combine_evaluators(**{"": evs})

        def save_fn(state, tag):
            state = jax.device_get(state)  # one batched fetch for all files
            ckpt.save_net(save_dir, tag, "G", {"params": state.g.params,
                                               "batch_stats": state.g.stats}, gen_cfg)
            # per-net D checkpoint: the reference's student recipes restore
            # the teacher's D (--restore_D_path, train_inception_student*.sh)
            ckpt.save_net(save_dir, tag, "D", {"params": state.d.params,
                                               **state.d.stats}, d_cfg)
            if getattr(opt, "save_full_state", 1):
                ckpt.save_train_state(save_dir, tag, state)
            else:
                ckpt.remove_stale(save_dir, tag, "state.msgpack")

        task_state_box = [state]

        def step_fn(state, batch, lr):
            state, metrics = task.train_step(state, batch, lr)
            task_state_box[0] = state
            return state, metrics

        trainer = Trainer(step_fn, loader, cli.trainer_config(opt),
                          evaluate_fn, save_fn if primary else None, logger,
                          device_put_fn=shard,
                          copy_tag_fn=lambda s, d: ckpt.copy_tag(save_dir, s, d))
        return trainer, state

    if opt.model == "cycle_gan":
        from cat_tpu.train.cyclegan import CycleGANHParams, CycleGANTask

        hp = CycleGANHParams(
            gan_mode=opt.gan_mode, lambda_A=opt.lambda_A, lambda_B=opt.lambda_B,
            lambda_identity=opt.lambda_identity, pool_size=opt.pool_size,
            beta1=opt.beta1, init_type=opt.init_type, init_gain=opt.init_gain,
            packed_blocks=_packed(opt, True),
            remat=bool(getattr(opt, "remat", 0)),
        )
        d_cfg = cli.discriminator_config(opt, opt.output_nc)
        task = CycleGANTask(gen_cfg, d_cfg, hp)
        state = task.init_state(jax.random.PRNGKey(opt.seed), opt.crop_size, opt.crop_size)
        state = _maybe_restore_state(opt, state)
        state, _, shard = _place(state, None, mesh)
        task_state_box = [state]

        evaluators = {}
        if judge:
            em = _eval_mesh(mesh)
            for direction, stat_path in (("A", opt.real_stat_B_path),
                                         ("B", opt.real_stat_A_path)):
                stats = _real_stats(stat_path)
                if not stats:
                    continue
                dname = "AtoB" if direction == "A" else "BtoA"
                eval_loader = create_eval_dataloader(
                    "unaligned", opt.dataroot, opt.eval_batch_size,
                    cli.transform_spec(opt), dname,
                )
                evaluators[direction] = FIDEvaluator(
                    _eval_state_fn(
                        functools.partial(
                            lambda s, x, d: task.generate(s, x, d), d=dname),
                        lambda: task_state_box[0], em,
                    ),
                    eval_loader, judge[0], judge[1], stats,
                    opt.log_dir if primary else None,
                    opt.eval_batch_size, name=f"fid_{'B' if direction == 'A' else 'A'}",
                    mesh=em, process_shard=_eval_pshard(),
                )
        evaluate_fn = combine_evaluators(**evaluators) if evaluators else None

        def save_fn(state, tag):
            state = jax.device_get(state)  # one batched fetch for all files
            for name in ("A", "B"):
                ckpt.save_net(save_dir, tag, f"G_{name}",
                              {"params": state.g.params[name]}, gen_cfg)
                ckpt.save_net(save_dir, tag, f"D_{name}",
                              {"params": state.d.params[name]}, d_cfg)
            if getattr(opt, "save_full_state", 1):
                ckpt.save_train_state(save_dir, tag, state)
            else:
                ckpt.remove_stale(save_dir, tag, "state.msgpack")

        def step_fn(state, batch, lr):
            state, metrics = task.train_step(state, batch, lr)
            task_state_box[0] = state
            return state, metrics

        trainer = Trainer(step_fn, loader, cli.trainer_config(opt),
                          evaluate_fn, save_fn if primary else None, logger,
                          device_put_fn=shard,
                          copy_tag_fn=lambda s, d: ckpt.copy_tag(save_dir, s, d))
        return trainer, state

    raise NotImplementedError(f"model [{opt.model}]")


def _spade_evaluators(opt, generate, teacher_generate=None, primary=True,
                      mesh=None):
    """FID (+mIoU) evaluators over the cityscapes val split for SPADE
    training/distillation (reference spade_model.evaluate_model:217-288,
    spade_distiller.py:96-172). Returns a combined evaluate_fn or None."""
    from cat_tpu.data.cityscapes import create_cityscapes_dataloader

    judge = cli.make_fid_judge(opt) if not opt.no_fid else None
    stats = _real_stats(opt.real_stat_path)
    want_miou = (
        opt.drn_path and os.path.exists(opt.drn_path)
        and os.path.exists(opt.table_path)
    )
    if not ((judge and stats) or want_miou):
        return None
    eval_loader = create_cityscapes_dataloader(
        opt.dataroot, opt.eval_batch_size, phase="val", shuffle=False,
        drop_last=False, load_size=opt.load_size, crop_size=opt.crop_size,
        aspect_ratio=opt.aspect_ratio, no_instance=opt.no_instance,
        pairing_check=not opt.no_pairing_check,
    )
    evs = []
    em = _eval_mesh(mesh)
    if judge and stats:
        evs.append(FIDEvaluator(
            generate, eval_loader, judge[0], judge[1], stats,
            opt.log_dir if primary else None,
            opt.eval_batch_size, input_key=None,
            teacher_generate=teacher_generate,
            mesh=em, process_shard=_eval_pshard(),
        ))
    if want_miou:
        from cat_tpu.metrics.drn import load_drnseg
        from cat_tpu.train.evaluation import MIoUEvaluator

        dm, dv = load_drnseg(opt.drn_path)
        miou = MIoUEvaluator(generate, eval_loader, dm, dv, opt.table_path,
                             data_dir=opt.cityscapes_path,
                             batch_size=opt.eval_batch_size,
                             mesh=em, process_shard=_eval_pshard())
        miou.input_key = None
        evs.append(miou)
    return combine_evaluators(**{"": evs})


def setup_train_spade(opt) -> Tuple[Trainer, Any]:
    """GauGAN teacher training (reference models/spade_model.py)."""
    from cat_tpu.core.spade_config import MultiscaleDiscriminatorConfig
    from cat_tpu.data.cityscapes import create_cityscapes_dataloader
    from cat_tpu.train.spade_model import SPADEHParams, SPADETask

    cli.set_seed(opt.seed)
    primary, pshard = _init_multihost(opt)
    logger = Logger(opt.log_dir, opt.tensorboard_dir, mute=not primary)
    save_dir = os.path.join(opt.log_dir, "checkpoints")
    gen_cfg = cli.spade_generator_config(opt, opt.ngf, opt.norm_G)
    d_cfg = MultiscaleDiscriminatorConfig(
        input_nc=gen_cfg.semantic_nc + gen_cfg.output_nc,
        ndf=opt.ndf, n_layers=opt.n_layers_D, num_D=opt.num_D, norm_D=opt.norm_D,
    )
    hp = SPADEHParams(
        gan_mode=opt.gan_mode, lambda_gan=opt.lambda_gan,
        lambda_feat=opt.lambda_feat, lambda_vgg=opt.lambda_vgg,
        no_TTUR=opt.no_TTUR,
        beta1=opt.beta1 if opt.no_TTUR else 0.0,
        beta2=opt.beta2 if opt.no_TTUR else 0.9,
        compute_dtype=opt.compute_dtype,
        vgg_compute_dtype=opt.vgg_compute_dtype,
        packed_blocks=_packed(opt, True),
        init_type=opt.init_type, init_gain=opt.init_gain,
        remat=bool(getattr(opt, "remat", 0)),
    )
    task = SPADETask(gen_cfg, d_cfg, hp, vgg_variables=cli.make_vgg(opt),
                     input_nc=opt.input_nc)
    task.contain_dontcare = opt.contain_dontcare_label
    h_lat = int(opt.crop_size / opt.aspect_ratio)
    state = task.init_state(jax.random.PRNGKey(opt.seed), h_lat, opt.crop_size)
    if opt.restore_G_path:
        gv = ckpt.load_pytree(opt.restore_G_path,
                              {"params": state.g.params, **state.g.stats})
        state = state.replace(g=state.g.replace(
            params=gv["params"],
            stats={k: v for k, v in gv.items() if k != "params"}))
        print(f"restored G from {opt.restore_G_path}")
    state = _maybe_restore_state(opt, state)
    # GSPMD data(-x-spatial) mesh — the reference GauGAN is its only
    # default-multi-GPU workload (--gpu_ids 0,1 + sync BN,
    # models/spade_model.py:96-106); batch-norm statistics become global
    # automatically under jit over the mesh (see ops/nn.py Norm2d)
    mesh = _mesh_or_none(opt)
    state, _, shard = _place(state, None, mesh)
    loader = create_cityscapes_dataloader(
        opt.dataroot, opt.batch_size, phase=opt.phase,
        load_size=opt.load_size, crop_size=opt.crop_size,
        aspect_ratio=opt.aspect_ratio, no_instance=opt.no_instance,
        pairing_check=not opt.no_pairing_check, max_size=opt.max_dataset_size,
        seed=opt.seed, process_shard=pshard,
    )
    task_state_box = [state]

    # FID + mIoU + best tracking during teacher training (reference
    # spade_model.evaluate_model:217-288 — was a round-1 gap)
    evaluate_fn = _spade_evaluators(
        opt,
        _eval_state_fn(task.generate_raw, lambda: task_state_box[0],
                       _eval_mesh(mesh)),
        primary=primary, mesh=mesh,
    )

    def save_fn(state, tag):
        state = jax.device_get(state)  # one batched fetch for all files
        ckpt.save_net(save_dir, tag, "G",
                      {"params": state.g.params, **state.g.stats}, gen_cfg)
        ckpt.save_net(save_dir, tag, "D",
                      {"params": state.d.params, **state.d.stats}, d_cfg)
        if getattr(opt, "save_full_state", 1):
            ckpt.save_train_state(save_dir, tag, state)
        else:
            ckpt.remove_stale(save_dir, tag, "state.msgpack")

    def step_fn(state, batch, lr):
        state, metrics = task.train_step(state, batch, lr)
        task_state_box[0] = state
        return state, metrics

    trainer = Trainer(step_fn, loader, cli.trainer_config(opt), evaluate_fn,
                      save_fn if primary else None, logger,
                      device_put_fn=shard,
                      copy_tag_fn=lambda s, d: ckpt.copy_tag(save_dir, s, d))
    return trainer, state


# ---------------------------------------------------------------------------
# distill verb
# ---------------------------------------------------------------------------


def shrink_preamble(opt, teacher_cfg, teacher_vars, logger) -> Tuple[Any, Optional[Dict], float]:
    """FLOPs-targeted pruning of the teacher into the student architecture.

    Returns (student_cfg, student_variables_or_None, pruning_seconds).
    Reference: trainer.py:105-123 + utils/common.py:315-707 — the pruned
    student is RE-initialised by default; --prune_init sliced keeps the
    surviving teacher weights; --prune_continue restores a checkpoint.
    """
    bounds = PruneBounds(
        cin_lb=max(opt.prune_cin_lb, 1),
        cin_ub=opt.prune_cin_ub if opt.prune_cin_ub > 0 else None,
        ft_cin_lb=max(opt.prune_ft_cin_lb, 1),
    )
    t0 = time.time()
    res = shrink_generator(
        teacher_cfg, teacher_vars, opt.target_flops,
        opt.crop_size, opt.crop_size, bounds,
    )
    dt = time.time() - t0
    logger.print_info(
        f"scale threshold: {res.threshold:.6g}, searched flops: "
        f"{res.searched_macs:,}, target flops: {opt.target_flops:g}, "
        f"flops diff: {res.searched_macs - opt.target_flops:g} "
        f"(pruning took {dt*1e3:.1f} ms)"
    )
    prof = profile_generator(res.config, opt.crop_size, opt.crop_size)
    logger.print_info(
        f"netG student FLOPs: {prof.macs:,}; down sampling: "
        f"{prof.sections['down_sampling']:,}; features: "
        f"{prof.sections['features']:,}; up sampling: {prof.sections['up_sampling']:,}."
    )
    student_vars = res.variables if opt.prune_init == "sliced" else None
    return res.config, student_vars, dt


def setup_distill(opt) -> Tuple[Optional[Trainer], Any]:
    if getattr(opt, "distiller", "inception") == "spade":
        return setup_distill_spade(opt)
    return setup_distill_inception(opt)


def load_spade_checkpoint(path: str, opt=None):
    """Load a SPADE generator checkpoint: native .msgpack (+ .json config)
    or a reference .pth (shape-driven architecture recovery)."""
    if path.endswith(".pth"):
        from cat_tpu.utils.spade_import import load_torch_spade_generator

        kwargs = {}
        if opt is not None:
            kwargs = dict(
                num_upsampling_layers=opt.num_upsampling_layers,
                crop_size=opt.crop_size,
                aspect_ratio=opt.aspect_ratio,
                param_free_norm=cli.parse_param_free_norm(opt.teacher_norm_G),
                spectral="spectral" in opt.teacher_norm_G,
            )
        return load_torch_spade_generator(path, **kwargs)
    import cat_tpu.core.spade_config  # noqa: F401 — registers the config type
    from cat_tpu.core.config import config_from_json
    from cat_tpu.utils.checkpoint import load_pytree

    variables = load_pytree(path)
    with open(path.replace(".msgpack", ".json")) as f:
        cfg = config_from_json(f.read())
    return cfg, variables


def setup_distill_spade(opt) -> Tuple[Optional[Trainer], Any]:
    """GauGAN distillation (reference distillers/spade_distiller.py)."""
    from cat_tpu.compress.spade import profile_spade_generator, shrink_spade_generator
    from cat_tpu.core.spade_config import MultiscaleDiscriminatorConfig
    from cat_tpu.data.cityscapes import create_cityscapes_dataloader
    from cat_tpu.distill.spade_distiller import SPADEDistillHParams, SPADEDistiller

    cli.set_seed(opt.seed)
    primary, pshard = _init_multihost(opt)
    logger = Logger(opt.log_dir, opt.tensorboard_dir, mute=not primary)
    save_dir = os.path.join(opt.log_dir, "checkpoints")

    teacher_cfg, teacher_vars = load_spade_checkpoint(opt.restore_teacher_G_path, opt)
    h_lat = int(opt.crop_size / opt.aspect_ratio)
    t_prof = profile_spade_generator(teacher_cfg, h_lat, opt.crop_size)
    logger.print_info(f"netG teacher FLOPs: {t_prof.macs:,}; params: {t_prof.params:,}")

    if opt.target_flops > 0:
        bounds = PruneBounds(
            cin_lb=max(opt.prune_cin_lb, 1),
            cin_ub=opt.prune_cin_ub if opt.prune_cin_ub > 0 else None,
        )
        t0 = time.time()
        res = shrink_spade_generator(
            teacher_cfg, teacher_vars, opt.target_flops, h_lat, opt.crop_size, bounds
        )
        logger.print_info(
            f"scale threshold: {res.threshold:.6g}, searched flops: "
            f"{res.searched_macs:,}, target flops: {opt.target_flops:g} "
            f"(pruning took {(time.time()-t0)*1e3:.1f} ms)"
        )
        student_cfg = res.config  # weights always re-init (reference semantics)
    else:
        student_cfg = cli.spade_generator_config(opt, opt.student_ngf, opt.student_norm_G)

    hp = SPADEDistillHParams(
        gan_mode=opt.gan_mode,
        distill_loss_type=opt.distill_G_loss_type,
        lambda_gan=opt.lambda_gan,
        lambda_distill=opt.lambda_distill,
        lambda_feat=opt.lambda_feat,
        lambda_vgg=opt.lambda_vgg,
        no_TTUR=opt.no_TTUR,
        beta1=opt.beta1 if opt.no_TTUR else 0.0,
        beta2=opt.beta2 if opt.no_TTUR else 0.9,
        compute_dtype=opt.compute_dtype,
        vgg_compute_dtype=opt.vgg_compute_dtype,
        packed_blocks=_packed(opt, True),
        init_type=opt.init_type,
        init_gain=opt.init_gain,
        remat=bool(getattr(opt, "remat", 0)),
        remat_policy=getattr(opt, "remat_policy", "") or "",
        ema_decay=_ema_decay(opt),
        teacher_compute_dtype=getattr(opt, "teacher_compute_dtype", "") or "",
    )
    # D follows the CLI flags exactly as on the teacher-training path —
    # otherwise --restore_D_path (teacher's D) can't load into the distiller
    # (reference builds D from the same opt, distillers/spade_distiller.py:72)
    d_cfg = MultiscaleDiscriminatorConfig(
        input_nc=teacher_cfg.semantic_nc + teacher_cfg.output_nc,
        ndf=opt.ndf, n_layers=opt.n_layers_D, num_D=opt.num_D, norm_D=opt.norm_D,
    )
    dist = SPADEDistiller(teacher_cfg, student_cfg, disc_cfg=d_cfg, hp=hp,
                          vgg_variables=cli.make_vgg(opt))
    dist.label_nc = opt.input_nc
    dist.contain_dontcare = opt.contain_dontcare_label
    # magnitude weight transfer from the wide pretrained generator into the
    # (possibly shrink-pruned) student — the reference gaugan student
    # recipes pass --restore_pretrained_G_path (train_inception_student_
    # 5p6B.sh:6, spade_distiller_modules.py:33-46); applied AFTER shrink so
    # it actually warm-starts the trained student (see compress/transfer.py
    # for the documented deviations from the reference's no-op branch loops)
    student_vars = None
    if getattr(opt, "restore_pretrained_G_path", None):
        from cat_tpu.compress.transfer import transfer_spade_generator_params

        p_cfg, p_vars = load_spade_checkpoint(opt.restore_pretrained_G_path, opt)
        student_vars = {
            "params": transfer_spade_generator_params(
                p_vars["params"], p_cfg, student_cfg
            )
        }
        logger.print_info("Pretrained weights transferred into the SPADE student.")
    state, teacher_vars = dist.init_state(
        jax.random.PRNGKey(opt.seed),
        int(opt.crop_size / opt.aspect_ratio), opt.crop_size, teacher_vars,
        student_vars,
    )
    mesh = _mesh_or_none(opt)
    if opt.restore_D_path:
        # teacher-D warm start, weights+spectral state, fresh optimizer
        # (reference gaugan student recipes pass --restore_D_path)
        d_vars = ckpt.load_pytree(opt.restore_D_path,
                                  {"params": state.d.params, **state.d.stats})
        state = state.replace(
            d=state.d.replace(
                params=d_vars["params"],
                stats={k: v for k, v in d_vars.items() if k != "params"},
            )
        )
        print(f"restored D from {opt.restore_D_path}")
    state = _maybe_restore_state(opt, state)
    # reference GauGAN distillation runs 2-GPU by default
    # (train_inception_student_5p6B.sh --gpu_ids 0,1) — data(-x-spatial)
    # GSPMD mesh; sync-BN statistics go global under jit automatically
    state, teacher_vars, shard = _place(state, teacher_vars, mesh)
    if primary:
        with open(os.path.join(opt.log_dir, "student_config.json"), "w") as f:
            f.write(config_to_json(student_cfg))
    if opt.prune_only:
        logger.print_info("prune_only: student architecture emitted; exiting.")
        return None, state

    loader = create_cityscapes_dataloader(
        opt.dataroot, opt.batch_size, phase=opt.phase,
        load_size=opt.load_size, crop_size=opt.crop_size,
        aspect_ratio=opt.aspect_ratio, no_instance=opt.no_instance,
        pairing_check=not opt.no_pairing_check, max_size=opt.max_dataset_size,
        load_in_memory=False, seed=opt.seed, process_shard=pshard,
    )

    task_state_box = [state]

    # evaluation: FID (+mIoU) of generated street photos from val labels
    evaluate_fn = _spade_evaluators(
        opt,
        _eval_state_fn(dist.generate_student_raw,
                       lambda: task_state_box[0], _eval_mesh(mesh)),
        teacher_generate=_eval_state_fn(
            dist.generate_teacher_raw, lambda: teacher_vars, _eval_mesh(mesh)),
        primary=primary, mesh=mesh,
    )

    def save_fn(state, tag):
        state = jax.device_get(state)  # one batched fetch for all files
        # net_G holds what evaluation/deployment uses (EMA weights when
        # --moving_average_decay is on), raw weights kept as net_G_raw
        eval_params = dist.student_eval_params(state)
        ckpt.save_net(save_dir, tag, "G",
                      {"params": eval_params, **state.g.stats}, student_cfg)
        if eval_params is not state.g.params["G"]:
            ckpt.save_net(save_dir, tag, "G_raw",
                          {"params": state.g.params["G"], **state.g.stats},
                          student_cfg)
        else:
            ckpt.remove_stale(save_dir, tag, "net_G_raw.msgpack")
            ckpt.remove_stale(save_dir, tag, "net_G_raw.json")
        if getattr(opt, "save_full_state", 1):
            ckpt.save_train_state(save_dir, tag, state)
        else:
            ckpt.remove_stale(save_dir, tag, "state.msgpack")

    def step_fn(state, batch, lr):
        state, metrics = dist.train_step(state, teacher_vars, batch, lr)
        task_state_box[0] = state
        return state, metrics

    trainer = Trainer(step_fn, loader, cli.trainer_config(opt), evaluate_fn,
                      save_fn if primary else None, logger,
                      device_put_fn=shard,
                      copy_tag_fn=lambda s, d: ckpt.copy_tag(save_dir, s, d))
    return trainer, state


def setup_distill_inception(opt) -> Tuple[Optional[Trainer], Any]:
    from cat_tpu.distill.inception_distiller import DistillHParams, InceptionDistiller

    cli.set_seed(opt.seed)
    primary, pshard = _init_multihost(opt)
    spec = cli.transform_spec(opt)
    loader = _make_train_loader(opt, spec, pshard)
    logger = Logger(opt.log_dir, opt.tensorboard_dir, mute=not primary)
    save_dir = os.path.join(opt.log_dir, "checkpoints")

    teacher_norm = cli.norm_config(opt, opt.norm_affine)
    teacher_cfg, teacher_vars = cli.load_generator_checkpoint(
        opt.restore_teacher_G_path, teacher_norm
    )
    t_prof = profile_generator(teacher_cfg, opt.crop_size, opt.crop_size)
    logger.print_info(f"netG teacher FLOPs: {t_prof.macs:,}; params: {t_prof.params:,}")

    # shrink -> student architecture
    if opt.target_flops > 0:
        student_cfg, student_vars, _ = shrink_preamble(
            opt, teacher_cfg, teacher_vars, logger
        )
    else:
        student_cfg = cli.generator_config(opt, opt.student_ngf)
        student_vars = None

    # magnitude weight transfer from a wide pretrained generator into the
    # student — INCLUDING a shrink-pruned student: the reference's shipped
    # student recipes pass --restore_pretrained_G_path together with
    # --target_flops and load_pretrained_weight always fires
    # (inception_distiller.py:194-200, train_inception_student_2p6B.sh);
    # --prune_init sliced takes precedence when set
    if opt.restore_pretrained_G_path and student_vars is None:
        from cat_tpu.compress.transfer import transfer_generator_params

        p_cfg, p_vars = cli.load_generator_checkpoint(
            opt.restore_pretrained_G_path, teacher_norm
        )
        student_vars = {
            "params": transfer_generator_params(p_vars["params"], p_cfg, student_cfg)
        }
        logger.print_info("Pretrained weights transferred into the student.")

    if opt.restore_student_G_path:  # prune_continue-style restore
        student_cfg2, student_vars = cli.load_generator_checkpoint(
            opt.restore_student_G_path, teacher_norm
        )
        student_cfg = student_cfg2

    # taps: encoder output + every third block (reference
    # base_inception_distiller.py:183-190 => features 2/5/8 for 9 blocks)
    mapping = ("encode",) + tuple(
        f"block{i}" for i in range(2, teacher_cfg.n_blocks, 3)
    )
    hp = DistillHParams(
        dataset_mode=opt.dataset_mode,
        gan_mode=opt.gan_mode,
        recon_loss_type=opt.recon_loss_type,
        distill_loss_type=opt.distill_G_loss_type,
        lambda_gan=opt.lambda_gan,
        lambda_recon=opt.lambda_recon,
        lambda_distill=opt.lambda_distill,
        beta1=opt.beta1,
        init_type=opt.init_type,
        init_gain=opt.init_gain,
        mapping_layers=mapping,
        compute_dtype=opt.compute_dtype,
        teacher_compute_dtype=getattr(opt, "teacher_compute_dtype", "") or "",
        fused_norms=opt.fused_norms,
        packed_blocks=_packed(opt, True),
        remat=bool(getattr(opt, "remat", 0)),
        ema_decay=_ema_decay(opt),
    )
    d_in = (teacher_cfg.input_nc + teacher_cfg.output_nc
            if opt.dataset_mode == "aligned" else teacher_cfg.output_nc)
    dist = InceptionDistiller(teacher_cfg, student_cfg,
                              disc_cfg=cli.discriminator_config(opt, d_in),
                              hp=hp)
    state, teacher_vars = dist.init_state(
        jax.random.PRNGKey(opt.seed), opt.crop_size, opt.crop_size,
        teacher_vars, student_vars,
    )
    if opt.restore_D_path:
        # warm-start the discriminator from a teacher-training checkpoint
        # (the reference's student recipes pass the teacher's best D —
        # train_inception_student_2p6B.sh --restore_D_path; weights only,
        # fresh optimizer, matching reference load_network semantics)
        d_vars = ckpt.load_pytree(opt.restore_D_path,
                                  {"params": state.d.params, **state.d.stats})
        state = state.replace(
            d=state.d.replace(
                params=d_vars["params"],
                stats={k: v for k, v in d_vars.items() if k != "params"},
            )
        )
        print(f"restored D from {opt.restore_D_path}")
    if opt.restore_A_path:
        av = ckpt.load_pytree(opt.restore_A_path,
                              {"params": state.g.params["A"]})
        g_params = dict(state.g.params)
        g_params["A"] = av["params"]
        state = state.replace(g=state.g.replace(params=g_params))
        print(f"restored adaptors from {opt.restore_A_path}")
    state = _maybe_restore_state(opt, state)
    mesh = _mesh_or_none(opt)
    state, teacher_vars, shard = _place(state, teacher_vars, mesh)
    if primary:
        with open(os.path.join(opt.log_dir, "student_config.json"), "w") as f:
            f.write(config_to_json(student_cfg))
    if opt.prune_only:
        logger.print_info("prune_only: student architecture emitted; exiting.")
        return None, state

    judge = cli.make_fid_judge(opt)
    stats = _real_stats(opt.real_stat_path)
    task_state_box = [state]
    evaluate_fn = None
    evs = []
    eval_loader = create_eval_dataloader(
        opt.dataset_mode, opt.dataroot, opt.eval_batch_size, spec, opt.direction
    )
    em = _eval_mesh(mesh)
    generate = _eval_state_fn(dist.generate_student,
                              lambda: task_state_box[0], em)
    if judge and stats:
        evs.append(FIDEvaluator(
            generate, eval_loader, judge[0], judge[1], stats,
            opt.log_dir if primary else None,
            opt.eval_batch_size,
            teacher_generate=_eval_state_fn(
                dist.generate_teacher, lambda: teacher_vars, em),
            mesh=em, process_shard=_eval_pshard(),
        ))
    miou_ev = make_miou_evaluator(opt, generate, eval_loader,
                                  mesh=em, process_shard=_eval_pshard())
    if miou_ev:
        evs.append(miou_ev)
    if evs:
        evaluate_fn = combine_evaluators(**{"": evs})

    def save_fn(state, tag):
        state = jax.device_get(state)  # one batched fetch for all files
        # net_G holds what evaluation/deployment uses: the EMA weights when
        # --moving_average_decay is on (so best-checkpoint tracking matches
        # the evaluated function), else the raw trained weights; the raw
        # weights are then kept alongside as net_G_raw
        eval_params = dist.student_eval_params(state)
        ckpt.save_net(save_dir, tag, "G",
                      {"params": eval_params, "batch_stats": state.g.stats},
                      student_cfg)
        if eval_params is not state.g.params["G"]:
            ckpt.save_net(save_dir, tag, "G_raw",
                          {"params": state.g.params["G"],
                           "batch_stats": state.g.stats},
                          student_cfg)
        else:
            ckpt.remove_stale(save_dir, tag, "net_G_raw.msgpack")
            ckpt.remove_stale(save_dir, tag, "net_G_raw.json")
        if getattr(opt, "save_full_state", 1):
            ckpt.save_train_state(save_dir, tag, state)
        else:
            ckpt.remove_stale(save_dir, tag, "state.msgpack")

    def step_fn(state, batch, lr):
        state, metrics = dist.train_step(state, teacher_vars, batch, lr)
        task_state_box[0] = state
        return state, metrics

    trainer = Trainer(step_fn, loader, cli.trainer_config(opt),
                      evaluate_fn, save_fn if primary else None, logger,
                      device_put_fn=shard,
                      copy_tag_fn=lambda s, d: ckpt.copy_tag(save_dir, s, d))
    return trainer, state


# ---------------------------------------------------------------------------
# profile verb (reference profiler.py:38-164)
# ---------------------------------------------------------------------------


def _profile_eval_sweep_inception(
    opt, logger, teacher_cfg, teacher_vars, student_cfg, student_vars
) -> Dict[str, float]:
    """Final full evaluation of the profile verb (reference
    profiler.py:154-164: ``evaluate(0, 0, save_image=True)``): sweep the val
    set, dump input/Sfake/Tfake images to <results_dir>/eval/latest/ (the
    KID script's input), and report FID (+mIoU on cityscapes BtoA)."""
    from cat_tpu.models.generator import InceptionGenerator
    from cat_tpu.train.common import apply_net

    judge = cli.make_fid_judge(opt) if not opt.no_fid else None
    stats = _real_stats(opt.real_stat_path)
    spec = cli.transform_spec(opt)
    eval_loader = create_eval_dataloader(
        opt.dataset_mode, opt.dataroot, opt.eval_batch_size, spec,
        opt.direction, max_size=opt.num_test,
    )
    s_model = InceptionGenerator(student_cfg)
    t_model = InceptionGenerator(teacher_cfg)
    gen_s = jax.jit(lambda x: apply_net(
        s_model, student_vars["params"], student_vars.get("batch_stats", {}),
        x, train=False)[0])
    gen_t = jax.jit(lambda x: apply_net(
        t_model, teacher_vars["params"], teacher_vars.get("batch_stats", {}),
        x, train=False)[0])

    results_dir = opt.results_dir or opt.log_dir
    metrics: Dict[str, float] = {}
    ev = FIDEvaluator(
        gen_s, eval_loader,
        judge[0] if judge else None, judge[1] if judge else None, stats,
        results_dir, opt.eval_batch_size, dump_images=10**9,
        teacher_generate=gen_t,
    )
    m, _ = ev("latest")
    metrics.update(m)
    if not opt.no_mIoU:
        miou_ev = make_miou_evaluator(opt, gen_s, eval_loader)
        if miou_ev:
            m, _ = miou_ev("latest")
            metrics.update(m)
    dump_dir = os.path.join(results_dir, "eval", "latest")
    logger.print_info(
        "evaluation: "
        + (", ".join(f"{k}: {v:.4f}" for k, v in metrics.items()) or "(no judges)")
        + f"; images dumped to {dump_dir}"
    )
    return metrics


def profile_distill(opt) -> Dict[str, Any]:
    """Prune-latency benchmark + MAC/param accounting + XLA cross-check +
    full evaluation sweep (reference profiler.py:38-164)."""
    import jax.numpy as jnp

    from cat_tpu.models.generator import InceptionGenerator

    if getattr(opt, "distiller", "inception") == "spade":
        return profile_distill_spade(opt)

    logger = Logger(opt.log_dir)
    teacher_norm = cli.norm_config(opt, opt.norm_affine)
    teacher_cfg, teacher_vars = cli.load_generator_checkpoint(
        opt.restore_teacher_G_path, teacher_norm
    )
    bounds = PruneBounds(
        cin_lb=max(opt.prune_cin_lb, 1),
        cin_ub=opt.prune_cin_ub if opt.prune_cin_ub > 0 else None,
        ft_cin_lb=max(opt.prune_ft_cin_lb, 1),
    )

    # 5 warmup + 10 timed shrink runs (reference profiler.py:139-149)
    for _ in range(5):
        shrink_generator(teacher_cfg, teacher_vars, opt.target_flops,
                         opt.crop_size, opt.crop_size, bounds)
    times = []
    for _ in range(10):
        t0 = time.time()
        res = shrink_generator(teacher_cfg, teacher_vars, opt.target_flops,
                               opt.crop_size, opt.crop_size, bounds)
        times.append(time.time() - t0)
    prune_mean = sum(times) / len(times)
    logger.print_info(f"mean pruning time over 10 runs: {prune_mean*1e3:.3f} ms")

    # student: shipped checkpoint if given, else the fresh shrink result
    if opt.pretrained_student_G_path:
        student_cfg, student_vars = cli.load_generator_checkpoint(
            opt.pretrained_student_G_path, teacher_norm
        )
    else:
        student_cfg, student_vars = res.config, res.variables

    prof = profile_generator(student_cfg, opt.crop_size, opt.crop_size)
    logger.print_info(
        f"student MACs: {prof.macs:,}; params: {prof.params:,} "
        f"(analytic, reference model_profiling formulas)"
    )

    # cross-check against XLA's own cost analysis (replaces the reference's
    # torchprofile cross-check, profiler.py:106-124)
    model = InceptionGenerator(student_cfg)
    x = jnp.zeros((1, opt.crop_size, opt.crop_size, student_cfg.input_nc))
    try:
        lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(student_vars, x)
        cost = lowered.compile().cost_analysis()
        xla_flops = cost.get("flops", float("nan")) if cost else float("nan")
        logger.print_info(
            f"XLA cost analysis: {xla_flops:,.0f} flops "
            f"(~{xla_flops / 2:,.0f} MACs) vs analytic {prof.macs:,} MACs"
        )
    except Exception as e:  # cost analysis is backend-dependent
        xla_flops = float("nan")
        logger.print_info(f"XLA cost analysis unavailable: {e}")

    # inference latency (reference TestOptions --times, test_options.py:108-111)
    from cat_tpu.train.common import to_device

    student_vars = to_device(student_vars)
    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x)))
    s = fwd(student_vars, x)
    float(s)  # sync
    reps = max(getattr(opt, "times", 10), 1)
    t0 = time.time()
    for _ in range(reps):
        s = fwd(student_vars, x)
    float(s)
    latency_ms = (time.time() - t0) / reps * 1e3
    logger.print_info(
        f"student forward latency: {latency_ms:.3f} ms/image (batch 1, {reps} reps)"
    )

    # final evaluation sweep with image dumps (reference profiler.py:154-164)
    metrics = _profile_eval_sweep_inception(
        opt, logger, teacher_cfg, teacher_vars, student_cfg, student_vars
    )

    return {
        "latency_ms": latency_ms,
        "pruning_seconds_mean": prune_mean,
        "student_macs": prof.macs,
        "student_params": prof.params,
        "xla_flops": xla_flops,
        "student_config": student_cfg,
        "student_variables": student_vars,
        "teacher_cfg": teacher_cfg,
        "metrics": metrics,
    }


def profile_distill_spade(opt) -> Dict[str, Any]:
    """SPADE/GauGAN profile verb: shrink-latency benchmark, MAC/param
    accounting, forward latency, and a full FID(+mIoU) evaluation sweep with
    image dumps (reference profiler.py handles the spade distiller through
    the same driver; load_pretrained_spade_student at profiler.py:83-89)."""
    import jax.numpy as jnp

    from cat_tpu.compress.spade import profile_spade_generator, shrink_spade_generator
    from cat_tpu.data.cityscapes import create_cityscapes_dataloader
    from cat_tpu.distill.spade_distiller import SPADEDistillHParams, SPADEDistiller

    logger = Logger(opt.log_dir)
    teacher_cfg, teacher_vars = load_spade_checkpoint(opt.restore_teacher_G_path, opt)
    h_lat = int(opt.crop_size / opt.aspect_ratio)
    t_prof = profile_spade_generator(teacher_cfg, h_lat, opt.crop_size)
    logger.print_info(f"netG teacher FLOPs: {t_prof.macs:,}; params: {t_prof.params:,}")

    prune_mean = float("nan")
    res = None
    if opt.target_flops > 0:
        bounds = PruneBounds(
            cin_lb=max(opt.prune_cin_lb, 1),
            cin_ub=opt.prune_cin_ub if opt.prune_cin_ub > 0 else None,
        )
        for _ in range(5):  # warmup + 10 timed runs (reference profiler.py:139-149)
            shrink_spade_generator(teacher_cfg, teacher_vars, opt.target_flops,
                                   h_lat, opt.crop_size, bounds)
        times = []
        for _ in range(10):
            t0 = time.time()
            res = shrink_spade_generator(teacher_cfg, teacher_vars,
                                         opt.target_flops, h_lat,
                                         opt.crop_size, bounds)
            times.append(time.time() - t0)
        prune_mean = sum(times) / len(times)
        logger.print_info(f"mean pruning time over 10 runs: {prune_mean*1e3:.3f} ms")

    if opt.pretrained_student_G_path:
        student_cfg, student_vars = load_spade_checkpoint(
            opt.pretrained_student_G_path, opt
        )
    elif res is not None:
        student_cfg, student_vars = res.config, None
    else:
        raise SystemExit(
            "profile (spade): need --pretrained_student_G_path or --target_flops"
        )

    s_prof = profile_spade_generator(student_cfg, h_lat, opt.crop_size)
    logger.print_info(f"netG student FLOPs: {s_prof.macs:,}; params: {s_prof.params:,}")

    hp = SPADEDistillHParams(
        gan_mode=opt.gan_mode, distill_loss_type=opt.distill_G_loss_type,
        lambda_vgg=0.0,  # no VGG needed for evaluation
    )
    dist = SPADEDistiller(teacher_cfg, student_cfg, hp=hp)
    dist.label_nc = opt.input_nc
    dist.contain_dontcare = opt.contain_dontcare_label
    state, teacher_vars = dist.init_state(
        jax.random.PRNGKey(opt.seed), h_lat, opt.crop_size, teacher_vars
    )
    if student_vars is not None:  # swap the loaded student into the state
        from cat_tpu.train.common import to_device

        student_vars = to_device(student_vars)
        g_params = dict(state.g.params)
        g_params["G"] = student_vars["params"]
        g_stats = {k: v for k, v in student_vars.items() if k != "params"}
        state = state.replace(g=state.g.replace(params=g_params, stats=g_stats))

    # forward latency on a synthetic semantic map
    sem = jnp.zeros((1, h_lat, opt.crop_size, student_cfg.semantic_nc), jnp.float32)
    lat = jax.jit(lambda s: jnp.sum(dist.generate_student(state, s)))
    float(lat(sem))
    reps = max(getattr(opt, "times", 10), 1)
    t0 = time.time()
    for _ in range(reps):
        s = lat(sem)
    float(s)
    latency_ms = (time.time() - t0) / reps * 1e3
    logger.print_info(
        f"student forward latency: {latency_ms:.3f} ms/image (batch 1, {reps} reps)"
    )

    # evaluation sweep with image dumps
    judge = cli.make_fid_judge(opt) if not opt.no_fid else None
    stats = _real_stats(opt.real_stat_path)
    eval_loader = create_cityscapes_dataloader(
        opt.dataroot, opt.eval_batch_size, phase="val", shuffle=False,
        drop_last=False, load_size=opt.load_size, crop_size=opt.crop_size,
        aspect_ratio=opt.aspect_ratio, no_instance=opt.no_instance,
        pairing_check=not opt.no_pairing_check, max_size=opt.num_test,
    )
    results_dir = opt.results_dir or opt.log_dir
    ev = FIDEvaluator(
        lambda b: dist.generate_student_raw(state, b), eval_loader,
        judge[0] if judge else None, judge[1] if judge else None, stats,
        results_dir, opt.eval_batch_size, dump_images=10**9,
        teacher_generate=lambda b: dist.generate_teacher_raw(teacher_vars, b),
        input_key=None,
    )
    metrics, _ = ev("latest")
    if not opt.no_mIoU and opt.drn_path and os.path.exists(opt.drn_path) \
            and os.path.exists(opt.table_path):
        from cat_tpu.metrics.drn import load_drnseg
        from cat_tpu.train.evaluation import MIoUEvaluator

        dm, dv = load_drnseg(opt.drn_path)
        miou = MIoUEvaluator(
            lambda b: dist.generate_student_raw(state, b), eval_loader, dm, dv,
            opt.table_path, batch_size=opt.eval_batch_size,
        )
        miou.input_key = None
        m, _ = miou("latest")
        metrics.update(m)
    dump_dir = os.path.join(results_dir, "eval", "latest")
    logger.print_info(
        "evaluation: "
        + (", ".join(f"{k}: {v:.4f}" for k, v in metrics.items()) or "(no judges)")
        + f"; images dumped to {dump_dir}"
    )
    return {
        "latency_ms": latency_ms,
        "pruning_seconds_mean": prune_mean,
        "student_macs": s_prof.macs,
        "student_params": s_prof.params,
        "student_config": student_cfg,
        "metrics": metrics,
    }


def profile_main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    cli.base_arguments(parser)
    cli.distill_arguments(parser)
    cli.test_arguments(parser)
    opt = parser.parse_args(argv)
    cli.print_options(opt, parser)
    profile_distill(opt)


def export_main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    cli.base_arguments(parser)
    cli.distill_arguments(parser)
    parser.add_argument("--export_path", type=str, default=None,
                        help="output path (.stablehlo / .tflite)")
    parser.add_argument("--export_format", type=str, default="stablehlo",
                        choices=["stablehlo", "tflite"])
    opt = parser.parse_args(argv)
    cli.print_options(opt, parser)

    from cat_tpu.export import export_stablehlo, export_tflite

    if getattr(opt, "distiller", "inception") == "spade":
        # GauGAN student export (reference onnx_exporter.py is
        # generator-agnostic; scripts/gaugan/cityscapes/onnx_export_*.sh)
        import jax.numpy as jnp

        if opt.pretrained_student_G_path:
            student_cfg, student_vars = load_spade_checkpoint(
                opt.pretrained_student_G_path, opt
            )
        else:
            from cat_tpu.compress.spade import shrink_spade_generator
            from cat_tpu.models.spade import SPADEGenerator

            teacher_cfg, teacher_vars = load_spade_checkpoint(
                opt.restore_teacher_G_path, opt
            )
            h_lat = int(opt.crop_size / opt.aspect_ratio)
            res = shrink_spade_generator(
                teacher_cfg, teacher_vars, opt.target_flops, h_lat,
                opt.crop_size, PruneBounds(cin_lb=max(opt.prune_cin_lb, 1)),
            )
            student_cfg = res.config
            # SPADE shrink is architecture-only (weights re-init) —
            # initialise fresh parameters for the artifact
            model = SPADEGenerator(student_cfg)
            student_vars = model.init(
                jax.random.PRNGKey(opt.seed),
                jnp.zeros((1, h_lat, opt.crop_size, student_cfg.semantic_nc)),
            )
    else:
        teacher_norm = cli.norm_config(opt, opt.norm_affine)
        if opt.pretrained_student_G_path:
            student_cfg, student_vars = cli.load_generator_checkpoint(
                opt.pretrained_student_G_path, teacher_norm
            )
        else:
            teacher_cfg, teacher_vars = cli.load_generator_checkpoint(
                opt.restore_teacher_G_path, teacher_norm
            )
            res = shrink_generator(
                teacher_cfg, teacher_vars, opt.target_flops,
                opt.crop_size, opt.crop_size,
                PruneBounds(cin_lb=max(opt.prune_cin_lb, 1)),
            )
            student_cfg, student_vars = res.config, res.variables

    path = opt.export_path or os.path.join(
        opt.log_dir, f"student.{opt.export_format}"
    )
    if opt.export_format == "stablehlo":
        out = export_stablehlo(student_cfg, student_vars, opt.crop_size,
                               opt.crop_size, path)
    else:
        out = export_tflite(student_cfg, student_vars, opt.crop_size,
                            opt.crop_size, path)
    print(f"exported student to {out}")


def real_stat_main(argv=None):
    """Cache {mu, sigma} Inception statistics of a real-image set
    (reference get_real_stat.py:24-48)."""
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    cli.base_arguments(parser)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--batch_size_stat", type=int, default=32)
    opt = parser.parse_args(argv)

    judge = cli.make_fid_judge(opt)
    if judge is None:
        raise SystemExit("inception weights are required for real stats")
    from cat_tpu.metrics.fid import compute_real_stats

    spec = cli.transform_spec(opt)
    loader = create_dataloader(
        "single", opt.dataroot, opt.batch_size_stat, spec,
        phase=opt.phase, serial_batches=True, drop_last=False,
    )
    images = np.concatenate([b["A"] for b in loader], axis=0)
    stats = compute_real_stats(images, judge[0], judge[1], opt.batch_size_stat)
    os.makedirs(os.path.dirname(opt.output_path) or ".", exist_ok=True)
    np.savez(opt.output_path, mu=stats["mu"], sigma=stats["sigma"])
    print(f"saved real statistics ({images.shape[0]} images) to {opt.output_path}")


# ---------------------------------------------------------------------------
# entry mains
# ---------------------------------------------------------------------------


def train_main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    cli.base_arguments(parser)
    cli.train_arguments(parser)
    cli.spade_arguments(parser)
    opt = parser.parse_args(argv)
    if opt.model == "cycle_gan":  # reference per-model defaults
        for k, v in dict(norm="instance", dataset_mode="unaligned",
                         gan_mode="lsgan", ndf=64).items():
            if getattr(opt, k) == parser.get_default(k):
                setattr(opt, k, v)
    elif opt.model == "spade":
        # reference spade_model.py:82-92 set_defaults + the multiscale D's
        # modify_commandline_options (discriminators.py:200 → n_layers_D=4)
        for k, v in dict(netD="multi_scale", ndf=64, n_layers_D=4,
                         dataset_mode="cityscapes", batch_size=16,
                         print_freq=50, save_epoch_freq=10,
                         nepochs=100, nepochs_decay=100,
                         init_type="xavier", active_fn="nn.LeakyReLU").items():
            if getattr(opt, k) == parser.get_default(k):
                setattr(opt, k, v)
    primary, _ = _init_multihost(opt)  # before any opt.txt write
    cli.print_options(opt, parser, write=primary)
    trainer, state = setup_train(opt)
    trainer.fit(state)


def distill_main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    cli.base_arguments(parser)
    cli.distill_arguments(parser)
    opt = parser.parse_args(argv)
    if opt.distiller == "spade":
        # reference spade_distiller.py:72-82 set_defaults + multiscale D's
        # n_layers_D=4 (discriminators.py:200).  ndf=64 is not in the
        # reference's distill set_defaults, but its shipped gaugan recipes
        # restore the teacher's D (trained at the spade-train default
        # ndf=64, spade_model.py:83) — the recipe is only loadable at 64.
        for k, v in dict(netD="multi_scale", ndf=64, n_layers_D=4,
                         dataset_mode="cityscapes", batch_size=16,
                         print_freq=50, save_epoch_freq=10,
                         nepochs=100, nepochs_decay=100,
                         init_type="xavier").items():
            if getattr(opt, k) == parser.get_default(k):
                setattr(opt, k, v)
    primary, _ = _init_multihost(opt)  # before any opt.txt write
    cli.print_options(opt, parser, write=primary)
    trainer, state = setup_distill(opt)
    if trainer is not None:
        trainer.fit(state)
