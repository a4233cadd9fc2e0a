"""Evaluators: FID (and mIoU) sweeps with best-checkpoint tracking.

Reference: pix2pix_model.evaluate_model:209-281, cycle_gan_model:310-365,
inception_distiller:204-281 — sweep the eval loader, dump sample images,
compute FID vs cached real statistics, track best / rolling mean-of-3.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from cat_tpu.metrics.fid import get_fid
from cat_tpu.utils.image import save_image, tensor2im


def write_eval_index(save_dir: str, title: str = "") -> Optional[str]:
    """index.html gallery over an eval dump directory's category subdirs
    (input/Sfake/Tfake/fake/real) — the reference's utils/html.py use-case,
    one table row per sample with the categories side by side."""
    from cat_tpu.utils.html import HTML

    cats = [c for c in ("input", "Sfake", "Tfake", "fake", "real")
            if os.path.isdir(os.path.join(save_dir, c))]
    if not cats:
        return None
    page = HTML(save_dir, title or os.path.basename(save_dir), img_prefix="")
    page.add_header(title or save_dir)
    names = sorted(set().union(
        *(os.listdir(os.path.join(save_dir, c)) for c in cats)
    ))
    for name in names:
        row = [c for c in cats
               if os.path.exists(os.path.join(save_dir, c, name))]
        rel = [os.path.join(c, name) for c in row]
        page.add_images(rel, [f"{c}/{name}" for c in row], rel, width=256)
    return page.save()


def shard_eval_input(inp, mesh):
    """Pad + batch-shard an evaluator's generate input over the data mesh.

    Accepts a bare NHWC array or a batch dict (arrays are sharded, path
    lists pass through untouched).  Returns ``(sharded_inp, real_n)``; the
    caller slices the generated output back to ``real_n``.
    """
    from cat_tpu.parallel.mesh import shard_eval_array

    if isinstance(inp, dict):
        n = None
        out = {}
        for k, v in inp.items():
            if isinstance(v, np.ndarray):
                out[k], n = shard_eval_array(v, mesh)
            else:
                out[k] = v
        return out, n
    arr, n = shard_eval_array(np.asarray(inp), mesh)
    return arr, n


class MetricTracker:
    """best + rolling last-3 mean (reference keeps self.fids/self.mIoUs)."""

    def __init__(self, larger_is_better: bool = False):
        self.best = -1e9 if larger_is_better else 1e9
        self.larger = larger_is_better
        self.history = []

    def update(self, value: float) -> bool:
        self.history.append(value)
        if len(self.history) > 3:
            self.history.pop(0)
        improved = value > self.best if self.larger else value < self.best
        if improved:
            self.best = value
        return improved

    @property
    def mean(self) -> float:
        return sum(self.history) / len(self.history)


class FIDEvaluator:
    """Generator sweep + FID vs cached stats; optionally dumps images.

    ``generate`` maps a [-1,1] NHWC input batch to generated images.
    ``inception_model``/``real_stats`` may be None: the sweep still runs and
    dumps input/Sfake/Tfake(/real) images — the reference profile verb's
    save_image=True contract (profiler.py:154-164) holds even when the FID
    judge weights are unavailable — and the FID metric is simply omitted.
    """

    def __init__(
        self,
        generate: Callable[[np.ndarray], np.ndarray],
        eval_loader,
        inception_model,
        inception_variables,
        real_stats: Optional[Dict[str, np.ndarray]],
        log_dir: Optional[str] = None,
        eval_batch_size: int = 32,
        name: str = "fid",
        dump_images: int = 10,
        teacher_generate: Optional[Callable] = None,
        input_key: str = "A",
        mesh=None,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        """``input_key``: batch key fed to ``generate``; None passes the whole
        batch dict (SPADE label+instance inputs).

        ``mesh``: shard the eval sweep over the data mesh (SURVEY §5.8) —
        generator inputs are padded to the data-axis size and batch-sharded
        (GSPMD partitions the forward; the params are already replicated on
        the mesh), and the InceptionV3 judge runs sharded the same way.
        The Fréchet reduction stays host-side.

        ``process_shard=(index, count)``: multi-host eval sharding — this
        process takes every count-th val batch (round-robin), ``mesh``
        should be the process-LOCAL mesh (parallel.multihost.local_mesh),
        and the Fréchet moments merge across hosts via
        multihost.reduce_moments (a collective: every process calls the
        evaluator in lockstep, as the Trainer's eval cadence guarantees).
        """
        self.input_key = input_key
        self.mesh = mesh
        self.process_shard = process_shard
        self.generate = generate
        self.eval_loader = eval_loader
        self.inception_model = inception_model
        self.inception_variables = inception_variables
        self.real_stats = real_stats
        self.log_dir = log_dir
        self.eval_batch_size = eval_batch_size
        self.name = name
        self.dump_images = dump_images
        self.teacher_generate = teacher_generate
        self.tracker = MetricTracker(larger_is_better=False)

    def __call__(self, step: int) -> Tuple[Dict[str, float], Dict[str, bool]]:
        fakes = []
        dumped = 0
        save_dir = (
            os.path.join(self.log_dir, "eval", str(step)) if self.log_dir else None
        )
        for bi, batch in enumerate(self.eval_loader):
            if self.process_shard is not None \
                    and bi % self.process_shard[1] != self.process_shard[0]:
                continue
            inp = batch[self.input_key] if self.input_key else batch
            if self.mesh is not None:
                sharded, real_n = shard_eval_input(inp, self.mesh)
                fake = np.asarray(self.generate(sharded))[:real_n]
            else:
                sharded, real_n = inp, None
                fake = np.asarray(self.generate(inp))
            fakes.append(fake)
            if save_dir and dumped < self.dump_images:
                tfake = (
                    np.asarray(self.teacher_generate(sharded))[
                        : real_n if real_n is not None else None]
                    if self.teacher_generate
                    else None
                )
                paths = batch.get("A_paths") or batch.get("path") or [
                    str(i) for i in range(len(fake))
                ]
                for j in range(len(fake)):
                    if dumped >= self.dump_images:
                        break
                    base = os.path.splitext(os.path.basename(paths[j]))[0]
                    if self.input_key:
                        save_image(tensor2im(batch[self.input_key][j]),
                                   os.path.join(save_dir, "input", f"{base}.png"))
                    elif "label" in batch:
                        from cat_tpu.utils.image import tensor2label

                        save_image(tensor2label(batch["label"][j]),
                                   os.path.join(save_dir, "input", f"{base}.png"))
                    save_image(tensor2im(fake[j]), os.path.join(save_dir, "Sfake" if tfake is not None else "fake", f"{base}.png"))
                    if tfake is not None:
                        save_image(tensor2im(tfake[j]), os.path.join(save_dir, "Tfake", f"{base}.png"))
                    if self.input_key and "B" in batch:
                        # aligned ground truth (reference dumps 'real' PNGs,
                        # inception_distiller.py:238-243)
                        save_image(tensor2im(batch["B"][j]),
                                   os.path.join(save_dir, "real", f"{base}.png"))
                    dumped += 1
        if save_dir and dumped:
            write_eval_index(save_dir, f"{self.name} eval @ step {step}")
        if self.inception_model is None or self.real_stats is None:
            return {}, {}
        moments_reduce = None
        if self.process_shard is not None and self.process_shard[1] > 1:
            from cat_tpu.parallel.multihost import reduce_moments

            moments_reduce = reduce_moments
        fakes = (np.concatenate(fakes, axis=0) if fakes
                 else np.zeros((0, 1, 1, 3), np.float32))
        fid = get_fid(
            fakes,
            self.inception_model,
            self.inception_variables,
            self.real_stats,
            batch_size=self.eval_batch_size,
            mesh=self.mesh,
            moments_reduce=moments_reduce,
        )
        improved = self.tracker.update(fid)
        metrics = {
            f"metric/{self.name}": fid,
            f"metric/{self.name}-mean": self.tracker.mean,
            f"metric/{self.name}-best": self.tracker.best,
        }
        return metrics, {"is_best": improved}


class MIoUEvaluator:
    """Cityscapes mIoU of generated street photos (reference
    metric/mIoU_score.py:209-247 + SegList table pairing :66-108).

    ``table_path`` rows are "<name> <label_path> <photo_path>"; labels are
    trainId maps at the judge resolution.
    """

    def __init__(
        self,
        generate: Callable[[np.ndarray], np.ndarray],
        eval_loader,
        drn_model,
        drn_variables,
        table_path: str,
        data_dir: str = "",
        batch_size: int = 2,
        name: str = "mIoU",
        mesh=None,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.mesh = mesh
        self.process_shard = process_shard
        self.generate = generate
        self.eval_loader = eval_loader
        self.drn_model = drn_model
        self.drn_variables = drn_variables
        self.batch_size = batch_size
        self.name = name
        self.data_dir = data_dir
        self.input_key: Optional[str] = "A"  # None = pass the whole batch
        self.tracker = MetricTracker(larger_is_better=True)
        self.table = []
        with open(table_path) as f:
            for line in f:
                parts = line.strip().split(" ")
                if len(parts) >= 3:
                    self.table.append(parts)

    def _label_for(self, sample_name: str) -> Optional[str]:
        for item in self.table:
            if item[0] == sample_name or item[2][: -len(".png")].endswith(sample_name):
                return os.path.join(self.data_dir, item[1])
        return None

    def __call__(self, step: int) -> Tuple[Dict[str, float], Dict[str, bool]]:
        from PIL import Image

        from cat_tpu.metrics.drn import get_miou

        fakes, labels = [], []
        for bi, batch in enumerate(self.eval_loader):
            if self.process_shard is not None \
                    and bi % self.process_shard[1] != self.process_shard[0]:
                continue
            inp = batch[self.input_key] if self.input_key else batch
            if self.mesh is not None:
                sharded, real_n = shard_eval_input(inp, self.mesh)
                fake = np.asarray(self.generate(sharded))[:real_n]
            else:
                fake = np.asarray(self.generate(inp))
            paths = batch.get("A_paths") or batch.get("path") or []
            for j in range(fake.shape[0]):
                name = os.path.splitext(os.path.basename(paths[j]))[0]
                label_path = self._label_for(name)
                if label_path is None or not os.path.exists(label_path):
                    continue
                fakes.append(fake[j])
                labels.append(np.asarray(Image.open(label_path)))
        hist_reduce = None
        if self.process_shard is not None and self.process_shard[1] > 1:
            from cat_tpu.parallel.multihost import reduce_hist

            hist_reduce = reduce_hist
        if not fakes:
            if hist_reduce is not None:
                # collective discipline: an empty batch share still joins
                # the cross-process histogram merge
                from cat_tpu.metrics.miou import mean_iou

                n = self.drn_model.classes
                hist = hist_reduce(np.zeros((n, n), np.int64))
                miou = round(mean_iou(hist), 2)
                improved = self.tracker.update(miou)
                return (
                    {f"metric/{self.name}": miou,
                     f"metric/{self.name}-mean": self.tracker.mean,
                     f"metric/{self.name}-best": self.tracker.best},
                    {"is_best": improved},
                )
            return {}, {}
        miou = get_miou(
            np.stack(fakes), labels, self.drn_model, self.drn_variables,
            batch_size=self.batch_size,
            target_hw=labels[0].shape[:2],
            mesh=self.mesh,
            hist_reduce=hist_reduce,
        )
        improved = self.tracker.update(miou)
        metrics = {
            f"metric/{self.name}": miou,
            f"metric/{self.name}-mean": self.tracker.mean,
            f"metric/{self.name}-best": self.tracker.best,
        }
        return metrics, {"is_best": improved}


def combine_evaluators(**named) -> Callable:
    """Merge evaluators (e.g. CycleGAN's two directions -> is_best_A/B).
    A value may be a list of evaluators sharing one flag (e.g. FID + mIoU
    both tracking is_best, as in the reference's cityscapes eval)."""

    def evaluate(state, step):
        metrics: Dict[str, float] = {}
        flags: Dict[str, bool] = {}
        for suffix, evs in named.items():
            if not isinstance(evs, (list, tuple)):
                evs = [evs]
            for ev in evs:
                m, f = ev(step)
                metrics.update(m)
                if f.get("is_best"):
                    flags[f"is_best_{suffix}" if suffix else "is_best"] = True
        return metrics, flags

    return evaluate
