"""Train a reduced-depth DRNSeg judge on the procedural cityscapes task.

The reference evaluates cityscapes flows with a *trained* DRN-D-105 mIoU
judge (metric/mIoU_score.py:209-247, weights drn-d-105_ms_cityscapes.pth).
This environment has zero egress, so those weights cannot be fetched — but
a random-weight judge would make mIoU trajectories meaningless.  This tool
closes the gap the same way the quality loops' random-projection FID does:
it trains a reduced DRNSeg (same architecture family, smaller spec) on the
photos->trainIds task of tools/make_synth_cityscapes.py until it segments
REAL synthetic photos well, then saves it natively
(cat_tpu.metrics.drn.save_drnseg: .msgpack + .json spec) for
make_miou_evaluator / --drn_path to load.  mIoU of a generator's fakes
under this judge then tracks how recognisable the generated semantics are
— the same signal the reference's flows read.

Usage:
  python tools/train_synth_drn.py --data /path/to/synth_cityscapes \
      --out /path/drn_synth.msgpack [--classes 8] [--steps 400]

Prints the judge's own held-out mIoU on real val photos at the end (the
"judge quality" headroom number for QUALITY.md).
"""

import argparse
import glob
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from cat_tpu.metrics.drn import DRNSeg, save_drnseg
from cat_tpu.metrics.miou import (
    CITYSCAPES_MEAN,
    CITYSCAPES_STD,
    fast_hist,
    mean_iou,
)

# reduced spec: same DRN-D family (dilated bottleneck stages, stride 8),
# ~1/40th the D-105 compute — enough capacity for the synthetic task
SYNTH_LAYERS = (1, 1, 2, 2, 2, 1, 1, 1)
SYNTH_CHANNELS = (16, 32, 32, 64, 64, 128, 128, 128)


def _load_split(root, phase):
    labs = sorted(glob.glob(os.path.join(
        root, "gtFine", phase, "*", "*_gtFine_labelIds.png")))
    photos, labels = [], []
    for lp in labs:
        pp = os.path.join(
            root, "leftImg8bit", phase, os.path.basename(os.path.dirname(lp)),
            os.path.basename(lp).replace("_gtFine_labelIds.png",
                                         "_leftImg8bit.png"))
        photos.append(np.asarray(Image.open(pp), np.float32) / 255.0)
        labels.append(np.asarray(Image.open(lp), np.int32))
    return np.stack(photos), np.stack(labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="synthetic cityscapes root")
    ap.add_argument("--out", required=True, help=".msgpack output path")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    t0 = time.time()
    photos, labels = _load_split(args.data, "train")
    vp, vl = _load_split(args.data, "val")
    n, h, w, _ = photos.shape
    print(f"train {n} scenes {h}x{w}, val {vp.shape[0]} "
          f"(+{time.time() - t0:.1f}s)")

    model = DRNSeg(classes=args.classes, layers=SYNTH_LAYERS,
                   channels=SYNTH_CHANNELS)
    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(rng, jnp.zeros((1, h, w, 3)), upsample=False)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    norm_mean = jnp.asarray(CITYSCAPES_MEAN, jnp.float32)
    norm_std = jnp.asarray(CITYSCAPES_STD, jnp.float32)

    @jax.jit
    def step(params, opt_state, x01, y):
        def loss_fn(p):
            x = (x01 - norm_mean) / norm_std
            # train on the stride-8 logits against 8x-subsampled labels:
            # 64x cheaper than full-res CE, same optimum for blocky scenes
            logits = model.apply({"params": p}, x, upsample=False)
            y8 = y[:, 4::8, 4::8]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y8)
            return ce.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params = variables["params"]
    rs = np.random.RandomState(args.seed)
    for s in range(args.steps):
        idx = rs.randint(0, n, args.batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(photos[idx]),
            jnp.asarray(labels[idx]))
        if s % 50 == 0 or s == args.steps - 1:
            print(f"step {s}: CE {float(loss):.4f} (+{time.time() - t0:.1f}s)")

    # held-out judge quality: mIoU of the judge's own predictions on REAL
    # val photos — the ceiling any generator can be scored against
    @jax.jit
    def infer(x01):
        x = (x01 - norm_mean) / norm_std
        return jnp.argmax(model.apply({"params": params}, x), axis=-1)

    hist = np.zeros((args.classes, args.classes), np.int64)
    for i in range(0, vp.shape[0], args.batch):
        pred = np.asarray(infer(jnp.asarray(vp[i:i + args.batch])))
        for j in range(pred.shape[0]):
            hist += fast_hist(pred[j].ravel(), vl[i + j].ravel(), args.classes)
    judge_miou = mean_iou(hist)
    print(f"judge held-out mIoU on real val photos: {judge_miou:.2f}")

    path = save_drnseg(args.out, model, {"params": jax.device_get(params)})
    print(f"saved synthetic DRN judge to {path} "
          f"(classes {args.classes}, layers {SYNTH_LAYERS}, "
          f"channels {SYNTH_CHANNELS}; +{time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
