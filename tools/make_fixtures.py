#!/usr/bin/env python
"""Rebuild the numerical-parity fixtures in tests/fixtures/ from the
reference implementation, and synthesize judge-layout weight files.

Usage:
  python tools/make_fixtures.py parity [--reference /root/reference]
      Regenerates tests/fixtures/{torch_gen,torch_spade,drn}_fixture.npz by
      instantiating the REFERENCE torch models (imported from the reference
      tree — nothing is copied into this repo), randomizing their weights
      with a fixed seed, and capturing (state_dict, input, output).  Also
      refreshes tests/fixtures/HASHES.json.

  python tools/make_fixtures.py judges --out DIR
      Writes random-weight torch checkpoints with the exact key layout of
      the real judge weights (pt_inception-2015-12-05.pth, vgg19.pth) so
      the full FID/VGG plumbing can be exercised end-to-end without
      network access.  These are NOT the real judges — metric numbers from
      them are meaningless; they validate shapes, conversion, and wiring.

The parity fixtures are self-consistent: any healthy random weights work,
because the tests assert our JAX reimplementation reproduces the captured
reference output through the converted weights.
"""

import argparse
import hashlib
import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO_ROOT)  # script may run as `python tools/make_fixtures.py`
FIXDIR = os.path.join(REPO_ROOT, "tests", "fixtures")


def _randomize(model, torch, seed, conv_scale=0.05):
    """Healthy random weights: perturb every parameter/buffer in-place.

    conv_scale keeps activations tame so fp32 accumulation-order noise
    stays within the parity tests' tolerances."""
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        p.data = torch.randn(p.shape, generator=g) * conv_scale
    for name, b in model.named_buffers():
        if b.dtype.is_floating_point:
            if "running_var" in name:
                b.data = 0.5 + torch.rand(b.shape, generator=g)
            else:
                b.data = torch.randn(b.shape, generator=g) * 0.1
    # norm affine scales around 1 so activations stay in range
    for name, m in model.named_modules():
        if hasattr(m, "weight") and m.weight is not None and m.weight.ndim == 1:
            m.weight.data = 1.0 + torch.randn(m.weight.shape, generator=g) * 0.1
    return model


def _save(path, sd, **extras):
    arrays = {f"sd/{k}": v.detach().numpy() for k, v in sd.items()}
    arrays.update(extras)
    np.savez(path, **arrays)
    print(f"wrote {path} ({len(sd)} tensors)")


def make_parity_fixtures(reference: str):
    sys.path.insert(0, reference)
    import functools

    import torch
    import torch.nn as nn

    torch.manual_seed(233)

    # --- inception generator (tests/test_torch_import.py) ---------------
    from models.modules.inception_architecture.inception_generator import (
        InceptionGenerator,
    )

    norm = functools.partial(nn.InstanceNorm2d, affine=True,
                             track_running_stats=False)
    gen = InceptionGenerator(3, 3, 8, None, 2, [1, 3, 5], norm_layer=norm,
                             n_blocks=3)
    _randomize(gen, torch, 101).eval()
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        ref = gen(x).permute(0, 2, 3, 1).numpy()
    _save(os.path.join(FIXDIR, "torch_gen_fixture.npz"), gen.state_dict(),
          x=x.numpy(), ref=ref)

    # --- SPADE generator (tests/test_spade_import.py) -------------------
    from models.modules.inception_architecture.inception_spade_generator import (
        InceptionSPADEGenerator,
    )

    opt = argparse.Namespace(
        ngf=4, semantic_nc=5, norm_G="spadesyncbatch3x3",
        channels=None, channels_reduction_factor=4, kernel_sizes=[1, 3],
        active_fn="nn.LeakyReLU", num_upsampling_layers="normal",
        crop_size=32, aspect_ratio=1.0,
    )
    sg = InceptionSPADEGenerator(opt)
    _randomize(sg, torch, 102).eval()
    g = torch.Generator().manual_seed(8)
    lab = torch.randint(0, 5, (2, 32, 32), generator=g)
    seg = torch.nn.functional.one_hot(lab, 5).permute(0, 3, 1, 2).float()
    with torch.no_grad():
        ref = sg(seg).permute(0, 2, 3, 1).numpy()
    _save(os.path.join(FIXDIR, "torch_spade_fixture.npz"), sg.state_dict(),
          seg=seg.numpy(), ref=ref)

    # --- DRN segmentation judge (tests/test_drn.py) ---------------------
    # load metric/drn.py directly: the metric package __init__ pulls in
    # torchvision, which this environment doesn't have
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_drn", os.path.join(reference, "metric", "drn.py")
    )
    ref_drn = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_drn)

    layers = [1, 1, 1, 1, 2, 1, 1, 1]
    channels = [4, 8, 8, 16, 16, 32, 32, 32]
    # Bottleneck blocks for levels 3-6, like drn_d_105 (metric/drn.py:471)
    backbone = ref_drn.DRN(ref_drn.Bottleneck, layers, arch="D",
                           channels=channels, num_classes=5)

    class TinySeg(nn.Module):
        """DRNSeg minus the fixed bilinear up (the JAX side owns that);
        mirrors metric/mIoU_score.py:127-171 base+seg structure."""

        def __init__(self):
            super().__init__()
            self.base = nn.Sequential(*list(backbone.children())[:-2])
            self.seg = nn.Conv2d(channels[-1], 5, 1)

        def forward(self, x):
            return self.seg(self.base(x))

    drn = TinySeg()
    _randomize(drn, torch, 103).eval()
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(9))
    # the reference upsamples with a FIXED bilinear-weight transposed conv
    # (mIoU_score.py:150-171, fill_up_weights) — groups=classes, k=16, s=8
    up = nn.ConvTranspose2d(5, 5, 16, stride=8, padding=4, groups=5, bias=False)
    from cat_tpu.metrics.drn import bilinear_up_kernel

    k = torch.from_numpy(np.asarray(bilinear_up_kernel(16), np.float32))
    with torch.no_grad():
        up.weight.zero_()
        for c in range(5):
            up.weight[c, 0] = k
        ref = up(drn(x))
    _save(os.path.join(FIXDIR, "drn_fixture.npz"), drn.state_dict(),
          x=x.numpy(), ref=ref.permute(0, 2, 3, 1).numpy(),
          layers=np.asarray(layers), channels=np.asarray(channels))

    # --- DeepLabV2 + MSC (tests/test_deeplabv2.py) -----------------------
    # same direct-module load as drn: metric/__init__ needs torchvision
    spec = importlib.util.spec_from_file_location(
        "ref_deeplabv2", os.path.join(reference, "metric", "deeplabv2.py")
    )
    ref_dl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_dl)

    n_blocks = [1, 1, 1, 1]
    rates = [2, 4]
    base = ref_dl.DeepLabV2(n_classes=4, n_blocks=n_blocks, atrous_rates=rates)
    msc = ref_dl.MSC(base)  # default scales (0.5, 0.75)
    _randomize(msc, torch, 104).eval()
    # odd spatial size exercises the stem's ceil_mode max pool
    x = torch.randn(1, 3, 33, 33, generator=torch.Generator().manual_seed(10))
    with torch.no_grad():
        ref_base = base(x).permute(0, 2, 3, 1).numpy()
        ref_msc = msc(x).permute(0, 2, 3, 1).numpy()
    _save(os.path.join(FIXDIR, "deeplabv2_fixture.npz"), msc.state_dict(),
          x=x.numpy(), ref_base=ref_base, ref_msc=ref_msc,
          n_blocks=np.asarray(n_blocks), rates=np.asarray(rates))

    write_hashes()


def write_hashes():
    hashes = {}
    for f in sorted(os.listdir(FIXDIR)):
        if f.endswith(".npz"):
            with open(os.path.join(FIXDIR, f), "rb") as fh:
                hashes[f] = hashlib.sha256(fh.read()).hexdigest()
    with open(os.path.join(FIXDIR, "HASHES.json"), "w") as fh:
        json.dump(hashes, fh, indent=2)
    print("updated HASHES.json")


# ---------------------------------------------------------------------------
# judge-layout checkpoints (random weights, real key layout)
# ---------------------------------------------------------------------------


def make_fake_inception(path: str, seed: int = 233):
    """pt_inception-2015-12-05-layout .pth with random weights.

    Built as the inverse of cat_tpu.metrics.inception.convert_torch_inception:
    init the Flax model, then emit torch keys <Scope>.conv.weight (HWIO->OIHW)
    and <Scope>.bn.{weight,bias,running_mean,running_var}.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from cat_tpu.metrics.inception import InceptionV3FID

    model = InceptionV3FID(output_blocks=(3,))
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(seed)
    sd = {}

    def walk(node, scope):
        leaves = {k: v for k, v in node.items() if not isinstance(v, dict)}
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, scope + [k])
        if not leaves:
            return
        prefix = ".".join(s for s in scope if s != "conv")
        for k, v in leaves.items():
            shape = np.asarray(v).shape
            if k == "kernel":  # HWIO -> OIHW
                # He scaling: random-weight judges must keep activations O(1)
                # through ~90 layers or FID degenerates to overflow noise
                fan_in = int(np.prod(shape[:3]))
                w = rng.randn(*shape).astype(np.float32) * np.sqrt(2.0 / fan_in)
                sd[prefix + ".conv.weight"] = torch.from_numpy(
                    w.transpose(3, 2, 0, 1).copy()
                )
            elif k == "bn_scale":
                sd[prefix + ".bn.weight"] = torch.from_numpy(
                    (1.0 + 0.1 * rng.randn(*shape)).astype(np.float32)
                )
            elif k == "bn_bias":
                sd[prefix + ".bn.bias"] = torch.from_numpy(
                    (0.05 * rng.randn(*shape)).astype(np.float32)
                )
            elif k == "bn_mean":
                sd[prefix + ".bn.running_mean"] = torch.from_numpy(
                    (0.05 * rng.randn(*shape)).astype(np.float32)
                )
            elif k == "bn_var":
                sd[prefix + ".bn.running_var"] = torch.from_numpy(
                    (0.5 + rng.rand(*shape)).astype(np.float32)
                )

    walk(variables["params"], [])
    torch.save(sd, path)
    print(f"wrote {path} ({len(sd)} tensors)")
    return path


def make_fake_vgg19(path: str, seed: int = 233):
    """torchvision-vgg19-layout .pth (features.N.{weight,bias}) with random
    weights, matching cat_tpu.models.vgg.convert_torch_vgg19's contract."""
    import torch

    # torchvision vgg19 conv indices in the `features` sequential
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    chans = [64, 64, 128, 128, 256, 256, 256, 256,
             512, 512, 512, 512, 512, 512, 512, 512]
    rng = np.random.RandomState(seed)
    sd = {}
    cin = 3
    for i, c in zip(conv_idx, chans):
        sd[f"features.{i}.weight"] = torch.from_numpy(
            (rng.randn(c, cin, 3, 3) * np.sqrt(2.0 / (9 * cin))).astype(np.float32)
        )
        sd[f"features.{i}.bias"] = torch.from_numpy(
            (rng.randn(c) * 0.01).astype(np.float32)
        )
        cin = c
    torch.save(sd, path)
    print(f"wrote {path} ({len(sd)} tensors)")
    return path


def main():
    # Host-side weight/fixture generation only: force the CPU backend before
    # any jax device touch (eager dispatch on the tunneled TPU costs ~25s/op).
    import os

    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("parity")
    p.add_argument("--reference", default="/root/reference")
    j = sub.add_parser("judges")
    j.add_argument("--out", required=True)
    args = parser.parse_args()
    if args.cmd == "parity":
        if not os.path.isdir(args.reference):
            raise SystemExit(f"reference tree not found at {args.reference}")
        make_parity_fixtures(args.reference)
    else:
        os.makedirs(args.out, exist_ok=True)
        make_fake_inception(os.path.join(args.out, "pt_inception_random.pth"))
        make_fake_vgg19(os.path.join(args.out, "vgg19_random.pth"))


if __name__ == "__main__":
    main()
