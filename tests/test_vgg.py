"""VGG19 perceptual judge: full-slice forward parity vs the reference.

The reference's VGGLoss (models/modules/loss.py:151-203) slices
torchvision.models.vgg19().features at [0:2) [2:7) [7:12) [12:21) [21:30)
and takes a weighted L1 over the five relu_x_1 taps.  torchvision is not
installed here, so the test rebuilds the identical `features` Sequential
(Conv/ReLU/MaxPool layout of torchvision vgg19) in raw torch, loads the
reproducible fake-weights checkpoint (tools/make_fixtures.make_fake_vgg19),
and asserts the Flax port + converter reproduce every slice and the final
loss value.  Weight VALUES are random; the architecture, slicing, and
converter layout under test are the real ones.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cat_tpu.models.vgg import (  # noqa: E402
    VGG_LOSS_WEIGHTS,
    VGG19Features,
    convert_torch_vgg19,
    vgg_loss,
)

# torchvision vgg19 `features` layout: (layer kind, conv width or None)
_LAYOUT = [
    ("conv", 64), ("relu", None), ("conv", 64), ("relu", None), ("pool", None),
    ("conv", 128), ("relu", None), ("conv", 128), ("relu", None), ("pool", None),
    ("conv", 256), ("relu", None), ("conv", 256), ("relu", None),
    ("conv", 256), ("relu", None), ("conv", 256), ("relu", None), ("pool", None),
    ("conv", 512), ("relu", None), ("conv", 512), ("relu", None),
    ("conv", 512), ("relu", None), ("conv", 512), ("relu", None), ("pool", None),
    ("conv", 512), ("relu", None), ("conv", 512), ("relu", None),
    ("conv", 512), ("relu", None), ("conv", 512), ("relu", None), ("pool", None),
]
_SLICES = [(0, 2), (2, 7), (7, 12), (12, 21), (21, 30)]


def _torch_features():
    layers = []
    cin = 3
    for kind, width in _LAYOUT:
        if kind == "conv":
            layers.append(torch.nn.Conv2d(cin, width, 3, padding=1))
            cin = width
        elif kind == "relu":
            layers.append(torch.nn.ReLU(inplace=False))
        else:
            layers.append(torch.nn.MaxPool2d(2, 2))
    return torch.nn.Sequential(*layers)


@pytest.fixture(scope="module")
def fake_sd(tmp_path_factory):
    import sys

    sys.path.insert(0, "tools")
    from make_fixtures import make_fake_vgg19

    path = str(tmp_path_factory.mktemp("vgg") / "vgg19_random.pth")
    make_fake_vgg19(path)
    return torch.load(path, map_location="cpu", weights_only=True)


def _load(feats, sd):
    # the checkpoint uses torchvision's `features.N.*` keys; the bare
    # Sequential rebuilt here wants `N.*`
    feats.load_state_dict({k.replace("features.", ""): v for k, v in sd.items()})


def test_vgg19_slice_forward_parity(fake_sd):
    feats = _torch_features()
    _load(feats, fake_sd)
    feats.eval()

    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        ref_slices = []
        for a, b in _SLICES:
            for i in range(a, b):
                h = feats[i](h)
            ref_slices.append(h.numpy())

    variables = convert_torch_vgg19(fake_sd)
    got = VGG19Features().apply(variables, np.transpose(x, (0, 2, 3, 1)))
    assert len(got) == 5
    for ref, g in zip(ref_slices, got):
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)), ref, atol=2e-4, rtol=1e-4
        )


def test_vgg_loss_value_and_grad(fake_sd):
    """Loss value matches the reference formula; gradient wrt x is finite
    and nonzero (the λ_vgg path computes a real gradient)."""
    import jax
    import jax.numpy as jnp

    feats = _torch_features()
    _load(feats, fake_sd)
    feats.eval()
    rs = np.random.RandomState(1)
    x = rs.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    y = rs.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        def run(t):
            h = torch.from_numpy(t)
            outs = []
            for a, b in _SLICES:
                for i in range(a, b):
                    h = feats[i](h)
                outs.append(h)
            return outs

        ref = sum(
            w * torch.nn.functional.l1_loss(fx, fy)
            for w, fx, fy in zip(VGG_LOSS_WEIGHTS, run(x), run(y))
        ).item()

    variables = convert_torch_vgg19(fake_sd)
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    yn = jnp.asarray(np.transpose(y, (0, 2, 3, 1)))
    val, grad = jax.value_and_grad(lambda a: vgg_loss(variables, a, yn))(xn)
    np.testing.assert_allclose(float(val), ref, atol=1e-4, rtol=1e-4)
    g = np.asarray(grad)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_vgg_loss_bf16_tracks_f32(fake_sd):
    import jax
    import jax.numpy as jnp

    """vgg_compute_dtype=bfloat16 must preserve the loss value (to bf16
    precision) and the gradient DIRECTION — it is a throughput knob for the
    SPADE step's perceptual term, not a semantic change."""
    variables = convert_torch_vgg19(fake_sd)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.rand(2, 24, 24, 3).astype(np.float32))
    y = jnp.asarray(rs.rand(2, 24, 24, 3).astype(np.float32))
    v32, g32 = jax.value_and_grad(lambda a: vgg_loss(variables, a, y))(x)
    v16, g16 = jax.value_and_grad(
        lambda a: vgg_loss(variables, a, y, "bfloat16"))(x)
    assert g16.dtype == x.dtype  # grads come back in the input dtype
    np.testing.assert_allclose(float(v16), float(v32), rtol=3e-2)
    a, b = np.asarray(g32).ravel(), np.asarray(g16, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    # ~0.94 on RANDOM weights + tiny images (L1's sign(a-b) backward flips
    # where bf16 noise crosses zero); trained weights on real-scale images
    # are better conditioned.  This is why bf16 VGG is explicit OPT-IN.
    assert cos > 0.9, cos
