"""DRN segmentation judge: torch-parity fixture + bilinear upsample kernel."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.metrics.drn import DRNSeg, bilinear_up_kernel, convert_torch_drnseg

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "drn_fixture.npz")


def test_bilinear_up_kernel_properties():
    k = bilinear_up_kernel(16)
    assert k.shape == (16, 16)
    # symmetric with the plateau at the (even-kernel) centre:
    # peak = (1 - 1/(2f))^2 = 0.9375^2 for k=16
    np.testing.assert_allclose(k, k.T)
    np.testing.assert_allclose(k, k[::-1, ::-1])
    assert k.max() == pytest.approx(0.9375**2, abs=1e-6)
    assert k.min() >= 0.0


@pytest.mark.slow
def test_drnseg_matches_torch_fixture():
    data = np.load(FIXTURE)
    layers = tuple(int(v) for v in data["layers"])
    channels = tuple(int(v) for v in data["channels"])
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    variables = convert_torch_drnseg(sd, classes=5, layers=layers)
    model = DRNSeg(classes=5, layers=layers, channels=channels)
    out = model.apply(variables, jnp.asarray(data["x"].transpose(0, 2, 3, 1)))
    ref = data["ref"]
    rel = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert rel < 1e-5
