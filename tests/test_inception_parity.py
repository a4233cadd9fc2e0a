"""Full-model forward parity of the InceptionV3 FID judge vs the reference.

The reference's judge is torchvision inception_v3 patched into the FID
variant (metric/inception.py:113-293: avg-pools exclude padding in
InceptionA/C/E_1; Mixed_7c pools with max).  torchvision is not installed
here, so this test rebuilds that exact network in raw torch — block
structure from torchvision's inception, FID patches from the reference
file — loads the reproducible random-weights checkpoint
(tools/make_fixtures.make_fake_inception, pt_inception key layout), and
asserts the Flax port + converter reproduce the pool3 features end to end
(resize-to-299 + [-1,1] scaling included).  Weight VALUES are random; the
architecture, patches, converter, and forward semantics under test are the
real ones — only the weight files themselves await egress.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional


class BC(torch.nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg_excl(x):  # FID patch: count_include_pad=False
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class A(torch.nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BC(cin, 64, kernel_size=1)
        self.branch5x5_1 = BC(cin, 48, kernel_size=1)
        self.branch5x5_2 = BC(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BC(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg_excl(x)),
        ], 1)


class B(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BC(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class C(torch.nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BC(cin, 192, kernel_size=1)
        self.branch7x7_1 = BC(cin, c7, kernel_size=1)
        self.branch7x7_2 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BC(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BC(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BC(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_avg_excl(x)),
        ], 1)


class D(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BC(cin, 192, kernel_size=1)
        self.branch3x3_2 = BC(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BC(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BC(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BC(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BC(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)), b7, F.max_pool2d(x, 3, 2),
        ], 1)


class E(torch.nn.Module):
    def __init__(self, cin, pool):  # pool: 'avg' (7b, FID excl-pad) | 'max' (7c)
        super().__init__()
        self.pool = pool
        self.branch1x1 = BC(cin, 320, kernel_size=1)
        self.branch3x3_1 = BC(cin, 384, kernel_size=1)
        self.branch3x3_2a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BC(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BC(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = (F.max_pool2d(x, 3, 1, 1) if self.pool == "max" else _avg_excl(x))
        return torch.cat([
            self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TorchFIDInception(torch.nn.Module):
    """The reference's fid_inception_v3 feature stack, blocks 0-3."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BC(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BC(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BC(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BC(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BC(80, 192, kernel_size=3)
        self.Mixed_5b = A(192, 32)
        self.Mixed_5c = A(256, 64)
        self.Mixed_5d = A(288, 64)
        self.Mixed_6a = B(288)
        self.Mixed_6b = C(768, 128)
        self.Mixed_6c = C(768, 160)
        self.Mixed_6d = C(768, 160)
        self.Mixed_6e = C(768, 192)
        self.Mixed_7a = D(768)
        self.Mixed_7b = E(1280, "avg")
        self.Mixed_7c = E(2048, "max")

    def forward(self, x):
        # reference InceptionV3.forward: resize 299 bilinear(align_corners
        # =False) + [-1,1] scaling, then blocks with inter-block maxpools
        x = F.interpolate(x, size=(299, 299), mode="bilinear",
                          align_corners=False)
        x = 2 * x - 1
        outs = {}
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        outs[0] = x
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        outs[1] = x
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e):
            x = m(x)
        outs[2] = x
        for m in (self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        outs[3] = F.adaptive_avg_pool2d(x, (1, 1))
        return outs


@pytest.mark.slow
def test_fid_inception_full_forward_parity(tmp_path):
    """pool3 (2048-d) + block0 features match through resize+scale+90 layers.

    Tolerance: bf16-free f32 path through ~90 conv/BN layers with a
    bilinear resize; 1e-3 absolute on O(1) activations.
    """
    import sys

    sys.path.insert(0, "tools")
    from make_fixtures import make_fake_inception

    from cat_tpu.metrics.inception import InceptionV3FID, load_inception

    path = str(tmp_path / "pt_inception_random.pth")
    make_fake_inception(path)

    oracle = TorchFIDInception()
    sd = torch.load(path, map_location="cpu", weights_only=True)
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    # BN running stats + affine and conv weights must ALL be present
    assert not [k for k in missing if "num_batches_tracked" not in k], missing
    assert not unexpected, unexpected
    oracle.eval()

    rs = np.random.RandomState(0)
    x = rs.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x))

    model, variables = load_inception(path, output_blocks=(0, 3))
    del model
    got = InceptionV3FID(output_blocks=(0, 3)).apply(
        variables, np.transpose(x, (0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got[0]), (0, 3, 1, 2)),
        ref[0].numpy(), atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), ref[3].numpy()[:, :, 0, 0], atol=1e-3, rtol=1e-3,
    )
