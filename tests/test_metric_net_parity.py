"""Numeric parity of the frozen FID/FVD metric networks vs torch.

VERDICT r1 item 3 / SURVEY §7 hard-part 6: "port weights to Flax once,
verify logits vs torch to ~1e-4".  LPIPS already has such a test
(test_evals.py); this closes the chain for InceptionV3 (FID) and I3D (FVD):
random-but-shared weights go through the actual converters
(`load_torch_inception` / `load_torch_i3d`) and features/logits are compared
against a torch-side forward.

* I3D: the reference net itself (/root/reference/evals/fvd/pytorch_i3d.py,
  pure torch+numpy) is imported from the mounted read-only reference and
  driven as the golden implementation.
* InceptionV3: the reference module imports torchvision (absent in this
  environment), so the torch-side golden net is built here following the
  FID-Inception spec (/root/reference/evals/fid/inception.py:200-225 block
  patches over the torchvision Inception3 layout) — exactly the layout the
  real pt_inception-2015-12-05 checkpoint uses, so the converter is
  exercised on true checkpoint key names.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

REF_I3D = "/root/reference/evals/fvd/pytorch_i3d.py"


def _randomize_bn_stats(module, gen):
    """Non-trivial frozen-BN stats: catches mean/var/scale/bias mapping bugs
    that all-zeros/ones stats would hide."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.05, generator=gen)
                m.running_var.uniform_(0.8, 1.2, generator=gen)
                if m.weight is not None:
                    m.weight.uniform_(0.9, 1.1, generator=gen)
                    m.bias.normal_(0.0, 0.05, generator=gen)


def _rel_err(got, ref):
    scale = max(1e-3, float(np.abs(ref).max()))
    return float(np.abs(got - ref).max()) / scale


# --------------------------------------------------------------------- FID


class _BC(tnn.Module):
    """torchvision BasicConv2d: conv(no bias) + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def _avgp(x):  # the FID tweak: count_include_pad=False
    return tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class _IncA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _BC(cin, 64, kernel_size=1)
        self.branch5x5_1 = _BC(cin, 48, kernel_size=1)
        self.branch5x5_2 = _BC(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BC(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat(
            [
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(_avgp(x)),
            ],
            1,
        )


class _IncB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _BC(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3(x),
                self.branch3x3dbl_3(
                    self.branch3x3dbl_2(self.branch3x3dbl_1(x))
                ),
                tF.max_pool2d(x, 3, stride=2),
            ],
            1,
        )


class _IncC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _BC(cin, 192, kernel_size=1)
        self.branch7x7_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7_2 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BC(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BC(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(
                    self.branch7x7dbl_2(self.branch7x7dbl_1(x))
                )
            )
        )
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(_avgp(x))], 1
        )


class _IncD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _BC(cin, 192, kernel_size=1)
        self.branch3x3_2 = _BC(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BC(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _BC(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BC(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BC(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(
                    self.branch7x7x3_3(
                        self.branch7x7x3_2(self.branch7x7x3_1(x))
                    )
                ),
                tF.max_pool2d(x, 3, stride=2),
            ],
            1,
        )


class _IncE(tnn.Module):
    def __init__(self, cin, use_max_pool):
        super().__init__()
        self.branch1x1 = _BC(cin, 320, kernel_size=1)
        self.branch3x3_1 = _BC(cin, 384, kernel_size=1)
        self.branch3x3_2a = _BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BC(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BC(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BC(cin, 192, kernel_size=1)
        self.use_max_pool = use_max_pool

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.use_max_pool:
            pooled = tF.max_pool2d(x, 3, stride=1, padding=1)
        else:
            pooled = _avgp(x)
        return torch.cat(
            [self.branch1x1(x), b3, bd, self.branch_pool(pooled)], 1
        )


class _TorchFIDInception(tnn.Module):
    """FID-Inception with pt_inception-2015-12-05 state-dict naming
    (spec: /root/reference/evals/fid/inception.py:200-225)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _BC(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BC(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BC(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BC(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BC(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32)
        self.Mixed_5c = _IncA(256, 64)
        self.Mixed_5d = _IncA(288, 64)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128)
        self.Mixed_6c = _IncC(768, 160)
        self.Mixed_6d = _IncC(768, 160)
        self.Mixed_6e = _IncC(768, 192)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280, use_max_pool=False)
        self.Mixed_7c = _IncE(2048, use_max_pool=True)
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = tF.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = tF.max_pool2d(x, 3, stride=2)
        for name in [
            "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
            "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
            "Mixed_7c",
        ]:
            x = getattr(self, name)(x)
        pool = x.mean(dim=(2, 3))
        return pool, self.fc(pool)


def test_inception_logit_parity_vs_torch(np_rng):
    from ddmi_tpu.evals.inception import InceptionV3, load_torch_inception

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    net = _TorchFIDInception().eval()
    _randomize_bn_stats(net, gen)

    x = np_rng.uniform(0, 1, (2, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        ref_pool, ref_logits = net(2.0 * torch.from_numpy(x) - 1.0)
    ref_pool, ref_logits = ref_pool.numpy(), ref_logits.numpy()

    params = load_torch_inception(net.state_dict())
    model = InceptionV3(resize_input=False, normalize_input=True)
    pool, logits = model.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    pool, logits = np.asarray(pool), np.asarray(logits)

    assert _rel_err(pool, ref_pool) < 1e-4, _rel_err(pool, ref_pool)
    assert _rel_err(logits, ref_logits) < 1e-4, _rel_err(logits, ref_logits)


# --------------------------------------------------------------------- FVD


def test_i3d_logit_parity_vs_torch_reference(np_rng):
    if not os.path.exists(REF_I3D):
        pytest.skip("reference I3D not mounted")
    from ddmi_tpu.evals.i3d import I3D, load_torch_i3d

    spec = importlib.util.spec_from_file_location("ref_pytorch_i3d", REF_I3D)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    net = ref_mod.InceptionI3d(num_classes=400, in_channels=3).eval()
    _randomize_bn_stats(net, gen)

    x = np_rng.uniform(-1, 1, (1, 3, 16, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref_logits = net(torch.from_numpy(x)).numpy()

    params = load_torch_i3d(net.state_dict())
    model = I3D()
    logits = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
        )
    )
    assert logits.shape == ref_logits.shape
    assert _rel_err(logits, ref_logits) < 1e-4, _rel_err(logits, ref_logits)
