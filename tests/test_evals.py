"""Tests for eval stacks: LPIPS parity vs a torch-side computation with the
same (random) weights, FID Fréchet math golden values, Inception port shape."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from ddmi_tpu.evals.fid import activation_statistics, frechet_distance
from ddmi_tpu.evals.lpips import LPIPS, load_torch_weights


def _torch_vgg16_features():
    """torchvision-layout VGG16 'features' Sequential with random weights."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    return tnn.Sequential(*layers)


def test_lpips_matches_torch_reference_computation(np_rng):
    torch.manual_seed(0)
    feats = _torch_vgg16_features().eval()
    # random nonnegative lin weights in the reference checkpoint format
    chans = [64, 128, 256, 512, 512]
    lin_state = {
        f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1) for i, c in enumerate(chans)
    }
    vgg_state = {f"features.{k}": v for k, v in feats.state_dict().items()}

    x = np_rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    y = np_rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)

    # ---- torch-side LPIPS computation (the reference algorithm)
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    taps = {3, 8, 15, 22, 29}  # relu{1_2,2_2,3_3,4_3,5_3} indices

    def torch_feats(t):
        h = (t - shift) / scale
        out = []
        for i, layer in enumerate(feats):
            h = layer(h)
            if i in taps:
                out.append(h)
        return out

    with torch.no_grad():
        fx = torch_feats(torch.from_numpy(x))
        fy = torch_feats(torch.from_numpy(y))
        total = torch.zeros(2)
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (a.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            b = b / (b.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            d = (a - b) ** 2
            w = lin_state[f"lin{i}.model.1.weight"]
            total += (d * w).sum(1).mean((1, 2))
    ref = total.numpy()

    # ---- our flax LPIPS with converted weights
    params = load_torch_weights(vgg_state, lin_state)
    model = LPIPS()
    got = model.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=1e-5)


class _StubScorer:
    """FIDScorer stand-in: 'features' = flattened pixels through a fixed
    projection, so the streaming drivers can be tested without Inception."""

    def __init__(self, d_in, d_out=6, seed=0):
        rng = np.random.default_rng(seed)
        self.W = rng.standard_normal((d_in, d_out)) * 0.1

    def features(self, images):
        out = [np.asarray(b).reshape(len(b), -1) @ self.W for b in images]
        return np.concatenate(out, axis=0)


def test_fid_n_driver_streams_and_reports(np_rng, capsys):
    """test_fid_n featurizes each generated batch as produced and prints a
    loud protocol-deviation line when n_samples != protocol_n."""
    from ddmi_tpu.evals.fid import test_fid_n

    scorer = _StubScorer(d_in=4 * 4 * 1)
    reals = [np_rng.standard_normal((8, 4, 4, 1)) for _ in range(4)]

    def sample_fn(rng):
        seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
        return np.random.default_rng(seed).standard_normal((8, 4, 4, 1))

    fid = test_fid_n(scorer, sample_fn, reals, n_samples=32, batch=8,
                     protocol_n=10000)
    out = capsys.readouterr().out
    assert "PROTOCOL IS 10000" in out
    assert np.isfinite(fid) and fid < 5.0  # same dist, modest n -> small FID

    # protocol-scale run prints the affirmative line instead
    test_fid_n(scorer, sample_fn, reals, n_samples=16, batch=8, protocol_n=16)
    assert "(protocol 16)" in capsys.readouterr().out


def test_rfid_driver_truncation_is_loud(np_rng, capsys):
    """test_rfid prints the truncation count when the loader is cut at
    max_batches, and the full-loader line otherwise."""
    from ddmi_tpu.evals.fid import test_rfid

    scorer = _StubScorer(d_in=4 * 4 * 1)
    batches = [np_rng.standard_normal((4, 4, 4, 1)) for _ in range(5)]
    recon = lambda b: b + 0.01 * np_rng.standard_normal(b.shape)

    fid = test_rfid(scorer, recon, iter(batches), max_batches=3)
    assert "truncated at max_batches=3" in capsys.readouterr().out
    assert np.isfinite(fid)

    fid = test_rfid(scorer, recon, iter(batches), max_batches=512)
    assert "full test loader, 20 images" in capsys.readouterr().out
    assert np.isfinite(fid)


def test_frechet_distance_identical_is_zero(np_rng):
    feats = np_rng.standard_normal((500, 8)).astype(np.float64)
    mu, sigma = activation_statistics(feats)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_gaussian_golden():
    """FID(N(0,I), N(m, a^2 I)) = |m|^2 + d*(a-1)^2 exactly."""
    d = 4
    mu1, s1 = np.zeros(d), np.eye(d)
    m = np.array([1.0, 2.0, 0.0, -1.0])
    a = 1.5
    mu2, s2 = m, (a**2) * np.eye(d)
    expected = float(m @ m + d * (a - 1) ** 2)
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(expected, rel=1e-9)


@pytest.mark.slow
def test_inception_forward_shapes(np_rng):
    from ddmi_tpu.evals.inception import InceptionV3

    model = InceptionV3(resize_input=False)  # feed 299 directly: cheaper init
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 299, 299, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    pool, logits = model.apply(params, x)
    assert pool.shape == (1, 2048)
    assert logits.shape == (1, 1008)
