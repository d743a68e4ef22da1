"""Parity tests for the fused Pallas INR-decode kernel vs the reference
INRImage module (interpret mode on CPU; the real-chip speedup is recorded in
ddmi_tpu/ops/pallas/BENCH.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import MLPConfig
from ddmi_tpu.nn.inr import INRImage
from ddmi_tpu.ops.pallas.inr_decode import (
    fold_inr_image_params,
    render_tokens_fused,
)
from ddmi_tpu.ops.resample import pixel_center_lin

CH = 64
LATENT = 16
RES = 16


@pytest.fixture(scope="module")
def mlp_and_params():
    cfg = MLPConfig(in_ch=2, out_ch=3, ch=CH, latent_dim=LATENT)
    m = INRImage(cfg)
    coords = jnp.zeros((1, 16, 2))
    hdbf = [
        jnp.zeros((1, 8, 8, LATENT)),
        jnp.zeros((1, 16, 16, LATENT)),
        jnp.zeros((1, 32, 32, LATENT)),
    ]
    p = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        coords, hdbf, 1.0,
    )["params"]
    # randomize biases that are zero at init so parity is non-trivial;
    # noise gains stay 0 -> both paths are deterministic
    def jiggle(t, key=[0]):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = jiggle(v)
            elif k in ("act_bias", "bias") and v.ndim == 1:
                key[0] += 1
                out[k] = 0.1 * jax.random.normal(
                    jax.random.PRNGKey(100 + key[0]), v.shape
                )
            else:
                out[k] = v
        return out

    return m, jiggle(p)


def _hdbf(np_rng, b=2):
    return [
        jnp.asarray(np_rng.standard_normal((b, r, r, LATENT)), jnp.float32)
        for r in (8, 16, 32)
    ]


def test_fused_decode_matches_inr_image(mlp_and_params, np_rng):
    m, params = mlp_and_params
    hdbf = _hdbf(np_rng)
    si = 0.7

    # reference path (deterministic: noise weights are zero)
    lin = pixel_center_lin(RES)
    ref = m.apply(
        {"params": params}, None, hdbf, si, grid_1d=(lin, lin),
        rngs={"noise": jax.random.PRNGKey(5)},
    )  # (b, n, 3)

    out = render_tokens_fused(
        params, hdbf, RES, si, seed=0, ch=CH, tile=256, interpret=True
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fused_decode_bf16_close(mlp_and_params, np_rng):
    """bf16 fused path tracks the fp32 reference within bf16 tolerance."""
    m, params = mlp_and_params
    hdbf32 = _hdbf(np_rng, b=1)
    si = 1.0
    lin = pixel_center_lin(RES)
    ref = m.apply(
        {"params": params}, None, hdbf32, si, grid_1d=(lin, lin),
        rngs={"noise": jax.random.PRNGKey(5)},
    )
    hdbf16 = [h.astype(jnp.bfloat16) for h in hdbf32]
    out = render_tokens_fused(
        params, hdbf16, RES, si, seed=0, ch=CH, tile=256, interpret=True
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean() + 1e-3
    assert err.mean() / scale < 0.05, (err.mean(), scale)


def test_fused_decode_noise_path_compiles(mlp_and_params, np_rng):
    """The has_noise kernel path (in-kernel TPU PRNG + Box-Muller) lowers and
    runs.  The Mosaic CPU interpreter stubs prng_random_bits to zeros, so
    here the noisy kernel must equal the noise-FREE reference; the actual
    randomness (seeds differ, spread matches) is asserted on the real chip by
    ddmi_tpu/ops/pallas/bench_decode.py."""
    from jax.experimental.pallas import tpu as pltpu

    m, params = mlp_and_params

    def set_noise(t):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = set_noise(v)
            elif k == "weight" and v.shape == (1,):
                out[k] = jnp.ones((1,)) * 0.5
            else:
                out[k] = v
        return out

    params_n = set_noise(params)
    hdbf = _hdbf(np_rng, b=1)
    a = render_tokens_fused(
        params_n, hdbf, RES, 1.0, seed=1, ch=CH, tile=256,
        interpret=pltpu.InterpretParams(),
    )
    # NB: the interpreter stubs prng_random_bits to zeros, which Box-Muller
    # maps to a large CONSTANT offset — so only shape/finiteness are
    # checkable here, not values.
    assert a.shape == (1, RES * RES, 3)
    assert np.isfinite(np.asarray(a, np.float32)).all()


def test_fold_weights_shapes(mlp_and_params):
    _, params = mlp_and_params
    f = fold_inr_image_params(params, 1.0, ch=CH, latent_dim=LATENT)
    assert f.wa.shape == (14, 128, 128)
    assert f.wb.shape == (6, 128, 128)
    assert f.act_bias.shape == (12, 128)
    assert f.noise_w.shape == (1, 12)
    assert not f.has_noise
