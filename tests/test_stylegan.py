"""Tests for StyleGAN-style blocks: the input-scaling modulated conv must be
algebraically identical to the reference's per-sample-weight grouped conv
(blocks.py:242-283)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.nn.stylegan import (
    EqualLinear,
    ModulatedConv,
    ResnetBlockFC,
    SinusoidalPosEmb,
    StyledResBlock,
    ToRGB,
)


def _per_sample_reference(x_nhwc, weight_hwio, style_s, scale, demodulate, pad):
    """Direct per-sample-weight computation (the reference formulation)."""
    b = x_nhwc.shape[0]
    outs = []
    for i in range(b):
        w = scale * weight_hwio * style_s[i][None, None, :, None]  # modulate
        if demodulate:
            demod = 1.0 / np.sqrt(np.sum(w**2, axis=(0, 1, 2)) + 1e-8)
            w = w * demod[None, None, None, :]
        out = jax.lax.conv_general_dilated(
            x_nhwc[i : i + 1],
            jnp.asarray(w),
            (1, 1),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs, 0)


@pytest.mark.parametrize("k,demod", [(1, True), (3, True), (1, False), (3, False)])
def test_modulated_conv_matches_per_sample_weights(k, demod, np_rng):
    b, h, w, cin, cout = 3, 8, 8, 6, 10
    x = np_rng.standard_normal((b, h, w, cin)).astype(np.float32)
    style = np_rng.standard_normal((b, 4)).astype(np.float32)

    mod = ModulatedConv(cout, k, demodulate=demod)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style)))

    # reconstruct the style gains exactly as the module computes them
    weight = np.asarray(params["params"]["weight"])  # (k,k,in,out)
    mw = np.asarray(params["params"]["modulation"]["weight"])  # (4, cin)
    mb = np.asarray(params["params"]["modulation"]["bias"])
    s = style @ (mw * (1 / np.sqrt(4))) + mb  # EqualLinear, bias_init=1
    scale = 1 / np.sqrt(cin * k**2)

    ref = _per_sample_reference(
        jnp.asarray(x), weight, s, scale, demod, pad=k // 2
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_modulated_conv_token_layout(np_rng):
    """1x1 modulated conv on (b, n, c) tokens == NHWC result flattened."""
    b, n, cin, cout = 2, 16, 8, 12
    x = np_rng.standard_normal((b, n, cin)).astype(np.float32)
    style = np_rng.standard_normal((b, 4)).astype(np.float32)
    mod = ModulatedConv(cout, 1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
    tok = mod.apply(params, jnp.asarray(x), jnp.asarray(style))
    img = mod.apply(
        params, jnp.asarray(x).reshape(b, 4, 4, cin), jnp.asarray(style)
    )
    np.testing.assert_allclose(
        np.asarray(tok), np.asarray(img).reshape(b, n, cout), atol=1e-5
    )


def test_equal_linear_scaling():
    lin = EqualLinear(8, bias_init=1.0)
    x = jnp.ones((2, 4))
    params = lin.init(jax.random.PRNGKey(0), x)
    out = lin.apply(params, x)
    w = np.asarray(params["params"]["weight"])
    expect = np.ones((2, 4)) @ (w / np.sqrt(4)) + 1.0
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_styled_resblock_shapes(np_rng):
    x = jnp.asarray(np_rng.standard_normal((2, 32, 66)).astype(np.float32))
    style = jnp.asarray(np_rng.standard_normal((2, 256)).astype(np.float32))
    blk = StyledResBlock(128, 1)
    params = blk.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, style
    )
    out = blk.apply(params, x, style, rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == (2, 32, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_torgb(np_rng):
    x = jnp.asarray(np_rng.standard_normal((2, 32, 128)).astype(np.float32))
    style = jnp.asarray(np_rng.standard_normal((2, 256)).astype(np.float32))
    rgb = ToRGB(3, upsample=False)
    params = rgb.init(jax.random.PRNGKey(0), x, style)
    out = rgb.apply(params, x, style)
    assert out.shape == (2, 32, 3)


def test_resnet_block_fc_zero_init_residual(np_rng):
    """fc_1 zero-init => output == shortcut at init (blocks.py:705)."""
    x = jnp.asarray(np_rng.standard_normal((4, 16)).astype(np.float32))
    blk = ResnetBlockFC(16)
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_sinusoidal_pos_emb():
    emb = SinusoidalPosEmb(64)(jnp.array([0.0, 1.0]))
    assert emb.shape == (2, 64)
    # x=0: sin parts 0, cos parts 1
    np.testing.assert_allclose(np.asarray(emb[0, :32]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), 1.0, atol=1e-7)
