"""Shape/dtype tests for the model stack at reduced config sizes, mirroring
the reference architecture constraints (SURVEY.md §4 test plan item 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import DDConfig, MLPConfig, UNetConfig
from ddmi_tpu.nn.inr import INR3D, INRImage, INRNeRF, INRVideo, FreqEmbedding
from ddmi_tpu.nn.unet import UNet, timestep_embedding
from ddmi_tpu.nn.vae import Autoencoder


TINY_DD = DDConfig(
    double_z=True,
    z_channels=32,
    resolution=32,
    in_channels=3,
    out_ch=16,
    ch=32,
    ch_mult=(1, 2, 4),
    num_res_blocks=1,
    attn_resolutions=(),
    hdbf_resolutions=(8, 16),
)

TINY_MLP = MLPConfig(in_ch=2, out_ch=3, ch=64, latent_dim=16)


@pytest.fixture(scope="module")
def vae_setup():
    vae = Autoencoder(TINY_DD, embed_dim=8)
    x = jnp.zeros((2, 32, 32, 3))
    params = vae.init(
        {"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1)
    )
    return vae, params


def test_vae_encode_decode_shapes(vae_setup, np_rng):
    vae, params = vae_setup
    x = jnp.asarray(np_rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    posterior = vae.apply(params, x, method=vae.encode)
    # latent at resolution/2^(levels-1) = 8, embed_dim channels
    assert posterior.mean.shape == (2, 8, 8, 8)
    z = posterior.sample(jax.random.PRNGKey(2))
    hdbf = vae.apply(params, z, method=vae.decode)
    # coarse -> fine pyramid: taps at 8 and 16, final at 32
    assert [p.shape for p in hdbf] == [
        (2, 8, 8, 16),
        (2, 16, 16, 16),
        (2, 32, 32, 16),
    ]


def test_vae_kl_finite(vae_setup, np_rng):
    vae, params = vae_setup
    x = jnp.asarray(np_rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    posterior = vae.apply(params, x, method=vae.encode)
    kl = posterior.kl()
    assert kl.shape == (2,)
    assert np.isfinite(np.asarray(kl)).all()


def test_inr_image_shapes(vae_setup, np_rng):
    hdbf = [
        jnp.asarray(np_rng.standard_normal((2, r, r, 16)).astype(np.float32))
        for r in (8, 16, 32)
    ]
    n = 64
    coords = jnp.asarray(
        np_rng.uniform(-1, 1, (1, n, 2)).astype(np.float32)
    )
    mlp = INRImage(TINY_MLP)
    params = mlp.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        coords,
        hdbf,
        1.0,
    )
    out = mlp.apply(
        params, coords, hdbf, 0.5, rngs={"noise": jax.random.PRNGKey(2)}
    )
    assert out.shape == (2, n, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_inr_3d_shapes(np_rng):
    planes = lambda: [
        jnp.asarray(np_rng.standard_normal((2, r, r, 16)).astype(np.float32))
        for r in (8, 16, 32)
    ]
    hdbf = (planes(), planes(), planes())
    coords = jnp.asarray(
        np_rng.uniform(-0.5, 0.5, (2, 100, 3)).astype(np.float32)
    )
    mlp = INR3D(MLPConfig(in_ch=3, out_ch=1, ch=64, latent_dim=16))
    params = mlp.init(jax.random.PRNGKey(0), coords, hdbf)
    logits = mlp.apply(params, coords, hdbf)
    assert logits.shape == (2, 100)


def test_inr_video_shapes(np_rng):
    t, h, w, c = 4, 8, 8, 6
    mk = lambda a, b: [
        jnp.asarray(np_rng.standard_normal((2, a, b, c)).astype(np.float32))
        for _ in range(3)
    ]
    hdbf = (mk(h, w), mk(t, h), mk(t, w))

    def grid2(n1, n2):
        lin1 = np.linspace(-1, 1, n1)
        lin2 = np.linspace(-1, 1, n2)
        g2, g1 = np.meshgrid(lin2, lin1, indexing="xy")
        return jnp.asarray(
            np.stack([g2, g1], -1).reshape(1, n1 * n2, 2).astype(np.float32)
        ).repeat(2, 0)

    coords = {
        "xy": grid2(h, w),
        "yt": grid2(t, h),
        "xt": grid2(t, w),
        "hw": (h, w),
    }
    mlp = INRVideo(MLPConfig(in_ch=3, out_ch=3, ch=64, latent_dim=c))
    params = mlp.init(jax.random.PRNGKey(0), coords, hdbf)
    out = mlp.apply(params, coords, hdbf)
    assert out.shape == (2, t * h * w, 3)


def test_inr_nerf_shapes(np_rng):
    emb_xyz = FreqEmbedding(5)
    emb_dir = FreqEmbedding(4)
    xyz = jnp.asarray(np_rng.standard_normal((10, 3)).astype(np.float32))
    d = jnp.asarray(np_rng.standard_normal((10, 3)).astype(np.float32))
    e_xyz = emb_xyz(xyz)
    e_dir = emb_dir(d)
    assert e_xyz.shape == (10, 3 * (2 * 5 + 1))
    mlp = INRNeRF(
        depth=4, width=64,
        in_channels_xyz=e_xyz.shape[-1], in_channels_dir=e_dir.shape[-1],
        skips=(2,),
    )
    x = jnp.concatenate([e_xyz, e_dir], -1)
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (10, 4)
    # rgb sigmoid-bounded
    assert (np.asarray(out[:, :3]) >= 0).all() and (np.asarray(out[:, :3]) <= 1).all()


TINY_UNET = UNetConfig(
    image_size=8,
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    num_head_channels=16,
)


def test_unet_shapes(np_rng):
    unet = UNet(TINY_UNET)
    x = jnp.asarray(np_rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    t = jnp.array([0, 500])
    params = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(params, x, t)
    assert out.shape == (2, 8, 8, 4)
    # zero-init output conv => exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_unet_timestep_embedding():
    emb = timestep_embedding(jnp.array([0, 10]), 32)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(emb[0, :16]), 1.0, atol=1e-6)  # cos(0)
    np.testing.assert_allclose(np.asarray(emb[0, 16:]), 0.0, atol=1e-6)  # sin(0)


def test_unet_bf16_compute(np_rng):
    unet = UNet(TINY_UNET, dtype=jnp.bfloat16)
    x = jnp.asarray(np_rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    t = jnp.array([3])
    params = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(params, x, t)
    assert out.dtype == jnp.float32  # output conv promotes back
    assert out.shape == (1, 8, 8, 4)


def test_fast_group_norm_matches_flax(np_rng):
    """MXU-statistics GroupNorm == nn.GroupNorm (profiled 15x-off-roofline
    convert+reduce replacement in the UNet)."""
    import flax.linen as nn

    from ddmi_tpu.ops.fused import FastGroupNorm

    x = jnp.asarray(np_rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    ref_m = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    fast_m = FastGroupNorm(32, epsilon=1e-5)
    params = ref_m.init(jax.random.PRNGKey(0), x)
    # nontrivial scale/bias
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params,
    )
    ref = ref_m.apply(params, x)
    fast = fast_m.apply(params, x)  # same param names -> interchangeable
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # bf16 input, fp32 stats
    xb = x.astype(jnp.bfloat16)
    fb = fast_m.apply(params, xb)
    assert fb.dtype == jnp.bfloat16 or fb.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fb, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_vae_remat_identity():
    """ddconfig.extra['remat'] (the round-5 image-s1 fusion/HBM A/B lever,
    nn/vae.py::_res_block) must be a pure scheduling change: identical
    param tree, same loss, gradients equal to rounding (the recompute's
    optimization barriers legitimately re-associate float ops — observed
    ~1e-6 relative on CPU — so the bound is numerical, not bitwise)."""
    import dataclasses

    import numpy as np

    from ddmi_tpu.core.config import DDConfig
    from ddmi_tpu.nn.vae import Autoencoder

    base = DDConfig(
        z_channels=32, resolution=32, in_channels=3, out_ch=16, ch=32,
        ch_mult=(1, 2), num_res_blocks=1, hdbf_resolutions=(16,),
    )
    rem = dataclasses.replace(base, extra={"remat": "all"})
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3))
        .astype(np.float32)
    )
    m0, m1 = Autoencoder(base, embed_dim=8), Autoencoder(rem, embed_dim=8)
    p0 = m0.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    p1 = m1.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(
        p1
    ), "remat changed the parameter tree (checkpoint layout breakage)"

    def loss(m, p):
        dec, post = m.apply(p, x, jax.random.PRNGKey(2))
        return sum(jnp.sum(d**2) for d in dec) + jnp.sum(post.kl())

    l0 = float(jax.jit(lambda p: loss(m0, p))(p0))
    l1 = float(jax.jit(lambda p: loss(m1, p))(p0))
    assert abs(l0 - l1) <= 1e-5 * abs(l0), (l0, l1)
    g0 = jax.jit(jax.grad(lambda p: loss(m0, p)))(p0)
    g1 = jax.jit(jax.grad(lambda p: loss(m1, p)))(p0)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3
        )
