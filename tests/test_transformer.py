"""Context-conditioned denoiser path: SpatialTransformer parity vs the
reference torch module (/root/reference/models/ldm/modules/attention.py),
UNet conditioning behavior, and sampler-level classifier-free guidance."""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import UNetConfig
from ddmi_tpu.diffusion.process import GaussianDiffusion, ddim_sample
from ddmi_tpu.diffusion.schedule import make_schedule
from ddmi_tpu.nn.transformer import SpatialTransformer
from ddmi_tpu.nn.unet import UNet

REF_ATTENTION = "/root/reference/models/ldm/modules/attention.py"


def _load_ref_attention():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_attention", REF_ATTENTION)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_attention"] = mod
    spec.loader.exec_module(mod)
    # Reference bug (SURVEY §2.12 class): attention.py comments out the
    # `checkpoint` import (line 8) but BasicTransformerBlock.forward calls it
    # -> NameError as shipped.  Patch a pass-through so the module runs.
    mod.checkpoint = lambda func, inputs, params, flag: func(*inputs)
    return mod, torch


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_spatial_transformer_torch_parity():
    """Same weights, same input -> same output as the reference
    SpatialTransformer (attention.py:219-261) to ~1e-4."""
    mod, torch = _load_ref_attention()
    torch.manual_seed(0)
    C, heads, d_head, ctx_dim, depth = 32, 4, 8, 12, 2
    inner = heads * d_head
    ref = mod.SpatialTransformer(
        C, heads, d_head, depth=depth, context_dim=ctx_dim
    ).eval()
    # zero-init proj_out would hide everything after the residual; randomize
    with torch.no_grad():
        ref.proj_out.weight.normal_(0, 0.05)
        ref.proj_out.bias.normal_(0, 0.05)

    x_t = torch.randn(2, C, 8, 8)
    ctx_t = torch.randn(2, 5, ctx_dim)
    with torch.no_grad():
        out_ref = ref(x_t, context=ctx_t)  # NCHW

    def block_params(b):
        ffp = b.ff.net
        return {
            "attn1": {
                "to_q": {"kernel": _t2j(b.attn1.to_q.weight).T},
                "to_k": {"kernel": _t2j(b.attn1.to_k.weight).T},
                "to_v": {"kernel": _t2j(b.attn1.to_v.weight).T},
                "to_out": {
                    "kernel": _t2j(b.attn1.to_out[0].weight).T,
                    "bias": _t2j(b.attn1.to_out[0].bias),
                },
            },
            "attn2": {
                "to_q": {"kernel": _t2j(b.attn2.to_q.weight).T},
                "to_k": {"kernel": _t2j(b.attn2.to_k.weight).T},
                "to_v": {"kernel": _t2j(b.attn2.to_v.weight).T},
                "to_out": {
                    "kernel": _t2j(b.attn2.to_out[0].weight).T,
                    "bias": _t2j(b.attn2.to_out[0].bias),
                },
            },
            "norm1": {"scale": _t2j(b.norm1.weight), "bias": _t2j(b.norm1.bias)},
            "norm2": {"scale": _t2j(b.norm2.weight), "bias": _t2j(b.norm2.bias)},
            "norm3": {"scale": _t2j(b.norm3.weight), "bias": _t2j(b.norm3.bias)},
            "ff": {
                "geglu": {
                    "proj": {
                        "kernel": _t2j(ffp[0].proj.weight).T,
                        "bias": _t2j(ffp[0].proj.bias),
                    }
                },
                "out_proj": {
                    "kernel": _t2j(ffp[2].weight).T,
                    "bias": _t2j(ffp[2].bias),
                },
            },
        }

    params = {
        "norm": {
            "scale": _t2j(ref.norm.weight),
            "bias": _t2j(ref.norm.bias),
        },
        "proj_in": {
            "kernel": _t2j(ref.proj_in.weight)[:, :, 0, 0].T,
            "bias": _t2j(ref.proj_in.bias),
        },
        "proj_out": {
            "kernel": _t2j(ref.proj_out.weight)[:, :, 0, 0].T,
            "bias": _t2j(ref.proj_out.bias),
        },
    }
    for i in range(depth):
        params[f"block_{i}"] = block_params(ref.transformer_blocks[i])

    st = SpatialTransformer(C, heads, d_head, depth=depth, context_dim=ctx_dim)
    x_j = _t2j(x_t).transpose(0, 2, 3, 1)  # NHWC
    out_j = st.apply({"params": params}, x_j, context=_t2j(ctx_t))
    np.testing.assert_allclose(
        np.asarray(out_j),
        out_ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-4,
        rtol=1e-3,
    )


def test_cross_attention_defaults_to_self_attention():
    """context=None must reduce attn2 to self-attention
    (attention.py:172 `context = default(context, x)`)."""
    st = SpatialTransformer(32, 2, 16, context_dim=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 32))
    params = st.init(jax.random.PRNGKey(1), x)
    out = st.apply(params, x)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def _jitter(params, key, scale=0.05):
    """Add noise to every param: the denoiser's conv_out and the transformer's
    proj_out are zero-init, so a freshly-initialized UNet maps everything to
    exactly 0 and conditioning effects would be invisible."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return treedef.unflatten(
        [
            l + scale * jax.random.normal(k, l.shape, l.dtype)
            if jnp.issubdtype(l.dtype, jnp.floating)
            else l
            for l, k in zip(leaves, keys)
        ]
    )


def _cond_cfg(**kw):
    base = dict(
        image_size=8,
        in_channels=4,
        out_channels=4,
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        num_head_channels=16,
        use_spatial_transformer=True,
        context_dim=12,
    )
    base.update(kw)
    return UNetConfig(**base)


def test_unet_context_conditioning_changes_output():
    cfg = _cond_cfg()
    unet = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 7])
    ctx_a = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 12))
    ctx_b = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
    params = _jitter(
        unet.init(jax.random.PRNGKey(3), x, t, cond=ctx_a),
        jax.random.PRNGKey(4),
    )
    out_a = unet.apply(params, x, t, cond=ctx_a)
    out_b = unet.apply(params, x, t, cond=ctx_b)
    assert out_a.shape == x.shape
    assert bool(jnp.isfinite(out_a).all())
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6


def test_unet_rejects_cond_without_spatial_transformer():
    """VERDICT item: `cond` must never be silently ignored."""
    cfg = _cond_cfg(use_spatial_transformer=False, context_dim=None)
    unet = UNet(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="use_spatial_transformer"):
        unet.init(jax.random.PRNGKey(0), x, t, cond=jnp.zeros((1, 3, 12)))


def test_unet_spatial_transformer_requires_context_dim():
    cfg = _cond_cfg(context_dim=None)
    with pytest.raises(ValueError, match="context_dim"):
        UNet(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32),
        )


def test_unet_class_conditional():
    """num_classes: label embedding added to the timestep embedding
    (openaimodel.py:565-566, :745-748)."""
    cfg = _cond_cfg(
        use_spatial_transformer=False, context_dim=None, num_classes=7
    )
    unet = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 7])
    params = _jitter(
        unet.init(jax.random.PRNGKey(1), x, t, y=jnp.array([0, 1])),
        jax.random.PRNGKey(2),
    )
    o0 = unet.apply(params, x, t, y=jnp.array([0, 1]))
    o1 = unet.apply(params, x, t, y=jnp.array([2, 3]))
    assert float(jnp.abs(o0 - o1).max()) > 1e-6
    with pytest.raises(ValueError, match="class labels"):
        unet.apply(params, x, t)


def test_cfg_sampling_with_context():
    """Classifier-free guidance end-to-end: DDIM sampling with
    cond_model_fn driving the context-conditioned UNet.  w=0 must equal the
    conditional branch alone ((1+0)*cond - 0*uncond, ddpm.py:310-317);
    w>0 must differ from the unconditional sample."""
    cfg = _cond_cfg()
    unet = UNet(cfg)
    shape = (2, 8, 8, 4)
    x = jnp.zeros(shape)
    t = jnp.zeros((2,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 12))
    params = _jitter(
        unet.init(jax.random.PRNGKey(0), x, t, cond=ctx), jax.random.PRNGKey(9)
    )

    # The unconditional CFG branch runs the SAME conditional network with a
    # null context (standard LDM practice — context_dim fixes to_k/to_v input
    # width, so `cond=None` is not an option for a context-trained net).
    uncond_fn = lambda x, t: unet.apply(params, x, t, cond=jnp.zeros_like(ctx))
    cond_fn = lambda x, t: unet.apply(params, x, t, cond=ctx)

    def gd(w):
        return GaussianDiffusion(
            schedule=make_schedule("linear", 20, 0.0015, 0.0195),
            mixed_prediction=False,
            sampling_timesteps=4,
            ddim_sampling_eta=0.0,
            w=w,
        )

    noise = jax.random.normal(jax.random.PRNGKey(2), shape)
    rng = jax.random.PRNGKey(3)
    guided = ddim_sample(
        gd(1.0), uncond_fn, None, shape, rng, noise=noise,
        cond_model_fn=cond_fn,
    )
    uncond_only = ddim_sample(gd(1.0), uncond_fn, None, shape, rng, noise=noise)
    w0 = ddim_sample(
        gd(0.0), uncond_fn, None, shape, rng, noise=noise,
        cond_model_fn=cond_fn,
    )
    cond_only = ddim_sample(gd(0.0), cond_fn, None, shape, rng, noise=noise)

    assert bool(jnp.isfinite(guided).all())
    assert float(jnp.abs(guided - uncond_only).max()) > 1e-6
    np.testing.assert_allclose(
        np.asarray(w0), np.asarray(cond_only), atol=1e-5
    )
