"""LinAttnBlock (`attn_type: linear`) parity vs the reference algorithm.

Reference: models/ldm/modules/attention.py:80-101 (LinearAttention), wrapped
heads=1/dim_head=C as LinAttnBlock at models/d2c_vae/autoencoder_unet.py:152
and reachable from every YAML via make_attn (:546-553).  The torch side
below re-states that algorithm (k softmax over the spatial axis, C x C
context, bias-free to_qkv, no norm / no residual) directly from the spec.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ddmi_tpu.interop.reference_ckpt import _Source, _attn_block
from ddmi_tpu.nn.vae import LinAttnBlock, _make_attn


def _torch_linear_attention(x, w_qkv, w_out, b_out, heads):
    """The reference forward (attention.py:88-101) in plain torch ops."""
    b, c, h, w = x.shape
    hd = (w_qkv.shape[0] // 3) // heads
    qkv = torch.nn.functional.conv2d(x, w_qkv)  # (b, 3*heads*hd, h, w)
    qkv = qkv.reshape(b, 3, heads, hd, h * w)  # 'b (qkv heads c) h w'
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (b, heads, hd, n)
    k = k.softmax(dim=-1)
    context = torch.einsum("bhdn,bhen->bhde", k, v)
    out = torch.einsum("bhde,bhdn->bhen", context, q)
    out = out.reshape(b, heads * hd, h, w)  # 'b (heads c) h w'
    return torch.nn.functional.conv2d(out, w_out, b_out)


@pytest.mark.parametrize("heads", [1, 4])
def test_linattn_matches_reference_algorithm(heads):
    C, H, W = 32, 6, 5
    rs = np.random.RandomState(0)
    x = rs.randn(2, C, H, W).astype(np.float32)
    w_qkv = (0.2 * rs.randn(3 * C, C, 1, 1)).astype(np.float32)
    w_out = (0.2 * rs.randn(C, C, 1, 1)).astype(np.float32)
    b_out = (0.1 * rs.randn(C)).astype(np.float32)

    with torch.no_grad():
        want = _torch_linear_attention(
            torch.from_numpy(x), torch.from_numpy(w_qkv),
            torch.from_numpy(w_out), torch.from_numpy(b_out), heads,
        ).numpy()

    src = _Source({
        "a.to_qkv.weight": w_qkv,
        "a.to_out.weight": w_out,
        "a.to_out.bias": b_out,
    })
    nm, params = _attn_block(src, "a", "linear")
    assert nm == "LinAttnBlock"
    src.finish()  # converter consumed every tensor

    got = LinAttnBlock(heads=heads).apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_make_attn_full_reference_enum():
    """Every live make_attn branch (autoencoder_unet.py:546-553) resolves:
    vanilla/vanilla-multihead/linear to modules, none to the skip sentinel —
    and an unknown type still fails loudly."""
    from ddmi_tpu.nn.vae import AttnBlock

    assert isinstance(_make_attn(32, "vanilla"), AttnBlock)
    assert isinstance(_make_attn(32, "vanilla-multihead"), AttnBlock)
    assert isinstance(_make_attn(32, "linear"), LinAttnBlock)
    assert _make_attn(32, "none") is None
    with pytest.raises(NotImplementedError):
        _make_attn(32, "vanilla-xformers")


def test_linattn_wired_through_vae():
    """A VAE config with attn_type: linear initializes and runs end-to-end
    (the round-3 NotImplementedError gate is gone)."""
    import jax

    from ddmi_tpu.core.config import DDConfig
    from ddmi_tpu.nn.vae import Autoencoder

    cfg = DDConfig(
        double_z=True, z_channels=16, resolution=32, in_channels=3,
        out_ch=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(16,), hdbf_resolutions=(16,), attn_type="linear",
    )
    ae = Autoencoder(cfg, embed_dim=8)
    x = jnp.zeros((1, 32, 32, 3))
    params = ae.init({"params": jax.random.PRNGKey(0)}, x,
                     rng=jax.random.PRNGKey(1))
    out = ae.apply(params, x, rng=jax.random.PRNGKey(1))
    planes = out[0] if isinstance(out, tuple) else out
    assert all(np.isfinite(np.asarray(p)).all() for p in planes)
