"""Parity and plumbing tests for the fused attention-block kernel
(ops/pallas/attn_block.py): one Pallas call = GroupNorm -> qkv -> MHA ->
proj -> residual, selected by sampling traces in nn/unet.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddmi_tpu.ops.pallas.attn_block import (
    _dense_block_ref,
    _pick_hc,
    fused_attention_block,
    supported,
)


def _args(key, B, H, W, C, scale_rand=True):
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    gn_scale = (
        1.0 + 0.1 * jax.random.normal(ks[1], (C,)) if scale_rand else jnp.ones((C,))
    )
    gn_bias = 0.1 * jax.random.normal(ks[2], (C,))
    w_qkv = jax.random.normal(ks[3], (C, 3 * C)) / np.sqrt(C)
    b_qkv = 0.1 * jax.random.normal(ks[4], (3 * C,))
    w_proj = jax.random.normal(ks[5], (C, C)) / np.sqrt(C)
    b_proj = 0.1 * jax.random.normal(ks[6], (C,))
    return x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj


@pytest.mark.parametrize(
    "B,H,W,C,nh",
    [
        (2, 32, 32, 128, 4),   # n=1024 -> hc=1, output accumulated over 4 chunks
        (2, 16, 16, 128, 4),   # n=256 -> hc=4, single chunk
        (1, 8, 8, 256, 8),     # n=64 -> hc=8, single chunk
        (1, 16, 16, 256, 8),   # n=256, hc=4, 2 chunks
    ],
)
def test_fused_block_matches_dense_ref(B, H, W, C, nh):
    args = _args(jax.random.PRNGKey(0), B, H, W, C)
    hd = C // nh
    out = fused_attention_block(*args, nh, hd**-0.5, 32, 1e-5, True)
    ref = _dense_block_ref(*args, nh, hd**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_block_matches_attention_block_module():
    """End-to-end weight-layout check against the REAL AttentionBlock: params
    initialized by the module, fed raw into the fused kernel, must reproduce
    the module's unfused CPU output (locks the (3, nh, hd) qkv channel order
    and (nh, hd) proj row order the converter also relies on,
    interop/reference_ckpt.py)."""
    from ddmi_tpu.nn.unet import AttentionBlock

    B, H, W, C, nh = 2, 16, 16, 128, 4
    hd = C // nh
    block = AttentionBlock(num_heads=nh)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.float32)
    variables = block.init(jax.random.PRNGKey(2), x)
    p = variables["params"]
    # random proj weights (module initializes proj_out to zeros -> out == x)
    p = jax.tree_util.tree_map(lambda a: a, p)
    p["proj_out"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(3), (1, 1, C, C)) / np.sqrt(C)
    )
    ref = block.apply({"params": p}, x)  # CPU -> dense unfused path
    out = fused_attention_block(
        x,
        p["norm"]["scale"], p["norm"]["bias"],
        p["qkv"]["kernel"][0, 0], p["qkv"]["bias"],
        p["proj_out"]["kernel"][0, 0], p["proj_out"]["bias"],
        nh, hd**-0.5, 32, 1e-5, True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_gradient_through_custom_vjp():
    B, H, W, C, nh = 1, 8, 8, 128, 4
    hd = C // nh
    args = _args(jax.random.PRNGKey(4), B, H, W, C)

    def f_fused(x):
        return fused_attention_block(
            x, *args[1:], nh, hd**-0.5, 32, 1e-5, True
        ).sum()

    def f_ref(x):
        return _dense_block_ref(x, *args[1:], nh, hd**-0.5).sum()

    g = jax.grad(f_fused)(args[0])
    gr = jax.grad(f_ref)(args[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-3)


def test_pick_hc_and_supported():
    assert _pick_hc(1024, 16, 32) == 1
    assert _pick_hc(256, 32, 32) == 4
    assert _pick_hc(64, 64, 32) == 8
    assert _pick_hc(256, 3, 32) == 3   # falls to a divisor
    # wide heads shrink the chunk so the weight block fits scoped VMEM
    assert _pick_hc(64, 32, 64) == 4
    assert _pick_hc(64, 16, 128) == 2
    assert supported(1024, 512, 16)
    assert supported(256, 1024, 32)
    assert supported(64, 2048, 64)
    assert not supported(2048, 512, 16)   # too many tokens
    assert not supported(1024, 96, 3)     # C not lane-aligned
    assert not supported(100, 512, 16)    # n not a multiple of 8
    assert not supported(1024, 512, 3)    # nh does not divide C


def test_attention_block_selects_fused_kernel_on_tpu(monkeypatch):
    """Under inference_mode on a TPU backend, AttentionBlock must route the
    whole block through fused_attention_block (stubbed so the selection logic
    is testable on CPU)."""
    import ddmi_tpu.nn.unet as unet_mod
    from ddmi_tpu.ops.pallas.attention import inference_mode

    calls = []

    def fake_fused(x, gs, gb, wq, bq, wp, bp, nh, scale, *a, **k):
        calls.append((x.shape, wq.shape, nh))
        return jnp.zeros_like(x)

    monkeypatch.setattr(unet_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        unet_mod.attn_block, "fused_attention_block", fake_fused
    )

    block = unet_mod.AttentionBlock(num_heads=4)
    x = jnp.zeros((2, 16, 16, 128))
    with inference_mode():
        out, _ = block.init_with_output(jax.random.PRNGKey(0), x)
    assert calls == [((2, 16, 16, 128), (128, 384), 4)]
    assert out.shape == x.shape


def test_block_specs_satisfy_mosaic_lowering_rule(monkeypatch):
    """Interpret mode does NOT check Mosaic's block-shape rule, so a CPU
    parity test can pass while real-TPU lowering fails (this exact bug
    shipped once: (1, C) bias blocks over (B, C) arrays).  Capture the
    specs/operands handed to pallas_call and enforce the rule here: each
    block's last two dims must be divisible by (8, 128) or equal the
    operand's."""
    import ddmi_tpu.ops.pallas.attn_block as mod

    captured = []

    def fake_pallas_call(kernel, *, grid, in_specs, out_specs, out_shape,
                         interpret=False):
        def run(*operands):
            for spec, op in zip(in_specs, operands):
                captured.append((spec.block_shape, op.shape))
            captured.append((out_specs.block_shape, out_shape.shape))
            return jnp.zeros(out_shape.shape, out_shape.dtype)

        return run

    monkeypatch.setattr(mod.pl, "pallas_call", fake_pallas_call)
    for B, H, W, C, nh in [(8, 32, 32, 512, 16), (8, 16, 16, 1024, 32),
                           (8, 8, 8, 2048, 64)]:
        args = _args(jax.random.PRNGKey(7), B, H, W, C)
        fused_attention_block(*args, nh, (C // nh) ** -0.5)
    assert captured, "pallas_call was never reached"
    for block, arr in captured:
        assert len(block) == len(arr)
        assert block[-1] % 128 == 0 or block[-1] == arr[-1], (block, arr)
        assert block[-2] % 8 == 0 or block[-2] == arr[-2], (block, arr)


def test_conv1x1_matches_nn_conv():
    """_Conv1x1 must be a drop-in for nn.Conv((1,1)): identical param tree
    and identical outputs for the same params."""
    import flax.linen as nn

    from ddmi_tpu.nn.unet import _Conv1x1

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    ref_mod = nn.Conv(48, (1, 1), dtype=jnp.float32)
    ours = _Conv1x1(48, dtype=jnp.float32)
    vr = ref_mod.init(jax.random.PRNGKey(1), x)
    out_ref = ref_mod.apply(vr, x)
    vo = ours.init(jax.random.PRNGKey(2), x)
    assert jax.tree_util.tree_structure(vo) == jax.tree_util.tree_structure(vr)
    assert [a.shape for a in jax.tree_util.tree_leaves(vo)] == [
        a.shape for a in jax.tree_util.tree_leaves(vr)
    ]
    out_ours = ours.apply(vr, x)  # reference params through our module
    np.testing.assert_allclose(
        np.asarray(out_ours), np.asarray(out_ref), atol=1e-6
    )
