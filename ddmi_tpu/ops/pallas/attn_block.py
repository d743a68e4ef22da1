"""Fully-fused UNet attention block for sampling traces.

One Pallas kernel per (batch, head-chunk) computes the ENTIRE AttentionBlock
(nn/unet.py): GroupNorm apply -> qkv projection -> multi-head attention ->
output projection -> residual add, with zero HBM traffic for any
intermediate.  The unfused XLA pipeline round-trips ~14 activation tensors
per block through HBM (GN out, qkv, attention out, proj out, residual);
at the celebahq denoiser's shapes that is ~1 GB of HBM per forward across
the 16 blocks — this kernel reduces it to "read x, read weights, write out".

Shape inventory at the flagship config (configs/ldm/celebahq.yaml:18-27,
reference openaimodel.py:283-427): n=1024/C=512 (ds2), n=256/C=1024 (ds4),
n=64/C=2048 (ds8), head_dim 32 everywhere.

Design notes:
  * GroupNorm statistics are computed OUTSIDE the kernel (ops/fused.py::
    group_norm_stats_mxu — one cheap extra pass over x) and folded into
    per-(batch, channel) effective scale/bias vectors, so the kernel applies
    GN as a single fused multiply-add with no cross-channel coupling.
  * Heads are processed in chunks of `hc` per grid instance; the output
    projection's partial products are ACCUMULATED into the fp32 output block
    across the chunk grid axis (Pallas revisiting: the out block index map
    ignores the chunk axis, so it stays resident in VMEM until the batch
    index changes).  Chunk 0 seeds the accumulator with residual + proj bias.
  * hc is chosen per shape to bound live fp32 score matrices (n=1024 ->
    hc=1: one 4 MB score matrix live; larger hc at n=1024 repeats the
    mha_vmem hpb=4 scoped-VMEM OOM, ops/pallas/BENCH.md).
  * Normalization happens AFTER the value contraction (divide on (n, hd)
    instead of (n, n)) exactly as in ops/pallas/attention.py.

Forward-only by intent: sampling/eval traces select it (nn/unet.py gates on
vmem_attn.is_inference()); training keeps the flash kernel.  A custom_vjp
recomputes a dense XLA backward so the op remains correct under grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ddmi_tpu.ops.fused import group_norm_stats_mxu

# Same VMEM bound as the attention-only kernel: above this the score matrix
# no longer fits and flash attention takes over.
FUSED_BLOCK_MAX_TOKENS = 1024


def _pick_hc(n: int, nh: int, hd: int) -> int:
    """Heads per grid instance, bounded by live fp32 score-matrix VMEM and
    by the per-chunk weight-block footprint (hc*hd capped at 256 lanes: at
    C=2048 a (C, 3*hc*hd) bf16 qkv block is 3 MB, x2 for double buffering —
    wider chunks OOM'd scoped VMEM at head_dim 64/128 on v5e)."""
    if n >= 1024:
        target = 1
    elif n >= 256:
        target = 4
    else:
        target = 8
    target = min(target, max(1, 256 // hd))
    for hc in range(min(target, nh), 0, -1):
        if nh % hc == 0:
            return hc
    return 1


def supported(n: int, C: int, num_heads: int) -> bool:
    hd = C // num_heads
    return (
        n % 8 == 0
        and n <= FUSED_BLOCK_MAX_TOKENS
        and num_heads * hd == C
        and hd <= 128
        and C % 128 == 0
    )


def _kernel(
    x_ref, es_ref, eb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
    *, hc: int, hd: int, sm_scale: float,
):
    c = pl.program_id(1)
    x = x_ref[0]  # (n, C)
    n = x.shape[0]
    # GroupNorm apply as one fused multiply-add (stats folded outside).
    h = x * es_ref[0].astype(x.dtype) + eb_ref[0].astype(x.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = qkv + bqkv_ref[0]  # (n, 3*hc*hd) fp32
    S = hc * hd
    # Fold the softmax scale into q — (n, S) fp32 work — instead of scaling
    # the (n, n) score matrix once per head (saves a full n² VPU pass per
    # head; same math, applied before the bf16 cast so precision matches the
    # post-dot scaling it replaces).  Two casts with NO (n, 3*hc*hd)
    # concatenate intermediate; the fp32 qkv is dead after these two ops
    # (keeping it live through the head loop cost +1 MB scoped VMEM and
    # OOM'd the n=64/C=2048 block at head_dim 64 on v5e).
    q_all = (jax.lax.slice(qkv, (0, 0), (n, S)) * sm_scale).astype(x.dtype)
    kv_all = jax.lax.slice(qkv, (0, S), (n, 3 * S)).astype(x.dtype)
    outs = []
    for i in range(hc):
        q = jax.lax.slice(q_all, (0, i * hd), (n, (i + 1) * hd))
        k = jax.lax.slice(kv_all, (0, i * hd), (n, (i + 1) * hd))
        v = jax.lax.slice(kv_all, (0, S + i * hd), (n, S + (i + 1) * hd))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # scale already folded into q above
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        av = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(av / jnp.sum(e, axis=-1, keepdims=True))
    chunk = outs[0] if hc == 1 else jnp.concatenate(outs, axis=-1)
    part = jax.lax.dot_general(
        chunk.astype(x.dtype), wproj_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (n, C)

    @pl.when(c == 0)
    def _seed():
        o_ref[0] = x.astype(jnp.float32) + bproj_ref[0] + part

    @pl.when(c != 0)
    def _accum():
        o_ref[0] = o_ref[0] + part


def _pack(w_qkv, b_qkv, w_proj, nh: int, hd: int, hc: int, dtype):
    """Relayout conv weights into per-chunk contiguous blocks.

    qkv conv output channels are ordered (3, nh, hd) — that is what
    nn/unet.py's reshape(B, n, 3, nh, hd) implies; proj input channels are
    ordered (nh, hd)."""
    C = w_qkv.shape[0]
    nchunks = nh // hc
    w = w_qkv.reshape(C, 3, nchunks, hc, hd)
    wqkv_b = jnp.transpose(w, (2, 0, 1, 3, 4)).reshape(nchunks, C, 3 * hc * hd)
    b = b_qkv.reshape(3, nchunks, hc, hd)
    bqkv_b = jnp.transpose(b, (1, 0, 2, 3)).reshape(nchunks, 3 * hc * hd)
    wproj_b = w_proj.reshape(nchunks, hc * hd, C)
    return (
        wqkv_b.astype(dtype),
        bqkv_b.astype(jnp.float32),
        wproj_b.astype(dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_attention_block(
    x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    num_heads: int, sm_scale: float, num_groups: int = 32,
    eps: float = 1e-5, interpret: bool = False,
):
    """Full AttentionBlock forward: GN -> qkv -> MHA -> proj -> +x.

    x: (B, H, W, C); w_qkv: (C, 3C); w_proj: (C, C); returns x.dtype/shape.
    Requires supported(H*W, C, num_heads)."""
    return _fwd_impl(
        x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
        num_heads, sm_scale, num_groups, eps, interpret,
    )


def _fwd_impl(
    x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    num_heads, sm_scale, num_groups, eps, interpret,
):
    B, H, W, C = x.shape
    n = H * W
    hd = C // num_heads
    hc = _pick_hc(n, num_heads, hd)
    nchunks = num_heads // hc
    S3 = 3 * hc * hd

    xf = x.reshape(B, n, C)
    mean, var = group_norm_stats_mxu(xf, num_groups)  # (B, G) fp32
    rstd = jax.lax.rsqrt(var + eps)
    per = C // num_groups
    rstd_c = jnp.repeat(rstd, per, axis=-1)  # (B, C)
    mean_c = jnp.repeat(mean, per, axis=-1)
    es = rstd_c * gn_scale.astype(jnp.float32)[None, :]
    eb = gn_bias.astype(jnp.float32)[None, :] - mean_c * es

    wqkv_b, bqkv_b, wproj_b = _pack(w_qkv, b_qkv, w_proj, num_heads, hd, hc, x.dtype)
    bproj = b_proj.astype(jnp.float32).reshape(1, 1, C)

    # Mosaic requires each block's last two dims to be 8/128-divisible or
    # equal to the array's — a (1, C) block over a (B, C) array is rejected
    # on real TPUs (fine in interpret mode).  Lift the per-batch / per-chunk
    # vectors to (N, 1, C)-shaped arrays so every block spans full trailing
    # dims; inside the kernel ref[0] is (1, C) and broadcasts as before.
    out = pl.pallas_call(
        functools.partial(_kernel, hc=hc, hd=hd, sm_scale=sm_scale),
        grid=(B, nchunks),
        in_specs=[
            pl.BlockSpec((1, n, C), lambda b, c: (b, 0, 0)),      # x
            pl.BlockSpec((1, 1, C), lambda b, c: (b, 0, 0)),      # es
            pl.BlockSpec((1, 1, C), lambda b, c: (b, 0, 0)),      # eb
            pl.BlockSpec((1, C, S3), lambda b, c: (c, 0, 0)),     # wqkv
            pl.BlockSpec((1, 1, S3), lambda b, c: (c, 0, 0)),     # bqkv
            pl.BlockSpec((1, hc * hd, C), lambda b, c: (c, 0, 0)),  # wproj
            pl.BlockSpec((1, 1, C), lambda b, c: (0, 0, 0)),      # bproj
        ],
        out_specs=pl.BlockSpec((1, n, C), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n, C), jnp.float32),
        interpret=interpret,
    )(xf, es[:, None, :], eb[:, None, :], wqkv_b, bqkv_b[:, None, :],
      wproj_b, bproj)
    return out.astype(x.dtype).reshape(B, H, W, C)


def _dense_block_ref(
    x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    num_heads, sm_scale, num_groups=32, eps=1e-5,
):
    """Pure-XLA reference: mirrors nn/unet.py's unfused AttentionBlock
    pipeline (GN via the same MXU-stats path, dense fp32-softmax attention)."""
    from ddmi_tpu.ops.fused import group_norm

    B, H, W, C = x.shape
    n = H * W
    hd = C // num_heads
    h = group_norm(x, gn_scale, gn_bias, num_groups, eps)
    qkv = (
        jax.lax.dot_general(h, w_qkv.astype(h.dtype), (((3,), (0,)), ((), ())))
        + b_qkv.astype(h.dtype)
    )
    qkv = qkv.reshape(B, n, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, n, C)
    out = (
        jax.lax.dot_general(out, w_proj.astype(out.dtype), (((2,), (0,)), ((), ())))
        + b_proj.astype(out.dtype)
    )
    return x + out.reshape(B, H, W, C).astype(x.dtype)


def _vjp_fwd(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
             num_heads, sm_scale, num_groups, eps, interpret):
    out = _fwd_impl(
        x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
        num_heads, sm_scale, num_groups, eps, interpret,
    )
    return out, (x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj)


def _vjp_bwd(num_heads, sm_scale, num_groups, eps, interpret, res, g):
    # Dense XLA recompute — correctness net only; training traces never
    # select the fused path (nn/unet.py gates on inference_mode).
    args = res
    _, vjp = jax.vjp(
        lambda *a: _dense_block_ref(
            *a, num_heads, sm_scale, num_groups, eps
        ),
        *args,
    )
    return vjp(g)


fused_attention_block.defvjp(_vjp_fwd, _vjp_bwd)
