"""Memory-efficient attention: online-softmax over KV chunks, tiled over Q.

TPU-native replacement for the reference's xformers
`memory_efficient_attention` dependency (attention_efficient.py:233,
autoencoder_unet.py:326) used on the long cross-plane video sequences
(up to 256^2 + 2*16*256 = 73k tokens).  Working set is bounded at
(q_chunk x kv_chunk) scores regardless of sequence length: a lax.map over
query blocks wraps a lax.scan over KV blocks (without the query tiling, a
73k-token sequence materializes an (n x kv_chunk) f32 score tensor — 19 GB
at batch 2 x 8 heads, found by bench_video.py OOM on a 16 GB v5e).  Falls
back to one dense softmax when the sequence is short."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this length the streaming path takes over.  2048 keeps the biggest
# dense score matrix at (2048^2 x batch x heads) f32 — training through a
# 6144-token cross-plane attention on the dense path cost 2.25 GB per
# score matrix (fwd + bwd) and OOM'd the video-GAN stage-1 config.
_DENSE_MAX = 2048


def _stream_kv(q, k, v, mask_base, kv_chunk: int):
    """Online-softmax over KV chunks for a (small) query block.
    q: (..., nq, d); k/v: (..., nk_padded, d) with nk_padded % kv_chunk == 0;
    mask_base: (nk_padded,) bool validity."""
    d = q.shape[-1]
    nq = q.shape[-2]
    chunks = k.shape[-2] // kv_chunk

    kc = jnp.moveaxis(k.reshape(k.shape[:-2] + (chunks, kv_chunk, d)), -3, 0)
    vc = jnp.moveaxis(v.reshape(v.shape[:-2] + (chunks, kv_chunk, d)), -3, 0)
    maskc = mask_base.reshape(chunks, kv_chunk)

    batch_shape = q.shape[:-2]
    m0 = jnp.full(batch_shape + (nq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros(batch_shape + (nq,), jnp.float32)
    acc0 = jnp.zeros(batch_shape + (nq, d), jnp.float32)

    def body(carry, inp):
        m, l, acc = carry
        kb, vb, mb = inp
        sim = jnp.einsum("...id,...jd->...ij", q, kb).astype(jnp.float32)
        sim = jnp.where(mb, sim, -jnp.inf)
        m_new = jnp.maximum(m, sim.max(-1))
        # guard fully-masked rows
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(sim - m_safe[..., None])
        corr = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        l = l * corr + p.sum(-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "...ij,...jd->...id", p, vb.astype(jnp.float32)
        )
        return (m_new, l, acc), None

    # remat the body so autodiff recomputes each tile's score matrix in the
    # backward pass instead of storing (q_chunk x kv_chunk) per KV step —
    # without this, training through a long sequence stores ~n^2 residuals
    body = jax.checkpoint(body, prevent_cse=False)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kc, vc, maskc))
    return acc / jnp.maximum(l, 1e-30)[..., None]


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_chunk: int = 2048,
    q_chunk: int = 2048,
    scale: float | None = None,
    dense_max: int | None = None,
) -> jnp.ndarray:
    """q,k,v: (..., n, d) with any leading batch/head dims; returns (..., n, d).

    Exact (not approximate); streaming softmax when n > dense_max
    (default _DENSE_MAX) with memory bounded by (q_chunk x kv_chunk) scores
    per step.  Callers with large LEADING batch dims (e.g. per-frame space
    attention: batch x heads x frames) pass a small dense_max so the full
    score tensor never materializes."""
    n = q.shape[-2]
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    q = q * scale

    if n <= (dense_max if dense_max is not None else _DENSE_MAX):
        sim = jnp.einsum("...id,...jd->...ij", q, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("...ij,...jd->...id", attn, v)

    nk = k.shape[-2]
    pad_k = (-nk) % kv_chunk
    if pad_k:
        k = jnp.pad(k, [(0, 0)] * (k.ndim - 2) + [(0, pad_k), (0, 0)])
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, pad_k), (0, 0)])
    mask_base = jnp.arange(nk + pad_k) < nk

    pad_q = (-n) % q_chunk
    if pad_q:
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 2) + [(0, pad_q), (0, 0)])
    q_blocks = (n + pad_q) // q_chunk
    qb = jnp.moveaxis(
        q.reshape(q.shape[:-2] + (q_blocks, q_chunk, d)), -3, 0
    )  # (q_blocks, ..., q_chunk, d)

    # remat the whole query-block body as well: lax.map's backward otherwise
    # saves each block's internal residuals for all blocks at once (observed
    # as a (q_blocks x q_blocks x ...) 10 GB buffer when training the video
    # decoder's 73k-token attention); with checkpoint the backward recomputes
    # one block at a time
    out = jax.lax.map(
        jax.checkpoint(
            lambda qi: _stream_kv(qi, k, v, mask_base, kv_chunk),
            prevent_cse=False,
        ),
        qb,
    )
    out = jnp.moveaxis(out, 0, -3).reshape(
        q.shape[:-2] + (n + pad_q, d)
    )[..., :n, :]
    return out.astype(v.dtype)
