"""Memory-efficient attention: online-softmax over KV chunks.

TPU-native replacement for the reference's xformers
`memory_efficient_attention` dependency (attention_efficient.py:233,
autoencoder_unet.py:326) used on the long cross-plane video sequences
(up to 256^2 + 2*16*256 = 73k tokens).  A lax.scan over KV blocks keeps the
attention-matrix working set at (n_q_chunk x kv_chunk) instead of (n x n);
XLA keeps the matmuls on the MXU.  Falls back to one dense softmax when the
sequence is short."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_DENSE_MAX = 8192


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_chunk: int = 4096,
    scale: float | None = None,
) -> jnp.ndarray:
    """q,k,v: (..., n, d) with any leading batch/head dims; returns (..., n, d).

    Uses streaming softmax when n > _DENSE_MAX; exact (not approximate)."""
    n = q.shape[-2]
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    q = q * scale

    if n <= _DENSE_MAX:
        sim = jnp.einsum("...id,...jd->...ij", q, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("...ij,...jd->...id", attn, v)

    nk = k.shape[-2]
    pad = (-nk) % kv_chunk
    if pad:
        k = jnp.pad(k, [(0, 0)] * (k.ndim - 2) + [(0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, pad), (0, 0)])
        mask_base = jnp.arange(nk + pad) < nk
    else:
        mask_base = None
    chunks = (nk + pad) // kv_chunk

    kc = jnp.moveaxis(
        k.reshape(k.shape[:-2] + (chunks, kv_chunk, d)), -3, 0
    )  # (chunks, ..., kv_chunk, d)
    vc = jnp.moveaxis(v.reshape(v.shape[:-2] + (chunks, kv_chunk, d)), -3, 0)
    if mask_base is not None:
        maskc = mask_base.reshape(chunks, kv_chunk)
    else:
        maskc = jnp.ones((chunks, kv_chunk), bool)

    batch_shape = q.shape[:-2]
    m0 = jnp.full(batch_shape + (n,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros(batch_shape + (n,), jnp.float32)
    acc0 = jnp.zeros(batch_shape + (n, d), jnp.float32)

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

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kc, vc, maskc))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(v.dtype)
