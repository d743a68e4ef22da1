"""Micro-bench of the denoiser's AttentionBlock core at production shapes.

celebahq stage-2 (configs/ldm/celebahq.yaml) runs attention at three shapes
per UNet forward (B=8):
  ds2: n=1024, C=512,  nh=16, hd=32   x5 blocks  (flash path today)
  ds4: n=256,  C=1024, nh=32, hd=32   x5 blocks  (dense path today)
  ds8: n=64,   C=2048, nh=64, hd=32   x6 blocks  (dense path today)

Ablations (/tmp/ablate.log) put attention at ~9.7 ms of the 27 ms step —
36% of time at ~2% of FLOPs — because hd=32 uses 32/128 MXU lanes.  This
sweeps implementations per shape to find the fastest.  Timing follows the
axon rule: loop + host-materializing readback.
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B = 8
SHAPES = [
    dict(name="ds2", n=1024, nh=16, hd=32, C=512),
    dict(name="ds4", n=256, nh=32, hd=32, C=1024),
    dict(name="ds8", n=64, nh=64, hd=32, C=2048),
]


def _time(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def dense_f32(q, k, v):
    hd = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (hd**-0.5)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


def dense_bf16(q, k, v):
    hd = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp((s - m).astype(jnp.bfloat16).astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    a = e / jnp.sum(e, axis=-1, keepdims=True).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


def flash(q, k, v, blk_q, blk_k, blk_b=1):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    n = q.shape[1]
    bq = min(n, blk_q)
    bk = min(n, blk_k)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=blk_b,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bq, block_k_dq=bk, block_q_dq=bq,
    )
    hd = q.shape[-1]
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    o = flash_attention(qt, kt, vt, sm_scale=hd**-0.5, block_sizes=bs)
    return jnp.transpose(o, (0, 2, 1, 3))


def _block_args(key, n, C, dtype=jnp.bfloat16):
    import numpy as np

    side = int(n**0.5)
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (B, side, side, C), dtype)
    return (
        x,
        jnp.ones((C,), jnp.float32),
        jnp.zeros((C,), jnp.float32),
        (jax.random.normal(ks[1], (C, 3 * C)) / np.sqrt(C)).astype(dtype),
        jnp.zeros((3 * C,), jnp.float32),
        (jax.random.normal(ks[2], (C, C)) / np.sqrt(C)).astype(dtype),
        jnp.zeros((C,), jnp.float32),
    )


def block_fused(nh, hd, *args):
    from ddmi_tpu.ops.pallas.attn_block import fused_attention_block

    return fused_attention_block(*args, nh, hd**-0.5)


def block_unfused_vmem(nh, hd, x, gs, gb, wq, bq, wp, bp):
    """The current production composite: XLA GN + 1x1 convs around mha_vmem
    (what the sampler ran before the fused block kernel)."""
    from ddmi_tpu.ops.fused import group_norm
    from ddmi_tpu.ops.pallas.attention import mha_vmem

    Bx, H, W, C = x.shape
    n = H * W
    h = group_norm(x, gs, gb, 32, 1e-5)
    qkv = jax.lax.dot_general(
        h, wq.astype(h.dtype), (((3,), (0,)), ((), ()))
    ) + bq.astype(h.dtype)
    qkv = qkv.reshape(Bx, n, 3, nh, hd)
    qkv_t = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    out = mha_vmem(qkv_t[0], qkv_t[1], qkv_t[2], hd**-0.5)
    out = jnp.swapaxes(out, 1, 2).reshape(Bx, n, C)
    out = jax.lax.dot_general(
        out, wp.astype(out.dtype), (((2,), (0,)), ((), ()))
    ) + bp.astype(out.dtype)
    return x + out.reshape(Bx, H, W, C)


def main():
    key = jax.random.PRNGKey(0)
    results = {}
    for s in SHAPES:
        n, nh, hd = s["n"], s["nh"], s["hd"]
        q, k, v = (
            jax.random.normal(jax.random.PRNGKey(i), (B, n, nh, hd), jnp.bfloat16)
            for i in range(3)
        )
        variants = {
            "dense_f32": dense_f32,
            "dense_bf16": dense_bf16,
        }
        if n >= 512:
            variants["flash_1024"] = functools.partial(flash, blk_q=1024, blk_k=1024)
            variants["flash_512"] = functools.partial(flash, blk_q=512, blk_k=512)
            variants["flash_256"] = functools.partial(flash, blk_q=256, blk_k=256)
            variants["flash_512_b8"] = functools.partial(
                flash, blk_q=512, blk_k=512, blk_b=8
            )
            variants["flash_1024_b8"] = functools.partial(
                flash, blk_q=1024, blk_k=1024, blk_b=8
            )
        row = {}
        for name, fn in variants.items():
            try:
                jf = jax.jit(fn)
                dt = _time(jf, q, k, v)
                row[name] = round(dt * 1e3, 4)
            except Exception as e:  # noqa: BLE001
                row[name] = f"ERR: {type(e).__name__}: {str(e)[:120]}"
            print(json.dumps({s["name"]: {name: row[name]}}), flush=True)
        # full-block composites (GN + qkv + attention + proj + residual)
        bargs = _block_args(jax.random.PRNGKey(7), n, s["C"])
        for name, fn in (
            ("block_unfused_vmem", block_unfused_vmem),
            ("block_fused", block_fused),
        ):
            try:
                jf = jax.jit(functools.partial(fn, nh, hd))
                dt = _time(jf, *bargs)
                row[name] = round(dt * 1e3, 4)
            except Exception as e:  # noqa: BLE001
                row[name] = f"ERR: {type(e).__name__}: {str(e)[:120]}"
            print(json.dumps({s["name"]: {name: row[name]}}), flush=True)
        results[s["name"]] = row
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
