"""Single-pass VMEM multi-head attention for short sequences.

The ADM UNet's attention shapes (configs/ldm/celebahq.yaml: 64x64 latents,
num_head_channels=32) are n in {64, 256, 1024} with head_dim 32.  At these
sizes the whole per-(batch, head) score matrix fits in VMEM (n=1024 ->
4 MB fp32), so the flash-attention machinery (streamed KV blocks, running
max/sum rescale passes) is pure overhead: this kernel computes scores,
softmax, and the value contraction in one pass with zero HBM score traffic
and no rescaling.  Measured vs the Pallas flash kernel at the production
shapes in ops/pallas/BENCH.md.

head_dim=32 caps MXU lane utilization at 32/128 for both matmuls — that
bound is shape-inherent (reference parity fixes num_head_channels, see
/root/reference/models/ldm/modules/diffusionmodules/openaimodel.py:283-427);
what this kernel removes is everything *above* that floor.

`heads_per_block` packs several heads into one grid instance so tiny
shapes (n=64: a 4K-element score matrix) don't drown in per-instance
pipeline overhead.

Forward-only: sampling and eval run it; training keeps the flash kernel
(its streamed backward is what makes 1024-token training fit).  A
custom_vjp recomputes the dense backward if someone differentiates it,
so the op is still correct under grad.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# n above which the score matrix no longer comfortably fits VMEM and the
# flash kernel should take over (n=2048 -> 16 MB fp32 scores).
VMEM_ATTN_MAX_TOKENS = 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, hpb: int):
    for h in range(hpb):
        # Fold the softmax scale into q — (n, hd) work instead of an (n, n)
        # VPU pass over the score matrix.  The multiply runs in fp32 and the
        # product takes ONE rounding to q's dtype; vs the post-dot fp32
        # `s * sm_scale` this costs at most one extra bf16 rounding of q*scale
        # (same order as the bf16 representation error already present in q).
        q = (q_ref[0, h].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # Normalize AFTER the value contraction: the divide runs on the
        # (n, hd) output instead of the (n, n) score matrix — one less
        # full-n^2 VPU pass (the n^2 exp is the irreducible part).
        acc = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, h] = (acc / denom).astype(o_ref.dtype)


def _heads_per_block(n: int, nh: int) -> int:
    # Keep per-instance VMEM (hpb * n * hd * 3 * 2B + n*n*4B) bounded while
    # amortizing pipeline overhead for small n.  Chosen from on-chip sweeps
    # (ops/pallas/BENCH.md).
    if n >= 1024:
        # hpb=4 OOMs scoped VMEM (multiple 4 MB fp32 score matrices live);
        # hpb=2 measured best on-chip.
        target = 2
    elif n >= 256:
        target = 8
    else:
        target = 32
    for hpb in range(min(target, nh), 0, -1):
        if nh % hpb == 0:
            return hpb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mha_vmem(q, k, v, sm_scale: float, interpret: bool = False):
    """Attention over (B, nh, n, hd) q/k/v; returns same-shaped output.

    n must be a multiple of 8 and <= VMEM_ATTN_MAX_TOKENS; hd <= 128.
    """
    return _mha_vmem_fwd_impl(q, k, v, sm_scale, interpret)


def _mha_vmem_fwd_impl(q, k, v, sm_scale: float, interpret: bool = False):
    B, nh, n, hd = q.shape
    hpb = _heads_per_block(n, nh)
    grid = (B, nh // hpb)
    spec = pl.BlockSpec((1, hpb, n, hd), lambda b, h: (b, h, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, hpb=hpb),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _dense_ref(q, k, v, sm_scale: float):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v).astype(q.dtype)


def _fwd(q, k, v, sm_scale: float, interpret: bool = False):
    return _mha_vmem_fwd_impl(q, k, v, sm_scale, interpret), (q, k, v)


def _bwd(sm_scale: float, interpret: bool, res, g):
    # Differentiation recomputes through the dense formulation — correct but
    # memory-hungry; the training paths select the flash kernel instead
    # (nn/unet.py AttentionBlock).
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _dense_ref(q, k, v, sm_scale), q, k, v)
    return vjp(g)


mha_vmem.defvjp(_fwd, _bwd)


def supported(n: int, hd: int) -> bool:
    return n % 8 == 0 and n <= VMEM_ATTN_MAX_TOKENS and hd <= 128


# --- inference-mode switch -------------------------------------------------
#
# Sampling/eval programs trace with this flag set (diffusion/process.py wraps
# its sampler bodies), steering AttentionBlock onto mha_vmem; training traces
# leave it unset and keep the flash kernel, whose streamed backward is what
# makes 1024-token training fit in HBM.  Trace-time only: the flag is read
# while jit traces the program, never at run time.

_INFERENCE_MODE = False


class inference_mode:
    """Context manager marking the enclosed trace as a no-grad inference
    program (enables the VMEM attention kernel)."""

    def __enter__(self):
        global _INFERENCE_MODE
        self._prev = _INFERENCE_MODE
        _INFERENCE_MODE = True
        return self

    def __exit__(self, *exc):
        global _INFERENCE_MODE
        _INFERENCE_MODE = self._prev
        return False


def is_inference() -> bool:
    return _INFERENCE_MODE
