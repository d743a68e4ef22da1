"""Spectral-norm regularizer — the reference's de-facto training-stability
mechanism (utils/sr_utils.py:10-97, README.md:87).

Pure-functional redesign: conv kernels are grouped by flattened (out, fan_in)
shape, stacked, and a batched power iteration runs with the singular-vector
estimates (u, v) carried in the train state under stop_gradient — the
functional analogue of the reference's persisted sr_u/sr_v dict updated inside
torch.no_grad (sr_utils.py:56-71).  The returned penalty is the sum of
estimated top singular values; norm-scale penalty is max-abs of GroupNorm
gammas (sr_utils.py:77-83).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

SNState = Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]


def _collect_conv_mats(params: Any) -> Dict[str, List[jnp.ndarray]]:
    """All 4D conv kernels (HWIO) reshaped to (out, fan_in), grouped by shape.

    Matches the reference's nn.Conv2d collection (sr_utils.py:30-32): our
    Flax convs name their kernel 'kernel'; StyleGAN modulated weights are
    named 'weight' and are deliberately excluded (the reference only
    regularizes torch nn.Conv2d layers)."""
    groups: Dict[str, List[jnp.ndarray]] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim == 4:
            kh, kw, cin, cout = leaf.shape
            mat = jnp.transpose(leaf, (3, 0, 1, 2)).reshape(cout, kh * kw * cin)
            groups.setdefault(f"{cout}x{kh * kw * cin}", []).append(mat)
    return groups


def _normalize(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def init_sn_state(params: Any, rng: jax.Array, num_iter: int = 40) -> SNState:
    """Initialize (u, v) per group with extra power iterations (the reference
    uses 10x iterations on first touch, sr_utils.py:16)."""
    state: SNState = {}
    for key, mats in _collect_conv_mats(params).items():
        w = jnp.stack(mats)  # (n, out, fanin)
        n, rows, cols = w.shape
        rng, r1, r2 = jax.random.split(rng, 3)
        u = _normalize(jax.random.normal(r1, (n, rows)))
        v = _normalize(jax.random.normal(r2, (n, cols)))
        for _ in range(num_iter):
            v = _normalize(jnp.einsum("nr,nrc->nc", u, w))
            u = _normalize(jnp.einsum("nrc,nc->nr", w, v))
        state[key] = (u, v)
    return state


def spectral_norm_loss(
    params: Any, state: SNState, num_iter: int = 4
) -> Tuple[jnp.ndarray, SNState]:
    """One regularizer evaluation: refresh (u,v) with `num_iter` power steps
    (no gradient through the iteration) and return sum of sigmas."""
    loss = jnp.float32(0.0)
    new_state: SNState = {}
    for key, mats in _collect_conv_mats(params).items():
        w = jnp.stack(mats)
        u, v = state[key]
        w_sg = jax.lax.stop_gradient(w)
        for _ in range(num_iter):
            v = _normalize(jnp.einsum("nr,nrc->nc", u, w_sg))
            u = _normalize(jnp.einsum("nrc,nc->nr", w_sg, v))
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("nr,nrc,nc->n", u, w, v)
        loss = loss + jnp.sum(sigma)
        new_state[key] = (u, v)
    return loss, new_state


def norm_scale_loss(params: Any) -> jnp.ndarray:
    """Sum of max-abs GroupNorm scales (sr_utils.py:77-83)."""
    loss = jnp.float32(0.0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
        if name == "scale" and "GroupNorm" in str(parent):
            loss = loss + jnp.max(jnp.abs(leaf))
    return loss
