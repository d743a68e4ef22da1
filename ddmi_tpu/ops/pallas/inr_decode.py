"""Fused INR-decode Pallas kernel — the arbitrary-resolution render hot path.

The image INR head (ddmi_tpu.nn.inr.INRImage, reference
models/d2c_vae/mlp.py:12-66) is a stack of style-modulated 1x1 convolutions
over a flat token axis: 4 StyledResBlocks (3 modulated convs + skip each) and
a ToRGB, ~13 matmuls per token.  XLA executes each matmul as its own HBM
round-trip: at a 1024^2 render that is ~13 x 2 x N x ch x 2B of activation
traffic for ~0.5 FLOP/byte — memory-bound.

This kernel exploits two structural facts:

1. *The style is shared.*  The scale injection `si` is one scalar per render
   call, so the per-sample StyleGAN modulation/demodulation collapses into a
   plain weight preprocessing step on the host side of the call
   (`fold_inr_image_params`): W_eff = s_in[:, None] * W * scale * demod[None]
   — algebra identical to ddmi_tpu.nn.stylegan.ModulatedConv (k=1).

2. *All folded weights fit in VMEM* (< 4 MB at ch=256).  The kernel tiles the
   token axis; each tile runs the ENTIRE residual MLP out of VMEM and writes
   only the RGB output — one HBM read of the PE features and one write of the
   pixels, instead of 13 round-trips.

NoiseInjection (x + w * N(0,1), blocks.py:286-297) is generated in-kernel
from the TPU PRNG (Box-Muller over `pltpu.prng_random_bits`) — statistically
equivalent to the JAX-PRNG path, bit-different.  With w == 0 (the init value)
the kernel is bit-deterministic and is tested for exact parity against
INRImage (tests/test_pallas_decode.py).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT2 = math.sqrt(2.0)
INV_SQRT2 = 1.0 / SQRT2
LANE = 128


def _pad128(n: int) -> int:
    return max(LANE, ((n + LANE - 1) // LANE) * LANE)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FoldedINR:
    """Style-folded INRImage weights, padded for the kernel.

    wa: (14, CHP, CHP)  ch->ch matmuls (see _WA_ORDER)
    wb: (6, INP0, CHP)  x0/xm/xh->ch matmuls (see _WB_ORDER)
    act_bias: (12, CHP) per-conv fused-leaky-relu biases
    noise_w: (1, 12)    per-conv noise gains
    rgb_bias: (1, CHP)  ToRGB bias (first out_ch lanes)
    """

    wa: jnp.ndarray
    wb: jnp.ndarray
    act_bias: jnp.ndarray
    noise_w: jnp.ndarray
    rgb_bias: jnp.ndarray
    ch: int
    in0: int
    out_ch: int
    has_noise: bool

    def tree_flatten(self):
        leaves = (self.wa, self.wb, self.act_bias, self.noise_w, self.rgb_bias)
        return leaves, (self.ch, self.in0, self.out_ch, self.has_noise)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


# WA slot -> logical matmul (all (CHP, CHP)):
#  0 b2.conv1 (h part)   1 b2.conv2   2 b2.conv3   3 b2.skip (h part)
#  4 b3.conv1 (h part)   5 b3.conv2   6 b3.conv3   7 b3.skip (h part)
#  8 b4.conv1            9 b4.conv2  10 b4.conv3
# 11 b1.conv2           12 b1.conv3  13 torgb
# WB slot -> (INP0, CHP):
#  0 b1.conv1   1 b1.skip   2 b2.conv1 (xm part)   3 b2.skip (xm part)
#  4 b3.conv1 (xh part)     5 b3.skip (xh part)
# act_bias / noise_w index = conv order b1c1..b1c3, b2c1..b2c3, ...


def _style_vector(params: Dict[str, Any], si: jnp.ndarray, ch: int):
    """Replicates INRImage's scale-conditioning MLP (nn/inr.py style path)."""
    dim = ch // 4
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    e = jnp.asarray(si, jnp.float32).reshape(()) * freqs
    style = jnp.concatenate([jnp.sin(e), jnp.cos(e)])
    style = style @ params["Dense_0"]["kernel"] + params["Dense_0"]["bias"]
    style = jax.nn.gelu(style)
    return style @ params["Dense_1"]["kernel"] + params["Dense_1"]["bias"]


def _fold_mod_conv(conv: Dict[str, Any], style: jnp.ndarray, demodulate: bool):
    """ModulatedConv(k=1) -> dense W_eff (in, out); matches
    nn/stylegan.py ModulatedConv numerics exactly."""
    w = conv["weight"][0, 0]  # (in, out)
    in_ch = w.shape[0]
    scale = 1.0 / math.sqrt(in_ch)
    mw = conv["modulation"]["weight"]  # (ch, in)
    mb = conv["modulation"]["bias"]
    s = style @ (mw / math.sqrt(style.shape[0])) + mb  # (in,)
    w_eff = s[:, None] * (w * scale)
    if demodulate:
        demod = jax.lax.rsqrt(jnp.sum(w_eff**2, axis=0) + 1e-8)  # (out,)
        w_eff = w_eff * demod[None, :]
    return w_eff


def fold_inr_image_params(
    mlp_params: Dict[str, Any],
    si,
    *,
    ch: int,
    latent_dim: int,
    in_ch: int = 2,
    out_ch: int = 3,
    dtype=jnp.bfloat16,
) -> FoldedINR:
    """Fold INRImage params + one scale injection into kernel weights."""
    style = _style_vector(mlp_params, si, ch)
    in0 = latent_dim + in_ch
    INP0 = _pad128(in0)
    CHP = _pad128(ch)

    def pad_to(w, rows, cols):
        return jnp.zeros((rows, cols), jnp.float32).at[
            : w.shape[0], : w.shape[1]
        ].set(w)

    wa = []
    wb = []
    act_bias = []
    noise_w = []

    def block(name, first_in_wb_slots):
        """Fold one StyledResBlock; returns list appends in kernel order."""
        blk = mlp_params[name]
        w1 = _fold_mod_conv(blk["conv1"]["conv"], style, True)  # (in, ch)
        w2 = _fold_mod_conv(blk["conv2"]["conv"], style, True)
        w3 = _fold_mod_conv(blk["conv3"]["conv"], style, True)
        for conv in ("conv1", "conv2", "conv3"):
            act_bias.append(blk[conv]["act_bias"])
            noise_w.append(blk[conv]["noise"]["weight"].reshape(()))
        skip = None
        if "skip" in blk:
            ws = blk["skip"]["EqualLinear_0"]["weight"]
            skip = ws * (1.0 / math.sqrt(ws.shape[0]))
        return w1, w2, w3, skip

    b1 = block("net_res1", True)
    b2 = block("net_res2", False)
    b3 = block("net_res3", False)
    b4 = block("net_res4", False)

    # b1: conv1/skip act on x0 only (in0 wide)
    wb.append(pad_to(b1[0], INP0, CHP))          # 0 b1.conv1
    wb.append(pad_to(b1[3], INP0, CHP))          # 1 b1.skip
    # b2: conv1/skip act on concat(h(ch), xm(in0)) -> split rows
    wa_list = [
        pad_to(b2[0][:ch], CHP, CHP),            # 0 b2.conv1 h-part
        pad_to(b2[1], CHP, CHP),                 # 1 b2.conv2
        pad_to(b2[2], CHP, CHP),                 # 2 b2.conv3
        pad_to(b2[3][:ch], CHP, CHP),            # 3 b2.skip h-part
        pad_to(b3[0][:ch], CHP, CHP),            # 4 b3.conv1 h-part
        pad_to(b3[1], CHP, CHP),                 # 5 b3.conv2
        pad_to(b3[2], CHP, CHP),                 # 6 b3.conv3
        pad_to(b3[3][:ch], CHP, CHP),            # 7 b3.skip h-part
        pad_to(b4[0], CHP, CHP),                 # 8 b4.conv1
        pad_to(b4[1], CHP, CHP),                 # 9 b4.conv2
        pad_to(b4[2], CHP, CHP),                 # 10 b4.conv3
        pad_to(b1[1], CHP, CHP),                 # 11 b1.conv2
        pad_to(b1[2], CHP, CHP),                 # 12 b1.conv3
    ]
    wb.append(pad_to(b2[0][ch:], INP0, CHP))     # 2 b2.conv1 xm-part
    wb.append(pad_to(b2[3][ch:], INP0, CHP))     # 3 b2.skip xm-part
    wb.append(pad_to(b3[0][ch:], INP0, CHP))     # 4 b3.conv1 xh-part
    wb.append(pad_to(b3[3][ch:], INP0, CHP))     # 5 b3.skip xh-part

    # torgb: modulated (no demod) + bias
    w_rgb = _fold_mod_conv(mlp_params["torgb"]["conv"], style, False)
    wa_list.append(pad_to(w_rgb, CHP, CHP))      # 13 torgb
    rgb_bias = jnp.zeros((1, CHP), jnp.float32).at[0, :out_ch].set(
        mlp_params["torgb"]["bias"]
    )

    wa_arr = jnp.stack(wa_list).astype(dtype)
    wb_arr = jnp.stack(wb).astype(dtype)
    ab = jnp.stack(
        [jnp.zeros((CHP,), jnp.float32).at[:ch].set(b) for b in act_bias]
    )
    nw = jnp.stack(noise_w).reshape(1, 12)
    has_noise = bool(jnp.any(jnp.abs(nw) > 0)) if not isinstance(
        nw, jax.core.Tracer
    ) else True
    return FoldedINR(
        wa=wa_arr, wb=wb_arr, act_bias=ab, noise_w=nw, rgb_bias=rgb_bias,
        ch=ch, in0=in0, out_ch=out_ch, has_noise=has_noise,
    )


def _make_kernel(tile: int, has_noise: bool):
    def kernel(seed_ref, x0_ref, xm_ref, xh_ref, wa_ref, wb_ref, ab_ref,
               nw_ref, rgbb_ref, out_ref):
        if has_noise:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            # prng_random_bits lands as int32 on hardware — bitcast to uint32
            # BEFORE shifting, else >> sign-extends and the [1,2) mantissa
            # trick below breaks (sqrt of a negative -> NaN)
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((tile, LANE)), jnp.uint32
            )
            u = pltpu.bitcast(
                (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
            ) - 1.0  # [0, 1)
            # 12 independent N(0,1) columns via Box-Muller over lane pairs,
            # pre-scaled by the per-conv noise gains
            u1 = jnp.maximum(u[:, 0:12], 1e-7)
            u2 = u[:, 12:24]
            gauss = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                2.0 * math.pi * u2
            )  # (tile, 12)
            gauss = gauss * nw_ref[0, :][None, :]

        x0 = x0_ref[:]
        xm = xm_ref[:]
        xh = xh_ref[:]
        cdt = x0.dtype

        def mm(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def styled(pre, k):
            """NoiseInjection + fused bias-LeakyReLU (fp32)."""
            if has_noise:
                pre = pre + gauss[:, k : k + 1]
            z = pre + ab_ref[k, :][None, :]
            return jnp.where(z >= 0.0, z, 0.2 * z) * SQRT2

        def resblock(h, extra, k0, wa1, wa2, wa3, was, wb1, wbs):
            """h: (tile, CHP) bf16 or None (block1); extra: x0/xm/xh part."""
            a = mm(extra, wb_ref[wb1]) if wb1 is not None else 0.0
            if h is not None and wa1 is not None:
                a = a + mm(h, wa_ref[wa1])
            a = styled(a, k0).astype(cdt)
            a = styled(mm(a, wa_ref[wa2]), k0 + 1).astype(cdt)
            a = styled(mm(a, wa_ref[wa3]), k0 + 2)
            if wbs is not None or was is not None:
                s = mm(extra, wb_ref[wbs]) if wbs is not None else 0.0
                if was is not None:
                    s = s + mm(h, wa_ref[was])
            else:
                s = h.astype(jnp.float32)
            return ((a + s) * INV_SQRT2).astype(cdt)

        h = resblock(None, x0, 0, None, 11, 12, None, 0, 1)       # net_res1
        h = resblock(h, xm, 3, 0, 1, 2, 3, 2, 3)                  # net_res2
        h = resblock(h, xh, 6, 4, 5, 6, 7, 4, 5)                  # net_res3
        h = resblock(h, None, 9, 8, 9, 10, None, None, None)      # net_res4
        out = mm(h, wa_ref[13]) + rgbb_ref[0, :][None, :]         # torgb
        out_ref[:] = out[:, :LANE].astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("tile", "interpret"))
def inr_decode_fused(
    folded: FoldedINR,
    x0: jnp.ndarray,
    xm: jnp.ndarray,
    xh: jnp.ndarray,
    seed,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x0/xm/xh: (N, INP0) padded PE features (concat [pe, scale_pix], then
    zero-pad to INP0 lanes).  Returns (N, out_ch)."""
    N, INP0 = x0.shape
    CHP = folded.wa.shape[-1]
    npad = (-N) % tile
    if npad:
        pad = lambda a: jnp.pad(a, ((0, npad), (0, 0)))
        x0, xm, xh = pad(x0), pad(xm), pad(xh)
    grid = (x0.shape[0] // tile,)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = _make_kernel(tile, folded.has_noise)
    tok_spec = pl.BlockSpec(
        (tile, INP0), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            tok_spec, tok_spec, tok_spec,
            full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec(
            (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((x0.shape[0], LANE), x0.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x0.shape[0] * CHP * (14 * CHP + 6 * INP0),
            bytes_accessed=x0.shape[0] * (3 * INP0 + LANE) * x0.dtype.itemsize,
            transcendentals=x0.shape[0] * 24,
        ),
        interpret=interpret,
    )(seed_arr, x0, xm, xh, folded.wa, folded.wb, folded.act_bias,
      folded.noise_w, folded.rgb_bias)
    return out[:N, : folded.out_ch]


def render_tokens_fused(
    mlp_params: Dict[str, Any],
    hdbf,
    res: int,
    si,
    seed,
    *,
    ch: int,
    in_ch: int = 2,
    out_ch: int = 3,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ImagePipeline._render_grid: regular
    res x res pixel-center render of a 3-level HDBF pyramid -> (b, res*res,
    out_ch).  PE sampling stays as separable MXU matmuls (ops/resample.py);
    the 13-matmul styled MLP runs in one Pallas kernel."""
    from ddmi_tpu.ops.resample import pixel_center_lin, separable_grid_sample

    b = hdbf[0].shape[0]
    latent = hdbf[0].shape[-1]
    lin = pixel_center_lin(res).astype(hdbf[0].dtype)
    n = res * res
    in0 = latent + in_ch
    INP0 = _pad128(in0)

    def pe(plane):
        out = separable_grid_sample(
            plane, lin, lin, align_corners=False, padding_mode="border"
        )
        return out.reshape(b * n, latent)

    si_f = jnp.asarray(si, hdbf[0].dtype)

    def tokens(plane):
        t = pe(plane)
        t = jnp.concatenate(
            [t, jnp.full((b * n, in_ch), si_f, t.dtype)], axis=-1
        )
        return jnp.pad(t, ((0, 0), (0, INP0 - in0)))

    folded = fold_inr_image_params(
        mlp_params, si, ch=ch, latent_dim=latent, in_ch=in_ch, out_ch=out_ch,
        dtype=hdbf[0].dtype,
    )
    out = inr_decode_fused(
        folded, tokens(hdbf[0]), tokens(hdbf[1]), tokens(hdbf[2]), seed,
        tile=tile, interpret=interpret,
    )
    return out.reshape(b, n, out_ch)
