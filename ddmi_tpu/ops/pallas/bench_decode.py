"""On-chip benchmark: fused Pallas INR decode vs the XLA separable-matmul
path, at CelebA-HQ head size (ch=256, latent=64), 256^2/512^2/1024^2 renders.

Run on the real TPU:  python -m ddmi_tpu.ops.pallas.bench_decode
Results are recorded in ddmi_tpu/ops/pallas/BENCH.md.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ddmi_tpu.core.config import MLPConfig
from ddmi_tpu.nn.inr import INRImage
from ddmi_tpu.ops.pallas.inr_decode import render_tokens_fused
from ddmi_tpu.ops.resample import pixel_center_lin

CH = 256
LATENT = 64
BATCH = 8


def _params():
    cfg = MLPConfig(in_ch=2, out_ch=3, ch=CH, latent_dim=LATENT)
    m = INRImage(cfg)
    coords = jnp.zeros((1, 16, 2))
    hdbf = [jnp.zeros((1, r, r, LATENT)) for r in (64, 128, 256)]
    p = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        coords, hdbf, 1.0,
    )["params"]
    return m, p


def _time(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    print("device:", jax.devices()[0].device_kind)
    m, params = _params()
    rng = np.random.default_rng(0)
    hdbf = [
        jnp.asarray(rng.standard_normal((BATCH, r, r, LATENT)), jnp.bfloat16)
        for r in (64, 128, 256)
    ]

    def xla_path(res, chunk_tokens=1 << 15):
        """The pipeline's production baseline: lax.map over row chunks
        (ImagePipeline._render_grid semantics)."""
        lin = pixel_center_lin(res).astype(jnp.bfloat16)
        rows_per = max(1, min(res, chunk_tokens // res))
        while res % rows_per:
            rows_per -= 1
        ys_chunks = lin.reshape(res // rows_per, rows_per)

        def fn(p, h):
            def render(ys):
                return m.apply(
                    {"params": p}, None, h, 1.0, grid_1d=(lin, ys),
                    rngs={"noise": jax.random.PRNGKey(3)},
                )

            out = jax.lax.map(render, ys_chunks)
            return jnp.moveaxis(out, 0, 1).reshape(BATCH, res * res, -1)

        return jax.jit(fn)

    for res in (256, 512, 1024):
        n_tokens = BATCH * res * res
        flops = 2 * n_tokens * (14 * 256 * 256 + 6 * 128 * 256)
        tx, ox = _time(xla_path(res), params, hdbf)
        tf, of = _time(
            jax.jit(
                lambda p, h: render_tokens_fused(
                    p, h, res, 1.0, seed=0, ch=CH
                )
            ),
            params, hdbf,
        )
        err = float(
            jnp.mean(
                jnp.abs(
                    of.astype(jnp.float32) - ox.astype(jnp.float32)
                )
            )
        )
        print(
            f"res {res:5d}: xla {tx*1e3:8.2f} ms  fused {tf*1e3:8.2f} ms  "
            f"speedup {tx/tf:5.2f}x  fused {flops/tf/1e12:6.1f} TFLOP/s  "
            f"mean|diff| {err:.4f}"
        )

    # noise statistics on-chip: different seeds differ; spread is sane
    def with_noise(t):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = with_noise(v)
            elif k == "weight" and v.shape == (1,):
                out[k] = jnp.ones((1,)) * 0.5
            else:
                out[k] = v
        return out

    pn = with_noise(params)
    f = jax.jit(
        lambda p, h, s: render_tokens_fused(p, h, 256, 1.0, seed=s, ch=CH)
    )
    a = np.asarray(f(pn, hdbf, 1), np.float32)
    b = np.asarray(f(pn, hdbf, 2), np.float32)
    assert not np.allclose(a, b), "noise seeds must differ"
    print(
        f"noise check: seed-to-seed mean|diff| {np.abs(a-b).mean():.4f}, "
        f"finite={np.isfinite(a).all()}"
    )


if __name__ == "__main__":
    main()
