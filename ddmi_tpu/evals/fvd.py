"""FVD (Fréchet Video Distance) and video eval drivers.

Port of evals/fvd/fvd.py:5-105 + evals/eval.py:254-345 (test_rfvd /
test_fvd_ddpm, PSNR): videos resized to 224^2, scaled to [-1,1], embedded
with I3D-400 logits, Fréchet distance over the logit statistics."""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddmi_tpu.evals.fid import activation_statistics, frechet_distance


def preprocess_video(videos: jnp.ndarray) -> jnp.ndarray:
    """(b, t, h, w, 3) in [0,1] -> (b, t, 224, 224, 3) in [-1,1]
    (fvd.py:5-40)."""
    b, t, h, w, c = videos.shape
    out = jax.image.resize(videos, (b, t, 224, 224, c), method="bilinear")
    return 2.0 * out - 1.0


class FVDScorer:
    def __init__(self, i3d_params):
        from ddmi_tpu.evals.i3d import I3D

        self.model = I3D()
        self.params = i3d_params
        self._embed = jax.jit(
            lambda p, v: self.model.apply({"params": p}, preprocess_video(v))
        )

    def embeddings(self, videos: Iterable[np.ndarray]) -> np.ndarray:
        out = []
        for batch in videos:
            out.append(np.asarray(self._embed(self.params, jnp.asarray(batch))))
        return np.concatenate(out, 0)

    def fvd(self, real: Iterable[np.ndarray], fake: Iterable[np.ndarray]) -> float:
        mu_r, s_r = activation_statistics(self.embeddings(real))
        mu_f, s_f = activation_statistics(self.embeddings(fake))
        return frechet_distance(mu_r, s_r, mu_f, s_f)


def test_rfvd(
    scorer: FVDScorer,
    reconstruct_fn: Callable[[np.ndarray], np.ndarray],
    test_data: Iterable[np.ndarray],
    max_batches: int = 512,
) -> float:
    """Reconstruction FVD (evals/eval.py:254-300)."""
    reals, fakes = [], []
    for i, batch in enumerate(test_data):
        if i >= max_batches:
            break
        reals.append(batch)
        fakes.append(np.asarray(reconstruct_fn(batch)))
    return scorer.fvd(reals, fakes)


def test_fvd_sample(
    scorer: FVDScorer,
    sample_fn: Callable[[jax.Array], np.ndarray],
    test_data: Iterable[np.ndarray],
    n_samples: int = 2048,
    rng: Optional[jax.Array] = None,
) -> float:
    """Generation FVD (evals/eval.py:303-345)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    fakes = []
    n = 0
    while n < n_samples:
        rng, sub = jax.random.split(rng)
        v = np.asarray(sample_fn(sub))
        fakes.append(v)
        n += v.shape[0]
    return scorer.fvd(test_data, fakes)


def psnr(
    reconstruct_fn: Callable[[np.ndarray], np.ndarray],
    test_data: Iterable[np.ndarray],
    max_batches: int = 100,
) -> float:
    """-10 log10(MSE) over the test loader (evals/eval.py:45-72)."""
    vals = []
    for i, batch in enumerate(test_data):
        if i >= max_batches:
            break
        recon = np.asarray(reconstruct_fn(batch))
        mse = np.mean((recon - batch) ** 2)
        vals.append(-10.0 * np.log10(max(mse, 1e-12)))
    return float(np.mean(vals))
