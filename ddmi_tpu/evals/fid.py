"""FID computation: activation statistics + Fréchet distance + eval drivers.

Port of evals/fid/fid_score.py:170-225 (Fréchet distance with matrix sqrt)
and the eval drivers in evals/eval.py (:77-131 test_rfid, :187-248 FID-N).
Feature extraction runs jitted on TPU in batches; the 2048x2048 covariance
sqrtm runs on host via scipy (eval-scale, not a hot path)."""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of (n, d) activations."""
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))  (fid_score.py:170-225)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


class FIDScorer:
    """Batched jitted feature extraction + FID over two image streams."""

    def __init__(self, inception_params, batch_size: int = 64):
        from ddmi_tpu.evals.inception import InceptionV3

        self.model = InceptionV3()
        self.params = inception_params
        self._extract = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)[0]
        )

    def features(self, images: Iterable[np.ndarray]) -> np.ndarray:
        """images: iterable of NHWC [0,1] batches -> (N, 2048).

        Streams: each image batch is consumed (featurized) as it arrives, so
        a generator of 10k samples never holds the pixel data — only the
        (N, 2048) features (80 MB at protocol scale) accumulate."""
        out = []
        for batch in images:
            out.append(np.asarray(self._extract(self.params, jnp.asarray(batch))))
        return np.concatenate(out, axis=0)

    def fid(
        self, real: Iterable[np.ndarray], fake: Iterable[np.ndarray]
    ) -> float:
        mu_r, s_r = activation_statistics(self.features(real))
        mu_f, s_f = activation_statistics(self.features(fake))
        return frechet_distance(mu_r, s_r, mu_f, s_f)

    def fid_against_stats(
        self, fake: Iterable[np.ndarray], stats_path: str
    ) -> float:
        """FID vs precomputed (mu, sigma) statistics — the reference's
        load_statistics path (evals/fid/fid_score.py; stats produced by
        ddmi_tpu.cli.precompute_fid)."""
        stats = np.load(stats_path)
        mu_f, s_f = activation_statistics(self.features(fake))
        return frechet_distance(stats["mu"], stats["sigma"], mu_f, s_f)


def test_rfid(
    scorer: FIDScorer,
    reconstruct_fn: Callable[[np.ndarray], np.ndarray],
    test_data: Iterable[np.ndarray],
    max_batches: int = 512,
) -> float:
    """Reconstruction FID (evals/eval.py:77-131): recon vs real over the test
    loader, <=512 batches.  Features stream batch-by-batch (no pixel
    buffering); any truncation is printed (no-silent-caps discipline)."""
    real_feats, fake_feats = [], []
    n_seen = truncated = 0
    for i, batch in enumerate(test_data):
        if i >= max_batches:
            truncated = 1
            break
        real_feats.append(scorer.features([np.asarray(batch)]))
        fake_feats.append(
            scorer.features([np.asarray(reconstruct_fn(batch))])
        )
        n_seen += np.asarray(batch).shape[0]
    if truncated:
        print(
            f"rFID: ran {max_batches} batches ({n_seen} images) — loader "
            f"truncated at max_batches={max_batches} (reference cap: 512, "
            f"evals/eval.py:98)"
        )
    else:
        print(f"rFID: full test loader, {n_seen} images")
    mu_r, s_r = activation_statistics(np.concatenate(real_feats))
    mu_f, s_f = activation_statistics(np.concatenate(fake_feats))
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def test_fid_n(
    scorer: FIDScorer,
    sample_fn: Callable[[jax.Array], np.ndarray],
    test_data: Iterable[np.ndarray],
    n_samples: int = 10000,
    batch: int = 50,
    rng: Optional[jax.Array] = None,
    protocol_n: int = 10000,
) -> float:
    """N-sample generation FID (evals/eval.py:187-248).  Generated batches
    are featurized as they are produced — a 10k-sample protocol run never
    materializes the pixel stream.  Progress + any deviation from the
    reference protocol count are printed."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    fake_feats = []
    n = 0
    while n < n_samples:
        rng, sub = jax.random.split(rng)
        imgs = np.asarray(sample_fn(sub))
        fake_feats.append(scorer.features([imgs]))
        n += imgs.shape[0]
        if n % max(batch * 10, 500) < imgs.shape[0]:
            print(f"FID sampling: {n}/{n_samples}")
    if n_samples != protocol_n:
        print(
            f"FID: ran {n} generated samples — PROTOCOL IS {protocol_n} "
            f"(evals/eval.py:187-248); raise data.extra.eval_samples for "
            f"reference-comparable numbers"
        )
    else:
        print(f"FID: {n} generated samples (protocol {protocol_n})")
    real_feats = scorer.features(test_data)
    print(f"FID: {real_feats.shape[0]} real samples")
    mu_r, s_r = activation_statistics(real_feats)
    mu_f, s_f = activation_statistics(np.concatenate(fake_feats))
    return frechet_distance(mu_r, s_r, mu_f, s_f)
