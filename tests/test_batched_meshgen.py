"""Batched lockstep MISE extraction (geometry/generation.py::
generate_meshes_batched) must be bit-identical to the serial MeshGenerator
path per mesh — same octree schedule, same grids, same extraction — while
issuing ONE device call per round for the whole group (the protocol-scale
occupancy eval path, VERDICT round-2 item 9)."""

import numpy as np
import pytest

from ddmi_tpu.geometry.generation import MeshGenerator, generate_meshes_batched

RADII = (0.22, 0.30, 0.41)


def _field(pts: np.ndarray, r: float) -> np.ndarray:
    """Occupancy logits for a sphere of radius r (positive inside)."""
    return 20.0 * (r - np.linalg.norm(pts, axis=-1))


def _group_fn(batch: np.ndarray) -> np.ndarray:
    assert batch.shape[0] == len(RADII) and batch.ndim == 3
    return np.stack([_field(batch[i], r) for i, r in enumerate(RADII)])


def _serial(r: float, **kw):
    def eval_fn(p):  # (1, n, 3) -> (1, n)
        return _field(p[0], r)[None]

    return MeshGenerator(eval_fn, **kw).generate()


@pytest.mark.parametrize("upsampling_steps", [0, 2])
def test_batched_matches_serial(upsampling_steps):
    kw = dict(
        threshold=0.2,
        resolution0=16,
        upsampling_steps=upsampling_steps,
        # small chunks: forces multiple rounds + per-mesh offsets so the
        # lockstep bookkeeping (not just one-shot eval) is exercised
        points_batch_size=2048,
    )
    got = generate_meshes_batched(_group_fn, len(RADII), **kw)
    assert len(got) == len(RADII)
    for (v1, t1), r in zip(got, RADII):
        v2, t2 = _serial(r, **kw)
        np.testing.assert_allclose(v1, v2)
        np.testing.assert_array_equal(t1, t2)
        assert len(t1) > 0
        # sanity: vertices sit on the iso-surface — logits cross the LOGIT
        # threshold log(t)-log(1-t) = -1.386, i.e. radius r + 1.386/20
        d = np.linalg.norm(v1, axis=-1)
        assert abs(float(d.mean()) - (r + 1.386 / 20)) < 0.05


def test_batched_simplify():
    kw = dict(
        threshold=0.2, resolution0=16, upsampling_steps=1,
        points_batch_size=4096, simplify_nfaces=100,
    )
    got = generate_meshes_batched(_group_fn, len(RADII), **kw)
    for (v, t), r in zip(got, RADII):
        assert 0 < len(t) <= 150  # quadric target is approximate
        d = np.linalg.norm(v, axis=-1)
        assert abs(float(d.mean()) - (r + 1.386 / 20)) < 0.08


def test_inactive_padding_slots_skipped():
    """Serving pads partial request groups to the compiled batch; inactive
    slots must produce empty meshes WITHOUT building an octree — a
    degenerate padding field (here: dense noise, the MISE worst case) must
    not drag the lockstep group (ADVICE r3)."""
    calls = {"n": 0}
    rng = np.random.default_rng(0)

    def group_fn(batch):
        calls["n"] += 1
        out = np.stack([_field(batch[i], r) for i, r in enumerate(RADII)])
        # slot 2 = padding: noise field that would degenerate MISE to dense
        out[2] = rng.standard_normal(out[2].shape) * 30.0
        return out

    kw = dict(threshold=0.2, resolution0=16, upsampling_steps=2,
              points_batch_size=2048)
    got = generate_meshes_batched(
        group_fn, len(RADII), active=[True, True, False], **kw
    )
    noisy_calls = calls["n"]
    assert len(got) == len(RADII)
    assert len(got[2][0]) == 0 and len(got[2][1]) == 0  # empty padding mesh
    # active slots still match the serial path exactly
    for i, r in list(enumerate(RADII))[:2]:
        v2, t2 = _serial(r, **kw)
        np.testing.assert_allclose(got[i][0], v2)
        np.testing.assert_array_equal(got[i][1], t2)
    # and the noise slot added no extra device rounds vs the all-active run
    calls["n"] = 0

    def counted_clean(batch):
        calls["n"] += 1
        return _group_fn(batch)

    generate_meshes_batched(counted_clean, len(RADII), **kw)
    assert noisy_calls <= calls["n"]
