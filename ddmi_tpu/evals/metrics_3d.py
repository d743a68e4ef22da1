"""3D evaluation metrics: chamfer MMD/COV (generation quality) and mesh
IoU / chamfer / F-score (reconstruction quality).

Ports of evals_3d/compute_metrics_3d.py:31-72 (MMD/COV over unit-sphere
normalized 2048-point clouds; note the reference imports helpers that are
NOT in its repo — SURVEY.md §2.12) and convocc/src/eval.py:27-220
(MeshEvaluator).  Pairwise chamfer runs jitted on TPU in tiles; the
1355x1355 pair matrix streams through device batches."""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_unit_sphere(pc: np.ndarray) -> np.ndarray:
    """Center + scale each cloud to the unit sphere (reference protocol)."""
    c = pc.mean(axis=-2, keepdims=True)
    pc = pc - c
    r = np.sqrt((pc**2).sum(-1)).max(axis=-1, keepdims=True)[..., None]
    return pc / np.maximum(r, 1e-12)


@partial(jax.jit, static_argnames=())
def _chamfer_pair_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a (na, p, 3), b (nb, p, 3) -> (na, nb) symmetric chamfer-L2 means."""

    def one(ai):
        # (p,3) vs (nb,p,3)
        d2 = jnp.sum((ai[None, :, None, :] - b[:, None, :, :]) ** 2, -1)
        return d2.min(2).mean(1) + d2.min(1).mean(1)  # (nb,)

    return jax.lax.map(one, a)


def chamfer_matrix(
    ref: np.ndarray, gen: np.ndarray, tile: int = 32
) -> np.ndarray:
    """Full (n_ref, n_gen) chamfer matrix, tiled over ref rows."""
    out = np.empty((ref.shape[0], gen.shape[0]), np.float32)
    genj = jnp.asarray(gen, jnp.float32)
    for i in range(0, ref.shape[0], tile):
        chunk = jnp.asarray(ref[i : i + tile], jnp.float32)
        out[i : i + tile] = np.asarray(_chamfer_pair_matrix(chunk, genj))
    return out


def mmd_cov_1nna(ref: np.ndarray, gen: np.ndarray) -> Dict[str, float]:
    """MMD (mean over ref of min chamfer to gen), COV (fraction of ref
    matched as someone's nearest), and 1-NNA — the standard point-cloud
    generation metrics computed by the reference's (missing) PointFlow deps."""
    d = chamfer_matrix(normalize_unit_sphere(ref), normalize_unit_sphere(gen))
    mmd = float(d.min(axis=1).mean())
    cov = float(len(np.unique(d.argmin(axis=0))) / d.shape[0])

    # 1-NNA: leave-one-out nearest-neighbour classification accuracy over the
    # union; needs within-set distances too
    drr = chamfer_matrix(normalize_unit_sphere(ref), normalize_unit_sphere(ref))
    dgg = chamfer_matrix(normalize_unit_sphere(gen), normalize_unit_sphere(gen))
    np.fill_diagonal(drr, np.inf)
    np.fill_diagonal(dgg, np.inf)
    ref_nn_is_ref = drr.min(1) < d.min(1)
    gen_nn_is_gen = dgg.min(1) < d.min(0)
    acc = (ref_nn_is_ref.sum() + gen_nn_is_gen.sum()) / (
        len(ref_nn_is_ref) + len(gen_nn_is_gen)
    )
    return {"mmd": mmd, "cov": cov, "1nna": float(acc)}


def _nn_dists(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    from ddmi_tpu.geometry import KDTree

    return KDTree(dst).query(src)[0]


def eval_mesh(
    verts: np.ndarray,
    tris: np.ndarray,
    pointcloud_gt: np.ndarray,
    points_iou: np.ndarray,
    occ_gt: np.ndarray,
    n_surface: int = 100_000,
    f_threshold: float = 0.01,
) -> Dict[str, float]:
    """MeshEvaluator protocol (convocc/src/eval.py): chamfer-L1/L2, F-score
    at 1% threshold, volumetric IoU via point-in-mesh."""
    from ddmi_tpu.geometry import check_mesh_contains
    from ddmi_tpu.geometry.generation import sample_surface_points

    if len(verts) == 0:
        return {"chamfer_l1": np.inf, "chamfer_l2": np.inf,
                "fscore": 0.0, "iou": 0.0}

    pc = sample_surface_points(verts, tris, n_surface)
    d_gen2gt = _nn_dists(pc, pointcloud_gt)
    d_gt2gen = _nn_dists(pointcloud_gt, pc)

    chamfer_l1 = 0.5 * (d_gen2gt.mean() + d_gt2gen.mean())
    chamfer_l2 = 0.5 * ((d_gen2gt**2).mean() + (d_gt2gen**2).mean())
    precision = (d_gen2gt < f_threshold).mean()
    recall = (d_gt2gen < f_threshold).mean()
    fscore = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )

    occ_pred = check_mesh_contains(verts, tris, points_iou)
    occ_gt_b = occ_gt > 0.5
    union = np.logical_or(occ_pred, occ_gt_b).sum()
    inter = np.logical_and(occ_pred, occ_gt_b).sum()
    iou = float(inter / union) if union > 0 else 0.0

    return {
        "chamfer_l1": float(chamfer_l1),
        "chamfer_l2": float(chamfer_l2),
        "fscore": float(fscore),
        "iou": iou,
    }


def voxel_iou(
    occ_logits_fn,
    voxels_gt: np.ndarray,
    threshold: float = 0.5,
    chunk: int = 32768,
) -> float:
    """Voxel IoU against binvox ground truth — the reference's eval_step
    protocol (convocc/src/conv_onet/training.py:95-111): evaluate the
    occupancy model at the voxel cell centers of a [-0.5, 0.5]^3 grid,
    threshold probabilities, IoU vs the GT grid.

    occ_logits_fn: (n, 3) points -> (n,) occupancy LOGITS (thresholded at
    logit(threshold)); voxels_gt: (dx, dy, dz) array, occupied where >= 0.5.
    Queries run in fixed-size chunks so the jitted logits program compiles
    once regardless of grid size."""
    from ddmi_tpu.data.binvox import voxel_center_points

    pts = voxel_center_points(voxels_gt.shape)
    logit_thresh = float(np.log(threshold / (1.0 - threshold)))
    pred = np.empty(pts.shape[0], dtype=bool)
    for i in range(0, pts.shape[0], chunk):
        block = pts[i : i + chunk]
        n = block.shape[0]
        if n < chunk:  # fixed-shape pad so the jit program is reused
            block = np.concatenate([block, np.zeros((chunk - n, 3), block.dtype)])
        out = np.asarray(occ_logits_fn(block))
        pred[i : i + n] = out[:n] >= logit_thresh
    gt = np.asarray(voxels_gt).reshape(-1) >= 0.5
    union = np.logical_or(pred, gt).sum()
    return float(np.logical_and(pred, gt).sum() / union) if union else 0.0
