"""Standalone Convolutional-Occupancy-Network training (the convocc
subsystem's own trainer, conv_onet/training.py): BCE over query-point
occupancies, IoU eval, mesh extraction via the shared MeshGenerator.

This is the reference's pretraining utility for occupancy representations —
separate from the DDMI two-stage pipeline (which trains pointnet+VAE+INR3D
jointly, domains/occupancy.py)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddmi_tpu.nn.onet import ConvONet, LocalDecoder
from ddmi_tpu.nn.pointnet import LocalPoolPointnet, LocalVoxelEncoder
from ddmi_tpu.nn.pointnetpp import PointNetPlusPlus

# convocc/src/encoder/__init__.py encoder_dict equivalent.  As in the
# reference, `pointnet_plus_plus` is registered but selected by no shipped
# config (it yields per-point features, not the plane features LocalDecoder
# consumes — the same mismatch exists upstream).
ENCODER_REGISTRY = {
    "pointnet_local_pool": LocalPoolPointnet,
    "voxel_simple_local": LocalVoxelEncoder,
    "pointnet_plus_plus": PointNetPlusPlus,
}


class ONetState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass
class ONetPipeline:
    """conv_onet Trainer equivalent; kwargs follow the convocc YAML schema
    (model.{c_dim, encoder, encoder_kwargs, decoder_kwargs})."""

    c_dim: int = 32
    encoder: str = "pointnet_local_pool"
    encoder_kwargs: Optional[Dict[str, Any]] = None
    decoder_kwargs: Optional[Dict[str, Any]] = None
    lr: float = 1e-4
    threshold: float = 0.2

    def __post_init__(self):
        ek = dict(self.encoder_kwargs or {})
        ek.setdefault("c_dim", self.c_dim)
        enc_cls = ENCODER_REGISTRY.get(self.encoder, LocalPoolPointnet)
        enc = enc_cls(**ek)
        dk = dict(self.decoder_kwargs or {})
        dk.setdefault("c_dim", self.c_dim)
        dec = LocalDecoder(**dk)
        self.model = ConvONet(encoder=enc, decoder=dec)
        self.tx = optax.adam(self.lr)

    def init(self, rng, example_batch) -> ONetState:
        params = self.model.init(
            rng,
            jnp.asarray(example_batch["points"])[:1],
            jnp.asarray(example_batch["inputs"])[:1],
        )["params"]
        return ONetState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

    def loss(self, params, batch):
        """Sum-over-points BCE, mean over batch (training.py compute_loss)."""
        logits = self.model.apply(
            {"params": params}, batch["points"], batch["inputs"]
        )
        bce = optax.sigmoid_binary_cross_entropy(logits, batch["occ"])
        return bce.sum(-1).mean()

    def train_step(self, state: ONetState, batch):
        loss, grads = jax.value_and_grad(self.loss)(state.params, batch)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state),
            {"loss": loss},
        )

    def eval_iou(self, params, batch) -> float:
        """training.py eval_step: IoU of thresholded probs vs labels."""
        logits = jax.device_get(
            self.model.apply({"params": params}, batch["points"],
                             batch["inputs"])
        )
        thr = float(np.log(self.threshold) - np.log(1 - self.threshold))
        pred = np.asarray(logits) > thr
        occ = np.asarray(batch["occ"]) > 0.5
        inter = np.logical_and(pred, occ).sum(-1)
        union = np.logical_or(pred, occ).sum(-1).clip(1)
        return float((inter / union).mean())

    def mesh_eval_fn(self, params, inputs):
        """jittable (1, n, 3) -> (1, n) logits closure for MeshGenerator."""
        planes = self.model.apply(
            {"params": params}, inputs, method=self.model.encode_inputs
        )

        def eval_points(points):
            return self.model.apply(
                {"params": params}, points, planes, method=self.model.decode
            )

        return eval_points
