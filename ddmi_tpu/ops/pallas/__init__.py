"""Pallas TPU kernels for the hot decode path."""

from ddmi_tpu.ops.pallas.inr_decode import (
    fold_inr_image_params,
    inr_decode_fused,
    render_tokens_fused,
)

__all__ = [
    "fold_inr_image_params",
    "inr_decode_fused",
    "render_tokens_fused",
]
