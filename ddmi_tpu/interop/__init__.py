"""Interop: import trained reference-DDMI PyTorch checkpoints.

`reference_ckpt` maps the reference's torch state_dicts onto this framework's
Flax parameter trees so users migrating from mlvlab/DDMI can reuse trained
weights (stage-1 D2C-VAE and stage-2 LDM, image domain).
"""

from ddmi_tpu.interop.reference_ckpt import (  # noqa: F401
    convert_mlp_image,
    convert_stage1_image,
    convert_stage2_image,
    convert_unet,
    convert_vae,
)
