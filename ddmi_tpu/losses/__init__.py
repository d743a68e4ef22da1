from ddmi_tpu.losses.gan import (
    GANLoss2D,
    GANLoss3D,
    NLayerDiscriminator,
    NLayerDiscriminator3D,
    hinge_d_loss,
    vanilla_d_loss,
)
from ddmi_tpu.losses.diffaugment import diff_augment

__all__ = [
    "GANLoss2D",
    "GANLoss3D",
    "NLayerDiscriminator",
    "NLayerDiscriminator3D",
    "hinge_d_loss",
    "vanilla_d_loss",
    "diff_augment",
]
