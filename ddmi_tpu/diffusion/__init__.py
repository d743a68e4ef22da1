from ddmi_tpu.diffusion.schedule import DiffusionSchedule, make_beta_schedule, make_schedule
from ddmi_tpu.diffusion.process import (
    GaussianDiffusion,
    ddim_sample,
    p_losses,
    p_sample_loop,
    q_sample,
)

__all__ = [
    "DiffusionSchedule",
    "GaussianDiffusion",
    "make_beta_schedule",
    "make_schedule",
    "q_sample",
    "p_losses",
    "ddim_sample",
    "p_sample_loop",
]
