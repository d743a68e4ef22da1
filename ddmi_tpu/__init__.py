"""DDMI-TPU: a TPU-native (JAX/Flax/pjit/Pallas) framework for Domain-Agnostic
Latent Diffusion Models over Implicit Neural Representations.

Re-designed from scratch for TPU hardware with the capabilities of the
mlvlab/DDMI reference (ICLR 2024): a two-stage generative framework
(D2C-VAE + latent diffusion) over implicit neural representations across
image / video / 3D-occupancy / NeRF domains.

Key design differences from the CUDA/torch reference:
  * NHWC layouts everywhere (TPU-native; reference is NCHW).
  * Sampling loops are `lax.scan`s inside a single jitted program
    (reference: Python for-loops, diffusion/ddpm.py:293,348).
  * Data parallelism via `jax.sharding.Mesh` + NamedSharding; gradient
    all-reduce happens inside compiled XLA (reference: Accelerate/DDP+NCCL).
  * StyleGAN modulated convolution uses the input-scaling formulation
    (batched MXU matmuls) instead of per-sample grouped convs.
  * grid_sample / upfirdn2d are XLA/Pallas ops with autodiff for free
    (reference: hand-written CUDA kernels under models/d2c_vae/op/).
"""

__version__ = "0.1.0"
