from ddmi_tpu.nn.distributions import DiagonalGaussian
from ddmi_tpu.nn.vae import Autoencoder, Decoder, Encoder

__all__ = ["DiagonalGaussian", "Autoencoder", "Encoder", "Decoder"]
