"""Model layer: networks, distributions, sparse GP, and the VAE-GAM core."""

from .vaegam import VAEGAMConfig, init_model, forward, MAP_KEYS

__all__ = ["VAEGAMConfig", "init_model", "forward", "MAP_KEYS"]
