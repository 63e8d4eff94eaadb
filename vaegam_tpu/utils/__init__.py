"""Shared pure utilities (reference: utils.py)."""

from .signals import (
    hrf,
    hrf_jnp,
    stimulus_to_neural,
    control_stimulus_to_neural,
)
from .stats import (
    zscore,
    get_xu_ranges,
    scale_beta_maps,
    read_design_mat,
    mk_spherical_mask,
    str2bool,
)

__all__ = [
    "hrf",
    "hrf_jnp",
    "stimulus_to_neural",
    "control_stimulus_to_neural",
    "zscore",
    "get_xu_ranges",
    "scale_beta_maps",
    "read_design_mat",
    "mk_spherical_mask",
    "str2bool",
]
