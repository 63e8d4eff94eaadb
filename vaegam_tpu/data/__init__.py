"""Data pipeline: CSV-driven fMRI volume dataset and loaders."""

from .dataset import FMRIDataset, DataLoader, setup_data_loaders, GLOBAL_SCALE
from .device_cache import DeviceResidentLoader, setup_device_loaders
from .prefetch import PrefetchLoader, setup_prefetch_loaders

__all__ = ["FMRIDataset", "DataLoader", "setup_data_loaders", "GLOBAL_SCALE",
           "DeviceResidentLoader", "setup_device_loaders",
           "PrefetchLoader", "setup_prefetch_loaders"]
