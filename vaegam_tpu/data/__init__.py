"""Data pipeline: CSV-driven fMRI volume dataset and loaders."""

from .dataset import FMRIDataset, DataLoader, setup_data_loaders, GLOBAL_SCALE

__all__ = ["FMRIDataset", "DataLoader", "setup_data_loaders", "GLOBAL_SCALE"]
