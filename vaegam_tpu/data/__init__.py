"""Data pipeline: CSV-driven fMRI volume dataset and loaders."""

from .dataset import FMRIDataset, DataLoader, setup_data_loaders, GLOBAL_SCALE
from .device_cache import DeviceResidentLoader, setup_device_loaders
from .prefetch import PrefetchLoader, setup_prefetch_loaders

__all__ = ["FMRIDataset", "DataLoader", "setup_data_loaders", "GLOBAL_SCALE",
           "DeviceResidentLoader", "setup_device_loaders",
           "PrefetchLoader", "setup_prefetch_loaders", "wide_eval_view"]


def wide_eval_view(loader, img_dim, width=128, max_map_bytes=1.5 * 2**30):
    """A wider-batch unshuffled view of a loader for the output stage.

    Recon/eval passes run the same forward as training but at the TRAINING
    batch size (reference vae_reg_GP.py:585-594 reuses the train loader),
    leaving the encoder MXU-starved at small B (the train path is 9B wide
    through the decoder, the eval maps path too — but B=32 encoder tiles
    poorly).  NOTE outputs are NOT bit-identical across widths: the
    batch-stat norms (reference track_running_stats=False semantics) make
    every forward batch-size-dependent, which is why the CLI keeps this
    opt-in (--eval_batch_size).

    The width is capped so the recon stage's map blocks stay under
    ``max_map_bytes`` (at MNI grid the maps themselves dominate HBM).  The
    depth-2 recon pipeline (outputs/recons.py) keeps TWO 10 x B x img_dim
    fp32 blocks live at once — batch k's block is held for host copies
    while batch k+1's forward runs — so the cap budgets for both.
    Device-cache loaders share the existing HBM cache (no second upload);
    other kinds get a same-class unshuffled loader over the same dataset.
    """
    cap = int(max_map_bytes // (2 * 10 * img_dim * 4))
    eval_bs = max(loader.batch_size, min(width, cap))
    if eval_bs <= loader.batch_size:
        return loader
    if isinstance(loader, DeviceResidentLoader):
        return DeviceResidentLoader.sharing_cache(
            loader, batch_size=eval_bs, shuffle=False)
    if isinstance(loader, PrefetchLoader):
        # preserve the loader's exact wire dtype (float16 vs bfloat16 differ
        # by 8x in mantissa quantization — the user's --stream_dtype choice)
        import numpy as _np
        wire = ("float32" if loader.transfer_dtype is None
                else _np.dtype(loader.transfer_dtype).name)
        return PrefetchLoader(loader.dataset, eval_bs, shuffle=False,
                              mesh=loader.mesh, depth=loader.depth,
                              workers=loader.workers, transfer_dtype=wire)
    return DataLoader(loader.dataset, eval_bs, shuffle=False)
