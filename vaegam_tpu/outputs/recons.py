"""Volume reconstruction + subject/group averaged NIfTI maps.

Reference behavior preserved:
  * reconstruct (vae_reg_GP.py:585-620): per batch, forward with maps; for
    each of the 10 map keys and each element, write
    {save_dir}/vol_{n}/recon_{key}.nii with the subject's reference
    affine+header.
  * mk_single_volumes (build_model_recons.py:15-38): creates
    reconstructions/{epoch:03d}_model_recons/{subj}/ then reconstructs.
  * mk_avg_maps (build_model_recons.py:40-116): per-subject averages of the
    written per-volume files, then the grand average;
    {map}_avg.nii files under {epoch:03d}_avg_model_recons/.

TPU-first: device compute is one jitted maps-forward per batch; NIfTI writes
are host-side and asynchronous (writer thread pool overlapped with the next
batch's device compute).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List

import numpy as np
import pandas as pd


from ..models.vaegam import MAP_KEYS
from ..utils import nifti, nifti_native
from ..parallel import is_main_process

# NIfTI writes are pure host I/O.  The fast path hands each flush to the
# native batch writer (native/vaegam_io.cc vaegam_nifti_write_batch_f32):
# Fortran-transpose + encode + file writes run on a C++ thread pool with the
# GIL released, overlapped with the next batch's device compute.  The
# fallback (library not built) is a Python writer pool.  Either way this
# replaces the reference's synchronous one-file-at-a-time loop
# (vae_reg_GP.py:605-620 — flagged as a host-I/O hot spot in SURVEY.md §7).
_WRITER_THREADS = nifti_native.DEFAULT_WRITER_THREADS


def _flush_native(header: bytes, maps, lo: int, hi: int, img_shape, paths):
    """Write rows lo:hi of every map key (paths ordered key-major)."""
    for k, key in enumerate(MAP_KEYS):
        nifti_native.write_batch_f32(
            header, maps[key][lo:hi], img_shape,
            paths[k * (hi - lo):(k + 1) * (hi - lo)],
            n_threads=_WRITER_THREADS,
        )


def reconstruct(trainer, loader, ref_niis: List[str], save_dirs: List[str]):
    """Write recon_{key}.nii per volume per map key under each subject dir.

    Args mirror VAE.reconstruct (vae_reg_GP.py:585-594): ref_niis and
    save_dirs are indexed by the subject index found in each sample.

    TPU-first pipeline (depth 2): batch k+1's forward is dispatched and
    batch k's device->host map copies started (copy_to_host_async) before
    batch k-1's files are encoded/written — device compute, the host
    transfer and the native writer pool all overlap.  HBM note: the
    pipeline keeps TWO map blocks live at once (batch k's, for host copies,
    while batch k+1's forward runs) — data.wide_eval_view budgets for both.
    """
    img_shape = tuple(trainer.config.img_shape)
    ref_imgs = {}
    headers = {}  # subj_idx -> encoded 352-byte header template

    def subj_header(subj_idx: int) -> bytes:
        if subj_idx not in headers:
            if subj_idx not in ref_imgs:
                ref_imgs[subj_idx] = nifti.load(ref_niis[subj_idx])
            ref = ref_imgs[subj_idx]
            headers[subj_idx] = nifti.encode_header(
                ref.header, img_shape, np.float32, ref.affine
            )
        return headers[subj_idx]

    # multi-process: every process runs the (collective) maps forward —
    # eval outputs are gathered to replicated inside the jitted step — but
    # only the main process writes files (one writer per shared FS)
    write_files = is_main_process()
    use_native = nifti_native.writer_available()

    with ThreadPoolExecutor(max_workers=(1 if use_native
                                         else _WRITER_THREADS)) as pool:
        futures = []

        def process(sample, dev_maps):
            # block on the (already started) host copies, then hand the
            # writes to the pool; group contiguous same-subject runs so
            # each native flush shares one header template
            maps = {k: np.asarray(v) for k, v in dev_maps.items()}
            n = len(sample["subjid"])
            lo = 0
            while lo < n:
                subj_idx = int(sample["subjid"][lo])
                hi = lo
                while hi < n and int(sample["subjid"][hi]) == subj_idx:
                    hi += 1
                paths = []
                for key in MAP_KEYS:
                    for i in range(lo, hi):
                        vol_dir = os.path.join(
                            save_dirs[subj_idx],
                            f"vol_{int(sample['vol_num'][i])}",
                        )
                        os.makedirs(vol_dir, exist_ok=True)
                        paths.append(
                            os.path.join(vol_dir, f"recon_{key}.nii"))
                if use_native:
                    futures.append(pool.submit(
                        _flush_native, subj_header(subj_idx), maps, lo, hi,
                        img_shape, paths,
                    ))
                else:
                    subj_header(subj_idx)  # populate ref_imgs[subj_idx]
                    ref = ref_imgs[subj_idx]
                    p = 0
                    for key in MAP_KEYS:
                        for i in range(lo, hi):
                            recon = maps[key][i].reshape(img_shape)
                            futures.append(pool.submit(
                                nifti.save,
                                nifti.Nifti1Image(
                                    recon.astype(np.float32),
                                    ref.affine, ref.header),
                                paths[p],
                            ))
                            p += 1
                lo = hi

        prev = None
        maps_step = trainer._recon_maps_step()  # applies recon_wire_dtype
        for sample in loader:
            covs, x = trainer._put_batch(sample)
            _, aux = maps_step(
                trainer.params, trainer._next_key(), covs, x
            )
            if not write_files:
                continue
            for v in aux["maps"].values():
                v.copy_to_host_async()
            if prev is not None:
                process(*prev)
            prev = (sample, aux["maps"])
        if prev is not None:
            process(*prev)
        for f in futures:
            f.result()  # surface any write error


def mk_single_volumes(loader, trainer, csv_file: str, save_dir: str):
    """Create per-subject dirs and reconstruct every volume."""
    dset = pd.read_csv(csv_file)
    subjs = dset.subjid.unique().tolist()
    ref_niis = dset.nii_path.unique().tolist()
    ckpt_num = str(trainer.epoch).zfill(3)
    subj_dirs = []
    for subj in subjs:
        subj_dir = os.path.join(
            save_dir, "reconstructions", f"{ckpt_num}_model_recons", subj
        )
        if is_main_process():
            os.makedirs(subj_dir, exist_ok=True)
        subj_dirs.append(subj_dir)
    reconstruct(trainer, loader, ref_niis, subj_dirs)


def mk_avg_maps(csv_file: str, trainer, save_dir: str,
                mk_motion_maps: bool = False):
    """Subject-level and grand-average maps from the written per-volume files.

    Re-reads the recon_{key}.nii files exactly like the reference
    (build_model_recons.py:86-92) so the output is a pure function of what
    is on disk.
    """
    if not is_main_process():
        return  # pure host re-read/average of written files; main-only
    img_shape = tuple(trainer.config.img_shape)
    ckpt_num = str(trainer.epoch).zfill(3)
    sngl_vols_dir = os.path.join(
        save_dir, "reconstructions", f"{ckpt_num}_model_recons"
    )
    avg_vols_dir = os.path.join(
        save_dir, "reconstructions", f"{ckpt_num}_avg_model_recons"
    )
    os.makedirs(avg_vols_dir, exist_ok=True)
    dset = pd.read_csv(csv_file)
    ref_niis = dset.nii_path.unique().tolist()
    subjs = dset.subjid.unique().tolist()
    ref_cache = {}  # one 4D reference load per subject, reused across keys
    maps = list(MAP_KEYS)
    # reference order: base, task, full_rec, then motion, then sex
    maps = ["base", "task", "full_rec", "x_mot", "y_mot", "z_mot",
            "pitch_mot", "roll_mot", "yaw_mot", "sex"]
    if not mk_motion_maps:
        maps = [maps[i] for i in (0, 1, 2, 9)]
    for key in maps:
        gd_avg = np.zeros(img_shape, np.float64)
        for s, subj in enumerate(subjs):
            subj_dir = os.path.join(sngl_vols_dir, subj)
            vol_dirs = os.listdir(subj_dir)
            subj_avg_dir = os.path.join(avg_vols_dir, subj)
            os.makedirs(subj_avg_dir, exist_ok=True)
            paths = [os.path.join(subj_dir, vd, f"recon_{key}.nii")
                     for vd in vol_dirs]
            # native pooled decode of the written per-volume files (same
            # read-back-from-disk semantics as build_model_recons.py:86-92,
            # C++ decoder instead of one Python parse per file), chunked so
            # host RAM stays bounded (~64 volumes decoded at a time, not the
            # subject's whole series per map key)
            subj_map = np.zeros(img_shape, np.float64)
            for lo in range(0, len(paths), 64):
                for vol in nifti_native.decode_many_f32(paths[lo:lo + 64]):
                    subj_map += vol
            subj_map /= len(vol_dirs)
            _save_map(subj_map, ref_niis[s], subj_avg_dir, key, ref_cache)
            gd_avg += subj_map
        gd_avg /= len(subjs)
        _save_map(gd_avg, ref_niis[0], avg_vols_dir, key, ref_cache)


def _save_map(map_arr, reference, save_dir, ext, ref_cache=None):
    if ref_cache is None:
        ref_cache = {}
    if reference not in ref_cache:
        ref_cache[reference] = nifti.load(reference)
    ref = ref_cache[reference]
    nifti.save(
        nifti.Nifti1Image(map_arr.astype(np.float32), ref.affine, ref.header),
        os.path.join(save_dir, f"{ext}_avg.nii"),
    )
