"""Diagnose the epoch_scan mid-run degradation (VERDICT r4 Weak #1).

The r4 MNI b8 `--epoch_scan` arm held ~3.2 s/epoch for ~200 epochs and then
progressively degraded ~6x (docs/PERFORMANCE.md).  This tool reproduces the
workload (synthetic MNI-shaped device-resident data, no NIfTI tree — the
degradation is a training-loop property, not a data property) while
separating every signal that discriminates the candidate causes:

  * per-epoch wall time split into DISPATCH (the scan call returning) and
    SYNC (np.asarray on the loss vector) — a slow return implicates the
    host/tunnel dispatch path, a slow sync implicates device execution;
  * a PROBE: every --probe_every epochs, two individually dispatched
    full-size train steps are timed round-trip.  If the probe degrades
    alongside the scan, the slowdown is global (allocator/tunnel); if only
    the scan slows down, it is scan-executable-specific;
  * jax.live_arrays() count + bytes (host-side buffer-reference leak) and
    device memory_stats() where the backend exposes it (HBM growth /
    fragmentation);
  * host VmRSS (host-side leak).

Fix candidates are testable in the same harness:
  --no_donate        scan jitted without donate_argnums
  --segment_cap N    cap each scan dispatch at N steps
  --mode per_step    control arm: the non-scan fused path

Usage (the r4 failing configuration):
  python -m vaegam_tpu.tools.epoch_scan_diagnosis --epochs 300 \
      --log /tmp/scan_diag.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def host_rss_mib() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def live_array_stats():
    import jax

    arrs = jax.live_arrays()
    return len(arrs), sum(a.nbytes for a in arrs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--n_vols", type=int, default=98)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--img_shape", type=int, nargs=3, default=[91, 109, 91])
    p.add_argument("--mode", choices=["scan", "per_step"], default="scan")
    p.add_argument("--no_donate", action="store_true",
                   help="build the scan without donated buffers")
    p.add_argument("--segment_cap", type=int, default=0,
                   help="max steps per scan dispatch (0 = whole epoch)")
    p.add_argument("--probe_every", type=int, default=10)
    p.add_argument("--log", type=str, default="")
    p.add_argument("--abort_factor", type=float, default=4.0,
                   help="stop once s/epoch exceeds this multiple of the "
                   "epoch-5..20 baseline for 5 consecutive epochs (the "
                   "degradation is established by then)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.device_cache import DeviceResidentLoader
    from ..models import VAEGAMConfig
    from ..train import Trainer

    img_shape = tuple(args.img_shape)
    img_dim = int(np.prod(img_shape))
    rng = np.random.default_rng(0)
    vols = rng.uniform(0, 1, size=(args.n_vols,) + img_shape).astype(
        np.float32)
    covs = rng.normal(size=(args.n_vols, 8)).astype(np.float32)
    glm_maps = (rng.normal(size=(img_dim, 9)) * 0.01).astype(np.float32)

    config = VAEGAMConfig(img_shape=img_shape, glm_reg_scale=10.0,
                          neural_covariates=False, fused_norm_stats=True,
                          qu_s_cholesky=True)
    loader = DeviceResidentLoader.from_arrays(
        vols, covs, batch_size=args.batch_size, shuffle=True, seed=1)
    trainer = Trainer(config, [[-2.0, 2.0]] * 6, glm_maps=glm_maps,
                      save_dir="", seed=1, enable_tb=False, epoch_scan=True)

    if args.no_donate:
        # identical body, no donation: discriminates donation/aliasing
        # pressure from everything else
        trainer._gather_train_scan = _build_scan_nodonate(trainer)

    dev = jax.local_devices()[0]
    logf = open(args.log, "a") if args.log else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if logf:
            logf.write(line + "\n")
            logf.flush()

    emit({"event": "start", "mode": args.mode, "no_donate": args.no_donate,
          "segment_cap": args.segment_cap, "batch": args.batch_size,
          "img_shape": list(img_shape), "device": str(dev)})

    baseline = None
    recent = []
    slow_streak = 0
    key = trainer._next_key()
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        sels = list(loader.iter_index_batches())
        full = loader.batch_size
        t_ep0 = time.perf_counter()
        dispatch_s = 0.0
        sync_s = 0.0
        n_dispatch = 0
        losses = []
        i, n = 0, len(sels)
        while i < n:
            j = i
            if args.mode == "scan" and len(sels[i]) == full:
                while j < n and len(sels[j]) == full:
                    j += 1
                if args.segment_cap:
                    j = min(j, i + args.segment_cap)
            if j - i >= 2:
                idx_mat = np.stack(sels[i:j])
                t0 = time.perf_counter()
                (trainer.params, trainer.opt_state, key,
                 seg_losses, _fb) = trainer._gather_train_scan(
                    trainer.params, trainer.opt_state, key,
                    loader._vols, loader._covs, idx_mat)
                t1 = time.perf_counter()
                losses.append(seg_losses)
                dispatch_s += t1 - t0
                n_dispatch += 1
                i = j
                continue
            t0 = time.perf_counter()
            (trainer.params, trainer.opt_state, key,
             loss, _fb) = trainer._gather_train_step(
                trainer.params, trainer.opt_state, key,
                loader._vols, loader._covs, np.asarray(sels[i]))
            t1 = time.perf_counter()
            losses.append(loss)
            dispatch_s += t1 - t0
            n_dispatch += 1
            i += 1
        t0 = time.perf_counter()
        ep_loss = float(np.sum([np.sum(np.asarray(l)) for l in losses]))
        sync_s = time.perf_counter() - t0
        ep_s = time.perf_counter() - t_ep0

        rec = {"epoch": epoch, "s": round(ep_s, 3),
               "dispatch_s": round(dispatch_s, 3),
               "sync_s": round(sync_s, 3), "n_dispatch": n_dispatch,
               "loss": round(ep_loss, 2)}
        if epoch % args.probe_every == 0 or epoch < 3:
            # probe: individually dispatched full-size steps, timed
            # round-trip (first probe pays one compile; skip its timing)
            probe_sel = np.asarray(sels[0][:full])
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                (trainer.params, trainer.opt_state, key,
                 l, _fb) = trainer._gather_train_step(
                    trainer.params, trainer.opt_state, key,
                    loader._vols, loader._covs, probe_sel)
                np.asarray(l)
                ts.append(time.perf_counter() - t0)
            rec["probe_step_s"] = round(min(ts), 4)
            n_arr, arr_bytes = live_array_stats()
            rec["live_arrays"] = n_arr
            rec["live_array_mib"] = round(arr_bytes / 2**20, 1)
            rec["host_rss_mib"] = round(host_rss_mib(), 1)
            try:
                ms = dev.memory_stats()
                if ms:
                    rec["hbm_in_use_mib"] = round(
                        ms.get("bytes_in_use", 0) / 2**20, 1)
                    rec["hbm_peak_mib"] = round(
                        ms.get("peak_bytes_in_use", 0) / 2**20, 1)
                    if "num_allocs" in ms:
                        rec["num_allocs"] = ms["num_allocs"]
            except Exception as e:  # memory_stats unsupported on backend
                rec["memory_stats_err"] = str(e)[:80]
        emit(rec)

        if 5 <= epoch < 20:
            recent.append(ep_s)
        elif epoch == 20:
            baseline = float(np.median(recent))
            emit({"event": "baseline", "s_per_epoch": round(baseline, 3)})
        if baseline is not None:
            if ep_s > args.abort_factor * baseline:
                slow_streak += 1
            else:
                slow_streak = 0
            if slow_streak >= 5:
                emit({"event": "aborted_degraded", "epoch": epoch,
                      "baseline_s": round(baseline, 3),
                      "last_s": round(ep_s, 3)})
                return 2
    emit({"event": "done", "epochs": args.epochs,
          "baseline_s": round(baseline, 3) if baseline else None})
    return 0


def _build_scan_nodonate(trainer):
    """The exact scan body, jitted WITHOUT donation (fix-candidate arm)."""
    import jax
    import jax.numpy as jnp

    from ..models import forward
    import optax

    config, tx, consts = trainer.config, trainer.tx, trainer.consts

    def steps(params, opt_state, key, vols, covs_all, idx_mat):
        def body(carry, idx):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            covariates = jnp.take(covs_all, idx, axis=0)
            x = jnp.take(vols, idx, axis=0).astype(jnp.float32)
            (loss, aux), grads = jax.value_and_grad(
                forward, has_aux=True
            )(params, consts, sub, covariates, x, config)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), (loss, aux["mvn_fallbacks"])

        (params, opt_state, key), (losses, fbs) = jax.lax.scan(
            body, (params, opt_state, key), idx_mat)
        return params, opt_state, key, losses, jnp.sum(fbs)

    return jax.jit(steps)


if __name__ == "__main__":
    raise SystemExit(main())
