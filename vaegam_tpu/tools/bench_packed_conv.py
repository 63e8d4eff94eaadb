"""Per-layer decoder conv benchmark: XLA dilated vs lane-packed (ops/packed_conv).

Times each stride-1 decoder conv layer at the REAL fused-decode shapes
(9B = 288 batch) on the attached accelerator, forward and forward+backward,
in fp32 and bf16, against packed_conv3d at several pack factors.

CAUTION — the decision-grade measurement is the FULL train step via
VAEGAMConfig.conv_pack, not this tool: on the remote-attached (axon) chip,
single-op timings proved unreliable in both directions (execution dedupe
when chained perturbations underflow; scan-loop numbers for the same op
varying 7.5 vs 98 ms between harnesses).  The full-step measurement
(docs/PERFORMANCE.md, r3) shows packs LOSE 2-3x end-to-end; this tool is
kept for layer-level structure exploration only.

Run:  python -m vaegam_tpu.tools.bench_packed_conv [--batch 288] [--iters 30]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from vaegam_tpu.ops.packed_conv import flop_inflation, packed_conv3d

_DN = ("NDHWC", "DHWIO", "NDHWC")

# (name, in_spatial, ic, oc, kernel, conv_padding) — stride-1 decoder layers
# at reference-grid fused-decode shapes (in_spatial from decode()'s chain).
LAYERS = [
    ("convt1", (6, 8, 5), 16, 16, (3, 3, 3), ((2, 2), (2, 2), (2, 2))),
    ("convt3", (16, 21, 14), 16, 8, (3, 3, 3), ((2, 2), (2, 2), (2, 2))),
    ("convt5", (39, 47, 33), 8, 1, (3, 3, 3), ((2, 2), (2, 2), (2, 2))),
]

PACKS = [(2, 4), (4, 4), (4, 8), (8, 8), (8, 16)]


def _time(fn, x, w, iters=30, warmup=3):
    """Time fn(x, w) per-iteration, chaining iterations through a lax.scan
    carry (each iteration's input depends on the previous output, so neither
    the remote (axon) platform's execution dedupe nor pipelining can elide
    work) inside ONE dispatch, amortizing tunnel latency."""

    def body(carry, _):
        out = fn(carry, w)
        leaf = out[0] if isinstance(out, tuple) else out
        # data dependence via one element — O(1) cost, defeats CSE/dedupe
        carry = carry + (leaf.reshape(-1)[0] * 1e-20).astype(carry.dtype)
        return carry, ()

    run = jax.jit(
        lambda x0: jax.lax.scan(body, x0, None, length=iters)[0]
    )
    jax.block_until_ready(run(x))  # compile + warm
    best = float("inf")
    for _ in range(max(1, warmup)):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=288)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}, batch {args.batch}")

    for name, spatial, ic, oc, k, pad in LAYERS:
        for dtype in (jnp.float32, jnp.bfloat16):
            dt = jnp.dtype(dtype).name
            x = jnp.asarray(
                rng.normal(size=(args.batch, *spatial, ic)), dtype
            )
            w = jnp.asarray(rng.normal(size=(*k, ic, oc)), dtype)

            def ref_fwd(x, w):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1, 1), pad, dimension_numbers=_DN,
                )

            def loss_of(fwd):
                def loss(x, w):
                    return jnp.sum(fwd(x, w).astype(jnp.float32) ** 2)
                return jax.grad(loss, argnums=(0, 1))

            t_f = _time(ref_fwd, x, w, iters=args.iters)
            t_b = _time(loss_of(ref_fwd), x, w, iters=args.iters)
            out_sp = tuple(
                s + p[0] + p[1] - kk + 1 for s, p, kk in zip(spatial, pad, k)
            )
            gflop = 2 * args.batch * np.prod(out_sp) * ic * np.prod(k) * oc / 1e9
            print(f"{name} {dt} ic{ic}->oc{oc} out{out_sp} {gflop:.1f}GF | "
                  f"xla fwd {t_f:.2f}ms fwd+bwd {t_b:.2f}ms")

            for pack in PACKS:
                if pack[0] < k[1] - 1 or pack[1] < k[2] - 1:
                    continue

                def pk_fwd(x, w, _pack=pack):
                    return packed_conv3d(x, w, padding=pad, pack=_pack)

                try:
                    p_f = _time(pk_fwd, x, w, iters=args.iters)
                    p_b = _time(loss_of(pk_fwd), x, w, iters=args.iters)
                except Exception as e:  # OOM etc.
                    print(f"   pack {pack}: FAILED {type(e).__name__}")
                    continue
                infl = flop_inflation(k[1], k[2], pack)
                lanes = pack[0] * pack[1] * oc
                print(f"   pack {pack} (x{infl:.1f} flops, {lanes} lanes): "
                      f"fwd {p_f:.2f}ms ({t_f / p_f:.2f}x) "
                      f"fwd+bwd {p_b:.2f}ms ({t_b / p_b:.2f}x)")


if __name__ == "__main__":
    main()
