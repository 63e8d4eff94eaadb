"""Full-step A/B of the lane-folded Pallas conv5 kernel (ops/pallas_conv).

The decision-grade measurement for VERDICT r3 Weak #1: time the COMPLETE
jitted train step (fwd + bwd + Adam) with encoder conv5 routed through the
hand-written Pallas kernel (`VAEGAMConfig.pallas_conv5`) vs XLA's native
conv lowering, interleaved A/B/A/B to cancel tunnel/thermal drift.
Per-op timings on the remote-attached (axon) chip are unreliable in both
directions (see bench_packed_conv.py docstring); only full-step deltas
with Adam-mutated params decide.

The kernel's backward is XLA's own transposed-conv formulas (custom_vjp),
so the delta isolates the FORWARD op swap.

Run:  python -m vaegam_tpu.tools.pallas_fullstep_study [--batch 32]
      [--iters 20] [--rounds 2]

Prints one JSON line with the per-arm vols/s and the ratio.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def measure(pallas_conv5: bool, batch: int, iters: int, warmup: int = 3):
    from vaegam_tpu.models import VAEGAMConfig, forward, init_model

    config = VAEGAMConfig(pallas_conv5=pallas_conv5)
    rng = np.random.default_rng(0)
    glm_maps = rng.normal(size=(config.img_dim, 9)).astype(np.float32)
    params, consts = init_model(
        jax.random.PRNGKey(0), config, [[-2.0, 2.0]] * 6, glm_maps
    )
    tx = optax.adam(1e-3)
    opt_state = jax.jit(tx.init)(params)

    def step(params, opt_state, key, covariates, x):
        (loss, _), grads = jax.value_and_grad(forward, has_aux=True)(
            params, consts, key, covariates, x, config
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step, donate_argnums=(0, 1))
    covs = jnp.asarray(
        rng.normal(size=(batch, config.num_covariates)), jnp.float32
    )
    x = jnp.asarray(
        rng.uniform(0, 1, size=(batch,) + config.img_shape), jnp.float32
    )
    keys = jax.random.split(jax.random.PRNGKey(1), warmup + iters)
    for i in range(warmup):
        params, opt_state, loss = step(params, opt_state, keys[i], covs, x)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = step(
            params, opt_state, keys[warmup + i], covs, x
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return batch * iters / dt, float(loss)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--rounds", type=int, default=2,
                        help="A/B interleave rounds (xla,pallas per round)")
    args = parser.parse_args(argv)

    xla, pallas = [], []
    losses = {}
    for _ in range(args.rounds):
        for arm, acc in ((False, xla), (True, pallas)):
            vps, loss = measure(arm, args.batch, args.iters)
            acc.append(vps)
            losses[arm] = loss
    out = {
        "batch": args.batch,
        "xla_vols_per_sec": [round(v, 1) for v in xla],
        "pallas_vols_per_sec": [round(v, 1) for v in pallas],
        "pallas_over_xla": round(
            (sum(pallas) / len(pallas)) / (sum(xla) / len(xla)), 4
        ),
        # same data/seeds: losses agree to fp tolerance when the kernel is
        # element-exact (tests/test_ops.py pins exactness; this is a smoke
        # check that the knob actually routed the step through the kernel)
        "loss_xla": round(losses[False], 2),
        "loss_pallas": round(losses[True], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
