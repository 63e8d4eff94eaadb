"""Measure the fp32-vs-fp64 epsilon precision policy (VERDICT r1 missing #3).

The reference trains its per-voxel log-precision map epsilon in float64
(/root/reference/vae_reg_GP.py:54); this framework keeps it float32 (the
TPU-native choice — fp64 is software-emulated on TPU).  Three facts bound
the impact, the first two already enforced by tests:

1. epsilon does not enter any of the 10 output maps (it only scales the
   observation log-likelihood, vae_reg_GP.py:400-403), so the 1e-3 map
   criterion is structurally epsilon-precision-independent;
2. test_trained_checkpoint_map_parity imports a reference checkpoint whose
   epsilon WAS trained in fp64 and hits 1e-3 on all maps;
3. this tool quantifies the remaining question — training-dynamics drift:
   it runs N identical Adam steps on the toy model with epsilon kept in
   fp32 vs promoted to fp64 (JAX x64 enabled), same PRNG stream, and
   prints the loss-trajectory and epsilon-map deltas.

Run:  JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python -m \
          vaegam_tpu.tools.epsilon_precision_study [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    import jax

    # honor JAX_PLATFORMS even though this env's sitecustomize pre-imports
    # jax on the axon platform (env vars are too late; config is
    # authoritative — same fix as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if not jax.config.read("jax_enable_x64"):
        raise SystemExit("run with JAX_ENABLE_X64=1 (needs a real fp64 path)")

    import numpy as np
    import jax.numpy as jnp
    import optax

    from ..models import VAEGAMConfig, forward, init_model

    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=(21, 25, 21))
    rng = np.random.default_rng(0)
    covs = jnp.asarray(rng.normal(size=(args.batch, 8)), jnp.float32)
    x = jnp.asarray(
        rng.uniform(0, 1, size=(args.batch,) + config.img_shape), jnp.float32
    )

    results = {}
    for eps_dtype in (jnp.float32, jnp.float64):
        params, consts = init_model(
            jax.random.PRNGKey(0), config, [[-2.0, 2.0]] * 6, None
        )
        params["epsilon"] = params["epsilon"].astype(eps_dtype)
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, key):
            (loss, _), grads = jax.value_and_grad(forward, has_aux=True)(
                params, consts, key, covs, x, config
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(7)
        losses = []
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
        results[str(jnp.dtype(eps_dtype))] = {
            "losses": losses,
            "epsilon": np.asarray(params["epsilon"], np.float64),
        }

    l32 = np.array(results["float32"]["losses"])
    l64 = np.array(results["float64"]["losses"])
    e32, e64 = results["float32"]["epsilon"], results["float64"]["epsilon"]
    out = {
        "steps": args.steps,
        "final_loss_fp32": l32[-1],
        "final_loss_fp64": l64[-1],
        "max_rel_loss_delta": float(np.max(np.abs(l32 - l64) /
                                           np.maximum(np.abs(l64), 1.0))),
        "epsilon_max_abs_delta": float(np.max(np.abs(e32 - e64))),
        "epsilon_rms": float(np.sqrt(np.mean(e64 ** 2))),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
