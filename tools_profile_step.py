"""Ad-hoc perf probe: step timing breakdown on the real chip (not shipped)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from vaegam_tpu.models import VAEGAMConfig, forward, init_model
from vaegam_tpu.models.networks import decode, encode

BATCH = 32


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    for conv_dtype, tag in ((None, "fp32"), (jnp.bfloat16, "bf16-compute")):
        config = VAEGAMConfig(conv_dtype=conv_dtype)
        glm = rng.normal(size=(config.img_dim, 9)).astype(np.float32)
        params, consts = init_model(
            jax.random.PRNGKey(0), config, [[-2.0, 2.0]] * 6, glm
        )
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def step(params, opt_state, key, covs, x):
            (loss, _), grads = jax.value_and_grad(forward, has_aux=True)(
                params, consts, key, covs, x, config
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        jstep = jax.jit(step)
        covs = jnp.asarray(rng.normal(size=(BATCH, 8)), jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, size=(BATCH,) + config.img_shape),
                        jnp.float32)
        key = jax.random.PRNGKey(1)
        ms = timeit(lambda: jstep(params, opt_state, key, covs, x))
        print(f"[{tag}] full train step: {ms:.2f} ms  "
              f"({BATCH/ms*1000:.0f} vols/s)")

        # decoder-only fwd and fwd+bwd (9B batch as in the real step)
        z = jnp.asarray(rng.normal(size=(9 * BATCH, config.z_dim)), jnp.float32)
        dec_fwd = jax.jit(lambda p, z: decode(p, z, config.nf, conv_dtype))
        ms = timeit(lambda: dec_fwd(params["dec"], z))
        print(f"[{tag}] decoder fwd (9B={9*BATCH}): {ms:.2f} ms")

        def dec_loss(p, z):
            return jnp.sum(decode(p, z, config.nf, conv_dtype) ** 2)

        dec_bwd = jax.jit(jax.grad(dec_loss, argnums=(0, 1)))
        ms = timeit(lambda: dec_bwd(params["dec"], z))
        print(f"[{tag}] decoder fwd+bwd: {ms:.2f} ms")

        # encoder
        enc_fwd = jax.jit(lambda p, x: encode(p, x, config.nf, conv_dtype))
        ms = timeit(lambda: enc_fwd(params["enc"], x))
        print(f"[{tag}] encoder fwd (B={BATCH}): {ms:.2f} ms")

        c = dec_fwd.lower(params["dec"], z).compile().cost_analysis()
        print(f"[{tag}] decoder fwd cost: flops={c.get('flops', 0)/1e9:.1f}G "
              f"bytes={c.get('bytes accessed', 0)/1e9:.2f}GB")
        c = dec_bwd.lower(params["dec"], z).compile().cost_analysis()
        print(f"[{tag}] decoder bwd cost: flops={c.get('flops', 0)/1e9:.1f}G "
              f"bytes={c.get('bytes accessed', 0)/1e9:.2f}GB")


if __name__ == "__main__":
    main()
