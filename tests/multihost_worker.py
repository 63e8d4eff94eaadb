"""Worker process for test_multihost: one of two jax.distributed hosts.

Each process owns 2 virtual CPU devices (4 global).  It initializes the
multi-host runtime through vaegam_tpu.parallel.init_multihost, builds the
GLOBAL ('data',) mesh, assembles its process-local quarter of the batch
into a global array, and runs one jitted loss+grad of the tiny model.
Prints "RESULT <loss>" — the test asserts both processes print the same
loss, equal to a single-process computation on the full batch.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaegam_tpu.parallel import (  # noqa: E402
    batch_sharding, init_multihost, make_data_mesh,
)

init_multihost(coordinator_address=f"localhost:{port}",
               num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

import numpy as np  # noqa: E402

from vaegam_tpu.models import VAEGAMConfig, forward, init_model  # noqa: E402

config = VAEGAMConfig(nf=2, num_latents=8, img_shape=(21, 25, 21))
params, consts = init_model(
    jax.random.PRNGKey(0), config, [[-2.0, 2.0]] * 6, None
)

# full deterministic batch of 8; this process contributes rows pid*4..pid*4+4
rng = np.random.default_rng(42)
covs_all = rng.normal(size=(8, 8)).astype(np.float32)
x_all = rng.uniform(0, 1, size=(8,) + config.img_shape).astype(np.float32)

mesh = make_data_mesh()
sh = batch_sharding(mesh)
covs = jax.make_array_from_process_local_data(sh, covs_all[pid * 4:(pid + 1) * 4])
x = jax.make_array_from_process_local_data(sh, x_all[pid * 4:(pid + 1) * 4])


@jax.jit
def loss_and_gradnorm(params, covs, x):
    loss, grads = jax.value_and_grad(
        lambda p: forward(p, consts, jax.random.PRNGKey(3), covs, x, config,
                          deterministic=True)[0]
    )(params)
    gn = sum(jax.numpy.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
    return loss, gn


loss, gn = loss_and_gradnorm(params, covs, x)
print(f"RESULT {float(loss):.6f} {float(gn):.6e}", flush=True)
