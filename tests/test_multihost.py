"""Multi-host (multi-process) data parallelism: a REAL 2-process run.

Round-1 review flagged --multihost as init-only/untested.  This test spawns
two OS processes that form a jax.distributed cluster (2 procs x 2 virtual
CPU devices = a 4-device global mesh), assemble a process-local-sharded
global batch via the production helpers (init_multihost / make_data_mesh /
batch_sharding), and compute one loss+grad of the tiny model.  Asserts:

  * both processes complete and report the SAME loss/grad-norm (the global
    computation is coherent across hosts);
  * the value equals a single-process computation on the full batch
    (multi-host sharding does not change the math).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_loss_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in:\n{out}"
        _, loss, gn = lines[-1].split()
        results.append((float(loss), float(gn)))
    # both hosts agree bitwise-at-print-precision
    assert results[0] == results[1], results

    # equals the single-process full-batch computation
    import jax

    from vaegam_tpu.models import VAEGAMConfig, forward, init_model

    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=(21, 25, 21))
    params, consts = init_model(
        jax.random.PRNGKey(0), config, [[-2.0, 2.0]] * 6, None
    )
    rng = np.random.default_rng(42)
    covs = rng.normal(size=(8, 8)).astype(np.float32)
    x = rng.uniform(0, 1, size=(8,) + config.img_shape).astype(np.float32)
    loss = float(forward(params, consts, jax.random.PRNGKey(3), covs, x,
                         config, deterministic=True)[0])
    np.testing.assert_allclose(results[0][0], loss, rtol=1e-4)
