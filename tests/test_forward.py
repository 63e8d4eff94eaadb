"""End-to-end forward/ELBO contract tests (reference vae_reg_GP.py:307-413)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaegam_tpu.models import MAP_KEYS, VAEGAMConfig, forward, init_model

B = 6

pytestmark = pytest.mark.slow
XU_RANGES = [[-2.0, 2.0]] * 6


@pytest.fixture(scope="module")
def setup():
    config = VAEGAMConfig()
    rng = np.random.default_rng(0)
    glm = rng.normal(size=(config.img_dim, 9))
    params, consts = init_model(jax.random.PRNGKey(0), config, XU_RANGES, glm)
    covs = jnp.array(rng.normal(size=(B, 8)).astype(np.float32))
    covs = covs.at[:, 0].set((rng.uniform(size=B) > 0.5).astype(np.float32))
    x = jnp.array(rng.uniform(0, 1, size=(B, 41, 49, 35)).astype(np.float32))
    return config, params, consts, covs, x


def test_forward_finite_and_shapes(setup):
    config, params, consts, covs, x = setup
    loss, aux = forward(params, consts, jax.random.PRNGKey(1), covs, x, config,
                        return_maps=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["elbo"]))
    assert np.isfinite(float(aux["gp_kl"]))
    assert np.isfinite(float(aux["glm_reg"])) and float(aux["glm_reg"]) > 0
    assert aux["z"].shape == (B, config.num_latents)
    assert set(aux["maps"].keys()) == set(MAP_KEYS)
    for k in MAP_KEYS:
        assert aux["maps"][k].shape == (B, config.img_dim)
    # full_rec must equal base + sum of the 8 covariate maps
    total = aux["maps"]["base"] + sum(
        aux["maps"][k] for k in MAP_KEYS[1:-1]
    )
    np.testing.assert_allclose(
        np.asarray(aux["maps"]["full_rec"]), np.asarray(total), rtol=1e-4, atol=1e-5
    )


def test_forward_jits_and_grads_finite(setup):
    config, params, consts, covs, x = setup

    @jax.jit
    def loss_fn(p, key):
        return forward(p, consts, key, covs, x, config)[0]

    g = jax.grad(loss_fn)(params, jax.random.PRNGKey(2))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter must receive gradient signal somewhere
    nonzero = [float(jnp.max(jnp.abs(l))) > 0 for l in leaves]
    assert np.mean(nonzero) > 0.9


def test_glm_reg_disabled_when_maps_none(setup):
    config, params, consts, covs, x = setup
    consts_none = dict(consts)
    consts_none["glm_maps"] = None
    loss, aux = forward(params, consts_none, jax.random.PRNGKey(3), covs, x, config)
    assert float(aux["glm_reg"]) == 0.0
    assert np.isfinite(float(loss))


def test_neural_covariates_flag_changes_task_gain(setup):
    config, params, consts, covs, x = setup
    cfg_off = VAEGAMConfig(neural_covariates=False)
    key = jax.random.PRNGKey(4)
    _, aux_on = forward(params, consts, key, covs, x, config, return_maps=True)
    _, aux_off = forward(params, consts, key, covs, x, cfg_off, return_maps=True)
    # same PRNG key => identical up to the HRF convolution of the task gain
    task_on = np.asarray(aux_on["maps"]["task"])
    task_off = np.asarray(aux_off["maps"]["task"])
    assert not np.allclose(task_on, task_off)
    # motion maps are NOT convolved in either mode
    np.testing.assert_allclose(
        np.asarray(aux_on["maps"]["x_mot"]), np.asarray(aux_off["maps"]["x_mot"]),
        rtol=1e-5,
    )


def test_hrf_convolution_matches_toeplitz():
    """Our jnp.convolve trim must equal the reference Toeplitz matmul."""
    from vaegam_tpu.models.vaegam import _hrf_convolve, hrf_kernel
    from vaegam_tpu.utils.signals import hrf

    rng = np.random.default_rng(5)
    B = 13
    gains = rng.normal(size=(B,))
    hrf_times = np.arange(0, 20, 1.4)
    hrf_sig = hrf(hrf_times)
    n_h = len(hrf_times)
    shifted = np.zeros((B, B + n_h - 1))
    for i in range(B):
        shifted[i, i : i + n_h] = hrf_sig
    ref = (gains[None, :] @ shifted)[0][: -(n_h - 1)]
    got = np.asarray(_hrf_convolve(jnp.array(gains, dtype=jnp.float32),
                                   hrf_kernel()))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_d_floor_applied_globally():
    """If any element of d is < 1e-6, the WHOLE tensor is shifted by 1e-6."""
    d = jnp.array([[0.5, 1e-9], [0.3, 0.4]])
    floored = jnp.where(jnp.any(d < 1e-6), d + 1e-6, d)
    np.testing.assert_allclose(np.asarray(floored), np.asarray(d) + 1e-6)
    d_ok = jnp.array([[0.5, 0.2]])
    same = jnp.where(jnp.any(d_ok < 1e-6), d_ok + 1e-6, d_ok)
    np.testing.assert_allclose(np.asarray(same), np.asarray(d_ok))


def test_glm_reg_closed_form_matches_cdist():
    """B * sum ||cons_b - glm||2 == sum(torch.cdist(cons, tile(glm, B)))."""
    import torch

    rng = np.random.default_rng(6)
    B, D = 4, 50
    cons = rng.normal(size=(B, D))
    glm = rng.normal(size=(D,))
    expected = torch.sum(
        torch.cdist(
            torch.tensor(cons), torch.tensor(glm).unsqueeze(0).expand(B, -1), p=2
        )
    ).item()
    got = B * float(np.sum(np.sqrt(np.sum((cons - glm[None]) ** 2, axis=1))))
    assert got == pytest.approx(expected, rel=1e-10)


def test_qu_s_cholesky_parameterization():
    """Opt-in PSD parameterization: init matches 2I, forward finite, and the
    covariance stays PSD under arbitrary raw-parameter perturbations."""
    from vaegam_tpu.models import init_model
    from vaegam_tpu.models.vaegam import resolve_qu_S

    config = VAEGAMConfig(nf=2, num_latents=8, qu_s_cholesky=True)
    params, consts = init_model(jax.random.PRNGKey(0), config, XU_RANGES, None)
    assert "qu_S_raw" in params["gp"] and "qu_S" not in params["gp"]
    qu_S = np.asarray(resolve_qu_S(params["gp"]))
    np.testing.assert_allclose(
        qu_S, np.tile(2.0 * np.eye(config.num_inducing_pts), (6, 1, 1)),
        rtol=1e-6,
    )
    # random raw params must still yield PSD covariances
    rng = np.random.default_rng(0)
    params["gp"]["qu_S_raw"] = jnp.asarray(
        rng.normal(size=params["gp"]["qu_S_raw"].shape), jnp.float32
    )
    qu_S = np.asarray(resolve_qu_S(params["gp"]))
    for c in range(6):
        np.linalg.cholesky(qu_S[c].astype(np.float64) + 1e-9 * np.eye(qu_S.shape[-1]))
    rngB = np.random.default_rng(1)
    covs = jnp.asarray(rngB.normal(size=(4, 8)), jnp.float32)
    x = jnp.asarray(rngB.uniform(0, 1, (4, *config.img_shape)), jnp.float32)
    loss, _ = forward(params, consts, jax.random.PRNGKey(2), covs, x, config)
    assert np.isfinite(float(loss))
