"""Sparse GP math vs a float64 numpy re-derivation of the reference formulas."""

import numpy as np
import torch
from torch.distributions import MultivariateNormal, kl

import jax
import jax.numpy as jnp

from vaegam_tpu.models.gp import GP_PRIOR_VAR, evaluate_posterior, gp_kl, rbf_gram


def _ref_kernel(dist, k_var, ls, scale=1.0):
    # reference gp.py:121-136
    return k_var * np.exp(-((scale / np.sqrt(2) / ls * dist) ** 2))


def _ref_posterior(xu, k_var, ls, qu_m, qu_S, xq):
    """Reference gp.py:67-110 math, re-derived in float64 numpy."""
    n, nq = len(xu), len(xq)
    knu = np.zeros((n, nq))
    for j in range(nq):
        knu[:, j] = xu - xq[j]
    knu = _ref_kernel(knu, k_var, ls)
    knn = _ref_kernel(xq[:, None] - xq[None, :], k_var, ls).T
    step = xu[1] - xu[0]
    striped = np.abs(np.subtract.outer(np.arange(n), np.arange(n))).astype(float)
    kuu = _ref_kernel(striped, k_var, ls, scale=step)
    A = knu.T @ np.linalg.inv(kuu)
    f_bar = A @ qu_m
    Sigma = knn + A @ (qu_S - kuu) @ A.T
    return f_bar, Sigma


def test_rbf_gram_formula():
    x1 = np.array([0.0, 1.0, 2.5])
    x2 = np.array([-1.0, 0.5])
    k_var, ls = 1.3, 0.8
    got = np.asarray(rbf_gram(jnp.array(x1), jnp.array(x2), k_var, ls))
    expected = _ref_kernel(x1[:, None] - x2[None, :], k_var, ls)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_posterior_matches_reference_math():
    rng = np.random.default_rng(0)
    P, B = 6, 12
    xu = np.linspace(-2.0, 2.0, P)
    k_var, ls = 1.1, 0.9
    qu_m = rng.normal(size=(P,))
    a = rng.normal(size=(P, P))
    qu_S = a @ a.T + 2 * np.eye(P)
    xq = rng.uniform(-2, 2, size=(B,))

    f_ref, S_ref = _ref_posterior(xu, k_var, ls, qu_m, qu_S, xq)
    with jax.enable_x64(True):
        f_got, S_got = evaluate_posterior(
            jnp.array(xu), k_var, ls, jnp.array(qu_m), jnp.array(qu_S), jnp.array(xq)
        )
    np.testing.assert_allclose(np.asarray(f_got), f_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(S_got), S_ref, rtol=1e-8, atol=1e-10)


def test_posterior_at_inducing_points():
    """With xq == xu and well-conditioned Kuu: f_bar == qu_m, Sigma == qu_S."""
    P = 6
    xu = np.linspace(-1.0, 1.0, P)
    k_var, ls = 1.0, 0.3  # short ls => Kuu well-conditioned
    rng = np.random.default_rng(1)
    qu_m = rng.normal(size=(P,))
    qu_S = 2.0 * np.eye(P)
    with jax.enable_x64(True):
        f_bar, sigma = evaluate_posterior(
            jnp.array(xu), k_var, ls, jnp.array(qu_m), jnp.array(qu_S), jnp.array(xu)
        )
    np.testing.assert_allclose(np.asarray(f_bar), qu_m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), qu_S, atol=1e-6)


def test_gp_kl_matches_torch():
    rng = np.random.default_rng(2)
    P = 6
    qu_m = rng.normal(size=(P,))
    a = rng.normal(size=(P, P))
    qu_S = a @ a.T + np.eye(P)
    expected = kl.kl_divergence(
        MultivariateNormal(torch.tensor(qu_m), torch.tensor(qu_S)),
        MultivariateNormal(
            torch.zeros(P, dtype=torch.float64),
            GP_PRIOR_VAR * torch.eye(P, dtype=torch.float64),
        ),
    ).item()
    with jax.enable_x64(True):
        got = float(gp_kl(jnp.array(qu_m), jnp.array(qu_S)))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_vmapped_six_covariates():
    rng = np.random.default_rng(3)
    C, P, B = 6, 6, 8
    xu = jnp.array(np.stack([np.linspace(-2, 2, P)] * C))
    kvar = jnp.array(rng.uniform(0.5, 1.5, C))
    ls = jnp.array(rng.uniform(0.5, 2.0, C))
    qu_m = jnp.array(rng.normal(size=(C, P)))
    qu_S = jnp.array(np.stack([2 * np.eye(P)] * C))
    xq = jnp.array(rng.normal(size=(C, B)))
    f, S = jax.vmap(evaluate_posterior)(xu, kvar, ls, qu_m, qu_S, xq)
    assert f.shape == (C, B) and S.shape == (C, B, B)
    assert np.isfinite(np.asarray(f)).all() and np.isfinite(np.asarray(S)).all()


def test_posterior_diag_matches_dense_diag():
    from vaegam_tpu.models.gp import evaluate_posterior_diag

    rng = np.random.default_rng(7)
    P, B = 6, 97
    k_var, ls = 1.3, 0.8
    with jax.enable_x64(True):
        xu = jnp.array(np.linspace(-2.0, 2.0, P))
        qu_m = jnp.array(rng.normal(size=(P,)))
        a = rng.normal(size=(P, P))
        qu_S = jnp.array(a @ a.T + np.eye(P))
        xq = jnp.array(rng.normal(size=(B,)) * 2.0)
        f_dense, sigma = evaluate_posterior(xu, k_var, ls, qu_m, qu_S, xq)
        f_diag, var = evaluate_posterior_diag(xu, k_var, ls, qu_m, qu_S, xq)
    np.testing.assert_allclose(np.asarray(f_diag), np.asarray(f_dense), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(var), np.diag(np.asarray(sigma)), rtol=1e-9, atol=1e-12
    )


def test_posterior_diag_memory_bounded_at_1e5_rows():
    """plot_GPs-scale eval: 1e5 query rows would need an 80 GB dense Sigma in
    float64; the diag path must run it (O(B P) memory) and stay finite."""
    from vaegam_tpu.models.gp import evaluate_posterior_diag

    rng = np.random.default_rng(8)
    P, B = 6, 100_000
    xu = jnp.array(np.linspace(-2.0, 2.0, P), jnp.float32)
    qu_m = jnp.array(rng.normal(size=(P,)), jnp.float32)
    qu_S = jnp.array(2.0 * np.eye(P), jnp.float32)
    xq = jnp.array(rng.normal(size=(B,)), jnp.float32)
    f_bar, var = jax.jit(evaluate_posterior_diag)(xu, 1.1, 0.9, qu_m, qu_S, xq)
    assert f_bar.shape == (B,) and var.shape == (B,)
    assert np.isfinite(np.asarray(f_bar)).all()
    assert np.isfinite(np.asarray(var)).all()
