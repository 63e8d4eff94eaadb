"""Distribution math vs torch.distributions as an independent oracle."""

import numpy as np
import pytest
import torch
from torch.distributions import (
    LowRankMultivariateNormal,
    MultivariateNormal,
    Normal,
    kl,
)

import jax
import jax.numpy as jnp

from vaegam_tpu.models.distributions import (
    lowrank_mvn_kl_to_std_normal,
    lowrank_mvn_sample,
    mvn_kl,
    mvn_sample,
    normal_kl,
    normal_log_prob,
)


def test_lowrank_kl_matches_torch():
    rng = np.random.default_rng(0)
    B, k = 4, 32
    mu = rng.normal(size=(B, k))
    u = rng.normal(size=(B, k))
    d = np.exp(rng.normal(size=(B, k)))

    q = LowRankMultivariateNormal(
        torch.tensor(mu), torch.tensor(u)[..., None], torch.tensor(d)
    )
    prior = LowRankMultivariateNormal(
        torch.zeros(k, dtype=torch.float64),
        torch.zeros(k, 1, dtype=torch.float64),
        torch.ones(k, dtype=torch.float64),
    )
    expected = kl.kl_divergence(q, prior).numpy()

    with jax.enable_x64(True):
        got = lowrank_mvn_kl_to_std_normal(jnp.array(mu), jnp.array(u), jnp.array(d))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-10)


def test_lowrank_sample_moments():
    key = jax.random.PRNGKey(0)
    k = 8
    mu = jnp.arange(k, dtype=jnp.float32)
    u = jnp.ones((k,)) * 0.5
    d = jnp.full((k,), 0.25)
    n = 20000
    keys = jax.random.split(key, n)
    zs = jax.vmap(lambda kk: lowrank_mvn_sample(kk, mu, u, d))(keys)
    emp_mean = np.asarray(jnp.mean(zs, 0))
    emp_cov = np.cov(np.asarray(zs).T)
    np.testing.assert_allclose(emp_mean, np.arange(k), atol=0.05)
    expected_cov = np.outer(np.full(k, 0.5), np.full(k, 0.5)) + 0.25 * np.eye(k)
    np.testing.assert_allclose(emp_cov, expected_cov, atol=0.05)


def test_mvn_kl_matches_torch():
    rng = np.random.default_rng(1)
    n = 6
    mu = rng.normal(size=(n,))
    a = rng.normal(size=(n, n))
    cov = a @ a.T + n * np.eye(n)
    expected = kl.kl_divergence(
        MultivariateNormal(torch.tensor(mu), torch.tensor(cov)),
        MultivariateNormal(
            torch.zeros(n, dtype=torch.float64),
            10 * torch.eye(n, dtype=torch.float64),
        ),
    ).numpy()
    with jax.enable_x64(True):
        got = mvn_kl(jnp.array(mu), jnp.array(cov), 10.0)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-10)


def test_mvn_kl_nan_on_non_psd():
    n = 4
    bad = -np.eye(n)
    got = mvn_kl(jnp.zeros(n), jnp.array(bad, dtype=jnp.float32), 10.0)
    assert np.isnan(np.asarray(got))


def test_mvn_sample_moments():
    n = 3
    mean = jnp.array([1.0, -2.0, 0.5])
    a = np.array([[2.0, 0.0, 0.0], [0.5, 1.0, 0.0], [-0.3, 0.2, 0.8]])
    cov = jnp.array(a @ a.T, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), 40000)
    xs = jax.vmap(lambda k: mvn_sample(k, mean, cov))(keys)
    np.testing.assert_allclose(np.asarray(jnp.mean(xs, 0)), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(xs).T), a @ a.T, atol=0.1)


def test_normal_kl_matches_torch():
    expected = kl.kl_divergence(
        Normal(torch.tensor(1.7), torch.tensor(0.9)),
        Normal(torch.tensor(1.0), torch.tensor(0.5)),
    ).item()
    got = float(normal_kl(1.7, 0.9, 1.0, 0.5))
    assert got == pytest.approx(expected, rel=1e-5)  # fp32


def test_normal_log_prob_matches_torch():
    x = np.linspace(-3, 3, 11)
    expected = Normal(torch.tensor(0.3), torch.tensor(1.7)).log_prob(
        torch.tensor(x)
    ).numpy()
    with jax.enable_x64(True):
        got = normal_log_prob(jnp.array(x), 0.3, 1.7)
    # weak-typed python scalar args leave one op at f32 precision
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-7)


def test_mvn_sample_safe_recovers_near_psd():
    """Slightly-indefinite + asymmetric covariances must sample finitely."""
    from vaegam_tpu.models.distributions import mvn_sample_safe

    rng = np.random.default_rng(7)
    n = 16
    a = rng.normal(size=(n, n))
    cov = (a @ a.T).astype(np.float32)
    # inject sub-jitter negative eigenvalue + fp32-scale asymmetry
    w, v = np.linalg.eigh(cov)
    w[0] = -1e-4
    cov = (v @ np.diag(w) @ v.T).astype(np.float32)
    cov += rng.normal(0, 1e-3, size=(n, n)).astype(np.float32)  # asymmetric
    out = mvn_sample_safe(jax.random.PRNGKey(0), jnp.zeros(n),
                          jnp.asarray(cov))
    assert np.isfinite(np.asarray(out)).all()
    # hopeless covariance still fails visibly
    bad = -jnp.eye(n)
    out_bad = mvn_sample_safe(jax.random.PRNGKey(0), jnp.zeros(n), bad)
    assert np.isnan(np.asarray(out_bad)).all()
