"""Sparse 1D inducing-point GP (Hensman-style), vectorized and vmappable.

Math contract (reference gp.py):
  * RBF kernel           k(a,b) = k_var * exp(-((a-b) / (sqrt(2)*ls))^2)
                          (gp.py:121-136; the striped/arange constructions in
                          the reference are just this kernel on a uniform grid)
  * posterior            A = Kuq^T Kuu^{-1};  f_bar = A qu_m;
                          Sigma = Kqq + A (qu_S - Kuu) A^T   (gp.py:67-110)
  * KL                   KL( N(qu_m, qu_S) || N(0, 10 I) )   (gp.py:41-65)

TPU-first design: gram matrices are built with one broadcasted subtraction
(no python loops), the Kuu solve uses an LU solve on the tiny P x P system
(P = num_inducing_pts, default 6), and everything is shaped so a single vmap
evaluates all six motion-covariate GPs at once.  qu_S stays a raw matrix
parameter exactly as in the reference (its non-PSD instability is part of
observable behavior); a non-PSD qu_S yields NaN through the Cholesky in
mvn_kl, and the training loop hosts a diagnostics dump mirroring
gp.py:47-63's qu_S_diagnostics.tar.
"""

from __future__ import annotations

import jax.numpy as jnp

from .distributions import mvn_kl

GP_PRIOR_VAR = 10.0  # prior N(0, 10 I) over inducing outputs (gp.py:45-46)


def rbf_gram(x1, x2, k_var, ls):
    """k_var * exp(-((x1_i - x2_j)/(sqrt(2) ls))^2), shape (len(x1), len(x2))."""
    diff = x1[:, None] - x2[None, :]
    scaled = diff / (jnp.sqrt(2.0).astype(diff.dtype) * ls)
    return k_var * jnp.exp(-jnp.square(scaled))


def evaluate_posterior(xu, k_var, ls, qu_m, qu_S, xq):
    """Posterior q(f) over query points xq.

    Args:
      xu:   (P,) inducing-point locations (fixed uniform grid).
      k_var, ls: scalars (already transformed: kvar = exp(logkvar)+0.1,
                 ls = max_ls * sigmoid(exp(log_ls)+0.5); vae_reg_GP.py:355-357).
      qu_m: (P,) posterior mean over inducing outputs.
      qu_S: (P, P) posterior covariance over inducing outputs.
      xq:   (B,) query covariate values.

    Returns:
      f_bar: (B,) posterior mean;  Sigma: (B, B) posterior covariance.
    """
    kuq = rbf_gram(xu, xq, k_var, ls)          # (P, B)
    kqq = rbf_gram(xq, xq, k_var, ls)          # (B, B)
    kuu = rbf_gram(xu, xu, k_var, ls)          # (P, P)
    # A = Kuq^T Kuu^{-1}  ==  solve(Kuu, Kuq)^T  (Kuu symmetric)
    a_t = jnp.linalg.solve(kuu, kuq)           # (P, B)
    f_bar = a_t.T @ qu_m
    sigma = kqq + a_t.T @ (qu_S - kuu) @ a_t
    return f_bar, sigma


def evaluate_posterior_diag(xu, k_var, ls, qu_m, qu_S, xq):
    """Posterior mean + MARGINAL variance over xq, without the (B, B) Sigma.

    Same math as :func:`evaluate_posterior` restricted to the diagonal:
      diag(Sigma) = diag(Kqq) + diag(A (qu_S - Kuu) A^T)
                  = k_var     + sum_pq a_t[p,b] M[p,q] a_t[q,b]
    (diag(Kqq) is k_var exactly because the RBF at zero distance is k_var).
    O(B P^2) work and O(B P) memory vs the dense path's O(B^2) — this is the
    path plot_GPs uses so a 1e5-row study CSV (reference vae_reg_GP.py:622-689
    evaluates over ALL csv rows) stays memory-bounded, x6 covariates.

    Returns:
      f_bar: (B,) posterior mean;  var: (B,) marginal posterior variance.
    """
    kuq = rbf_gram(xu, xq, k_var, ls)          # (P, B)
    kuu = rbf_gram(xu, xu, k_var, ls)          # (P, P)
    a_t = jnp.linalg.solve(kuu, kuq)           # (P, B)
    f_bar = a_t.T @ qu_m
    m = qu_S - kuu                             # (P, P)
    var = k_var + jnp.einsum("pb,pq,qb->b", a_t, m, a_t)
    return f_bar, var


def gp_kl(qu_m, qu_S):
    """KL( N(qu_m, qu_S) || N(0, 10 I) );  NaN if qu_S is not PSD."""
    return mvn_kl(qu_m, qu_S, GP_PRIOR_VAR)
