"""Fused stats kernel vs jnp reference path (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from scfgp_tpu.models.params import init_params
from scfgp_tpu.models.objective import (fourier_features, sufficient_stats,
                                        solve_posterior, loss_fn, LossAux,
                                        latent_moments, expected_nll_rows,
                                        kl_penalty, softplus)
from scfgp_tpu.ops.gram import sufficient_stats_pallas

D, S, M = 5, 4, 7


def _setup(seed=0, n=300, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.randn(n, D), dtype)
    y = jnp.asarray(rng.randn(n), dtype)
    w = jnp.asarray((rng.rand(n) > 0.1).astype(np.float32), dtype)
    p = init_params(jax.random.PRNGKey(seed), D, S, M, dtype)
    return X, y, w, p


def test_stats_forward_matches_jnp():
    X, y, w, p = _setup(n=1100)
    Phi = fourier_features(p, X)
    ref = sufficient_stats(Phi, y, w)
    got = sufficient_stats_pallas(p, X, y, w)
    np.testing.assert_allclose(np.asarray(got.phiTphi),
                               np.asarray(ref.phiTphi), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.phiTy),
                               np.asarray(ref.phiTy), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got.yTy), float(ref.yTy), rtol=1e-5)
    np.testing.assert_allclose(float(got.n), float(ref.n), rtol=0)


def test_stats_vjp_matches_jnp():
    X, y, w, p = _setup(seed=1, n=256)

    def scalar_of_stats(stats):
        post = solve_posterior(stats, jnp.exp(2.0 * jnp.asarray(0.1)))
        return (jnp.sum(post.log_diag_L) + jnp.sum(post.alpha * post.alpha)
                + 0.3 * jnp.sum(stats.phiTy))

    def f_ref(p):
        Phi = fourier_features(p, X)
        return scalar_of_stats(sufficient_stats(Phi, y, w))

    def f_pal(p):
        return scalar_of_stats(sufficient_stats_pallas(p, X, y, w))

    g_ref = jax.grad(f_ref)(p)
    g_pal = jax.grad(f_pal)(p)
    for name, a, b in zip(g_ref._fields, jax.tree.leaves(g_ref),
                          jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4, err_msg=name)


def test_full_loss_with_pallas_stats():
    """loss_fn assembled on pallas stats: value + grad vs dense path."""
    X, y, w, p = _setup(seed=2, n=200)

    def loss_pallas_stats(p):
        yv = y.reshape(-1)
        sig2_n = jnp.exp(2.0 * p.a)
        noise = softplus(p.c)
        stats = sufficient_stats_pallas(p, X, yv, None)
        post = solve_posterior(stats, sig2_n)
        Phi = fourier_features(p, X)
        mu_f, var_f = latent_moments(Phi, post)
        enll = jnp.sum(expected_nll_rows(mu_f, var_f, yv, noise))
        nlml = (2.0 * jnp.sum(post.log_diag_L) + 2.0 * enll
                + (stats.yTy - jnp.sum(post.beta * post.beta)) / sig2_n
                + 2.0 * (stats.n - p.M) * p.a)
        return (nlml + kl_penalty(p)) / stats.n

    c_ref, _ = loss_fn(p, X, y)
    c_pal = loss_pallas_stats(p)
    np.testing.assert_allclose(float(c_pal), float(c_ref), rtol=2e-4)
    g_ref = jax.grad(lambda q: loss_fn(q, X, y)[0])(p)
    g_pal = jax.grad(loss_pallas_stats)(p)
    for name, a, b in zip(g_ref._fields, jax.tree.leaves(g_ref),
                          jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-2, atol=1e-3, err_msg=name)
