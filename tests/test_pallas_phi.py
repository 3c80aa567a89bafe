"""Pallas feature-map kernel vs the jnp reference path (interpreter on CPU).

SURVEY.md §4 item 1: kernel numerics validated against the step-1 jnp path,
including the custom-VJP gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scfgp_tpu.models.params import init_params, derive_frequencies
from scfgp_tpu.models.objective import fourier_features, loss_fn
from scfgp_tpu.ops.phi import fourier_features_pallas

D, S, M = 5, 4, 7


def _setup(seed=0, n=100, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.randn(n, D), dtype)
    p = init_params(jax.random.PRNGKey(seed), D, S, M, dtype)
    return X, p


def test_forward_matches_xla():
    X, p = _setup(n=1100)  # not a multiple of TILE_N: padding path
    ref = fourier_features(p, X, impl="xla")
    got = fourier_features(p, X, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_vjp_matches_xla():
    X, p = _setup(seed=1, n=300)

    def f(impl):
        def g(p):
            Phi = fourier_features(p, X, impl=impl)
            return jnp.sum(jnp.sin(Phi * 0.7) * 0.3)
        return g

    g_ref = jax.grad(f("xla"))(p)
    g_pal = jax.grad(f("pallas"))(p)
    for name, a, b in zip(g_ref._fields, jax.tree.leaves(g_ref),
                          jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_loss_grad_with_pallas_features():
    X, p = _setup(seed=2, n=200)
    y = jnp.asarray(np.random.RandomState(3).randn(200), jnp.float32)
    c_ref, _ = loss_fn(p, X, y)
    c_pal, _ = loss_fn(p, X, y, feature_impl="pallas")
    np.testing.assert_allclose(float(c_pal), float(c_ref), rtol=1e-4)

    g_ref = jax.grad(lambda q: loss_fn(q, X, y)[0])(p)
    g_pal = jax.grad(lambda q: loss_fn(q, X, y, feature_impl="pallas")[0])(p)
    for name, a, b in zip(g_ref._fields, jax.tree.leaves(g_ref),
                          jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4, err_msg=name)


def test_direct_wrapper_float32():
    X, p = _setup(seed=4, n=512)
    d = derive_frequencies(p)
    scale = jnp.exp(p.b) * jnp.sqrt(2.0 / p.M)
    got = fourier_features_pallas(X, d.Fcat, d.pcat, scale)
    assert got.shape == (512, 2 * (S + M))
    assert got.dtype == jnp.float32
