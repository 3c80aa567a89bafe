"""Blocked Pallas Cholesky vs XLA (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scfgp_tpu.ops.cholesky import cholesky_pallas


def _spd(n, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    B = rng.randn(n, n)
    A = B @ B.T + n * np.eye(n)
    return jnp.asarray(A, dtype)


@pytest.mark.parametrize("n", [128, 256, 200, 384])  # incl. padded + 3-block
def test_forward_matches_xla(n):
    A = _spd(n)
    L_ref = np.linalg.cholesky(np.asarray(A, np.float64))
    L = cholesky_pallas(A)
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=2e-4, atol=2e-4)
    # reconstruction check
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A),
                               rtol=2e-4, atol=2e-3)


def test_vjp_matches_xla():
    A = _spd(128, seed=1)

    def f_pal(A):
        L = cholesky_pallas(A)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.1 * jnp.sum(L)

    def f_ref(A):
        L = jnp.linalg.cholesky(A)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.1 * jnp.sum(L)

    g_pal = jax.grad(f_pal)(A)
    g_ref = jax.grad(f_ref)(A)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-4)


def test_posterior_solve_with_pallas_chol():
    """solve_posterior math reproduced with the pallas factor."""
    from scfgp_tpu.models.objective import (fourier_features,
                                            sufficient_stats,
                                            solve_posterior)
    from scfgp_tpu.models.params import init_params

    rng = np.random.RandomState(2)
    X = jnp.asarray(rng.randn(300, 4), jnp.float32)
    y = jnp.asarray(rng.randn(300), jnp.float32)
    p = init_params(jax.random.PRNGKey(0), 4, 10, 54, jnp.float32)
    Phi = fourier_features(p, X)
    stats = sufficient_stats(Phi, y)
    post = solve_posterior(stats, jnp.exp(2.0 * p.a))
    A = stats.phiTphi + (jnp.exp(2.0 * p.a) + 1e-6) * jnp.eye(128)
    L = cholesky_pallas(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(post.L),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("n", [128, 300, 512])
def test_fused_chol_inverse_matches_xla(n):
    """Fused (L, L^{-1}) kernel: both outputs vs float64 reference."""
    from scfgp_tpu.ops.cholesky import cholesky_inverse_pallas

    A = _spd(n, seed=n)
    L_ref = np.linalg.cholesky(np.asarray(A, np.float64))
    Li_ref = np.linalg.inv(L_ref)
    L, Li = cholesky_inverse_pallas(A)
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Li), Li_ref, rtol=2e-4, atol=2e-4)


def test_fused_chol_inverse_vjp_matches_xla():
    from scfgp_tpu.ops.cholesky import cholesky_inverse_pallas

    A = _spd(96, seed=5)

    def f_pal(A):
        L, Li = cholesky_inverse_pallas(A)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(Li ** 2)

    def f_ref(A):
        L = jnp.linalg.cholesky(A)
        Li = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(A.shape[0], dtype=A.dtype), lower=True)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(Li ** 2)

    g_pal = jax.grad(f_pal)(A)
    g_ref = jax.grad(f_ref)(A)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-4)


def test_tri_inverse_blocked_exact():
    """Block-Neumann triangular inverse (XLA ops, no VMEM bound): exact to
    f32 precision at several (n, block) shapes including non-power-of-two
    block counts (finite nilpotency, not an approximation)."""
    from scfgp_tpu.ops.cholesky import tri_inverse_blocked

    for n, b in [(256, 256), (512, 256), (512, 128), (768, 256)]:
        A = _spd(n, seed=1)
        L = jnp.linalg.cholesky(A)
        Li = tri_inverse_blocked(L, block=b)
        err = float(jnp.max(jnp.abs(
            Li @ L - jnp.eye(n, dtype=L.dtype))))
        assert err < 5e-6, (n, b, err)
        # strictly lower-triangular output
        assert float(jnp.max(jnp.abs(jnp.triu(np.asarray(Li), 1)))) == 0.0


def test_tri_inverse_blocked_rejects_bad_block():
    from scfgp_tpu.ops.cholesky import tri_inverse_blocked

    L = jnp.linalg.cholesky(_spd(300, seed=2))
    try:
        tri_inverse_blocked(L, block=256)
    except ValueError as e:
        assert "multiple" in str(e)
    else:
        raise AssertionError("n % block != 0 should raise")
