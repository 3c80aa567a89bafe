"""SGLD / pSGLD correctness: analytic targets, minibatch unbiasedness on a
decomposable posterior, streaming == dense estimator, and the fit_bayes
integration path (SURVEY.md §2.4 chain-parallel row; bayes/sgld.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scfgp_tpu.bayes import (make_minibatch_value_and_grad, sgld_sample)


def _vg_of(logpdf):
    f = jax.vmap(jax.value_and_grad(logpdf))
    return lambda q, k: f(q)


def test_sgld_recovers_isotropic_gaussian():
    mu = jnp.asarray([1.0, -2.0, 0.5, 3.0])

    def lp(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    init = jnp.zeros((4, 4), jnp.float32)
    res = sgld_sample(_vg_of(lp), init, jax.random.PRNGKey(0),
                      num_warmup=500, num_samples=4000, step_size=0.05,
                      preconditioner="none")
    draws = np.asarray(res.samples).reshape(-1, 4)
    assert int(res.nonfinite) == 0
    np.testing.assert_allclose(draws.mean(axis=0), np.asarray(mu), atol=0.15)
    # ULA at step eps has O(eps) variance bias — loose band.
    np.testing.assert_allclose(draws.var(axis=0), np.ones(4), rtol=0.2)


def test_psgld_adapts_to_anisotropic_scales():
    sig2 = jnp.asarray([0.25, 1.0, 9.0, 25.0])

    def lp(q):
        return -0.5 * jnp.sum(q ** 2 / sig2)

    init = jnp.zeros((4, 4), jnp.float32)
    res = sgld_sample(_vg_of(lp), init, jax.random.PRNGKey(1),
                      num_warmup=2000, num_samples=8000, step_size=0.05,
                      preconditioner="rmsprop", precond_lambda=1e-3)
    draws = np.asarray(res.samples).reshape(-1, 4)
    assert int(res.nonfinite) == 0
    # One shared step size must serve scales spanning 100x: the pSGLD
    # metric G ~ sqrt(sig2) equalizes per-coordinate relaxation times
    # (relaxation ~ sig2 / (eps * G) steps; unpreconditioned, the var-25
    # coordinate would need ~500x this budget to mix).
    np.testing.assert_allclose(draws.mean(axis=0), np.zeros(4), atol=2.0)
    np.testing.assert_allclose(draws.var(axis=0), np.asarray(sig2),
                               rtol=0.35)


def test_minibatch_sgld_on_decomposable_posterior():
    # Bayesian mean estimation: y_i ~ N(w, 1), prior w ~ N(0, 10^2).  The
    # log posterior DECOMPOSES over rows, so the N-scaled minibatch
    # gradient is exactly unbiased and SGLD must recover the conjugate
    # posterior N(mu_post, var_post).
    rng = np.random.RandomState(0)
    n, w_true = 512, 1.7
    yd = jnp.asarray(w_true + rng.randn(n), jnp.float32)
    prior_var = 100.0
    var_post = 1.0 / (n + 1.0 / prior_var)
    mu_post = var_post * float(jnp.sum(yd))

    def vg(q, key):
        idx = jax.random.randint(key, (64,), 0, n)
        yb = yd[idx]

        def lp(w):
            like = -0.5 * (n / 64.0) * jnp.sum((yb - w[0]) ** 2)
            return like - 0.5 * w[0] ** 2 / prior_var
        return jax.vmap(jax.value_and_grad(lp))(q)

    init = jnp.zeros((4, 1), jnp.float32)
    res = sgld_sample(vg, init, jax.random.PRNGKey(2), num_warmup=1000,
                      num_samples=4000, step_size=2e-4,
                      preconditioner="none")
    draws = np.asarray(res.samples).reshape(-1)
    assert int(res.nonfinite) == 0
    assert abs(draws.mean() - mu_post) < 4 * np.sqrt(var_post)
    # Minibatch-noise inflation is bounded at this step size.
    assert var_post * 0.5 < draws.var() < var_post * 3.0


def test_streaming_estimator_matches_dense():
    from scfgp_tpu.bayes.predictive import reduced_dim
    from scfgp_tpu.data.datasets import synthetic_gp_rff
    from scfgp_tpu.models.params import init_params, pack_params

    D, S, M = 3, 4, 6
    X, y = synthetic_gp_rff(n=160, d=D, s=S, m=M, noise_std=0.1, seed=0,
                            dtype=np.float32)
    X, y = jnp.asarray(X), jnp.asarray(y)
    P = reduced_dim(D, S, M)
    q = jnp.stack([pack_params(init_params(
        jax.random.PRNGKey(i), D, S, M, jnp.float32))[:P] for i in range(2)])
    dense = make_minibatch_value_and_grad(X, y, D, S, M, batch_size=0)
    stream = make_minibatch_value_and_grad(X, y, D, S, M, batch_size=0,
                                           streaming_block=64)
    k = jax.random.PRNGKey(0)
    vd, gd = dense(q, k)
    vs, gs = stream(q, k)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vs), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs), rtol=2e-3,
                               atol=2e-3)


def test_minibatch_estimator_shapes_and_scaling():
    from scfgp_tpu.bayes import make_logposterior
    from scfgp_tpu.bayes.predictive import reduced_dim
    from scfgp_tpu.data.datasets import synthetic_gp_rff
    from scfgp_tpu.models.params import init_params, pack_params

    D, S, M = 3, 4, 6
    X, y = synthetic_gp_rff(n=160, d=D, s=S, m=M, noise_std=0.1, seed=0,
                            dtype=np.float32)
    X, y = jnp.asarray(X), jnp.asarray(y)
    P = reduced_dim(D, S, M)
    q = jnp.stack([pack_params(init_params(
        jax.random.PRNGKey(i), D, S, M, jnp.float32))[:P] for i in range(3)])
    vgf = make_minibatch_value_and_grad(X, y, D, S, M, batch_size=40)
    vals, grads = vgf(q, jax.random.PRNGKey(0))
    assert vals.shape == (3,) and grads.shape == (3, P)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(grads)).all()
    # n_scale: a batch_size == n estimator must sit at the same order as
    # the full logposterior (same N scaling), not the per-batch scale.
    lp_full = make_logposterior(X, y, D, S, M)
    full = float(jax.vmap(lp_full)(q)[0])
    est = float(vals[0])
    assert abs(est) > 0.1 * abs(full) and abs(est) < 10 * abs(full)


@pytest.mark.slow
def test_fit_bayes_sgld_end_to_end():
    from scfgp_tpu import SCFGP

    rng = np.random.RandomState(0)
    X = rng.rand(300, 1) * 10
    y = np.sin(X[:, 0]) * 2 + 0.1 * rng.randn(300) + 3
    m = SCFGP(sparsity=4, nfeats=8, seed=0)
    m.fit_bayes(X[:250], y[:250], X[250:], y[250:], sampler="sgld",
                chains=4, num_warmup=300, num_samples=200,
                init_step_size=1e-4, batch_size=64, thin=2)
    assert m.thetas.shape[0] == 200 * 4
    assert int(m.bayes_result.nonfinite) == 0
    mu, std = m.predict_bayes(X[250:])
    assert np.isfinite(np.asarray(mu)).all()
    assert np.isfinite(np.asarray(std)).all()
    assert float(np.asarray(std).min()) > 0
    nmse = float(np.mean((np.asarray(mu)[:, 0] - y[250:]) ** 2)
                 / np.var(y[250:]))
    assert nmse < 1.0  # posterior-predictive is informative, not prior-wide


def test_fit_bayes_chain_init_map():
    from scfgp_tpu import SCFGP

    rng = np.random.RandomState(1)
    X = rng.rand(200, 1) * 10
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(200)
    m = SCFGP(sparsity=4, nfeats=8, seed=0)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m.fit_bayes(X, y, sampler="hmc", chains=4, num_warmup=30,
                    num_samples=30, chain_init="map", map_iters=60)
    assert m.thetas.shape == (30 * 4, 39)
    draws = np.asarray(m.bayes_result.samples)
    assert np.isfinite(draws).all()
    mu, std = m.predict_bayes(X[:20])
    assert np.isfinite(np.asarray(mu)).all()
    with pytest.raises(ValueError):
        m.fit_bayes(X, y, chain_init="banana")


def test_fit_bayes_chain_init_ensemble():
    """chain_init='ensemble' (VERDICT r4 item 5): chains start at distinct
    gradient-selected basins (fit_ensemble members) + jitter."""
    from scfgp_tpu import SCFGP

    rng = np.random.RandomState(6)
    X = rng.rand(200, 1) * 10
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(200)
    m = SCFGP(sparsity=4, nfeats=8, seed=0)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m.fit_bayes(X, y, sampler="hmc", chains=4, num_warmup=25,
                    num_samples=25, chain_init="ensemble", map_iters=50)
    assert m.thetas.shape == (25 * 4, 39)
    assert np.isfinite(np.asarray(m.bayes_result.samples)).all()
    assert len(m._ensemble) == 4  # one trained member per chain
    # members (hence chain inits) are distinct basins, not clones
    p0 = np.asarray(m._ensemble[0][0].l_F)
    p1 = np.asarray(m._ensemble[1][0].l_F)
    assert not np.allclose(p0, p1)
    mu, std = m.predict_bayes(X[:20])
    assert np.isfinite(np.asarray(mu)).all()


def test_fit_bayes_tempered_segmented():
    from scfgp_tpu import SCFGP

    rng = np.random.RandomState(2)
    X = rng.rand(200, 1) * 10
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(200)
    m = SCFGP(sparsity=4, nfeats=8, seed=0)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m.fit_bayes(X, y, sampler="tempered", chains=2, num_warmup=20,
                    num_samples=30, segment=10)
    assert m.thetas.shape[0] == 30 * 2
    assert np.isfinite(np.asarray(m.bayes_result.samples)).all()
    mu, std = m.predict_bayes(X[:10])
    assert np.isfinite(np.asarray(mu)).all()


def test_fit_bayes_tempered_segments_warmup_dominated(monkeypatch):
    """ADVICE r4 medium: an explicit segment below num_warmup (even when
    >= num_samples) must route through the chunked-warmup segmented path —
    the fused one-shot runner would put all warmup in ONE XLA execution,
    the >100 s program class the chunking exists to avoid."""
    import scfgp_tpu.bayes.tempering as tempering
    from scfgp_tpu import SCFGP

    called = {}
    real = tempering.tempered_hmc_sample_segmented

    def spy(*a, **kw):
        called["kw"] = kw
        return real(*a, **kw)

    monkeypatch.setattr(tempering, "tempered_hmc_sample_segmented", spy)
    rng = np.random.RandomState(3)
    X = rng.rand(150, 1) * 10
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(150)
    m = SCFGP(sparsity=4, nfeats=8, seed=0)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m.fit_bayes(X, y, sampler="tempered", chains=2, num_warmup=40,
                    num_samples=10, segment=15)
    assert called, "warmup-dominated tempered run must use the segmented path"
    assert m.thetas.shape[0] == 10 * 2


def test_fit_bayes_sgld_autosegment_counts_thin(monkeypatch):
    """ADVICE r4 medium: the auto-segmentation guard must count SGLD
    device STEPS (num_samples * thin), not kept draws — both in the
    device-seconds estimate and in the per-kept-draw segment sizing."""
    import scfgp_tpu.models.model as mm
    import scfgp_tpu.bayes.segmented as seg_mod
    from scfgp_tpu import SCFGP

    seen = {}

    def fake_est(sampler, n_rows, two_k, chains, rungs, num_warmup,
                 num_samples, L, depth, thin, batch_size):
        seen["thin"] = thin
        return 120.0  # force the auto-segmentation branch

    real_seg = seg_mod.sgld_sample_segmented

    def spy(*a, **kw):
        seen["segment"] = kw.get("segment")
        return real_seg(*a, **kw)

    monkeypatch.setattr(mm, "_estimate_bayes_device_seconds", fake_est)
    monkeypatch.setattr(mm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(seg_mod, "sgld_sample_segmented", spy)
    rng = np.random.RandomState(4)
    X = rng.rand(150, 1) * 10
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(150)
    m = SCFGP(sparsity=4, nfeats=8, seed=0)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m.fit_bayes(X, y, sampler="sgld", chains=2, num_warmup=20,
                    num_samples=40, thin=4, init_step_size=1e-4)
    # estimate saw the REAL thin (4), and the segment was sized per KEPT
    # draw: 120 s / (20 + 40*4 steps) * 4 steps/draw = 2.67 s/draw
    # -> floor(30 / 2.67) = 11 draws per bounded execution.
    assert seen["thin"] == 4
    assert seen["segment"] == 11
    assert m.thetas.shape[0] == 40 * 2


def test_sgld_nan_chain_does_not_poison_shared_preconditioner():
    """One chain with a permanently non-finite gradient must not freeze the
    other chains: non-finite gradients are masked OUT of the shared pSGLD
    RMSProp metric (ADVICE r3 medium — previously one NaN poisoned v and
    every chain's proposals were rejected forever)."""
    mu = jnp.asarray([1.0, -2.0, 0.5, 3.0])

    def lp(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    base = jax.vmap(jax.value_and_grad(lp))

    def vg(q, k):
        vals, grads = base(q)
        # chain 0's gradient is always NaN (a diverged chain)
        bad = jnp.zeros_like(grads).at[0].set(jnp.nan)
        return vals, grads + bad

    init = jnp.zeros((4, 4), jnp.float32)
    n_steps = 600
    res = sgld_sample(vg, init, jax.random.PRNGKey(3), num_warmup=100,
                      num_samples=n_steps - 100, step_size=0.05,
                      preconditioner="rmsprop", precond_lambda=1e-3)
    # The preconditioner stayed finite, ...
    assert np.isfinite(np.asarray(res.precond)).all()
    # ... chain 0 was rejected every step (stuck at its init), ...
    assert int(res.nonfinite) == n_steps
    draws = np.asarray(res.samples)
    np.testing.assert_array_equal(draws[:, 0, :], 0.0)
    # ... and the healthy chains actually mixed toward the target (loose
    # band: short run + pSGLD discretization bias; the point is that they
    # MOVE, not that they are calibrated).
    healthy = draws[:, 1:, :].reshape(-1, 4)
    np.testing.assert_allclose(healthy.mean(axis=0), np.asarray(mu),
                               atol=1.0)
