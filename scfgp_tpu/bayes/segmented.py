"""Bounded-execution (segmented) drivers for every fused sampler.

This environment's tunneled TPU worker crashes on single XLA program
executions beyond ~100 s (CLAUDE.md; three kernel faults in round 3), so
long sampling runs must be host loops of bounded device executions with a
readback between segments.  Round 3 built that pattern for the tempered
sampler only (``tempering.tempered_hmc_sample_segmented``); this module
generalizes it to plain HMC, static NUTS, and SGLD (VERDICT r3 item 7):

  * WARMUP is chunked too (the tempered path runs all warmup inside the
    first program — fine for its 100-warmup campaigns, but a 2000-warmup
    HMC run would still emit one >100 s program): the (dual-averaging,
    Welford) adaptation carry is threaded across chunks via the samplers'
    ``warmup_state=`` parameter, so chunked warmup is EXACT — the same
    adaptation trajectory as one-shot, only the RNG key splits differ;
  * SAMPLING chunks continue from ``final_positions`` with adaptation
    frozen (``adapted=``), the same contract as the tempered path;
  * SGLD chunks thread the full ``(q, v, t, bad)`` carry (preconditioner,
    decay-schedule step index, nonfinite counter) via ``init_carry=``.

Chunked == one-shot in law: the kernels are Markov and every piece of
adaptation state is carried exactly; the only difference is where the RNG
keys split (each chunk folds the master key).  At most four compiled
programs per sampler config (warmup chunk, odd-sized warmup tail,
sampling chunk, odd-sized sampling tail) regardless of the number of
segments — the tail chunk compiles at its exact remainder size, so the
chain advances through precisely ``num_samples`` draws and
``final_positions``/``accept_rate``/``divergences`` describe exactly the
draws the caller receives (ADVICE r4).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .hmc import HMCResult, hmc_sample
from .nuts import NUTSResult, nuts_sample, nuts_sample_static
from .sgld import SGLDResult, sgld_sample


def _chunks(total: int, size: int):
    """[size, size, ..., remainder] covering ``total`` steps."""
    out = [size] * (total // size)
    if total % size:
        out.append(total % size)
    return out


def _segmented_hmc_like(sample_fn: Callable, result_cls, init_positions,
                        key, num_warmup: int, num_samples: int,
                        segment: int, jit: bool = True, **kw):
    """Shared driver for hmc_sample / nuts_sample_static (same adaptation
    contract).  ``sample_fn(q, k, num_warmup=, num_samples=, adapted=,
    warmup_state=, **kw)``."""
    wrap = jax.jit if jit else (lambda f: f)
    warm_sizes = _chunks(num_warmup, segment)

    warm_progs = {}

    def warm_chunk(q, k, state, n):
        prog = warm_progs.get(n)
        if prog is None:
            prog = wrap(lambda q_, k_, st: sample_fn(
                q_, k_, num_warmup=n, num_samples=0, warmup_state=st, **kw))
            warm_progs[n] = prog
        return prog(q, k, state)

    q = init_positions
    state = None
    i = 0
    r = None
    for n in warm_sizes:
        r = warm_chunk(q, jax.random.fold_in(key, i), state, n)
        q = r.final_positions
        state = r.warmup_state
        np.asarray(q)  # host readback bounds the execution
        i += 1
    if r is not None:
        eps, inv_mass = r.step_size, r.inv_mass
    elif "adapted" in kw:
        eps, inv_mass = kw.pop("adapted")
    else:
        # num_warmup == 0 with no adaptation given: mirror the one-shot
        # sampler (init_step_size + unit-seeded mass) via an empty chunk.
        r = warm_chunk(q, jax.random.fold_in(key, i), state, 0)
        eps, inv_mass = r.step_size, r.inv_mass
        i += 1

    C, P = np.shape(init_positions)
    dt = jnp.asarray(init_positions).dtype
    if num_samples == 0:
        # Pure-warmup call (mirrors the one-shot samplers' num_samples=0
        # path): empty draw arrays, warmup-derived adaptation + positions.
        extra = ({"mean_depth": jnp.asarray(np.nan, dt)}
                 if result_cls is NUTSResult else {})
        return result_cls(
            samples=jnp.zeros((0, C, P), dt),
            logdensities=jnp.zeros((0, C), dt),
            accept_rate=jnp.asarray(np.nan, dt),
            step_size=eps, inv_mass=inv_mass,
            divergences=jnp.asarray(0, jnp.int32),
            final_positions=q,
            warmup_state=None if r is None else r.warmup_state, **extra)

    kw_sample = {k: v for k, v in kw.items() if k != "adapted"}
    sample_progs = {}

    def sample_chunk(q_, k_, e_, im_, n):
        # Tail chunks compile at their EXACT remainder size — the chain
        # never advances through draws the caller doesn't receive, so
        # final_positions/accept_rate/divergences describe exactly the
        # returned draws (ADVICE r4).  Two programs max: segment + tail.
        prog = sample_progs.get(n)
        if prog is None:
            prog = wrap(lambda q2, k2, e2, im2: sample_fn(
                q2, k2, num_warmup=0, num_samples=n, adapted=(e2, im2),
                **kw_sample))
            sample_progs[n] = prog
        return prog(q_, k_, e_, im_)

    samples, lds, accs, divs, depths, sizes = [], [], [], [], [], []
    remaining = num_samples
    while remaining > 0:
        n = min(segment, remaining)
        r = sample_chunk(q, jax.random.fold_in(key, i), eps, inv_mass, n)
        samples.append(np.asarray(r.samples))  # readback bounds execution
        lds.append(np.asarray(r.logdensities))
        accs.append(float(r.accept_rate))
        divs.append(int(r.divergences))
        if result_cls is NUTSResult:
            depths.append(float(r.mean_depth))
        sizes.append(n)
        q = r.final_positions
        remaining -= n
        i += 1
    # Draw-weighted chunk aggregation: an unweighted mean would bias the
    # reported rates toward small tail chunks (ADVICE r4).
    extra = ({"mean_depth": jnp.asarray(np.average(depths, weights=sizes))}
             if result_cls is NUTSResult else {})
    return result_cls(
        samples=jnp.asarray(np.concatenate(samples)),
        logdensities=jnp.asarray(np.concatenate(lds)),
        accept_rate=jnp.asarray(np.average(accs, weights=sizes)),
        step_size=eps, inv_mass=inv_mass,
        divergences=jnp.asarray(sum(divs), jnp.int32),
        final_positions=q, **extra)


def hmc_sample_segmented(logdensity_fn: Callable, init_positions, key,
                         num_warmup: int = 500, num_samples: int = 500,
                         segment: int = 100,
                         num_integration_steps: int = 16,
                         init_step_size: float = 0.01,
                         target_accept: float = 0.8,
                         shared_adaptation: bool = True,
                         jit: bool = True) -> HMCResult:
    """``hmc.hmc_sample`` as a host loop of bounded executions (module
    doc); identical in law to one-shot, RNG key splits aside."""
    return _segmented_hmc_like(
        lambda q, k, **kw: hmc_sample(logdensity_fn, q, k, **kw),
        HMCResult, init_positions, key, num_warmup, num_samples, segment,
        jit=jit, num_integration_steps=num_integration_steps,
        init_step_size=init_step_size, target_accept=target_accept,
        shared_adaptation=shared_adaptation)


def nuts_sample_static_segmented(logdensity_fn: Callable, init_positions,
                                 key, num_warmup: int = 500,
                                 num_samples: int = 500,
                                 segment: int = 100, depth: int = 6,
                                 init_step_size: float = 0.01,
                                 target_accept: float = 0.8,
                                 shared_adaptation: bool = True,
                                 jit: bool = True) -> NUTSResult:
    """``nuts.nuts_sample_static`` as a host loop of bounded executions."""
    return _segmented_hmc_like(
        lambda q, k, **kw: nuts_sample_static(logdensity_fn, q, k, **kw),
        NUTSResult, init_positions, key, num_warmup, num_samples, segment,
        jit=jit, depth=depth, init_step_size=init_step_size,
        target_accept=target_accept,
        shared_adaptation=shared_adaptation)


def nuts_sample_segmented(logdensity_fn: Callable, init_positions,
                          key, num_warmup: int = 500,
                          num_samples: int = 500,
                          segment: int = 100, max_depth: int = 8,
                          init_step_size: float = 0.01,
                          target_accept: float = 0.8,
                          jit: bool = True) -> NUTSResult:
    """DYNAMIC (iterative, U-turn-terminated) ``nuts.nuts_sample`` as a
    host loop of bounded executions — closes the sampler feature matrix
    hole where a long dynamic-NUTS run had to emit one unbounded program
    (round-4 VERDICT weak #7); same adaptation-carry contract as the
    static driver."""
    return _segmented_hmc_like(
        lambda q, k, **kw: nuts_sample(logdensity_fn, q, k, **kw),
        NUTSResult, init_positions, key, num_warmup, num_samples, segment,
        jit=jit, max_depth=max_depth, init_step_size=init_step_size,
        target_accept=target_accept)


def sgld_sample_segmented(value_and_grad_fn: Callable, init_positions, key,
                          num_warmup: int = 500, num_samples: int = 500,
                          segment: int = 500, step_size: float = 1e-6,
                          step_decay: float = 0.0, thin: int = 1,
                          preconditioner: str = "rmsprop",
                          precond_alpha: float = 0.99,
                          precond_lambda: float = 1e-5,
                          jit: bool = True) -> SGLDResult:
    """``sgld.sgld_sample`` as a host loop of bounded executions.

    ``segment`` counts KEPT draws per chunk (each chunk runs
    ``segment * thin`` steps); warmup runs inside the first chunk's
    program when ``num_warmup <= segment * thin``, else in its own
    chunked pure-warmup programs first.  The full ``(q, v, t, bad)``
    carry threads through, so the decay schedule and preconditioner are
    exact continuations."""
    wrap = jax.jit if jit else (lambda f: f)
    common = dict(step_size=step_size, step_decay=step_decay, thin=thin,
                  preconditioner=preconditioner,
                  precond_alpha=precond_alpha,
                  precond_lambda=precond_lambda)

    i = 0
    carry = None
    q = init_positions
    # warmup chunks (pure-warmup programs emit num_samples=1 and we drop it
    # — sgld_sample has no num_samples=0 path because of its reshape)
    warm_left = num_warmup
    warm_progs = {}
    while warm_left > segment * max(thin, 1):
        n = segment * max(thin, 1)
        prog = warm_progs.get(n) or wrap(
            lambda q_, k_, c_, n_=n: sgld_sample(
                value_and_grad_fn, q_, k_, num_warmup=n_ - 1,
                num_samples=1, init_carry=c_, **{**common, "thin": 1}))
        warm_progs[n] = prog
        r = prog(q, jax.random.fold_in(key, i), carry)
        carry = r.final_carry
        q = carry[0]
        np.asarray(q)  # readback bounds the execution
        warm_left -= n
        i += 1

    if num_samples == 0:
        # Pure-warmup call (ADVICE r4: previously crashed on r.step_size /
        # np.concatenate([])): run the warmup remainder as one bounded
        # emit-1-drop-it program and return empty draw arrays with the
        # exact carry.  warm_left > 0 whenever num_warmup > 0 (the chunk
        # loop above only strictly-undershoots).
        if num_warmup == 0:
            raise ValueError("sgld_sample_segmented: num_warmup == 0 and "
                             "num_samples == 0 — nothing to run")
        prog = wrap(lambda q_, k_, c_: sgld_sample(
            value_and_grad_fn, q_, k_, num_warmup=warm_left - 1,
            num_samples=1, init_carry=c_, **{**common, "thin": 1}))
        r = prog(q, jax.random.fold_in(key, i), carry)
        carry = r.final_carry
        C, P = np.shape(init_positions)
        dt = jnp.asarray(init_positions).dtype
        return SGLDResult(samples=jnp.zeros((0, C, P), dt),
                          logdensities=jnp.zeros((0, C), dt),
                          step_size=r.step_size, precond=r.precond,
                          nonfinite=carry[3], final_carry=carry)

    samples, lds = [], []
    remaining = num_samples
    first = True
    prog_first = prog_cont = None
    r = None
    while remaining > 0:
        n = min(segment, remaining)
        if first:
            if prog_first is None or n != min(segment, num_samples):
                prog_first = wrap(lambda q_, k_, c_, n_=n, w_=warm_left:
                                  sgld_sample(value_and_grad_fn, q_, k_,
                                              num_warmup=w_, num_samples=n_,
                                              init_carry=c_, **common))
            r = prog_first(q, jax.random.fold_in(key, i), carry)
            first = False
        else:
            if prog_cont is None or r.samples.shape[0] != n:
                prog_cont = wrap(lambda q_, k_, c_, n_=n:
                                 sgld_sample(value_and_grad_fn, q_, k_,
                                             num_warmup=0, num_samples=n_,
                                             init_carry=c_, **common))
            r = prog_cont(q, jax.random.fold_in(key, i), carry)
        samples.append(np.asarray(r.samples))  # readback bounds execution
        lds.append(np.asarray(r.logdensities))
        carry = r.final_carry
        q = carry[0]
        remaining -= r.samples.shape[0]
        i += 1
    return SGLDResult(samples=jnp.asarray(np.concatenate(samples)),
                      logdensities=jnp.asarray(np.concatenate(lds)),
                      step_size=r.step_size, precond=r.precond,
                      nonfinite=carry[3], final_carry=carry)
