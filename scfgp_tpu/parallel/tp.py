"""Feature-axis tensor parallelism: 2-D (data, feature) sharded objective.

SURVEY.md §2.4 marks tensor parallelism "phase 2 — optional shard of the
2(S+M) feature axis for very large M".  This module is that phase: the same
SCFGP objective (``models/objective.py``, mirroring ``reference:
SCFGP/SCFGP.py:92-128``) evaluated over a 2-D device mesh where

  * rows of (X, y) are sharded over the ``data`` axis (as in ``dp.py``), and
  * the S+M projection columns are sharded over the ``feature`` axis, so
    every O(N * K) and O(N * K^2) tensor (Phi, the Gram accumulation, the
    latent-moment GEMMs; K = 2(S+M)) is computed in column strips.

Per device (d, f), with c = (S+M) / n_feature local projection columns:

  1. **Phi strip**: T = X_d @ Fcat[:, f*c:(f+1)*c] + pcat[slice] and the
     (N_d, 2c) strip ``[cos T | sin T]`` — each device runs 1/(pd*pf) of the
     feature-map FLOPs and never materialises the full projection.
  2. **Gram block-columns**: the full-width Phi rows are assembled once per
     step with an ``all_gather`` over ``feature`` (the strip layout is
     column-contiguous, so gathering preserves the reference's
     ``[cos_1..cos_{S+M} | sin_1..sin_{S+M}]`` column order), then each
     device computes only its (K, 2c) block-columns ``Phi^T (w Phi_strip)``
     — 1/pf of the dominant N*K^2 FLOPs — scattered into a zero (K, K)
     buffer and ``psum``-ed over BOTH axes into the replicated Gram.
  3. **Posterior solve**: replicated (K x K stays tiny next to N).
  4. **Latent moments**: ``mu_f`` from the local strip against the owned
     alpha slices (+ feature psum); ``var_f = rowsum((Phi Li^T)^2)`` with
     Li^T's columns block-split over ``feature`` (any column partition sums
     the same squares), again 1/pf of the N*K^2 FLOPs.
  5. **Row-sum reductions** (expected NLL, yTy, n) are psum-ed over ``data``
     only — they are feature-replicated by construction.

Exactness: every reduction is a deterministic psum of per-device partial
sums of the same scalars the single-device objective adds, so the sharded
loss/gradient equals single device to float round-off (tests:
``tests/test_tp.py`` at float64 rtol 1e-9).

Requires ``(S + M) % n_feature == 0`` (feature padding would change the
model: M enters the feature scale and the nlml — ``SCFGP.py:102,125``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.objective import (LossAux, SufficientStats,
                                expected_nll_rows, kl_penalty, softplus,
                                solve_posterior)
from ..models.params import SCFGPParams, derive_frequencies
from ..opt.optimizers import Transform, tree_add
from .mesh import DATA_AXIS, FEATURE_AXIS


def _loss_local(params: SCFGPParams, X, y, w, *, n_feature: int,
                data_axis: str, feature_axis: str):
    """Per-device objective body (runs inside shard_map on the 2-D mesh)."""
    y = y.reshape(-1)
    w = w.reshape(-1)
    S, M = params.S, params.M
    SM = S + M
    assert SM % n_feature == 0, (
        f"S+M={SM} must be divisible by the feature-axis size {n_feature}")
    c = SM // n_feature
    f_idx = jax.lax.axis_index(feature_axis)

    sig2_n = jnp.exp(2.0 * params.a)
    noise = softplus(params.c)
    d = derive_frequencies(params)  # (D, S+M): replicated, O(D*S*M) — cheap
    scale = jnp.exp(params.b) * jnp.sqrt(2.0 / params.M)

    # -- 1. local Phi strip -------------------------------------------------
    Floc = jax.lax.dynamic_slice_in_dim(d.Fcat, f_idx * c, c, axis=1)
    ploc = jax.lax.dynamic_slice_in_dim(d.pcat, f_idx * c, c)
    T = jnp.dot(X, Floc, preferred_element_type=X.dtype) + ploc[None, :]
    cos_s = scale * jnp.cos(T)                       # (N_d, c)
    sin_s = scale * jnp.sin(T)

    # -- 2. Gram block-columns ----------------------------------------------
    cos_all = jax.lax.all_gather(cos_s, feature_axis, axis=1, tiled=True)
    sin_all = jax.lax.all_gather(sin_s, feature_axis, axis=1, tiled=True)
    Phi = jnp.concatenate([cos_all, sin_all], axis=1)   # (N_d, K) global order
    K = 2 * SM

    wcol = w.astype(Phi.dtype)[:, None]
    strip_w = jnp.concatenate([cos_s, sin_s], axis=1) * wcol  # (N_d, 2c)
    blocks = jnp.dot(Phi.T, strip_w,
                     preferred_element_type=Phi.dtype)        # (K, 2c)
    z32 = jnp.zeros((), jnp.int32)
    off = (f_idx * c).astype(jnp.int32)
    A_part = jnp.zeros((K, K), Phi.dtype)
    A_part = jax.lax.dynamic_update_slice(A_part, blocks[:, :c], (z32, off))
    A_part = jax.lax.dynamic_update_slice(A_part, blocks[:, c:],
                                          (z32, SM + off))
    wy = (w * y).astype(Phi.dtype)
    py = jnp.concatenate([cos_s.T @ wy, sin_s.T @ wy])        # (2c,)
    py_part = jnp.zeros((K,), Phi.dtype)
    py_part = jax.lax.dynamic_update_slice(py_part, py[:c], (off,))
    py_part = jax.lax.dynamic_update_slice(py_part, py[c:], (SM + off,))

    phiTphi = jax.lax.psum(jax.lax.psum(A_part, feature_axis), data_axis)
    phiTy = jax.lax.psum(jax.lax.psum(py_part, feature_axis), data_axis)
    # Feature-replicated row sums: reduce over data only.
    yTy = jax.lax.psum(jnp.sum(w * y * y), data_axis)
    n_total = jax.lax.psum(jnp.sum(w), data_axis)
    stats = SufficientStats(phiTphi=phiTphi, phiTy=phiTy, yTy=yTy, n=n_total)

    # -- 3. replicated posterior solve --------------------------------------
    post = solve_posterior(stats, sig2_n)

    # -- 4. latent moments, feature-split -----------------------------------
    a_cos = jax.lax.dynamic_slice_in_dim(post.alpha, f_idx * c, c)
    a_sin = jax.lax.dynamic_slice_in_dim(post.alpha, SM + f_idx * c, c)
    mu_f = jax.lax.psum(cos_s @ a_cos + sin_s @ a_sin, feature_axis)
    # Any column partition of Li^T sums the same squares: take the f-th
    # contiguous 2c-column block.
    Vloc = jax.lax.dynamic_slice_in_dim(post.Li.T, f_idx * 2 * c, 2 * c,
                                        axis=1)
    PV = jnp.dot(Phi, Vloc, preferred_element_type=Phi.dtype)  # (N_d, 2c)
    var_f = jax.lax.psum(jnp.sum(PV * PV, axis=1), feature_axis)

    # -- 5. nlml / penalty / cost (reference SCFGP.py:113-128) --------------
    enll_rows = expected_nll_rows(mu_f, var_f, y, noise)
    enll_sum = jax.lax.psum(jnp.sum(enll_rows * w.astype(enll_rows.dtype)),
                            data_axis)
    nlml = (2.0 * jnp.sum(post.log_diag_L)
            + 2.0 * enll_sum
            + (stats.yTy - jnp.sum(post.beta * post.beta)) / sig2_n
            + 2.0 * (n_total - params.M) * params.a)
    penalty = kl_penalty(params)
    cost = (nlml + penalty) / n_total
    return cost, LossAux(post=post, nlml=nlml, penalty=penalty)


def tp_loss(mesh: Mesh, data_axis: str = DATA_AXIS,
            feature_axis: str = FEATURE_AXIS):
    """shard_map-wrapped 2-D sharded loss.

    Returns ``f(params, X, y, w) -> (cost, aux)`` with X/y/w sharded over
    ``data`` (replicated over ``feature``) and replicated outputs.
    Differentiable through the shard_map boundary.
    """
    n_feature = mesh.shape[feature_axis]
    body = partial(_loss_local, n_feature=n_feature, data_axis=data_axis,
                   feature_axis=feature_axis)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(data_axis, None), P(data_axis), P(data_axis)),
        out_specs=(P(), P()),
    )


def make_tp_train_step(tx: Transform, mesh: Mesh,
                       data_axis: str = DATA_AXIS,
                       feature_axis: str = FEATURE_AXIS):
    """Jitted 2-D-parallel train step (loss + grad + optimizer update)."""
    f = tp_loss(mesh, data_axis, feature_axis)
    vg = jax.value_and_grad(lambda p, X, y, w: f(p, X, y, w)[0])
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(rep, rep, rep))
    def step(params, opt_state, X, y, w):
        cost, grads = vg(params, X, y, w)
        delta, opt_state = tx.update(grads, opt_state, params)
        params = tree_add(params, delta)
        return params, opt_state, cost

    return step


def shard_rows_2d(mesh: Mesh, X, y, w=None, data_axis: str = DATA_AXIS):
    """Place (X, y, w) sharded over ``data``, replicated over ``feature``."""
    import numpy as np
    from .mesh import pad_rows
    n_shards = mesh.shape[data_axis]
    X = np.asarray(X)
    y = np.asarray(y).reshape(-1)
    if w is None:
        X, y, w = pad_rows(X, y, n_shards)
    Xs = jax.device_put(X, NamedSharding(mesh, P(data_axis, None)))
    ys = jax.device_put(y, NamedSharding(mesh, P(data_axis)))
    ws = jax.device_put(w, NamedSharding(mesh, P(data_axis)))
    return Xs, ys, ws
