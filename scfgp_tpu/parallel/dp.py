"""Exact data-parallel training: psum-ed sufficient statistics over a mesh.

Two interchangeable implementations of the same math (the sharded loss is
bitwise-equal in exact arithmetic to single-device full batch, because every
N-dependent term of the SCFGP objective is a row sum — SURVEY.md §2.4):

* ``gspmd_*`` — the idiomatic path: ``jax.jit`` over arrays carrying
  ``NamedSharding``; XLA partitions the Gram matmul and inserts the
  all-reduces (this is the "annotate shardings, let the compiler insert
  collectives" recipe).  Zero changes to the objective code.

* ``shardmap_*`` — the explicit path: ``jax.shard_map`` with per-shard
  ``loss_fn(..., axis_name='data')`` psum-ing the statistics manually.
  Deterministic reduction order (fixed tree over shards) and an auditable
  collective schedule; gradients are taken *through* the shard_map so JAX's
  replicated-input transpose produces the exact global gradient.

Both paths drive the same optimizer transforms; ``make_dp_train_step``
returns a jitted ``(params, opt_state, X, y, w) -> (params, opt_state, cost,
post)`` step for either mode.

The reference has no distributed analog (no MPI/NCCL/sockets — SURVEY.md
§2.4); its nearest feature, sequential minibatching with median aggregation
(``reference: SCFGP/SCFGP.py:226-235``), is kept separately in the model's
``nbatches`` path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.objective import loss_fn
from ..opt.optimizers import Transform, tree_add
from .mesh import DATA_AXIS


def shardmap_loss(mesh: Mesh, axis_name: str = DATA_AXIS):
    """Per-shard loss with explicit psum, wrapped in shard_map.

    Returns ``f(params, X, y, w) -> (cost, post)`` where X/y/w are
    row-sharded and cost/post are replicated.  Differentiable through the
    shard_map boundary.
    """
    def local(params, X, y, w):
        cost, aux = loss_fn(params, X, y, w=w, axis_name=axis_name)
        return cost, aux.post

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )


def gspmd_loss(mesh: Mesh):
    """Compiler-partitioned loss: plain loss_fn, sharding via the arrays."""
    def f(params, X, y, w):
        cost, aux = loss_fn(params, X, y, w=w)
        return cost, aux.post
    return f


def make_dp_train_step(tx: Transform, mesh: Mesh, mode: str = "gspmd",
                       axis_name: str = DATA_AXIS):
    """Jitted data-parallel train step (loss + grad + optimizer update).

    ``mode`` selects 'gspmd' (compiler-inserted collectives) or 'shard_map'
    (explicit psum).  Outputs (params, opt_state, cost, post) are replicated.
    """
    if mode == "shard_map":
        vg = jax.value_and_grad(shardmap_loss(mesh, axis_name), has_aux=True)
    elif mode == "gspmd":
        vg = jax.value_and_grad(gspmd_loss(mesh), has_aux=True)
    else:
        raise ValueError(f"unknown dp mode {mode!r}")

    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(rep, rep, rep, rep))
    def step(params, opt_state, X, y, w):
        (cost, post), grads = vg(params, X, y, w)
        delta, opt_state = tx.update(grads, opt_state, params)
        params = tree_add(params, delta)
        return params, opt_state, cost, post

    return step


def make_dp_eval(mesh: Mesh, mode: str = "gspmd", axis_name: str = DATA_AXIS):
    """Jitted loss WITHOUT update (posterior refresh, reference train_func)."""
    f = shardmap_loss(mesh, axis_name) if mode == "shard_map" else gspmd_loss(mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(f, out_shardings=(rep, rep))
