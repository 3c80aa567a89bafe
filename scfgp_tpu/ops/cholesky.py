"""Pallas TPU kernel: blocked Cholesky factorization (SURVEY.md §2.2 kernel 3).

Right-looking blocked algorithm as a **sequential Pallas grid over block
columns** (``grid=(n_blocks,)``): the working matrix is one VMEM-resident
output block (constant index map, so it persists across grid steps — the
standard revisited-accumulator pattern), and each grid step is a *small*
program:

  1. unblocked Cholesky of the 128x128 diagonal block k (sequential over
     its columns; VPU rank-1 updates),
  2. forward-substitution inverse ``Likk = Lkk^{-1}`` of that block
     (sequential over its 128 rows),
  3. panel "solve" as ONE MXU matmul: ``P = C @ Likk^T`` on the full
     (Np, 128) column block, masked to rows below the diagonal block,
  4. trailing SYRK update as ONE MXU matmul: ``A -= P @ P^T`` (P is zero
     on rows <= the diagonal block, so this touches only the trailing
     submatrix).

This shape exists because the previous whole-matrix kernel — a triple-nested
``fori_loop`` over (block column, block row, block col) with per-block
dynamic slices — never finished compiling through a remote Mosaic service
(>35 min; docs/TODO.md round-1 item 1).  The grid version compiles one small
step program executed ``n_blocks`` times, keeps the FLOPs in two large MXU
contractions per step, and has no nested block loops at all.

The SCFGP Gram is 2(S+M) x 2(S+M) — a few hundred rows for every reference
config — so whole-matrix VMEM residency is cheap (f32 capacity bound:
Np <= ~1280 with separate in/out blocks on a 16 MB-VMEM chip).

The backward pass delegates to XLA's own Cholesky VJP on the reconstructed
input (A = L L^T): guaranteed-consistent cotangents for one extra small
factorization.

``solve_posterior`` keeps XLA's ``lax.linalg.cholesky`` as the default (the
survey's own guidance: fall back until the kernel wins); this kernel is the
opt-in ``chol_impl='pallas'`` path and the building block for K beyond XLA's
comfort zone.  Interpreter mode makes the identical kernel CPU-testable.

Reference being replaced: ``theano.sandbox.linalg.cholesky`` at
``reference: SCFGP/SCFGP.py:106``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phi import _on_tpu, _round_up, _pad_axis

BLK = 128


def _chol_step_kernel(a_ref, out_ref):
    """One block column of the right-looking factorization (grid step k)."""
    k = pl.program_id(0)
    off = k * BLK
    n_p = out_ref.shape[0]

    @pl.when(k == 0)
    def _():
        out_ref[:] = a_ref[:]

    # Mosaic cannot lower dynamic_slice on VALUES (only on refs), so every
    # traced-index column/row access below is a masked whole-block reduction.
    # All intermediates stay 2-D — Mosaic's 1-D vector relayouts are buggy
    # ("Invalid relayout ... replicated in destination but not in source").
    rows2d = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols2d = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    rowcol = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)   # (BLK, 1)
    colrow = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)   # (1, BLK)

    # -- 1. unblocked Cholesky of the diagonal block ------------------------
    def col_factor(j, blk):
        colm = jnp.sum(jnp.where(cols2d == j, blk, 0.0),
                       axis=1, keepdims=True)                    # blk[:, j]
        diag2 = jnp.sum(jnp.where(
            jnp.logical_and(rows2d == j, cols2d == j), blk, 0.0))
        diag = jnp.sqrt(jnp.maximum(diag2, 1e-30))
        newcol = jnp.where(rowcol >= j, colm / diag, 0.0)        # (BLK, 1)
        # rank-1 update of the remaining columns (> j) only.
        upd = blk - (newcol * newcol.T) * (cols2d > j)
        return jnp.where(cols2d == j, newcol, upd)

    blk = out_ref[pl.ds(off, BLK), pl.ds(off, BLK)]
    Lkk = jax.lax.fori_loop(0, BLK, col_factor, blk)

    # -- 2. Likk = Lkk^{-1} by forward substitution, row by row -------------
    # X[j, :] = (e_j - Lkk[j, :j] @ X) / Lkk[j, j]
    def inv_row(j, X):
        lrow = jnp.sum(jnp.where(rows2d == j, Lkk, 0.0),
                       axis=0, keepdims=True)                    # (1, BLK)
        ljj = jnp.sum(jnp.where(
            jnp.logical_and(rows2d == j, cols2d == j), Lkk, 0.0))
        lrow = jnp.where(colrow < j, lrow, 0.0)
        acc = jnp.dot(lrow, X, preferred_element_type=jnp.float32)
        ej = jnp.where(colrow == j, 1.0, 0.0).astype(X.dtype)
        xj = (ej - acc.astype(X.dtype)) / ljj
        return jnp.where(rows2d == j, xj, X)

    Likk = jax.lax.fori_loop(0, BLK, inv_row, jnp.zeros_like(Lkk))

    # -- 3. panel solve: ONE (Np, BLK) x (BLK, BLK) MXU matmul --------------
    rowsN = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    C = out_ref[:, pl.ds(off, BLK)]
    P = jnp.dot(C, Likk.T, preferred_element_type=jnp.float32).astype(C.dtype)
    P = jnp.where(rowsN >= off + BLK, P, 0.0)

    # Finished column block: zeros above, Lkk on the diagonal block, P below.
    out_ref[:, pl.ds(off, BLK)] = P
    out_ref[pl.ds(off, BLK), pl.ds(off, BLK)] = Lkk

    # -- 4. trailing SYRK: ONE (Np, BLK) x (BLK, Np) MXU matmul -------------
    # P is zero for rows <= off + BLK, so P @ P^T only touches the trailing
    # submatrix; subtracting it from the whole block is a no-op elsewhere.
    T = jax.lax.dot_general(P, P, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[:] = out_ref[:] - T.astype(out_ref.dtype)


def _chol_call(A, interpret):
    n = A.shape[0]
    Np = _round_up(n, BLK)
    Ap = _pad_axis(_pad_axis(A, 0, Np), 1, Np)
    if Np > n:
        # keep padded diagonal positive so sqrt stays clean
        idx = jnp.arange(n, Np)
        Ap = Ap.at[idx, idx].set(1.0)
    full = pl.BlockSpec((Np, Np), lambda k: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _chol_step_kernel,
        grid=(Np // BLK,),
        in_specs=[full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((Np, Np), A.dtype),
        interpret=interpret,
    )(Ap)
    return out[:n, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chol_pallas(interpret, A):
    return _chol_call(A, interpret)


def _chol_fwd(interpret, A):
    L = _chol_call(A, interpret)
    return L, L


def _chol_bwd(interpret, L, Lbar):
    # Delegate to XLA's own Cholesky VJP rule on the reconstructed input
    # (A = L L^T): guaranteed-consistent cotangent at the cost of one extra
    # (small) factorization in the backward pass.
    A = L @ L.T
    _, vjp = jax.vjp(jnp.linalg.cholesky, A)
    return vjp(Lbar)


_chol_pallas.defvjp(_chol_fwd, _chol_bwd)


def cholesky_pallas(A, interpret=None):
    """Lower Cholesky factor of SPD ``A`` via the blocked Pallas kernel.

    Differentiable (standard closed-form VJP).  ``interpret=None`` selects
    interpreter mode everywhere by default; opt in to on-chip compilation
    with ``interpret=False`` or ``SCFGP_PALLAS_CHOL_COMPILE=1``.  (The
    pre-restructure whole-matrix kernel jammed remote Mosaic services —
    docs/TODO.md item 1; this sequential-grid version compiles one small
    step program, but stays opt-in until measured on the target service.)
    """
    if interpret is None:
        import os
        compiled_ok = os.environ.get("SCFGP_PALLAS_CHOL_COMPILE") == "1"
        interpret = not (_on_tpu() and compiled_ok)
    return _chol_pallas(interpret, A)
