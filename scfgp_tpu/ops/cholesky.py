"""Pallas TPU kernel: blocked Cholesky factorization (SURVEY.md §2.2 kernel 3).

Right-looking blocked algorithm, entirely in VMEM (the SCFGP Gram is
2(S+M) x 2(S+M) — a few MB at most — so the whole matrix fits on-chip):

  for each 128-wide diagonal block k:
    1. unblocked Cholesky of the diagonal block (sequential over its
       columns; VPU rank-1 updates),
    2. panel triangular solve  L[k+1:, k] = A[k+1:, k] L_kk^{-T}
       (sequential over the 128 columns; masked mat-vecs),
    3. trailing SYRK update    A[k+1:, k+1:] -= L[k+1:, k] L[k+1:, k]^T
       on the MXU — where the FLOPs are.

The backward pass is the standard closed-form Cholesky VJP assembled from
XLA triangular solves (level-3 math; no need for a hand-written kernel):

    P    = copyltu(L^T Lbar) with diagonal halved
    Abar = L^{-T} P L^{-1}, symmetrized to the lower triangle's cotangent.

``solve_posterior`` keeps XLA's ``lax.linalg.cholesky`` as the default (the
survey's own guidance: fall back until the kernel wins); this kernel is the
opt-in ``chol_impl='pallas'`` path and the building block for K beyond
XLA's comfort zone.  Interpreter mode makes the identical kernel CPU-
testable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phi import _on_tpu, _round_up, _pad_axis

BLK = 128


def _chol_kernel(a_ref, out_ref, *, n_blocks):
    """In-VMEM blocked Cholesky; a_ref/out_ref are the full (Np, Np) matrix."""
    out_ref[:] = a_ref[:]

    # Mosaic cannot lower dynamic_slice on VALUES (only on refs), so every
    # traced-index column access below is a masked whole-block reduction.
    rows2d = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols2d = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    # All intermediates stay 2-D ((BLK,1) columns / (1,BLK) rows) — Mosaic's
    # 1-D vector relayouts are buggy ("Invalid relayout ... replicated in
    # destination but not in source").
    rowcol = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)   # (BLK, 1)
    colrow = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)   # (1, BLK)

    def col_factor(j, blk):
        """One column of the unblocked diagonal-block Cholesky."""
        colm = jnp.sum(jnp.where(cols2d == j, blk, 0.0),
                       axis=1, keepdims=True)                    # blk[:, j]
        diag2 = jnp.sum(jnp.where(
            jnp.logical_and(rows2d == j, cols2d == j), blk, 0.0))
        diag = jnp.sqrt(jnp.maximum(diag2, 1e-30))
        newcol = jnp.where(rowcol >= j, colm / diag, 0.0)        # (BLK, 1)
        # rank-1 update of the remaining columns: A -= newcol newcol^T on
        # columns > j only.
        upd = blk - (newcol * newcol.T) * (cols2d > j)
        return jnp.where(cols2d == j, newcol, upd)

    def panel_solve_col(j, carry):
        """Column j of B := A L_kk^{-T} for the sub-diagonal panel."""
        B, A, Lkk = carry
        # b_j = (a_j - B @ Lkk[j, :j]) / Lkk[j, j]
        lrow = jnp.sum(jnp.where(rows2d == j, Lkk, 0.0),
                       axis=0, keepdims=True)                    # (1, BLK)
        ljj = jnp.sum(jnp.where(
            jnp.logical_and(rows2d == j, cols2d == j), Lkk, 0.0))
        lrow = jnp.where(colrow < j, lrow, 0.0)
        aj = jnp.sum(jnp.where(cols2d == j, A, 0.0),
                     axis=1, keepdims=True)                      # (BLK, 1)
        bj = (aj - jnp.dot(B, lrow.T,
                           preferred_element_type=jnp.float32).astype(
                               B.dtype)) / ljj
        B = jnp.where(cols2d == j, bj, B)
        return (B, A, Lkk)

    def block_step(k, _):
        off = k * BLK
        # 1. diagonal block factorization
        blk = out_ref[pl.ds(off, BLK), pl.ds(off, BLK)]
        blk = jax.lax.fori_loop(0, BLK, col_factor, blk)
        out_ref[pl.ds(off, BLK), pl.ds(off, BLK)] = blk

        # 2 + 3. panel solve and SYRK update for every later block-row.
        def tail(i, _):
            roff = i * BLK

            @pl.when(i > k)
            def _():
                A_panel = out_ref[pl.ds(roff, BLK), pl.ds(off, BLK)]
                B0 = jnp.zeros((BLK, BLK), A_panel.dtype)
                B, _, _ = jax.lax.fori_loop(
                    0, BLK, panel_solve_col, (B0, A_panel, blk))
                out_ref[pl.ds(roff, BLK), pl.ds(off, BLK)] = B

            return 0

        jax.lax.fori_loop(0, n_blocks, tail, 0)

        def syrk(i, _):
            roff = i * BLK

            @pl.when(i > k)
            def _():
                Li_k = out_ref[pl.ds(roff, BLK), pl.ds(off, BLK)]

                def inner(jj, _):
                    coff = jj * BLK

                    @pl.when(jnp.logical_and(jj > k, jj <= i))
                    def _():
                        Lj_k = out_ref[pl.ds(coff, BLK), pl.ds(off, BLK)]
                        acc = out_ref[pl.ds(roff, BLK), pl.ds(coff, BLK)]
                        out_ref[pl.ds(roff, BLK), pl.ds(coff, BLK)] = (
                            acc - jax.lax.dot_general(
                                Li_k, Lj_k,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                            ).astype(acc.dtype))

                    return 0

                jax.lax.fori_loop(0, n_blocks, inner, 0)

            return 0

        jax.lax.fori_loop(0, n_blocks, syrk, 0)
        return 0

    jax.lax.fori_loop(0, n_blocks, block_step, 0)

    # zero strict upper triangle
    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = jnp.where(rows >= cols, out_ref[:], 0.0)


def _chol_call(A, interpret):
    n = A.shape[0]
    Np = _round_up(n, BLK)
    Ap = _pad_axis(_pad_axis(A, 0, Np), 1, Np)
    if Np > n:
        # keep padded diagonal positive so sqrt stays clean
        idx = jnp.arange(n, Np)
        Ap = Ap.at[idx, idx].set(1.0)
    out = pl.pallas_call(
        functools.partial(_chol_kernel, n_blocks=Np // BLK),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
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
    interpreter mode EVERYWHERE by default: the compiled kernel's triple-
    nested loop structure has shown pathological (>35 min, service-jamming)
    Mosaic compile times on remote-compile TPU setups (docs/TODO.md item 1).
    Opt in to on-chip compilation with ``interpret=False`` or
    ``SCFGP_PALLAS_CHOL_COMPILE=1`` once the kernel is restructured to a
    sequential grid."""
    if interpret is None:
        import os
        compiled_ok = os.environ.get("SCFGP_PALLAS_CHOL_COMPILE") == "1"
        interpret = not (_on_tpu() and compiled_ok)
    return _chol_pallas(interpret, A)
