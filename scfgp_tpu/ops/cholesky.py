"""Pallas TPU kernel: blocked Cholesky factorization (SURVEY.md §2.2 kernel 3).

Right-looking blocked algorithm as a **sequential Pallas grid over block
columns** (``grid=(n_blocks,)``): the working matrix is one VMEM-resident
output block (constant index map, so it persists across grid steps — the
standard revisited-accumulator pattern), and each grid step is a *small*
program:

  1. Cholesky of the 128x128 diagonal block k (sub-blocked serial column
     loop, ``_chol_diag_block``),
  2. ``Likk = Lkk^{-1}`` via the log-depth Neumann product
     (``_tri_inverse_logdepth`` — GEMMs only, no serial substitution),
  3. panel "solve" as ONE MXU matmul: ``P = C @ Likk^T`` on the full
     (Np, 128) column block, masked to rows below the diagonal block,
  4. trailing SYRK update as ONE MXU matmul: ``A -= P @ P^T`` (P is zero
     on rows <= the diagonal block, so this touches only the trailing
     submatrix).

``cholesky_inverse_pallas`` additionally emits ``Li = L^{-1}`` from the same
sequential grid (progressive block-inverse identity, two extra MXU GEMMs per
step) — the pair ``(L, Li)`` is exactly what ``solve_posterior`` consumes.

CLOSED as "XLA wins, measured" (round-3 crossover,
``experiments/tpu_chol_crossover.py`` -> ``results/chol_crossover.json``;
SURVEY.md §2.2 kernel 3).  Same-session DCE-proof chain, v5e, ms/call
(common chain overhead ~0.2 ms cancels in deltas):

    n      xla_chol   xla chol+inv   neumann_inv   pallas_chol  pallas(L,Li)
    512    0.483      0.545          0.550         0.578        0.580
    1024   0.604      0.780          0.774         0.779        0.784
    2048   0.936      1.561          1.529         (>VMEM)      (>VMEM)
    4096   2.514      7.250          7.941         (>VMEM)      (>VMEM)

Three independent implementations were built and measured: this blocked
Pallas kernel (parity with XLA at its n=1024 VMEM limit, loses below),
the fused (L, Li) variant (same), and the XLA-composed block-Neumann
inverse (``tri_inverse_blocked`` — ties XLA's solve at 1024-2048, -2% at
2048, loses at 4096).  None beats XLA's chol+solve anywhere: the stage is
serial-dependency-latency bound (~8x above MXU FLOP speed-of-light at
n=2048), and that latency floor binds every blocked formulation equally.
XLA stays the production path; the kernels remain correct, differentiable,
compile on-chip in seconds, and CPU-testable via interpret mode.

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


def _tri_inverse_logdepth(Lkk, rows2d, cols2d):
    """Exact inverse of a lower-triangular (b, b) block, GEMMs only.

    ``Lkk = diag(d) @ (I + N)`` with N strictly lower =>
    ``Lkk^{-1} = (I + N)^{-1} @ diag(1/d)`` where the unit-triangular
    inverse is the telescoping Neumann product — log2(b) squaring stages,
    every op an MXU matmul or a VPU elementwise, no serial loop.
    """
    b = Lkk.shape[0]
    dcol = jnp.sum(jnp.where(rows2d == cols2d, Lkk, 0.0),
                   axis=1, keepdims=True)                        # (b, 1)
    drow = jnp.sum(jnp.where(rows2d == cols2d, Lkk, 0.0),
                   axis=0, keepdims=True)                        # (1, b)
    N = jnp.where(rows2d > cols2d, Lkk / dcol, 0.0)
    eye = jnp.where(rows2d == cols2d, 1.0, 0.0).astype(Lkk.dtype)
    X = eye - N
    P = N
    n_stages = b.bit_length() - 1  # log2(b); b a power of two
    for _ in range(1, n_stages):
        P = jnp.dot(P, P, preferred_element_type=jnp.float32).astype(X.dtype)
        X = jnp.dot(X, eye + P,
                    preferred_element_type=jnp.float32).astype(X.dtype)
    return X / drow


SUB = 32  # diagonal-factor sub-block width (see docs/DESIGN.md sweep)


def _chol_diag_block(blk):
    """Cholesky of the (BLK, BLK) diagonal block, sub-blocked at SUB.

    The serial critical path of a Cholesky is ~n dependent column steps and
    cannot be removed; sub-blocking reduces the per-step tile width (masked
    select/reduce on (SUB, SUB) instead of the full (128, 128) tile) and
    turns each sub-block's panel solve + trailing update into MXU matmuls
    (with the sub-block inverse from the log-depth Neumann product).
    Measured v5e sweep at n=512 (docs/DESIGN.md): full-tile loop 0.38 ms,
    SUB=8 0.43 ms, SUB=32 0.37 ms — the serial loop is LATENCY-bound (loop
    machinery + sqrt/div dependency chains), not VPU-throughput-bound, so
    sub-blocking is roughly neutral and XLA's chol (0.29-0.30 ms) keeps the
    edge at reference sizes.
    """
    n_b = blk.shape[0]
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    rowcol_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)

    def col_factor(j, sub):
        colm = jnp.sum(jnp.where(cols_s == j, sub, 0.0),
                       axis=1, keepdims=True)
        diag2 = jnp.sum(jnp.where(
            jnp.logical_and(rows_s == j, cols_s == j), sub, 0.0))
        diag = jnp.sqrt(jnp.maximum(diag2, 1e-30))
        newcol = jnp.where(rowcol_s >= j, colm / diag, 0.0)
        upd = sub - (newcol * newcol.T) * (cols_s > j)
        return jnp.where(cols_s == j, newcol, upd)

    # Mosaic lowers static `lax.slice` on values but NOT
    # `dynamic_update_slice` (even with constant indices), so placements are
    # expressed as static zero-pad + add into disjoint regions.
    L = jnp.zeros_like(blk)
    for sb in range(n_b // SUB):           # static unroll: all shapes fixed
        o = sb * SUB
        Asb = jax.lax.slice(blk, (o, o), (o + SUB, o + SUB))
        Lsb = jax.lax.fori_loop(0, SUB, col_factor, Asb)
        L = L + jnp.pad(Lsb, ((o, n_b - o - SUB), (o, n_b - o - SUB)))
        if o + SUB < n_b:
            Lisb = _tri_inverse_logdepth(Lsb, rows_s, cols_s)
            Pan = jax.lax.slice(blk, (o + SUB, o), (n_b, o + SUB))
            P = jnp.dot(Pan, Lisb.T,
                        preferred_element_type=jnp.float32).astype(blk.dtype)
            L = L + jnp.pad(P, ((o + SUB, 0), (o, n_b - o - SUB)))
            PPt = jnp.dot(P, P.T,
                          preferred_element_type=jnp.float32).astype(blk.dtype)
            blk = blk - jnp.pad(PPt, ((o + SUB, 0), (o + SUB, 0)))
    return L


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

    # -- 1. Cholesky of the diagonal block, sub-blocked at SUB ----------------
    blk = out_ref[pl.ds(off, BLK), pl.ds(off, BLK)]
    Lkk = _chol_diag_block(blk)

    # -- 2. Likk = Lkk^{-1} in log depth: 13 small MXU GEMMs ----------------
    # (see _tri_inverse_logdepth; replaces a BLK-iteration serial forward
    # substitution — on-chip probing showed the serial loops were the whole
    # kernel's bottleneck, docs/DESIGN.md)
    Likk = _tri_inverse_logdepth(Lkk, rows2d, cols2d)

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


def _chol_inv_step_kernel(a_ref, l_ref, li_ref):
    """One block column of the fused factor-and-invert pass (grid step k).

    Produces BOTH ``L = chol(A)`` (right-looking, as ``_chol_step_kernel``)
    and ``Li = L^{-1}`` in the same sequential grid, via the progressive
    block identity: with ``T_k`` the leading k-block of L and ``W_k`` its
    inverse,

        inv([[T_k, 0], [R, Lkk]]) = [[W_k, 0], [-Likk R W_k, Likk]]

    so each grid step emits one finished row block of Li from two MXU
    GEMMs: ``G = R @ W_k`` (R = this step's finalized row panel of L) and
    ``-Likk @ G``.  This replaces XLA's chol + triangular-solve-vs-identity
    pair in ``solve_posterior`` — the largest single forward stage at
    reference scale (docs/DESIGN.md op-split) — with one kernel launch.
    """
    k = pl.program_id(0)
    off = k * BLK
    n_p = l_ref.shape[0]

    @pl.when(k == 0)
    def _():
        l_ref[:] = a_ref[:]
        # zero BEFORE the G GEMM below reads li_ref: uninitialized VMEM can
        # hold NaN patterns and 0 * NaN = NaN even under the rpan mask
        li_ref[:] = jnp.zeros_like(li_ref)

    rows2d = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols2d = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    blk = l_ref[pl.ds(off, BLK), pl.ds(off, BLK)]
    Lkk = _chol_diag_block(blk)
    Likk = _tri_inverse_logdepth(Lkk, rows2d, cols2d)

    # Li row block k: G = (finalized row panel of L) @ Li so far.  Columns
    # >= off of the row panel are masked (still working values); Li rows
    # >= off are zero (not yet written), so the full-width GEMM is exact.
    colsN = jax.lax.broadcasted_iota(jnp.int32, (BLK, n_p), 1)
    rpan = l_ref[pl.ds(off, BLK), :]
    rpan = jnp.where(colsN < off, rpan, 0.0)
    G = jnp.dot(rpan, li_ref[:], preferred_element_type=jnp.float32)
    Lirow = -jnp.dot(Likk, G.astype(Likk.dtype),
                     preferred_element_type=jnp.float32).astype(Likk.dtype)
    li_ref[pl.ds(off, BLK), :] = Lirow
    li_ref[pl.ds(off, BLK), pl.ds(off, BLK)] = Likk

    # Finished L column block + trailing SYRK update (as _chol_step_kernel).
    rowsN = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    C = l_ref[:, pl.ds(off, BLK)]
    P = jnp.dot(C, Likk.T, preferred_element_type=jnp.float32).astype(C.dtype)
    P = jnp.where(rowsN >= off + BLK, P, 0.0)
    l_ref[:, pl.ds(off, BLK)] = P
    l_ref[pl.ds(off, BLK), pl.ds(off, BLK)] = Lkk
    T = jax.lax.dot_general(P, P, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    l_ref[:] = l_ref[:] - T.astype(l_ref.dtype)


def _chol_inv_call(A, interpret):
    n = A.shape[0]
    Np = _round_up(n, BLK)
    Ap = _pad_axis(_pad_axis(A, 0, Np), 1, Np)
    if Np > n:
        idx = jnp.arange(n, Np)
        Ap = Ap.at[idx, idx].set(1.0)
    full = pl.BlockSpec((Np, Np), lambda k: (0, 0), memory_space=pltpu.VMEM)
    L, Li = pl.pallas_call(
        _chol_inv_step_kernel,
        grid=(Np // BLK,),
        in_specs=[full],
        out_specs=(full, full),
        out_shape=(jax.ShapeDtypeStruct((Np, Np), A.dtype),
                   jax.ShapeDtypeStruct((Np, Np), A.dtype)),
        interpret=interpret,
    )(Ap)
    return L[:n, :n], Li[:n, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chol_inv_pallas(interpret, A):
    return _chol_inv_call(A, interpret)


def _chol_inv_ref(A):
    L = jnp.linalg.cholesky(A)
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return L, Li


def _chol_inv_fwd(interpret, A):
    out = _chol_inv_call(A, interpret)
    return out, out


def _chol_inv_bwd(interpret, res, g):
    # XLA's own VJP rules on the reconstructed input (A = L L^T): one extra
    # small chol+solve in the backward pass, guaranteed-consistent
    # cotangents (same pattern as _chol_bwd).
    L, _ = res
    A = L @ L.T
    _, vjp = jax.vjp(_chol_inv_ref, A)
    return vjp(g)


_chol_inv_pallas.defvjp(_chol_inv_fwd, _chol_inv_bwd)


def cholesky_inverse_pallas(A, interpret=None):
    """(L, L^{-1}) of SPD ``A`` in ONE fused Pallas pass (differentiable).

    The SCFGP posterior needs both (``objective.solve_posterior``:
    ``log diag L`` for the nlml, ``Li`` for every downstream GEMM) —
    reference ops being replaced: ``theano.sandbox.linalg.cholesky`` +
    ``matrix_inverse`` at ``reference: SCFGP/SCFGP.py:106-107``.  Same
    interpret gating as ``cholesky_pallas``.  VMEM bound: 3 whole-matrix
    f32 buffers => n up to ~1024 on a 16 MB chip; fall back to XLA above.
    """
    if interpret is None:
        import os
        compiled_ok = os.environ.get("SCFGP_PALLAS_CHOL_COMPILE") == "1"
        interpret = not (_on_tpu() and compiled_ok)
    return _chol_inv_pallas(interpret, A)


def tri_inverse_blocked(L, block: int = 256):
    """``L^{-1}`` of a lower-triangular matrix via block-Neumann squaring —
    XLA ops only, any size (no VMEM bound), MXU-heavy.

    Factor ``L = D (I + N)`` with ``D`` the block-diagonal (``n/block``
    triangular blocks, inverted as ONE batched ``solve_triangular`` — the
    per-block substitutions run in parallel lanes instead of one long
    serial chain) and ``N = D^{-1} L - I`` strictly block-lower (nilpotent:
    ``N^m = 0`` for ``m = n/block`` blocks).  Then

        (I + N)^{-1} = prod_k (I - N^{2^k}),   k = 0..ceil(log2 m)-1

    — the telescoping Neumann product: ``ceil(log2 m)`` squarings + as many
    full GEMMs, every FLOP on the MXU.  Exact (finite nilpotency), not an
    approximation.  Candidate replacement for XLA's serial
    ``solve_triangular(L, I)`` in the large-K posterior solve; crossover
    measured by ``experiments/tpu_chol_crossover.py`` (VERDICT r2 item 4).
    """
    n = L.shape[0]
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    m = n // block
    if m == 1:
        eye = jnp.eye(n, dtype=L.dtype)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    # batched diagonal-block inverse: (m, b, b)
    Dblocks = L.reshape(m, block, m, block)
    diag = jnp.stack([Dblocks[i, :, i, :] for i in range(m)])
    eye_b = jnp.broadcast_to(jnp.eye(block, dtype=L.dtype),
                             (m, block, block))
    Dinv_b = jax.vmap(lambda a, b: jax.scipy.linalg.solve_triangular(
        a, b, lower=True))(diag, eye_b)
    # Dinv as a block-diagonal matrix multiply: rows of L scaled blockwise.
    # Dinv @ L computed per block row: (m, b, n)
    Lrows = L.reshape(m, block, n)
    DinvL = jnp.einsum("mab,mbn->man", Dinv_b, Lrows,
                       preferred_element_type=jnp.float32).astype(L.dtype)
    DinvL = DinvL.reshape(n, n)
    eye = jnp.eye(n, dtype=L.dtype)
    N = DinvL - eye
    X = eye - N
    P = N
    stages = max((m - 1).bit_length(), 1)  # ceil(log2 m)
    for _ in range(1, stages):
        P = jnp.dot(P, P, preferred_element_type=jnp.float32).astype(L.dtype)
        X = jnp.dot(X, eye + P,
                    preferred_element_type=jnp.float32).astype(L.dtype)
    # Li = (I+N)^{-1} @ Dinv  — apply Dinv columnwise (block columns).
    Xcols = X.reshape(n, m, block)
    Li = jnp.einsum("nmb,mbc->nmc", Xcols, Dinv_b,
                    preferred_element_type=jnp.float32).astype(L.dtype)
    return Li.reshape(n, n)


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
