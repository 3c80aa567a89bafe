"""Pallas TPU kernel: fused feature-map + sufficient-statistics accumulation.

SURVEY.md §2.2 kernel 2: computes the weighted sufficient statistics

    phiTphi = Phi^T diag(w) Phi     (2K x 2K)
    phiTy   = Phi^T (w * y)         (2K,)
    yTy     = sum(w y^2),  n = sum(w)

(reference Gram path ``reference: SCFGP/SCFGP.py:104,108,126``) WITHOUT ever
writing Phi to HBM: each row tile's projection ``T = X F + p`` and its
cos/sin features live only in VMEM, and the MXU accumulates the three
quadrant Grams ``cc = cos^T W cos``, ``cs = cos^T W sin``, ``ss`` directly
(``sc = cs^T`` by symmetry).  For N-row data this removes the O(N * 2K)
feature tensor from memory traffic entirely — the customer is the streaming
objective at the N=1e6 scaling config, where Phi blocks are recomputed in
every pass anyway.

Backward (custom VJP, params only — X/y/w are data): with cotangents
``Abar = Cbar + Cbar^T`` (quadrant blocks) and ``pbar``,

    G_cos = w * (s (c Abar_cc + sn Abar_sc) + y pbar_cos)
    G_sin = w * (s (c Abar_cs^T? -- see code) ...)
    dT    = s (G_sin c - G_cos sn)
    dFcat = X^T dT,  dpcat = sum_rows dT,
    ds    = sum(G_cos c + G_sin sn)

accumulated across row tiles in a second Pallas kernel that recomputes T.
Lane alignment: D and K are zero-padded to 128 (padded K columns produce
junk rows/cols in the accumulators that are sliced off before use and
receive zero cotangent in backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phi import TILE_N, LANE, _on_tpu, _round_up, _pad_axis


def _fwd_kernel(scale_ref, x_ref, fcat_ref, pcat_ref, y_ref, w_ref,
                cc_ref, cs_ref, ss_ref, cty_ref, sty_ref, sc2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cc_ref[:] = jnp.zeros_like(cc_ref)
        cs_ref[:] = jnp.zeros_like(cs_ref)
        ss_ref[:] = jnp.zeros_like(ss_ref)
        cty_ref[:] = jnp.zeros_like(cty_ref)
        sty_ref[:] = jnp.zeros_like(sty_ref)
        sc2_ref[:] = jnp.zeros_like(sc2_ref)

    t = jnp.dot(x_ref[:], fcat_ref[:],
                preferred_element_type=jnp.float32) + pcat_ref[:]
    s = scale_ref[0]
    c = s * jnp.cos(t)           # scaled cos features (TILE, Kp)
    sn = s * jnp.sin(t)
    w = w_ref[:]                 # (TILE, 1)
    y = y_ref[:]                 # (TILE, 1)
    wc = w * c
    wy = w * y                   # (TILE, 1)
    dimn = (((0,), (0,)), ((), ()))
    cc_ref[:] += jax.lax.dot_general(c, wc, dimn,
                                     preferred_element_type=jnp.float32)
    cs_ref[:] += jax.lax.dot_general(wc, sn, dimn,
                                     preferred_element_type=jnp.float32)
    ss_ref[:] += jax.lax.dot_general(sn, w * sn, dimn,
                                     preferred_element_type=jnp.float32)
    cty_ref[:] += jax.lax.dot_general(wy, c, dimn,
                                      preferred_element_type=jnp.float32)
    sty_ref[:] += jax.lax.dot_general(wy, sn, dimn,
                                      preferred_element_type=jnp.float32)
    # (1, LANE)-aligned scalar row: col 0 = sum(w y^2), col 1 = sum(w).
    vals = jnp.concatenate(
        [jnp.sum(w * y * y).reshape(1, 1), jnp.sum(w).reshape(1, 1),
         jnp.zeros((1, sc2_ref.shape[1] - 2), sc2_ref.dtype)], axis=1)
    sc2_ref[:] = sc2_ref[:] + vals


def _bwd_kernel(scale_ref, x_ref, fcat_ref, pcat_ref, y_ref, w_ref,
                acc_ref, acs_ref, asc_ref, ass_ref, pbc_ref, pbs_ref,
                dfcat_ref, dpcat_ref, ds_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dfcat_ref[:] = jnp.zeros_like(dfcat_ref)
        dpcat_ref[:] = jnp.zeros_like(dpcat_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)

    t = jnp.dot(x_ref[:], fcat_ref[:],
                preferred_element_type=jnp.float32) + pcat_ref[:]
    s = scale_ref[0]
    c = jnp.cos(t)               # UNscaled trig (TILE, Kp)
    sn = jnp.sin(t)
    w = w_ref[:]
    y = y_ref[:]
    # dL/dPhi for Phi = s*[c | sn], stats as in forward:
    #   dL/dPhi = diag(w) Phi Abar + (w*y) pbar^T
    # quadrants: Abar = [[acc, acs], [asc, ass]]
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    g_cos = w * (s * (mm(c, acc_ref[:]) + mm(sn, asc_ref[:]))
                 + y * pbc_ref[:])
    g_sin = w * (s * (mm(c, acs_ref[:]) + mm(sn, ass_ref[:]))
                 + y * pbs_ref[:])
    dt = s * (g_sin * c - g_cos * sn)
    dfcat_ref[:] += jax.lax.dot_general(
        x_ref[:], dt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpcat_ref[:] += jnp.sum(dt, axis=0, keepdims=True)
    ds_ref[:] = ds_ref[:] + jnp.sum(g_cos * c + g_sin * sn).reshape(1, 1)


def _prep(X, y, w, Fcat, pcat):
    n, D = X.shape
    K = Fcat.shape[1]
    Np, Dp, Kp = _round_up(n, TILE_N), _round_up(D, LANE), _round_up(K, LANE)
    if w is None:
        w = jnp.ones(n, X.dtype)
    Xp = _pad_axis(_pad_axis(X, 0, Np), 1, Dp)
    yp = _pad_axis(y.reshape(-1, 1), 0, Np)
    wp = _pad_axis(w.reshape(-1, 1).astype(X.dtype), 0, Np)
    Fp = _pad_axis(_pad_axis(Fcat, 0, Dp), 1, Kp)
    pp = _pad_axis(pcat.reshape(1, K), 1, Kp)
    return Xp, yp, wp, Fp, pp, (n, D, K, Np, Dp, Kp)


def _fwd_call(X, y, w, Fcat, pcat, scale, interpret):
    Xp, yp, wp, Fp, pp, (n, D, K, Np, Dp, Kp) = _prep(X, y, w, Fcat, pcat)
    grid = (Np // TILE_N,)
    kblk = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    rblk = lambda cols: pl.BlockSpec((TILE_N, cols), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    cc, cs, ss, cty, sty, sc2 = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rblk(Dp), kblk((Dp, Kp)), kblk((1, Kp)), rblk(1), rblk(1),
        ],
        out_specs=[kblk((Kp, Kp)), kblk((Kp, Kp)), kblk((Kp, Kp)),
                   kblk((1, Kp)), kblk((1, Kp)), kblk((1, LANE))],
        out_shape=[
            jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(scale.reshape(1), Xp, Fp, pp, yp, wp)
    cc = cc[:K, :K]
    cs = cs[:K, :K]
    ss = ss[:K, :K]
    phiTphi = jnp.block([[cc, cs], [cs.T, ss]]).astype(X.dtype)
    phiTy = jnp.concatenate([cty[0, :K], sty[0, :K]]).astype(X.dtype)
    return phiTphi, phiTy, sc2[0, 0].astype(X.dtype), sc2[0, 1].astype(X.dtype)


def _bwd_call(X, y, w, Fcat, pcat, scale, cbar, pbar, interpret):
    Xp, yp, wp, Fp, pp, (n, D, K, Np, Dp, Kp) = _prep(X, y, w, Fcat, pcat)
    abar = cbar + cbar.T
    acc = _pad_axis(_pad_axis(abar[:K, :K], 0, Kp), 1, Kp).astype(jnp.float32)
    acs = _pad_axis(_pad_axis(abar[:K, K:], 0, Kp), 1, Kp).astype(jnp.float32)
    asc = _pad_axis(_pad_axis(abar[K:, :K], 0, Kp), 1, Kp).astype(jnp.float32)
    ass = _pad_axis(_pad_axis(abar[K:, K:], 0, Kp), 1, Kp).astype(jnp.float32)
    pbc = _pad_axis(pbar[:K].reshape(1, K), 1, Kp).astype(jnp.float32)
    pbs = _pad_axis(pbar[K:].reshape(1, K), 1, Kp).astype(jnp.float32)
    grid = (Np // TILE_N,)
    kblk = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    rblk = lambda cols: pl.BlockSpec((TILE_N, cols), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    dfcat, dpcat, ds = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rblk(Dp), kblk((Dp, Kp)), kblk((1, Kp)), rblk(1), rblk(1),
            kblk((Kp, Kp)), kblk((Kp, Kp)), kblk((Kp, Kp)), kblk((Kp, Kp)),
            kblk((1, Kp)), kblk((1, Kp)),
        ],
        out_specs=[kblk((Dp, Kp)), kblk((1, Kp)), kblk((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scale.reshape(1), Xp, Fp, pp, yp, wp, acc, acs, asc, ass, pbc, pbs)
    return dfcat[:D, :K], dpcat[0, :K], ds.reshape(())


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stats_pallas(interpret, X, y, w, Fcat, pcat, scale):
    return _fwd_call(X, y, w, Fcat, pcat, scale, interpret)


def _stats_fwd(interpret, X, y, w, Fcat, pcat, scale):
    out = _fwd_call(X, y, w, Fcat, pcat, scale, interpret)
    return out, (X, y, w, Fcat, pcat, scale)


def _stats_bwd(interpret, res, cts):
    X, y, w, Fcat, pcat, scale = res
    cbar, pbar, _ybar, _nbar = cts  # yTy/n do not depend on params
    dfcat, dpcat, ds = _bwd_call(X, y, w, Fcat, pcat, scale, cbar, pbar,
                                 interpret)
    return (None, None, None,
            dfcat.astype(Fcat.dtype),
            dpcat.astype(pcat.dtype),
            ds.astype(scale.dtype))


_stats_pallas.defvjp(_stats_fwd, _stats_bwd)


def sufficient_stats_pallas(p, X, y, w=None, interpret=None):
    """Fused Phi-free sufficient statistics for SCFGPParams ``p``.

    Returns a ``SufficientStats``; differentiable in the params (X/y/w are
    data).  ``interpret=None`` auto-selects interpreter mode off TPU.
    """
    from ..models.objective import SufficientStats
    from ..models.params import derive_frequencies

    if interpret is None:
        interpret = not _on_tpu()
    d = derive_frequencies(p)
    scale = (jnp.exp(p.b) * jnp.sqrt(2.0 / p.M)).astype(jnp.float32)
    y = y.reshape(-1)
    phiTphi, phiTy, yTy, n = _stats_pallas(
        interpret, X, y, w, d.Fcat, d.pcat, scale.reshape(()))
    return SufficientStats(phiTphi=phiTphi, phiTy=phiTy, yTy=yTy, n=n)
