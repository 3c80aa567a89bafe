"""Pallas TPU kernel: fused low-rank trig Fourier feature map.

Computes ``Phi = s * [cos(X @ Fcat + pcat) | sin(X @ Fcat + pcat)]`` — the
reference's feature construction (``reference: SCFGP/SCFGP.py:99-102``) — in
ONE pass per row tile: the (TILE_N, K) projection is produced on the MXU into
VMEM and the cos/sin halves are written straight to VMEM output blocks, so
the projection tensor ``T = X F + p`` never round-trips HBM (the XLA graph
writes T, then reads it twice for cos and sin).

TPU tiling: lanes are 128-wide, so the wrapper zero-pads the contraction dim
D and the feature dim K up to multiples of 128 (zero columns of X times
anything contribute 0 to T; padded K columns are sliced off after the call
and never reach the Gram matrix).  cos and sin are separate outputs so no
write straddles an unaligned column boundary — with K%128 != 0 a single
(TILE_N, 2K) block put the cos/sin seam mid-lane, which wedged the Mosaic
pipeline on v5e.

The backward pass is a second Pallas kernel that *recomputes* T per tile
(FLOPs are cheap next to HBM traffic) and accumulates

    dT    = s * (g_sin * cos T - g_cos * sin T)
    dFcat = X^T dT          (accumulated across row tiles, f32)
    dpcat = sum_rows dT
    ds    = sum(g_cos * cos T + g_sin * sin T)

X is treated as non-differentiable data (hyperparameter gradients only, as in
the reference where X is a constant input to the Theano graph).

Falls back to interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
LANE = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_axis(a, axis, size):
    pad = size - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _fwd_kernel(scale_ref, x_ref, fcat_ref, pcat_ref, cos_ref, sin_ref):
    t = jnp.dot(x_ref[:], fcat_ref[:],
                preferred_element_type=jnp.float32) + pcat_ref[:]
    s = scale_ref[0]
    cos_ref[:] = (s * jnp.cos(t)).astype(cos_ref.dtype)
    sin_ref[:] = (s * jnp.sin(t)).astype(sin_ref.dtype)


def _bwd_kernel(scale_ref, x_ref, fcat_ref, pcat_ref, gcos_ref, gsin_ref,
                dfcat_ref, dpcat_ref, ds_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dfcat_ref[:] = jnp.zeros_like(dfcat_ref)
        dpcat_ref[:] = jnp.zeros_like(dpcat_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)

    t = jnp.dot(x_ref[:], fcat_ref[:],
                preferred_element_type=jnp.float32) + pcat_ref[:]
    c = jnp.cos(t)
    sn = jnp.sin(t)
    g_cos = gcos_ref[:].astype(jnp.float32)
    g_sin = gsin_ref[:].astype(jnp.float32)
    s = scale_ref[0]
    dt = s * (g_sin * c - g_cos * sn)
    dfcat_ref[:] += jax.lax.dot_general(
        x_ref[:], dt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpcat_ref[:] += jnp.sum(dt, axis=0, keepdims=True)
    ds_ref[:] = ds_ref[:] + jnp.sum(g_cos * c + g_sin * sn).reshape(1, 1)


def _padded_inputs(X, Fcat, pcat):
    n, D = X.shape
    K = Fcat.shape[1]
    Np, Dp, Kp = _round_up(n, TILE_N), _round_up(D, LANE), _round_up(K, LANE)
    Xp = _pad_axis(_pad_axis(X, 0, Np), 1, Dp)
    Fp = _pad_axis(_pad_axis(Fcat, 0, Dp), 1, Kp)
    pp = _pad_axis(pcat.reshape(1, K), 1, Kp)
    return Xp, Fp, pp, (n, D, K, Np, Dp, Kp)


def _phi_fwd_call(X, Fcat, pcat, scale, interpret):
    Xp, Fp, pp, (n, D, K, Np, Dp, Kp) = _padded_inputs(X, Fcat, pcat)
    grid = (Np // TILE_N,)
    blk = pl.BlockSpec((TILE_N, Kp), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cos_o, sin_o = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale (1,)
            pl.BlockSpec((TILE_N, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((Np, Kp), X.dtype)] * 2,
        interpret=interpret,
    )(scale.reshape(1), Xp, Fp, pp)
    return jnp.concatenate([cos_o[:n, :K], sin_o[:n, :K]], axis=1)


def _phi_bwd_call(X, Fcat, pcat, scale, g, interpret):
    Xp, Fp, pp, (n, D, K, Np, Dp, Kp) = _padded_inputs(X, Fcat, pcat)
    # Split the (n, 2K) cotangent into padded cos/sin halves.  Padded rows
    # and columns carry zero cotangent, so they contribute nothing.
    gcos = _pad_axis(_pad_axis(g[:, :K], 0, Np), 1, Kp)
    gsin = _pad_axis(_pad_axis(g[:, K:], 0, Np), 1, Kp)
    grid = (Np // TILE_N,)
    gblk = pl.BlockSpec((TILE_N, Kp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    dfcat, dpcat, ds = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_N, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            gblk, gblk,
        ],
        out_specs=[
            pl.BlockSpec((Dp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scale.reshape(1), Xp, Fp, pp, gcos, gsin)
    return dfcat[:D, :K], dpcat[0, :K], ds.reshape(())


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _phi_pallas(interpret, X, Fcat, pcat, scale):
    return _phi_fwd_call(X, Fcat, pcat, scale, interpret)


def _phi_pallas_fwd(interpret, X, Fcat, pcat, scale):
    out = _phi_fwd_call(X, Fcat, pcat, scale, interpret)
    return out, (X, Fcat, pcat, scale)


def _phi_pallas_bwd(interpret, res, g):
    X, Fcat, pcat, scale = res
    dfcat, dpcat, ds = _phi_bwd_call(X, Fcat, pcat, scale, g, interpret)
    return (None,  # X: data, no gradient
            dfcat.astype(Fcat.dtype),
            dpcat.astype(pcat.dtype),
            ds.astype(scale.dtype))


_phi_pallas.defvjp(_phi_pallas_fwd, _phi_pallas_bwd)


def fourier_features_pallas(X, Fcat, pcat, scale, interpret=None):
    """Fused Phi = scale * [cos(X Fcat + pcat) | sin(...)], differentiable in
    (Fcat, pcat, scale).  ``interpret=None`` auto-selects interpreter mode off
    TPU so the identical kernel runs in CPU tests."""
    if interpret is None:
        interpret = not _on_tpu()
    scale = jnp.asarray(scale, jnp.float32).reshape(())
    return _phi_pallas(interpret, X, Fcat, pcat, scale)
