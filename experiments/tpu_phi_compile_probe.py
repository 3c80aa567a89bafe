"""Reproduce the bench-matrix pallas-phi 65536x2048 compile failure.

The round-3 same-session bench matrix (results/bench_matrix.json) recorded
a remote-compile-service error for the pallas-phi leg at the single cell
N=65536, 2K=2048 (every other cell compiled; the dense pallas map is
retired anyway — docs/TODO.md open item 4).  VMEM accounting says the tile
is small (TILE_N=512 x Kp=1024 f32 blocks ~ 6.5 MB), so the hypothesis is
a service-side failure, not a Mosaic capacity limit.  This probe compiles
and runs JUST the phi forward+backward at that shape and prints either
timings or the full error, isolating kernel from service.

Usage: python experiments/tpu_phi_compile_probe.py [--n 65536] [--k 1024]
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--k", type=int, default=1024, help="K (2K = 2*k lanes)")
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from scfgp_tpu.ops.phi import fourier_features_pallas

    n, d, k = args.n, args.d, args.k
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(n, d), jnp.float32)
    Fcat = jnp.asarray(rng.randn(d, k) * 0.3, jnp.float32)
    pcat = jnp.asarray(rng.rand(k) * 2 * np.pi, jnp.float32)
    scale = jnp.float32(1.3)

    def f(X_, F_, p_, s_):
        return jnp.sum(fourier_features_pallas(X_, F_, p_, s_))

    out = {"n": n, "k": k, "backend": jax.default_backend()}
    try:
        fwd = jax.jit(f)
        t0 = time.time()
        v = float(fwd(X, Fcat, pcat, scale))
        out["fwd_compile_and_run_s"] = round(time.time() - t0, 1)
        out["fwd_value_finite"] = bool(np.isfinite(v))
        g = jax.jit(jax.grad(f, argnums=(1, 2, 3)))
        t0 = time.time()
        gs = g(X, Fcat, pcat, scale)
        gn = float(sum(jnp.sum(jnp.abs(x)) for x in gs))
        out["bwd_compile_and_run_s"] = round(time.time() - t0, 1)
        out["grad_norm_finite"] = bool(np.isfinite(gn))
        out["status"] = "ok"
    except Exception as e:
        out["status"] = "error"
        out["error"] = f"{type(e).__name__}: {e}"[:2000]
        traceback.print_exc()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
