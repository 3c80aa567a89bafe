"""Large-K posterior-solve crossover: win or retire the Pallas Cholesky.

Round-2 VERDICT item 4: the op-split shows chol + latent dominating at
N=16384, 2K=2048 — past the Pallas (L, Li) kernel's whole-matrix VMEM
bound — so either the kernel is extended and wins somewhere, or SURVEY
§2.2 kernel 3 closes as "XLA wins, measured" with the crossover table.
This probe measures, same session, scan-chained, readback-timed:

  xla_chol          jnp.linalg.cholesky
  xla_chol_inv      chol + solve_triangular(L, I)  (the production solve)
  neumann_inv       chol + ops/cholesky.tri_inverse_blocked (batched
                    diagonal-block solves + log-depth Neumann squaring —
                    XLA ops only, no VMEM bound, MXU-heavy)
  pallas_chol       sequential-grid kernel          (n <= 1024: VMEM)
  pallas_fused      fused (L, Li) kernel            (n <= 1024: VMEM)

at n in {512, 1024, 2048, 4096}.  Appends incrementally to
results/chol_crossover.json (remote-compile variance).

Usage: python experiments/tpu_chol_crossover.py [--cpu] [--sizes 512 ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", nargs="*", type=int,
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scfgp_tpu.ops.cholesky import (cholesky_inverse_pallas,
                                        cholesky_pallas, tri_inverse_blocked)

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "chol_crossover.json")
    results = {}
    if os.path.exists(path) and not args.fresh:
        with open(path) as f:
            results = json.load(f)
    results.setdefault("backend", jax.default_backend())
    results.setdefault("sizes", {})

    interp = jax.default_backend() != "tpu"

    def xla_chol(A):
        return jnp.linalg.cholesky(A)

    def xla_chol_inv(A):
        L = jnp.linalg.cholesky(A)
        eye = jnp.eye(A.shape[0], dtype=A.dtype)
        return L, jax.scipy.linalg.solve_triangular(L, eye, lower=True)

    def neumann_inv(A):
        L = jnp.linalg.cholesky(A)
        return L, tri_inverse_blocked(L, block=256)

    def measure(fn, A, steps, reps):
        """Scan-chain fn so iterations serialize through the carry.

        The carry perturbation must depend on EVERY output element — an
        earlier version fed only L back, and XLA dead-code-eliminated the
        entire Li solve in the *_inv legs (chol+inv measured == chol).  A
        scalar sum over all outputs blocks DCE; the O(n^2) positive
        rescale keeps A SPD without adding an n^3 GEMM of overhead."""
        def one(carry, _):
            out = fn(carry)
            parts = out if isinstance(out, tuple) else (out,)
            s = sum(jnp.sum(p) for p in parts)
            nxt = A * (1.0 + 1e-9 * jnp.tanh(s * 1e-6))
            return nxt, s

        @jax.jit
        def run(A0):
            A1, trace = jax.lax.scan(one, A0, None, length=steps)
            return trace[-1]

        t0 = time.perf_counter()
        float(run(A))  # compile + readback
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            v = run(A)
        float(v)
        dt = time.perf_counter() - t0
        return dt / (steps * reps) * 1000.0, compile_s  # ms per call

    for n in args.sizes:
        key = str(n)
        cell = results["sizes"].setdefault(key, {})
        rng = np.random.RandomState(0)
        B = rng.randn(n, n).astype(np.float32) / np.sqrt(n)
        A = jnp.asarray(B @ B.T + np.eye(n, dtype=np.float32))

        legs = {"xla_chol": xla_chol, "xla_chol_inv": xla_chol_inv,
                "neumann_inv": neumann_inv}
        if n <= 1024:  # whole-matrix VMEM residency bound (cholesky.py)
            legs["pallas_chol"] = lambda M: cholesky_pallas(
                M, interpret=interp)
            legs["pallas_fused"] = lambda M: cholesky_inverse_pallas(
                M, interpret=interp)

        # numerics check once per size: neumann vs xla inverse
        if "neumann_err" not in cell:
            L, Li_x = jax.jit(xla_chol_inv)(A)
            _, Li_n = jax.jit(neumann_inv)(A)
            cell["neumann_err"] = float(jnp.max(jnp.abs(Li_n - Li_x)))
            print(json.dumps({key: {"neumann_err": cell["neumann_err"]}}),
                  flush=True)

        for name, fn in legs.items():
            if name in cell and isinstance(cell[name], dict):
                print(f"{key} {name}: cached", flush=True)
                continue
            try:
                ms, compile_s = measure(fn, A, args.steps, args.reps)
                cell[name] = {"ms": round(ms, 4),
                              "compile_s": round(compile_s, 1)}
            except Exception as e:
                cell[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps({key: {name: cell[name]}}), flush=True)
            with open(path, "w") as f:
                json.dump(results, f, indent=2)

    print(json.dumps({k: {n_: v_.get("ms") for n_, v_ in v.items()
                          if isinstance(v_, dict)}
                      for k, v in results["sizes"].items()}))


if __name__ == "__main__":
    main()
