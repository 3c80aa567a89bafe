"""On-chip probe for the sequential-grid Pallas Cholesky (docs/TODO.md #1).

Compiles `ops/cholesky.py::cholesky_pallas` with interpret=False on the real
chip, checks numerics against XLA's `jnp.linalg.cholesky`, and times both
(scan-chained, carry-dependent so iterations serialize) at the bench-config
size and one larger size.  Prints one JSON line per (n, impl).

argv: matrix sizes (default 512 1024).  Run alone — one TPU client at a time.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from scfgp_tpu.ops.cholesky import cholesky_pallas, cholesky_inverse_pallas

SIZES = [int(a) for a in sys.argv[1:]] or [512, 1024]
STEPS = 30


def xla_chol_inv(M):
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(M.shape[0], dtype=M.dtype)
    return L, jax.scipy.linalg.solve_triangular(L, eye, lower=True)


print("backend:", jax.default_backend(), flush=True)
for n in SIZES:
    rng = np.random.RandomState(0)
    B = rng.randn(n, n).astype(np.float32) / np.sqrt(n)
    A = jnp.asarray(B @ B.T + np.eye(n, dtype=np.float32))

    L_xla, Li_xla = jax.jit(xla_chol_inv)(A)
    t0 = time.perf_counter()
    L_pal = jax.jit(lambda M: cholesky_pallas(M, interpret=False))(A)
    L_pal.block_until_ready()
    compile_s = time.perf_counter() - t0
    err = float(jnp.max(jnp.abs(L_pal - L_xla)))
    print(json.dumps({"n": n, "check": "max_abs_diff_vs_xla", "err": err,
                      "compile_s": round(compile_s, 1)}), flush=True)
    t0 = time.perf_counter()
    L_f, Li_f = jax.jit(lambda M: cholesky_inverse_pallas(
        M, interpret=False))(A)
    jax.block_until_ready((L_f, Li_f))
    compile_s = time.perf_counter() - t0
    err_li = float(jnp.max(jnp.abs(Li_f - Li_xla)))
    print(json.dumps({"n": n, "check": "fused_Li_diff_vs_xla",
                      "err": err_li,
                      "compile_s": round(compile_s, 1)}), flush=True)

    for name, chol in (("xla", jnp.linalg.cholesky),
                       ("pallas", lambda M: cholesky_pallas(
                           M, interpret=False)),
                       ("xla_chol+inv", xla_chol_inv),
                       ("pallas_fused_chol+inv", lambda M:
                        cholesky_inverse_pallas(M, interpret=False))):
        def one(carry, _):
            out = chol(A + carry * jnp.eye(n, dtype=A.dtype))
            L = out[0] if isinstance(out, tuple) else out
            probe = L[n - 1, n - 1]
            if isinstance(out, tuple):
                probe = probe + out[1][n - 1, 0]  # keep Li live too
            return probe * 1e-20, None

        @jax.jit
        def run():
            c, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=STEPS)
            return c

        c = run().block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            c = run()
        c.block_until_ready()
        dt = time.perf_counter() - t0
        print(json.dumps({"n": n, "impl": name,
                          "ms": round(1e3 * dt / (STEPS * reps), 4)}),
              flush=True)
