"""XLA-level triangular inverse: solve_triangular vs log-depth Neumann.

The posterior solve materializes Li = L^{-1} (objective.chol_and_inverse).
XLA's solve_triangular-vs-identity is serial-blocked; the exact Neumann
product (L = D(I+N), N nilpotent => (I+N)^{-1} = prod (I + (-N)^{2^i}))
is ~2*log2(n) GEMMs.  Times both on chip, checks numerics.

argv: sizes (default 512 1024).  Run alone — one TPU client at a time.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZES = [int(a) for a in sys.argv[1:]] or [512, 1024]
STEPS = 50


def tri_inv_neumann(L):
    n = L.shape[0]
    d = jnp.diagonal(L)[:, None]
    M = L / d
    eye = jnp.eye(n, dtype=L.dtype)
    N = M - eye
    X = eye - N
    P = N
    stages = max(1, (n - 1).bit_length())  # 2^stages >= n
    for _ in range(1, stages):
        P = jnp.dot(P, P, preferred_element_type=jnp.float32)
        X = jnp.dot(X, eye + P, preferred_element_type=jnp.float32)
    return X / d.T


def tri_inv_xla(L):
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


print("backend:", jax.default_backend(), flush=True)
for n in SIZES:
    rng = np.random.RandomState(0)
    B = rng.randn(n, n).astype(np.float32) / np.sqrt(n)
    A = jnp.asarray(B @ B.T + np.eye(n, dtype=np.float32))
    L = jnp.linalg.cholesky(A)
    ref = np.asarray(jax.jit(tri_inv_xla)(L))
    got = np.asarray(jax.jit(tri_inv_neumann)(L))
    print(json.dumps({"n": n, "max_abs_diff": float(np.max(np.abs(got - ref)))}),
          flush=True)

    for name, f in (("xla_solve", tri_inv_xla), ("neumann", tri_inv_neumann)):
        def one(carry, _):
            Li = f(L + carry * jnp.eye(n, dtype=L.dtype))
            return Li[n - 1, 0] * 1e-20, None

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
