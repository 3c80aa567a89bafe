"""TPU probe: f32 vs bf16-GEMM training-step throughput (one chip).

Measures the bench.py config (N=8192, D=8, 2(S+M)=500) with the default f32
GEMMs and with ``mm_dtype=bfloat16`` (Gram + latent-variance GEMMs on the
MXU at its native input width).  Prints one JSON line per variant.

Run alone — one TPU client at a time (CLAUDE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from scfgp_tpu.models.params import init_params
from scfgp_tpu.models.objective import loss_fn
from scfgp_tpu.opt.optimizers import make_optimizer, tree_add

# argv: [N D S M STEPS] — default is the bench.py config; pass e.g.
# 16384 8 200 824 20 for the MXU-bound large-K regime (2(S+M)=2048).
N, D, S, M, STEPS = (int(a) for a in sys.argv[1:6]) if len(sys.argv) > 5 \
    else (8192, 8, 50, 200, 50)

rng = np.random.RandomState(0)
X = jnp.asarray(rng.rand(N, D), jnp.float32)
y = jnp.asarray(np.sin(rng.rand(N) * 6) + 0.1 * rng.randn(N), jnp.float32)
params = init_params(jax.random.PRNGKey(0), D, S, M, jnp.float32)
tx = make_optimizer("adam", {"learning_rate": 0.01})
opt_state = tx.init(params)


def make_run(mm_dtype):
    vg = jax.value_and_grad(lambda p: loss_fn(p, X, y, mm_dtype=mm_dtype)[0])

    def one(carry, _):
        p, st = carry
        cost, g = vg(p)
        delta, st = tx.update(g, st, p)
        return (tree_add(p, delta), st), cost

    @jax.jit
    def run(p, st):
        (p, st), costs = jax.lax.scan(one, (p, st), None, length=STEPS)
        return p, st, costs[-1]

    return run


print("backend:", jax.default_backend(), flush=True)
for name, mm in (("f32", None), ("bf16", jnp.bfloat16)):
    run = make_run(mm)
    t0 = time.perf_counter()
    p, st, c = run(params, opt_state)
    float(c)  # HOST READBACK: axon's block_until_ready can return early
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        p, st, c = run(p, st)
    final = float(c)  # timed to a real readback, not just "ready"
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": name, "evals_per_s": round(STEPS * reps / dt, 1),
        "ms_per_step": round(1e3 * dt / (STEPS * reps), 4),
        "final_cost": float(c), "compile_s": round(compile_s, 1),
    }), flush=True)
