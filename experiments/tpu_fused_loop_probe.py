"""Per-iteration cost of the fused while_loop trainer vs the plain scan.

fit_fast measured ~21 ms/iter on TPU where the scan-chained step probe
measures 0.54 ms — this isolates where the difference lives: same config,
(a) fused_optimize (while_loop + bookkeeping + annealing), (b) bare scan of
the same value_and_grad step.  ``cpu`` forces CPU.

Run alone — one TPU client at a time (CLAUDE.md).
"""

import json
import sys
import time

import jax

if "cpu" in sys.argv:
    sys.argv.remove("cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from scfgp_tpu.models.params import init_params
from scfgp_tpu.models.objective import loss_fn
from scfgp_tpu.opt.optimizers import make_optimizer, tree_add
from scfgp_tpu.opt.fused_loop import fused_optimize

N, D, S, M, ITERS = 8192, 8, 50, 200, 300
rng = np.random.RandomState(0)
X = jnp.asarray(rng.rand(N, D), jnp.float32)
y = jnp.asarray(np.sin(rng.rand(N) * 6) + 0.1 * rng.randn(N), jnp.float32)
params = init_params(jax.random.PRNGKey(0), D, S, M, jnp.float32)
tx = make_optimizer("adam", {"learning_rate": 0.01})

vg = jax.value_and_grad(
    lambda p: (lambda c, a: (c, a.post))(*loss_fn(p, X, y)),
    has_aux=True)

print("backend:", jax.default_backend(), flush=True)

# (a) fused while_loop trainer, early stopping disabled via max_cvrg so the
# trip count is exactly ITERS
run = jax.jit(lambda p, k: fused_optimize(
    vg, tx, p, k, max_iter=ITERS, cvrg_tol=0.0, max_cvrg=ITERS + 1))
t0 = time.perf_counter()
res = jax.block_until_ready(run(params, jax.random.PRNGKey(1)))
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
res = jax.block_until_ready(run(params, jax.random.PRNGKey(2)))
dt = time.perf_counter() - t0
n = int(res.num_iters)
print(json.dumps({"impl": "fused_while", "iters_run": n,
                  "ms_per_iter": round(1e3 * dt / max(n, 1), 3),
                  "compile_s": round(compile_s, 1)}), flush=True)

# (b) bare scan of the same step
opt_state = tx.init(params)


def one(carry, _):
    p, st = carry
    (cost, post), g = vg(p)
    delta, st = tx.update(g, st, p)
    return (tree_add(p, delta), st), cost


@jax.jit
def scan_run(p, st):
    (p, st), costs = jax.lax.scan(one, (p, st), None, length=ITERS)
    return costs[-1]


c = scan_run(params, opt_state).block_until_ready()
t0 = time.perf_counter()
c = scan_run(params, opt_state).block_until_ready()
dt = time.perf_counter() - t0
print(json.dumps({"impl": "bare_scan",
                  "ms_per_iter": round(1e3 * dt / ITERS, 3)}), flush=True)
