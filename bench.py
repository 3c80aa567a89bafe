"""Headline benchmark: NLML-grad evaluations per second per chip.

Measures the full SCFGP training step (feature map -> Gram -> Cholesky
posterior -> closed-form expected NLL -> gradient -> adam+nesterov update)
on the kin8nm-scale config (N=8192, D=8, S=50, M=200 => 2(S+M)=500
features), f32, steps chained inside one jit via lax.scan so dispatch
latency is excluded.

Baseline: the reference's kin8nm training at m~212 took ~395 s for a <=500
iteration run (BASELINE.md, read off experiments/kin8nm/plots/time(s).png),
i.e. ~1.27 NLML-grad evals/s on the author's CPU/Theano setup.

Robustness: the measurement runs in a subprocess with a hard timeout — this
environment's tunneled TPU occasionally wedges (see CLAUDE.md); if the TPU
measurement cannot complete, a clearly-labeled CPU fallback number is
printed instead so the driver always receives its one JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys

BASELINE_EVALS_PER_S = 500.0 / 395.0  # reference kin8nm: ~1.27 evals/s

_WORKER = r"""
import json, sys, time
if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, %(repo)r)
from scfgp_tpu.models.params import init_params
from scfgp_tpu.models.objective import loss_fn
from scfgp_tpu.opt.optimizers import make_optimizer, tree_add

N, D, S, M = 8192, 8, 50, 200
STEPS = 50
rng = np.random.RandomState(0)
X = jnp.asarray(rng.rand(N, D), jnp.float32)
y = jnp.asarray(np.sin(rng.rand(N) * 6) + 0.1 * rng.randn(N), jnp.float32)
params = init_params(jax.random.PRNGKey(0), D, S, M, jnp.float32)
tx = make_optimizer("adam", {"learning_rate": 0.01})
opt_state = tx.init(params)
vg = jax.value_and_grad(lambda p: loss_fn(p, X, y)[0])

def one(carry, _):
    p, st = carry
    cost, g = vg(p)
    delta, st = tx.update(g, st, p)
    return (tree_add(p, delta), st), cost

@jax.jit
def run(p, st):
    (p, st), costs = jax.lax.scan(one, (p, st), None, length=STEPS)
    return p, st, costs[-1]

p, st, c = run(params, opt_state)
float(c)  # HOST READBACK - the tunneled TPU's block_until_ready can return
          # before execution finishes (measured 0.1 ms/"step" on programs
          # whose HBM traffic alone needs >2 ms); timing to a value fetch
          # is the honest clock.
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    p, st, c = run(p, st)
final = float(c)
dt = time.perf_counter() - t0
print(json.dumps({"evals_per_s": STEPS * reps / dt,
                  "backend": jax.default_backend()}))
"""


def _measure(mode: str, timeout_s: int):
    code = _WORKER % {"repo": os.path.dirname(os.path.abspath(__file__))}
    args = [sys.executable, "-c", code] + ([mode] if mode == "cpu" else [])
    try:
        out = subprocess.run(args, capture_output=True, text=True,
                             timeout=timeout_s)
        for line in out.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                return json.loads(line)
    except subprocess.TimeoutExpired:
        return None
    return None


def main():
    # TPU first (generous budget: remote compiles are variance-prone), then
    # a labeled CPU fallback so the driver always gets a result line.
    res = _measure("tpu", timeout_s=1500)
    unit = "evals/s (N=8192, 2(S+M)=500, f32)"
    if res is None:
        res = _measure("cpu", timeout_s=900)
        unit = "evals/s (CPU FALLBACK - TPU unresponsive; N=8192, 2(S+M)=500)"
    if res is None:
        print(json.dumps({"metric": "nlml_grad_evals_per_s_per_chip",
                          "value": 0.0,
                          "unit": "bench could not run (no backend)",
                          "vs_baseline": 0.0}))
        return
    v = res["evals_per_s"]
    print(json.dumps({
        "metric": "nlml_grad_evals_per_s_per_chip",
        "value": round(v, 2),
        "unit": unit,
        "vs_baseline": round(v / BASELINE_EVALS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
