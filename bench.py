"""Headline benchmark: NLML-grad evaluations per second per chip.

Runs the full SCFGP training step (feature map -> Gram -> Cholesky posterior
-> closed-form expected NLL -> gradient -> adam+nesterov update) on the
kin8nm-scale config (N=8192, D=8, S=50, M=200 => 2(S+M)=500 features), f32,
on the default backend (the real TPU chip under the driver), with steps
chained inside one jit via lax.scan so dispatch latency is excluded.

Baseline: the reference's kin8nm training at m~212 took ~395 s for a <=500
iteration run (BASELINE.md, read off experiments/kin8nm/plots/time(s).png),
i.e. ~1.27 NLML-grad evals/s on the author's CPU/Theano setup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scfgp_tpu.models.params import init_params
    from scfgp_tpu.models.objective import loss_fn
    from scfgp_tpu.opt.optimizers import make_optimizer, tree_add

    N, D, S, M = 8192, 8, 50, 200
    STEPS = 50  # scan length kept modest: this environment's remote compile
    #             service is variance-prone on large programs
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

    # Warmup/compile.
    p, st, c = run(params, opt_state)
    jax.block_until_ready(c)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        p, st, c = run(p, st)
    jax.block_until_ready(c)
    dt = time.perf_counter() - t0

    evals_per_s = STEPS * reps / dt
    baseline = 500.0 / 395.0  # reference kin8nm: ~1.27 NLML-grad evals/s
    print(json.dumps({
        "metric": "nlml_grad_evals_per_s_per_chip",
        "value": round(evals_per_s, 2),
        "unit": "evals/s (N=8192, 2(S+M)=500, f32)",
        "vs_baseline": round(evals_per_s / baseline, 1),
    }))


if __name__ == "__main__":
    main()
