"""Same-session bench matrix: settle bf16 + kernel dispatch with one clock.

Round-2 VERDICT item 3: BENCH_r02 (bf16 slower than f32) contradicted
docs/DESIGN.md (bf16 +10%) because the two numbers came from different
sessions on a shared tunneled chip whose absolute throughput drifts ±15%
(docs/RESULTS.md timing note).  This script measures every leg in ONE
session, cell by cell over (N, 2K), readback-timed, steps scan-chained
inside one jit:

  f32          loss_fn, XLA feature map, f32 GEMMs      (the default)
  bf16         mm_dtype=bfloat16: O(N K^2) GEMMs at MXU native width
  pallas_phi   fused trig feature-map kernel (ops/phi.py)
  gram_stream  streaming objective + Phi-free Pallas Gram (ops/gram.py)

Winners per cell feed ``scfgp_tpu.ops.dispatch`` (mm_dtype="auto").
Results append incrementally to results/bench_matrix.json so a crashed or
interrupted session resumes where it left off (remote-compile variance:
20-900 s per program).

Usage: python experiments/tpu_bench_matrix.py [--cpu] [--steps 30]
       [--cells 8192x500 65536x2048 ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = [(8192, 500), (8192, 1024), (8192, 2048),
         (65536, 500), (65536, 1024), (65536, 2048)]
# 2(S+M) = 2K with the kin8nm-like 1:4 S:M split.
SM = {500: (50, 200), 1024: (112, 400), 2048: (224, 800)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cells", nargs="*", default=None)
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing results, remeasure everything")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scfgp_tpu.models.objective import loss_fn
    from scfgp_tpu.models.params import init_params
    from scfgp_tpu.ops.streaming import loss_fn_streaming
    from scfgp_tpu.opt.optimizers import make_optimizer, tree_add

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "bench_matrix.json")
    results = {}
    if os.path.exists(path) and not args.fresh:
        with open(path) as f:
            results = json.load(f)
    results.setdefault("backend", jax.default_backend())
    results.setdefault("cells", {})

    cells = CELLS
    if args.cells:
        cells = [tuple(int(v) for v in c.split("x")) for c in args.cells]

    D = 8
    tx = make_optimizer("adam", {"learning_rate": 0.01})

    def make_run(loss, steps):
        vg = jax.value_and_grad(loss)

        def one(carry, _):
            p, st, X, y = carry
            cost, g = vg(p, X, y)
            delta, st = tx.update(g, st, p)
            return (tree_add(p, delta), st, X, y), cost

        @jax.jit
        def run(p, st, X, y):
            (p, st, _, _), costs = jax.lax.scan(one, (p, st, X, y), None,
                                                length=steps)
            return p, st, costs[-1]
        return run

    def measure(run, p0, st0, X, y, steps, reps):
        t_c0 = time.perf_counter()
        p, st, c = run(p0, st0, X, y)
        float(c)  # readback = honest clock (CLAUDE.md)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(reps):
            p, st, c = run(p, st, X, y)
        float(c)
        dt = time.perf_counter() - t0
        return steps * reps / dt, compile_s

    for (N, K2) in cells:
        key = f"{N}x{K2}"
        cell = results["cells"].setdefault(key, {})
        S, M = SM[K2]
        rng = np.random.RandomState(0)
        X = jnp.asarray(rng.rand(N, D), jnp.float32)
        y = jnp.asarray(np.sin(rng.rand(N) * 6) + 0.1 * rng.randn(N),
                        jnp.float32)
        params = init_params(jax.random.PRNGKey(0), D, S, M, jnp.float32)
        st0 = tx.init(params)
        block = min(N, 8192)

        legs = {
            "f32": lambda p, X_, y_: loss_fn(p, X_, y_)[0],
            "bf16": lambda p, X_, y_: loss_fn(
                p, X_, y_, mm_dtype=jnp.bfloat16)[0],
            "pallas_phi": lambda p, X_, y_: loss_fn(
                p, X_, y_, feature_impl="pallas")[0],
            "gram_stream": lambda p, X_, y_: loss_fn_streaming(
                p, X_, y_, block_size=block, stats_impl="pallas")[0],
            "bf16_pallas_phi": lambda p, X_, y_: loss_fn(
                p, X_, y_, feature_impl="pallas",
                mm_dtype=jnp.bfloat16)[0],
        }
        for name, loss in legs.items():
            if name in cell and cell[name].get("evals_per_s"):
                print(f"{key} {name}: cached "
                      f"{cell[name]['evals_per_s']}", flush=True)
                continue
            try:
                rate, compile_s = measure(make_run(loss, args.steps),
                                          params, st0, X, y,
                                          args.steps, args.reps)
                cell[name] = {"evals_per_s": round(rate, 1),
                              "ms_per_step": round(1000.0 / rate, 3),
                              "compile_s": round(compile_s, 1)}
            except Exception as e:  # leg may be unsupported on a backend
                cell[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps({key: {name: cell[name]}}), flush=True)
            with open(path, "w") as f:
                json.dump(results, f, indent=2)

        ok = {k: v["evals_per_s"] for k, v in cell.items()
              if isinstance(v, dict) and v.get("evals_per_s")}
        if ok:
            cell["winner"] = max(ok, key=ok.get)
            with open(path, "w") as f:
                json.dump(results, f, indent=2)
        print(json.dumps({key: {"winner": cell.get("winner")}}), flush=True)

    print(json.dumps({k: v.get("winner") for k, v in
                      results["cells"].items()}))


if __name__ == "__main__":
    main()
