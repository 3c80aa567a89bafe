"""Honest-f32 precision matrix: re-measure the mm_dtype dispatch table.

Round-4 discovery: jax's DEFAULT matmul precision lowers f32 dots to
single-pass bf16 on the TPU MXU, so every prior "f32" TPU measurement in
this repo was bf16-pass arithmetic — and it silently broke the co2
composite model (fused fit NMSE 2.34 / ensemble NaN vs the correct
0.00023; "high" 3-pass still NaNs; only "highest" = true f32 recovers
the CPU-exact result).  The package now forces
``jax_default_matmul_precision = "highest"`` at import (scfgp_tpu/
__init__.py), which makes the old dispatch table
(``ops/dispatch.py``) stale: its "f32" column was fake-f32.

This probe re-races honest-f32 vs explicit-bf16 GEMMs
(``mm_dtype=bfloat16``: bf16 inputs are single-pass natively, unaffected
by the precision config) per (N x 2K) cell, same-session, median of 3
separated sequences, timed to host readbacks.  The winner table sets the
new ``BF16_GEMM_WORK_THRESHOLD``.

Usage: python experiments/tpu_precision_matrix.py [--cpu]
Writes experiments/results/precision_matrix.json.
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
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scfgp_tpu.models.params import init_params
    from scfgp_tpu.models.objective import loss_fn
    from scfgp_tpu.opt.optimizers import make_optimizer, tree_add

    assert jax.config.jax_default_matmul_precision == "highest"

    CELLS = [  # (N, S, M) -> 2K = 2(S+M)
        (2048, 50, 200),    # 2K=500, sampler-scale rows
        (8192, 50, 200),    # 2K=500, the bench.py headline cell
        (8192, 112, 400),   # 2K=1024
        (65536, 50, 200),   # 2K=500, streaming-scale rows
    ]
    D = 8
    out = {"backend": jax.default_backend(), "steps": args.steps,
           "cells": []}
    for (N, S, M) in CELLS:
        rng = np.random.RandomState(0)
        X = jnp.asarray(rng.rand(N, D), jnp.float32)
        y = jnp.asarray(np.sin(rng.rand(N) * 6) + 0.1 * rng.randn(N),
                        jnp.float32)
        params = init_params(jax.random.PRNGKey(0), D, S, M, jnp.float32)
        tx = make_optimizer("adam", {"learning_rate": 0.01})
        st0 = tx.init(params)

        def measure(mm):
            vg = jax.value_and_grad(
                lambda p, X_, y_: loss_fn(p, X_, y_, mm_dtype=mm)[0])

            def one(carry, _):
                p, st = carry
                c, g = vg(p, X, y)
                d, st = tx.update(g, st, p)
                return (tree_add(p, d), st), c

            @jax.jit
            def run(p, st):
                (p, st), cs = jax.lax.scan(one, (p, st), None,
                                           length=args.steps)
                return p, st, cs[-1]

            p, st, c = run(params, st0)
            float(c)  # readback: the honest clock
            rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(3):
                    p, st, c = run(p, st)
                float(c)
                rates.append(args.steps * 3 / (time.perf_counter() - t0))
            rates.sort()
            return rates[1]

        f32 = measure(None)
        bf16 = measure(jnp.bfloat16)
        two_k = 2 * (S + M)
        cell = {"n": N, "two_k": two_k, "work": N * two_k ** 2,
                "f32_honest": round(f32, 1), "bf16": round(bf16, 1),
                "bf16_speedup": round(bf16 / f32, 3),
                "winner": "bf16" if bf16 > f32 else "f32"}
        out["cells"].append(cell)
        print(json.dumps(cell), flush=True)
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "results")
        with open(os.path.join(outdir, "precision_matrix.json"), "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
