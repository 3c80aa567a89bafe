"""End-to-end training wall-clock on TPU: the reference's headline number.

The reference's kin8nm sweep at m~212 took ~395 s per <=500-iteration
training run on the author's CPU (BASELINE.md, read off the committed time
plot).  This measures the same workload shape end to end through the public
API — Scaler fit, fused device loop with early stopping + stall annealing,
validation metrics — on one TPU chip via ``fit_fast``.

argv: [S M MAX_ITER] (default 50 200 500) on the kin8nm benchmark
(real CSV if present, documented surrogate otherwise).
``cpu`` anywhere forces CPU.  Prints one JSON line per run (cold = first
call incl. jit compile; warm = re-fit with cached executables, the
reference's own compiled-function-reuse pattern, SCFGP.py:150-151).
Run alone — one TPU client at a time (CLAUDE.md).
"""

import json
import sys
import time

import jax

if "cpu" in sys.argv:
    sys.argv.remove("cpu")
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, ".")
from scfgp_tpu import SCFGP
from scfgp_tpu.data.datasets import load_kin8nm

S, M, MAX_ITER = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
    else (50, 200, 500)

Xt, yt, Xv, yv, meta = load_kin8nm(seed=0)
N, D = Xt.shape

print("backend:", jax.default_backend(), flush=True)
for label, seed in (("cold", 0), ("warm", 1)):
    m = SCFGP(sparsity=S, nfeats=M, seed=seed)
    t0 = time.perf_counter()
    m.fit_fast(Xt, yt, Xv, yv, max_iter=MAX_ITER)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "run": label, "train_s": round(dt, 2),
        "iters": int(m.evals["COST"][1] and len(m.evals["COST"][1])),
        "NMSE": round(float(m.evals["NMSE"][1][m.min_obj_ind]), 4),
        "MNLP": round(float(m.evals["MNLP"][1][m.min_obj_ind]), 3),
        "config": {"N": int(N), "D": int(D), "S": S, "M": M,
                   "max_iter": MAX_ITER, "data": meta["source"]},
    }), flush=True)
