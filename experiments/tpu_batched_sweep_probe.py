"""Batched sweep throughput on TPU: fit_fast_batch vs sequential fit_fast.

The reference's experiment shape is many small independent trials
(boston: 50 reps x 5 sizes, ``reference: boston_housing.py:16,23``).  Each
boston-sized trial (N=455, 2(S+M)=80) is dispatch/latency bound on its own
— nowhere near the chip's roofline — so batching B trials into ONE vmapped
fused program (models/model.py::fit_fast_batch) is where sweep throughput
comes from: batched Phi GEMMs, batched Cholesky, one dispatch for the whole
sweep.

Measures, same session (honest A/B):
  seq   — B warm sequential fit_fast calls (the round-1 sweep path),
  batch — one fit_fast_batch over the same B (model, split) pairs.

argv: [B] (default 50); ``cpu`` anywhere forces CPU.
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
from scfgp_tpu import SCFGP, fit_fast_batch
from scfgp_tpu.data.datasets import load_boston

B = int(sys.argv[1]) if len(sys.argv) > 1 else 50
OPT = dict(obj="SCORE", max_iter=500, cvrg_tol=1e-5, max_cvrg=18,
           algo={"algo": "adam",
                 "algo_params": {"learning_rate": 0.01, "beta1": 0.9,
                                 "beta2": 0.999, "epsilon": 1e-8}})

splits = [load_boston(seed=s)[:4] for s in range(B)]
print("backend:", jax.default_backend(), "B:", B, flush=True)

# -- sequential: warm the runner on trial 0, then time trials 1..B --------
warm = SCFGP(sparsity=20, nfeats=20, seed=0)
warm.fit_fast(*splits[0], **OPT)
t0 = time.perf_counter()
seq_models = [SCFGP(sparsity=20, nfeats=20, seed=s) for s in range(1, B)]
for m, sp in zip(seq_models, splits[1:]):
    m.fit_fast(*sp, **OPT)
seq_s = time.perf_counter() - t0
print(json.dumps({"mode": "sequential_warm", "trials": B - 1,
                  "total_s": round(seq_s, 2),
                  "fits_per_s": round((B - 1) / seq_s, 2)}), flush=True)

# -- batched: cold (includes the vmapped compile), then warm --------------
for label, seed0 in (("batch_cold", 1000), ("batch_warm", 2000)):
    models = [SCFGP(sparsity=20, nfeats=20, seed=seed0 + s)
              for s in range(B)]
    t0 = time.perf_counter()
    fit_fast_batch(models, splits, **OPT)
    dt = time.perf_counter() - t0
    nmse = float(np.mean([m.evals["NMSE"][1][m.min_obj_ind]
                          for m in models]))
    print(json.dumps({"mode": label, "trials": B, "total_s": round(dt, 2),
                      "fits_per_s": round(B / dt, 2),
                      "mean_NMSE": round(nmse, 4)}), flush=True)

seq_nmse = float(np.mean([m.evals["NMSE"][1][m.min_obj_ind]
                          for m in seq_models]))
print(json.dumps({"mode": "sequential_mean_NMSE",
                  "mean_NMSE": round(seq_nmse, 4)}), flush=True)
