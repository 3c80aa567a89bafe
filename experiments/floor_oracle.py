"""Floor certification: closed-form oracle vs exact GP vs SCFGP, same splits.

Round-1 VERDICT item 1 asked for an oracle baseline run on the same splits
as the experiments so the surrogate floors are *measured*, not asserted.
Three predictors per boston split:

  floor    — ``datasets.surrogate_floor``: the closed-form conditional mean
             of the known generative process (no predictor beats it),
  exact_gp — ARD-RBF GP, ML-II hyperparameters (``scfgp_tpu.baselines``):
             certifies the floor is *reachable*,
  scfgp    — the framework at the boston experiment config,
  scfgp_ensemble — fit_ensemble(k=16, mix_best=8) with a linear extra
             basis: the measured floor-closing recipe (round 2) — k
             restarts train as ONE vmapped program, the best 8 by
             validation SCORE predict as a GP mixture.

(abalone needs no oracle run: the full 30x10 sweep already sits at
floor x1.02 — experiments/results/abalone/results.json.)

Writes experiments/results/floors/floors.json; cited by docs/RESULTS.md.
Usage: python experiments/floor_oracle.py [--cpu] [--seeds K]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from scfgp_tpu import SCFGP
    from scfgp_tpu.baselines import ExactGP
    from scfgp_tpu.data.datasets import load_boston, surrogate_floor

    algo = {"algo": "adam",
            "algo_params": {"learning_rate": 0.01, "beta1": 0.9,
                            "beta2": 0.999, "epsilon": 1e-8}}
    rows = []
    for seed in range(args.seeds):
        Xt, yt, Xv, yv, meta = load_boston(seed=seed)
        floor = surrogate_floor("boston_housing", Xv, yv)

        gp = ExactGP(steps=300).fit(Xt, yt)
        mu_gp, _ = gp.predict(Xv)
        nmse_gp = float(np.mean((mu_gp - yv) ** 2) / np.var(yv))

        m = SCFGP(sparsity=20, nfeats=20, seed=seed)
        m.fit_fast(Xt, yt, Xv, yv, obj="SCORE", algo=algo, max_iter=500,
                   cvrg_tol=1e-5, max_cvrg=18)
        nmse_sc = float(m.evals["NMSE"][1][m.min_obj_ind])

        def linear_basis(Xb):
            import jax.numpy as jnp
            return jnp.asarray(Xb)
        me = SCFGP(sparsity=20, nfeats=20, seed=seed,
                   extra_basis=linear_basis)
        me.fit_ensemble(Xt, yt, Xv, yv, k=16, mix_best=8, obj="SCORE",
                        algo=algo, max_iter=1500, cvrg_tol=1e-5,
                        max_cvrg=40)
        nmse_ens = float(me.evals["NMSE"][1][me.min_obj_ind])

        rows.append({
            "seed": seed, "source": meta["source"],
            "floor_nmse": round(floor["NMSE"], 4),
            "exact_gp_nmse": round(nmse_gp, 4),
            "exact_gp_over_floor": round(nmse_gp / floor["NMSE"], 3),
            "scfgp_nmse": round(nmse_sc, 4),
            "scfgp_over_floor": round(nmse_sc / floor["NMSE"], 3),
            "scfgp_ensemble_nmse": round(nmse_ens, 4),
            "scfgp_ensemble_over_floor": round(nmse_ens / floor["NMSE"], 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    summary = {
        "dataset": "boston_housing",
        "rows": rows,
        "mean_exact_gp_over_floor": round(float(np.mean(
            [r["exact_gp_over_floor"] for r in rows])), 3),
        "mean_scfgp_over_floor": round(float(np.mean(
            [r["scfgp_over_floor"] for r in rows])), 3),
        "mean_scfgp_ensemble_over_floor": round(float(np.mean(
            [r["scfgp_ensemble_over_floor"] for r in rows])), 3),
    }
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results", "floors")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "floors.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("mean_exact_gp_over_floor", "mean_scfgp_over_floor",
                       "mean_scfgp_ensemble_over_floor")}))


if __name__ == "__main__":
    main()
