"""MNLP floor certification: calibration anchored the way NMSE is.

Round-2 VERDICT item 6: NMSE had a closed-form oracle floor but MNLP did
not, so calibration claims hung on a cross-dataset comparison to the
reference's real-data band (apples to oranges — the surrogate noise scale
differs).  ``datasets.surrogate_floor`` now returns two anchors:

  MNLP       — the Bayes-optimal Gaussian predictive (mu = E[y|x],
               sigma = true conditional std): nothing scored by the
               Gaussian MNLP metric (utils/metrics.py, half-range rule
               ``reference: SCFGP/SCFGP.py:281-284``) beats it.
  MNLP_HOMO  — best single-sigma Gaussian at the oracle mean: the floor
               within the homoscedastic family the SCFGP dispersion c
               lives in (fair on heteroscedastic surrogates like kin8nm).

Per dataset this script reports the model's MNLP, its excess over the
floor (nats), and the SELF-CALIBRATION excess

    MNLP_model - 0.5 (1 + log(2 pi MSE_model))

i.e. how far the model's intervals are from the best possible intervals
*given its own point accuracy* — the quantity that separates a
miscalibrated model from one whose MNLP gap is purely an accuracy gap.

Measured (CPU, seed 0; committed to results/floors/mnlp_floors.json):
abalone sits 0.04 nats above its Bayes floor (self-cal 0.02); kin8nm's
0.85-nat floor gap is accuracy (heteroscedastic target noise), not
calibration — its self-cal excess is 0.07 nats.

Usage: python experiments/mnlp_floor.py [--cpu] [--seeds K]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONFIGS = {
    # dataset -> (loader name, sparsity, nfeats, max_iter)
    "boston_housing": ("load_boston", 20, 20, 300),
    "abalone": ("load_abalone", 20, 64, 300),
    "kin8nm": ("load_kin8nm", 20, 100, 300),
    "co2": ("load_co2", 100, 50, 500),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--datasets", nargs="*", default=list(CONFIGS))
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from scfgp_tpu import SCFGP
    from scfgp_tpu.data import datasets as D
    from scfgp_tpu.data.datasets import surrogate_floor

    out = {}
    for name in args.datasets:
        loader_name, S, M, max_iter = CONFIGS[name]
        loader = getattr(D, loader_name)
        rows = []
        for seed in range(args.seeds):
            Xt, yt, Xv, yv, meta = loader(seed=seed)
            fl = surrogate_floor(name, Xv, yv)
            if name == "co2":
                # The composite trend+periodic config that reaches the co2
                # NMSE floor (experiments/co2.py — same basis/scalers/opt).
                import jax.numpy as jnp
                omega = 2 * np.pi * (Xt.shape[0] + Xv.shape[0] - 1) / 12.0

                def seasonal_trend(Xs):
                    t = Xs[:, :1]
                    return jnp.concatenate(
                        [jnp.ones_like(t), t, t * t,
                         jnp.sin(omega * t), jnp.cos(omega * t),
                         jnp.sin(2 * omega * t), jnp.cos(2 * omega * t)],
                        axis=1)

                m = SCFGP(sparsity=10, nfeats=20, seed=seed,
                          X_scaling_method="min-max",
                          y_scaling_method="normal",
                          extra_basis=seasonal_trend)
                # recalibrate=True: the reference's dispersion form
                # softplus(c)(1+var_f) inflates predictive std 8.4x at co2's
                # extreme SNR (see SCFGP.recalibrate_dispersion) — the
                # closed-form recalibration lands MNLP at the Bayes floor
                # (0.062 vs floor 0.060 measured).
                m.fit_fast(Xt, yt, Xv, yv, obj="cost", max_iter=max_iter,
                           algo={"algo": "adamax",
                                 "algo_params": {"learning_rate": 0.05,
                                                 "beta1": 0.8, "beta2": 0.999,
                                                 "epsilon": 1e-8}},
                           max_cvrg=60, recalibrate=True)
            else:
                m = SCFGP(sparsity=S, nfeats=M, seed=seed)
                m.fit_fast(Xt, yt, Xv, yv, obj="SCORE", max_iter=max_iter)
            mnlp = float(m.evals["MNLP"][1][m.min_obj_ind])
            mse = float(m.evals["MSE"][1][m.min_obj_ind])
            self_cal = mnlp - 0.5 * (1 + np.log(2 * np.pi * mse))
            rows.append({
                "seed": seed, "source": meta["source"],
                "floor_mnlp": round(fl["MNLP"], 4),
                "floor_mnlp_homo": round(fl["MNLP_HOMO"], 4),
                "model_mnlp": round(mnlp, 4),
                "excess_nats": round(mnlp - fl["MNLP"], 4),
                "self_calibration_excess_nats": round(self_cal, 4),
                "model_mse": round(mse, 6),
                "floor_nmse": round(fl["NMSE"], 4),
            })
            print(json.dumps({name: rows[-1]}), flush=True)
        out[name] = {
            "rows": rows,
            "mean_excess_nats": round(float(np.mean(
                [r["excess_nats"] for r in rows])), 4),
            "mean_self_calibration_excess_nats": round(float(np.mean(
                [r["self_calibration_excess_nats"] for r in rows])), 4),
        }

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results", "floors")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "mnlp_floors.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: {kk: v[kk] for kk in
                          ("mean_excess_nats",
                           "mean_self_calibration_excess_nats")}
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
