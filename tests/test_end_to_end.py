"""End-to-end training quality tests (SURVEY.md §4 item 3).

The real UCI datasets are unavailable offline, so quality is anchored two
ways: (a) data drawn exactly from the SCFGP generative family, where the
Bayes-optimal NMSE = noise_var/var(y) is known, and (b) the boston-surrogate
config at reference scale (N=506, D=13, S=20), which must land at small NMSE
and calibrated MNLP.
"""

import numpy as np
import pytest

from scfgp_tpu import SCFGP
from scfgp_tpu.data.datasets import (load_boston, load_co2, synthetic_gp_rff)


def test_recovers_gp_rff_data_to_noise_floor():
    X, y = synthetic_gp_rff(n=600, d=4, s=5, m=15, noise_std=0.1, seed=0)
    Xt, yt, Xv, yv = X[:480], y[:480], X[480:], y[480:]
    m = SCFGP(sparsity=8, nfeats=20, seed=0)
    m.fit(Xt, yt, Xv, yv, max_iter=200, cvrg_tol=1e-5)
    nmse = m.evals["NMSE"][1][m.min_obj_ind]
    noise_floor = 0.01 / np.var(yv)
    assert nmse < max(5 * noise_floor, 0.08), (nmse, noise_floor)


def test_boston_surrogate_reference_config():
    """Reference boston config: S=20, adam lr .01, <=200 iters
    (boston_housing.py:16-40)."""
    Xt, yt, Xv, yv, meta = load_boston(seed=0)
    m = SCFGP(sparsity=20, nfeats=30, seed=0)
    m.fit(Xt, yt, Xv, yv, max_iter=200,
          algo={"algo": "adam",
                "algo_params": {"learning_rate": 0.01, "beta1": 0.9,
                                "beta2": 0.999, "epsilon": 1e-8}},
          cvrg_tol=1e-5, max_cvrg=8)
    nmse = m.evals["NMSE"][1][m.min_obj_ind]
    mnlp = m.evals["MNLP"][1][m.min_obj_ind]
    # Surrogate has ~2.5 noise on ~±5.5-std targets: NMSE floor ~0.18.
    assert nmse < 0.5, nmse
    assert np.isfinite(mnlp) and mnlp < 4.0, mnlp


def test_co2_surrogate_1d():
    Xt, yt, Xv, yv, meta = load_co2(seed=0)
    m = SCFGP(sparsity=20, nfeats=20, seed=0)
    m.fit(Xt, yt, Xv, yv, max_iter=200, obj="cost",
          algo={"algo": "adamax",
                "algo_params": {"learning_rate": 0.05, "beta1": 0.8,
                                "beta2": 0.999, "epsilon": 1e-8}})
    nmse = m.evals["NMSE"][1][m.min_obj_ind]
    assert nmse < 0.05, nmse  # random split => interpolation; trend dominates


def test_dataset_loaders_shapes():
    from scfgp_tpu.data.datasets import load_abalone, load_kin8nm
    Xt, yt, Xv, yv, meta = load_boston(seed=1)
    assert Xt.shape[1] == 13 and Xt.shape[0] + Xv.shape[0] == 506
    Xt, yt, Xv, yv, meta = load_abalone(seed=1)
    assert Xt.shape[1] == 10 and Xt.shape[0] + Xv.shape[0] == 4177
    Xt, yt, Xv, yv, meta = load_kin8nm(seed=1)
    assert Xt.shape[1] == 8 and Xt.shape[0] + Xv.shape[0] == 8192
    Xt, yt, Xv, yv, meta = load_co2(seed=1)
    assert Xt.shape[1] == 1
    assert meta["source"] in ("real", "synthetic-surrogate")
