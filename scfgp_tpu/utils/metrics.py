"""Evaluation metrics with the reference's exact definitions.

These names/definitions are the parity currency with the reference
(``reference: SCFGP/SCFGP.py:285-293``); RMSE is added per the legacy
experiment scripts (``reference: experiments/abalone/abalone.py:42``).
"""

from __future__ import annotations

import numpy as np

# Display names, reference SCFGP.py:40-49 (+ RMSE from legacy experiments).
METRIC_NAMES = {
    "SCORE": "Model Selection Score",
    "COST": "Hyperparameter Selection Cost",
    "MAE": "Mean Absolute Error",
    "NMAE": "Normalized Mean Absolute Error",
    "MSE": "Mean Square Error",
    "NMSE": "Normalized Mean Square Error",
    "RMSE": "Root Mean Square Error",
    "MNLP": "Mean Negative Log Probability",
    "TIME(s)": "Training Time",
}


def regression_metrics(mu_y: np.ndarray, std_y: np.ndarray,
                       ys: np.ndarray) -> dict:
    """MAE/NMAE/MSE/NMSE/RMSE/MNLP/SCORE of predictions vs targets.

    MNLP uses the supplied predictive std directly — under nonlinear target
    scaling the caller passes the half-range std approximation
    (``SCFGP.py:281-284``), reproducing the reference's definition exactly.
    SCORE = NMSE / (1 + exp(-MNLP))  (``SCFGP.py:292-293``).
    """
    mu_y = np.asarray(mu_y).reshape(-1)
    std_y = np.asarray(std_y).reshape(-1)
    ys = np.asarray(ys).reshape(-1)
    err = mu_y - ys
    mae = float(np.mean(np.abs(err)))
    mse = float(np.mean(err**2))
    nmae = mae / float(np.std(ys))
    nmse = mse / float(np.var(ys))
    mnlp = float(0.5 * np.mean(((ys - mu_y) / std_y) ** 2
                               + np.log(2 * np.pi * std_y**2)))
    score = nmse / (1 + np.exp(-mnlp))
    return {
        "MAE": mae,
        "NMAE": nmae,
        "MSE": mse,
        "NMSE": nmse,
        "RMSE": float(np.sqrt(mse)),
        "MNLP": mnlp,
        "SCORE": score,
    }


def new_evals_dict() -> dict:
    """Fresh metric-history container, reference layout (SCFGP.py:40-49)."""
    return {name: [title, []] for name, title in METRIC_NAMES.items()}
