"""Data scaling with automatic Box-Cox skew removal and Gaussian-CDF maps.

Re-implements the reference's 5 scaling algorithms (``reference:
SCFGP/Scaler.py:15-21``) with the same semantics:

  * ``min-max``        — affine map to [0, 1]                 (Scaler.py:43-45)
  * ``normal``         — z-score                              (Scaler.py:46-48)
  * ``inv-normal``     — Gaussian CDF of the z-score          (Scaler.py:49-51)
  * ``auto-normal``    — min-max -> per-column Box-Cox with lambda chosen by
                         SLSQP skewness minimisation -> z-score
                                                              (Scaler.py:52-74)
  * ``auto-inv-normal``— same, but ending in a Gaussian CDF   (Scaler.py:75-97)

Constant columns are dropped at fit time (Scaler.py:40-41).  Fitting is
host-side NumPy/SciPy (it runs once, and SLSQP is inherently sequential);
``forward_transform``/``backward_transform`` are pure jnp functions of the
fitted state, so they can be jitted and run on-device inside training and
evaluation loops — the reference's transforms were host-only NumPy.

Reference bug handled (SURVEY.md §5 quirk 3): the reference's ``inv-normal``
backward transform is not the inverse of its forward
(``Scaler.py:106`` vs ``:125``).  We implement the true inverse by default and
reproduce the reference behavior only when ``compat_reference=True``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize
from scipy.stats import skew

ALGOS = ("min-max", "normal", "inv-normal", "auto-normal", "auto-inv-normal")

_SQRT2 = np.sqrt(2.0)


def _ndtr(x):
    """Standard normal CDF (jittable)."""
    return 0.5 * (1.0 + jax.lax.erf(x / _SQRT2))


def _ndtri(q):
    """Standard normal quantile (jittable)."""
    return _SQRT2 * jax.lax.erf_inv(2.0 * q - 1.0)


def _boxcox(x, lm):
    """Signed Box-Cox transform, reference form (Scaler.py:56)."""
    return (jnp.sign(x) * jnp.abs(x) ** lm - 1.0) / lm


def _inv_boxcox(x, lm):
    """Inverse of the signed Box-Cox transform (Scaler.py:128)."""
    z = x * lm + 1.0
    return jnp.sign(z) * jnp.abs(z) ** (1.0 / lm)


def _fit_boxcox_lambdas(tX: np.ndarray) -> np.ndarray:
    """Per-column skewness-minimising Box-Cox lambda via SLSQP.

    Mirrors Scaler.py:56-70: lambda = softplus(raw) with raw in [-5, 5],
    columns with <10 distinct values keep lambda=1 (identity-ish).
    """
    lams = np.zeros(tX.shape[1])
    for d in range(tX.shape[1]):
        Xd = tX[:, d]
        if np.unique(Xd).shape[0] < 10:
            lams[d] = 1.0
            continue
        t_lm = lambda lm: np.log(np.exp(lm[0]) + 1.0)
        bc = lambda lm: (np.sign(Xd) * np.abs(Xd) ** t_lm(lm) - 1.0) / t_lm(lm)
        obj = lambda lm: skew(bc(lm), bias=False) ** 2
        res = minimize(obj, [0.0], method="SLSQP", bounds=[(-5, 5)],
                       options={"ftol": 1e-8, "maxiter": 100, "disp": False})
        lams[d] = t_lm(res["x"])
    return lams


@dataclass
class Scaler:
    """Fit on host once; transform anywhere (host or jitted on device).

    ``native=True`` routes the Box-Cox lambda fit through the C++/OpenMP
    kernel (``native/boxcox.cpp``) — same objective, grid+golden-section
    optimized, parallel over columns; the SciPy SLSQP path (exact reference
    behavior) is the default and the automatic fallback.
    """

    algo: str
    compat_reference: bool = False
    native: bool = False
    cols: Optional[np.ndarray] = None          # surviving column indices
    state: dict = field(default_factory=dict)  # jnp arrays keyed by name

    def __post_init__(self):
        algo = self.algo.lower()
        assert algo in ALGOS, f"Invalid scaling algorithm {self.algo!r}"
        self.algo = algo

    # -- fitting (host) ------------------------------------------------------

    def fit(self, X) -> "Scaler":
        X = np.asarray(X, np.float64)
        if X.ndim == 1:
            X = X[:, None]
        const = np.all(X == X[0, :], axis=0)
        self.cols = np.where(~const)[0]
        tX = X[:, self.cols]
        s = {}
        if self.algo == "min-max":
            s["min"] = tX.min(axis=0)
            s["max"] = tX.max(axis=0)
        elif self.algo in ("normal", "inv-normal"):
            s["mu"] = tX.mean(axis=0)
            s["std"] = tX.std(axis=0)
        else:  # auto-normal / auto-inv-normal
            s["min"] = tX.min(axis=0)
            s["max"] = tX.max(axis=0)
            u = (tX - s["min"]) / (s["max"] - s["min"])
            lams = None
            if self.native:
                from .native import fit_boxcox_lambdas_native
                lams = fit_boxcox_lambdas_native(u)
            s["boxcox"] = lams if lams is not None else _fit_boxcox_lambdas(u)
            bu = np.asarray(_boxcox(u, s["boxcox"][None, :]))
            s["mu"] = bu.mean(axis=0)
            s["std"] = bu.std(axis=0)
        self.state = {k: jnp.asarray(v) for k, v in s.items()}
        return self

    # -- transforms (jittable) ----------------------------------------------

    def forward_transform(self, X):
        X = jnp.asarray(X)
        if X.ndim == 1:
            X = X[:, None]
        tX = X[:, np.asarray(self.cols)]
        s = self.state
        if self.algo == "min-max":
            return (tX - s["min"]) / (s["max"] - s["min"])
        if self.algo == "normal":
            return (tX - s["mu"]) / s["std"]
        if self.algo == "inv-normal":
            return _ndtr((tX - s["mu"]) / s["std"])
        u = (tX - s["min"]) / (s["max"] - s["min"])
        bu = _boxcox(u, s["boxcox"][None, :])
        if self.algo == "auto-normal":
            return (bu - s["mu"]) / s["std"]
        # auto-inv-normal: norm.cdf(bu, mu, std)  (Scaler.py:116)
        return _ndtr((bu - s["mu"]) / s["std"])

    def backward_transform(self, X):
        X = jnp.asarray(X)
        if X.ndim == 1:
            X = X[:, None]
        assert len(self.cols) == X.shape[1], "Backward Transform Error"
        return backward_transform_stateless(
            self.algo, self.state, X, self.compat_reference)

    # -- persistence ---------------------------------------------------------

    def to_state_dict(self) -> dict:
        return {
            "algo": self.algo,
            "compat_reference": self.compat_reference,
            "cols": np.asarray(self.cols),
            "state": {k: np.asarray(v) for k, v in self.state.items()},
        }

    @classmethod
    def from_state_dict(cls, d: dict) -> "Scaler":
        sc = cls(d["algo"], compat_reference=d.get("compat_reference", False))
        sc.cols = np.asarray(d["cols"])
        sc.state = {k: jnp.asarray(v) for k, v in d["state"].items()}
        return sc


def backward_transform_stateless(algo: str, state: dict, X,
                                 compat_reference: bool = False):
    """Pure jittable backward transform from (possibly traced) state arrays.

    Same math as ``Scaler.backward_transform`` (reference ``Scaler.py:
    118-135``), factored out so cached jitted runners can take the scaler
    state as TRACED arguments instead of baking it in as jaxpr constants —
    what lets one compiled fused-training program serve every model in a
    sweep (model.py::_fused_runner_val).
    """
    s = state
    if algo == "min-max":
        return X * (s["max"] - s["min"]) + s["min"]
    if algo == "normal":
        return X * s["std"] + s["mu"]
    if algo == "inv-normal":
        if compat_reference:
            # Reference bug (Scaler.py:125): NOT the inverse of forward.
            return (_ndtri(X) - s["mu"]) / s["std"]
        return s["mu"] + s["std"] * _ndtri(X)
    if algo == "auto-normal":
        bu = X * s["std"] + s["mu"]
    else:  # auto-inv-normal: norm.ppf(X, mu, std)  (Scaler.py:134)
        bu = s["mu"] + s["std"] * _ndtri(X)
    u = _inv_boxcox(bu, s["boxcox"][None, :])
    return u * (s["max"] - s["min"]) + s["min"]
