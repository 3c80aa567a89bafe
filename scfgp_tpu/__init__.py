"""scfgp_tpu — TPU-native sparsely-correlated Fourier-feature Gaussian processes.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference ``MaxInGaussian/SCFGP`` (Theano): low-rank trig Fourier feature GP
regression with a regularized marginal-likelihood objective, an optimizer zoo,
automatic data scaling, an early-stopping training harness, checkpointing,
benchmark experiments — plus TPU-first extensions the reference lacks:
data-parallel training over device meshes via psum-ed sufficient statistics,
Pallas kernels for the hot path, and chain-parallel HMC/NUTS.
"""

import jax as _jax

# f32 must MEAN f32: on TPU, jax's default matmul precision lowers f32
# dots to single-pass bf16 on the MXU, which silently broke the co2
# composite model (NMSE 2.34 vs the correct 0.00023 — measured round 4,
# docs/RESULTS.md precision section; 3-pass "high" still NaNs).  The
# reference runs float64 Theano (``reference: SCFGP/SCFGP.py:95,138``),
# so metric parity requires honest f32 as the floor.  Explicitly
# requested reduced precision stays available (``SCFGP(mm_dtype=...)`` /
# "auto" dispatch, ops/dispatch.py) — that is the speed lever; the
# DEFAULT is correct.  Respect a user's own setting if present.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from .models.params import (SCFGPParams, init_params, pack_params,
                            unpack_params, num_params)
from .models.objective import (SufficientStats, Posterior, fourier_features,
                               sufficient_stats, solve_posterior, loss_fn,
                               loss_and_grad, predict_f)
from .data.scaler import Scaler
from .models.model import SCFGP, fit_fast_batch
from .utils.visualizer import Visualizer
from .bayes import (hmc_sample, nuts_sample, fit_vi, vi_sample,
                    make_logposterior, predictive_mixture)

__version__ = "0.1.0"

__all__ = [
    "SCFGP", "fit_fast_batch", "Scaler", "Visualizer",
    "SCFGPParams", "init_params", "pack_params", "unpack_params", "num_params",
    "SufficientStats", "Posterior", "fourier_features", "sufficient_stats",
    "solve_posterior", "loss_fn", "loss_and_grad", "predict_f",
]
