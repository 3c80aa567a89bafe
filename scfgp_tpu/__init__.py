"""scfgp_tpu — TPU-native sparsely-correlated Fourier-feature Gaussian processes.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference ``MaxInGaussian/SCFGP`` (Theano): low-rank trig Fourier feature GP
regression with a regularized marginal-likelihood objective, an optimizer zoo,
automatic data scaling, an early-stopping training harness, checkpointing,
benchmark experiments — plus TPU-first extensions the reference lacks:
data-parallel training over device meshes via psum-ed sufficient statistics,
Pallas kernels for the hot path, and chain-parallel HMC/NUTS.
"""

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
