from .params import (SCFGPParams, DerivedFrequencies, init_params,
                     pack_params, unpack_params, num_params,
                     derive_frequencies)
from .objective import (SufficientStats, Posterior, LossAux, fourier_features,
                        sufficient_stats, psum_stats, solve_posterior,
                        latent_moments, expected_nll_rows, kl_penalty,
                        loss_fn, loss_and_grad, predict_f)
