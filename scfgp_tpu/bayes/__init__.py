from .hmc import (hmc_sample, hmc_sample_host_looped, make_hmc_transition,
                  HMCResult)
from .nuts import (nuts_sample, nuts_sample_host_looped, nuts_sample_static,
                   NUTSResult)
from .vi import (fit_vi, vi_sample, vi_posterior_sample, VIResult,
                 VISamplerResult)
from .predictive import make_logposterior, predictive_mixture
from .tempering import (tempered_hmc_sample, tempered_hmc_sample_segmented,
                        geometric_ladder, energy_matched_ladder,
                        TemperedHMCResult)
from .diagnostics import (split_rhat, ess_bulk, ess_tail, ess_mean,
                          diagnose, Diagnostics)
from .sgld import (sgld_sample, make_minibatch_value_and_grad, SGLDResult)
from .segmented import (hmc_sample_segmented, nuts_sample_segmented,
                        nuts_sample_static_segmented,
                        sgld_sample_segmented)
