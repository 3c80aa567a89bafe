from .phi import fourier_features_pallas
from .gram import sufficient_stats_pallas
from .cholesky import cholesky_pallas
from .streaming import loss_fn_streaming
from .quadrature import expected_nll_rows_gh, hermgauss
