"""Measured-table implementation dispatch (ops/dispatch.py).

The bf16 rule is pinned to the committed same-session bench matrix
(experiments/results/bench_matrix.json): bf16 GEMMs only where they
measurably win (N*(2K)^2 >= 6.8e10), f32 everywhere else.
"""

import jax.numpy as jnp
import numpy as np

from scfgp_tpu import SCFGP
from scfgp_tpu.ops.dispatch import auto_mm_dtype, resolve_mm_dtype


def test_auto_rule_matches_measured_cells():
    # measured-winner cells (bench_matrix.json)
    assert auto_mm_dtype(65536, 2048) == jnp.bfloat16   # +12.2% measured
    assert auto_mm_dtype(65536, 1024) == jnp.bfloat16   # +5.6% measured
    # noise/f32-favored cells
    assert auto_mm_dtype(8192, 500) is None
    assert auto_mm_dtype(8192, 1024) is None
    assert auto_mm_dtype(8192, 2048) is None
    assert auto_mm_dtype(65536, 500) is None


def test_resolve_passthrough_and_validation():
    assert resolve_mm_dtype(None, 10**9, 4096) is None
    assert resolve_mm_dtype(jnp.bfloat16, 8, 8) == jnp.bfloat16
    try:
        resolve_mm_dtype("bf16", 8, 8)
    except ValueError as e:
        assert "auto" in str(e)
    else:
        raise AssertionError("bad string should raise")


def test_model_auto_resolves_at_set_data():
    rng = np.random.RandomState(0)
    # small config -> f32 (None)
    m = SCFGP(sparsity=4, nfeats=10, seed=0, mm_dtype="auto")
    m.set_data(rng.rand(256, 3), rng.randn(256))
    assert m.mm_dtype is None
    # large-GEMM config -> bf16 (N=65536, 2(S+M)=1024)
    m2 = SCFGP(sparsity=112, nfeats=400, seed=0, mm_dtype="auto")
    m2.set_data(rng.rand(65536, 3).astype(np.float32),
                rng.randn(65536).astype(np.float32))
    assert m2.mm_dtype == jnp.bfloat16
