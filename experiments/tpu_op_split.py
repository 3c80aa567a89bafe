"""Where does the training step spend its time? (TODO round-1 item 6)

The tensorboard profiler plugin is not installable offline, so instead of a
trace this times each pipeline stage as its own scan-chained jitted program
(same shapes/dtypes as the full step) and prints one JSON line per stage:

  phi        feature map Phi = scale * [cos|sin](X @ Fcat + p)      (VPU+MXU)
  gram       sufficient stats Phi^T Phi, Phi^T y                    (MXU)
  chol       posterior solve: cholesky + triangular inverse (2K)    (serial)
  latent     mu_f, var_f GEMMs against Li                           (MXU)
  forward    full loss_fn
  step       full loss + grad + adam update (the bench.py unit)

Stage times cannot be read as an exact partition of the step (XLA fuses
across stage boundaries in the full program), but they bound which stage is
the roofline.  argv: [N D S M STEPS], defaults to the bench config; an
extra ``prec=default`` / ``prec=highest`` token selects the per-dot
mm_precision the stages run under (round 5: ``prec=default`` IS the
shipped non-composite dispatch, ``prec=highest`` the r04 honest-f32
global default — ops/dispatch.py).

Run alone — one TPU client at a time (CLAUDE.md).
"""

import json
import sys
import time

import jax

if "cpu" in sys.argv:  # validation mode (JAX_PLATFORMS env is ignored here)
    sys.argv.remove("cpu")
    jax.config.update("jax_platforms", "cpu")

MP = None  # per-dot mm_precision for the dispatched GEMMs (None = global)
for _a in list(sys.argv):
    if _a.startswith("prec="):
        MP = _a.split("=", 1)[1]
        sys.argv.remove(_a)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from scfgp_tpu.models.params import init_params, derive_frequencies
from scfgp_tpu.models import objective as obj
from scfgp_tpu.opt.optimizers import make_optimizer, tree_add

N, D, S, M, STEPS = (int(a) for a in sys.argv[1:6]) if len(sys.argv) > 5 \
    else (8192, 8, 50, 200, 50)

rng = np.random.RandomState(0)
X = jnp.asarray(rng.rand(N, D), jnp.float32)
y = jnp.asarray(np.sin(rng.rand(N) * 6) + 0.1 * rng.randn(N), jnp.float32)
params = init_params(jax.random.PRNGKey(0), D, S, M, jnp.float32)
tx = make_optimizer("adam", {"learning_rate": 0.01})
opt_state = tx.init(params)

Phi_const = obj.fourier_features(params, X)
stats_const = obj.sufficient_stats(Phi_const, y)
post_const = obj.solve_posterior(stats_const, jnp.exp(2.0 * params.a))


def timed(name, fn):
    """Scan-chain STEPS executions of fn(eps) inside one jit; report ms/call.

    ``fn`` takes a scalar the caller folds into an input so XLA cannot hoist
    the body out of the scan as loop-invariant.
    """

    def one(carry, _):
        out = fn(carry)
        probe = jax.tree.leaves(out)[0]
        return jnp.asarray(probe, jnp.float32).ravel()[0] * 1e-30, None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=STEPS)
        return c

    # Roofline bound from XLA's OWN counts: the stage cannot run faster
    # than max(flops/peak, bytes/HBM-bw).  On v5e: 197 TFLOP/s MXU,
    # ~819 GB/s HBM.  Counted on an UNSCANNED single application — loop-body
    # flop accounting differs across backends (TPU counts the while body
    # once; dividing a scanned program by trip count is wrong there).
    # Caveat: transcendentals (cos/sin) are not in XLA's flop count, so the
    # phi stage's real bound is VPU transcendental throughput, not HBM.
    flops = bytes_ = 0.0
    try:
        ca = jax.jit(fn).lower(jnp.float32(0.0)).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass
    sol_ms = 1e3 * max(flops / 197e12, bytes_ / 819e9)

    float(run())  # compile; readback = the honest clock (CLAUDE.md)
    t0 = time.perf_counter()
    reps = 5
    c = 0.0
    for _ in range(reps):
        c = run()
    float(c)
    dt = time.perf_counter() - t0
    ms = 1e3 * dt / (STEPS * reps)
    rec = {"stage": name, "ms": round(ms, 4),
           "gflops": round(flops / 1e9, 3), "mbytes": round(bytes_ / 1e6, 2),
           "speed_of_light_ms": round(sol_ms, 4),
           "sol_fraction": round(sol_ms / ms, 3) if ms else None,
           "bound": ("mxu" if flops / 197e12 > bytes_ / 819e9 else "hbm")}
    print(json.dumps(rec), flush=True)
    return ms


def step_fn(p, st):
    vg = jax.value_and_grad(lambda q: obj.loss_fn(q, X, y,
                                                  mm_precision=MP)[0])
    cost, g = vg(p)
    delta, st = tx.update(g, st, p)
    return tree_add(p, delta), st, cost


print("backend:", jax.default_backend(), "config:",
      {"N": N, "D": D, "S": S, "M": M, "mm_precision": MP}, flush=True)
timed("phi", lambda e: obj.fourier_features(params, X + e))
timed("gram", lambda e: obj.sufficient_stats(Phi_const + e, y,
                                             mm_precision=MP))
timed("chol", lambda e: obj.solve_posterior(
    obj.SufficientStats(stats_const.phiTphi + e, stats_const.phiTy,
                        stats_const.yTy, stats_const.n),
    jnp.exp(2.0 * params.a)))
timed("latent", lambda e: obj.latent_moments(Phi_const + e, post_const,
                                             mm_precision=MP))
timed("forward", lambda e: obj.loss_fn(params, X + e, y,
                                       mm_precision=MP)[0])
# probe the UPDATED PARAMS (not the cost) so the backward pass + optimizer
# update cannot be dead-code-eliminated: probing cost alone measured
# forward-only (step == forward in the first run of this script).
timed("step", lambda e: step_fn(
    jax.tree.map(lambda t: t + e, params), opt_state)[0].l_F)
