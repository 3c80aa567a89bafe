"""First-order optimizer zoo as pure-functional PyTree transforms.

Re-implements the reference's optimizer registry (``reference:
SCFGP/Optimizer.py``) — sgd, adagrad, rmsprop, adadelta, adam, adamax plus
momentum / Nesterov-momentum wrappers — with bit-for-bit identical update
formulas, but in the functional style JAX transforms expect:

    tx = adam(learning_rate=0.01, beta1=0.9, beta2=0.999, epsilon=1e-8)
    state = tx.init(params)
    delta, state = tx.update(grads, state, params)
    params = tree_add(params, delta)

``update`` returns the *delta* added to params, so wrappers compose exactly as
Theano update-dict rewriting did (``Optimizer.py:27-97``): the reference
always wraps the base algorithm in Nesterov momentum 0.9 (``SCFGP.py:130-131``).

Formula provenance (exact, including epsilon placement, which differs from
optax's adam): sgd ``Optimizer.py:100-119``, adagrad ``:121-164``, rmsprop
``:166-213`` (reference has a NameError bug — ``grad`` for ``grads``, SURVEY.md
§5 quirk 1 — fixed here), adadelta ``:215-276``, adam ``:278-331``, adamax
``:333-382``, momentum ``:27-60``, nesterov ``:62-97``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Transform(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple]  # (grads, state, params) -> (delta, state)


def _zeros_like(params):
    return jax.tree.map(jnp.zeros_like, params)


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def sgd(learning_rate=0.01, **_):
    """params := params - lr * g  (Optimizer.py:100-119)."""
    def init(params):
        return ()

    def update(grads, state, params):
        delta = jax.tree.map(lambda g: -learning_rate * g, grads)
        return delta, state

    return Transform(init, update)


def adagrad(learning_rate=0.01, epsilon=1e-6, **_):
    """accu += g^2; delta = -lr * g / sqrt(accu + eps)  (Optimizer.py:121-164)."""
    def init(params):
        return _zeros_like(params)

    def update(grads, accu, params):
        accu = jax.tree.map(lambda s, g: s + g * g, accu, grads)
        delta = jax.tree.map(
            lambda g, s: -learning_rate * g / jnp.sqrt(s + epsilon),
            grads, accu)
        return delta, accu

    return Transform(init, update)


def rmsprop(learning_rate=0.01, rho=0.9, epsilon=1e-6, **_):
    """accu = rho*accu + (1-rho)*g^2  (Optimizer.py:166-213, NameError fixed)."""
    def init(params):
        return _zeros_like(params)

    def update(grads, accu, params):
        accu = jax.tree.map(lambda s, g: rho * s + (1 - rho) * g * g,
                            accu, grads)
        delta = jax.tree.map(
            lambda g, s: -learning_rate * g / jnp.sqrt(s + epsilon),
            grads, accu)
        return delta, accu

    return Transform(init, update)


class AdadeltaState(NamedTuple):
    accu: Any
    delta_accu: Any


def adadelta(learning_rate=0.01, rho=0.95, epsilon=1e-6, **_):
    """Zeiler's adadelta, reference scaling included (Optimizer.py:215-276)."""
    def init(params):
        return AdadeltaState(_zeros_like(params), _zeros_like(params))

    def update(grads, state, params):
        accu = jax.tree.map(lambda s, g: rho * s + (1 - rho) * g * g,
                            state.accu, grads)
        upd = jax.tree.map(
            lambda g, s, ds: g * jnp.sqrt(ds + epsilon) / jnp.sqrt(s + epsilon),
            grads, accu, state.delta_accu)
        delta = jax.tree.map(lambda u: -learning_rate * u, upd)
        delta_accu = jax.tree.map(
            lambda ds, u: rho * ds + (1 - rho) * u * u, state.delta_accu, upd)
        return delta, AdadeltaState(accu, delta_accu)

    return Transform(init, update)


class AdamState(NamedTuple):
    t: jax.Array
    m: Any
    v: Any


def adam(learning_rate=0.01, beta1=0.9, beta2=0.99, epsilon=1e-8, **_):
    """Adam with the reference's epsilon placement: a_t*m/(sqrt(v)+eps)
    where a_t = lr*sqrt(1-b2^t)/(1-b1^t)  (Optimizer.py:278-331)."""
    def init(params):
        return AdamState(jnp.zeros((), jnp.float32),
                         _zeros_like(params), _zeros_like(params))

    def update(grads, state, params):
        t = state.t + 1.0
        a_t = learning_rate * jnp.sqrt(1.0 - beta2**t) / (1.0 - beta1**t)
        m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g,
                         state.m, grads)
        v = jax.tree.map(lambda v_, g: beta2 * v_ + (1 - beta2) * g * g,
                         state.v, grads)
        delta = jax.tree.map(
            lambda m_, v_: -(a_t * m_ / (jnp.sqrt(v_) + epsilon)).astype(m_.dtype),
            m, v)
        return delta, AdamState(t, m, v)

    return Transform(init, update)


class AdamaxState(NamedTuple):
    t: jax.Array
    m: Any
    u: Any


def adamax(learning_rate=0.01, beta1=0.9, beta2=0.999, epsilon=1e-8, **_):
    """Infinity-norm Adam variant (Optimizer.py:333-382)."""
    def init(params):
        return AdamaxState(jnp.zeros((), jnp.float32),
                           _zeros_like(params), _zeros_like(params))

    def update(grads, state, params):
        t = state.t + 1.0
        a_t = learning_rate / (1.0 - beta1**t)
        m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g,
                         state.m, grads)
        u = jax.tree.map(lambda u_, g: jnp.maximum(beta2 * u_, jnp.abs(g)),
                         state.u, grads)
        delta = jax.tree.map(
            lambda m_, u_: -(a_t * m_ / (u_ + epsilon)).astype(m_.dtype),
            m, u)
        return delta, AdamaxState(t, m, u)

    return Transform(init, update)


class MomentumState(NamedTuple):
    velocity: Any
    inner: Any


def apply_momentum(inner: Transform, momentum=0.9) -> Transform:
    """v := mom*v + delta; params += v  (Optimizer.py:27-60)."""
    def init(params):
        return MomentumState(_zeros_like(params), inner.init(params))

    def update(grads, state, params):
        delta, inner_state = inner.update(grads, state.inner, params)
        v = jax.tree.map(lambda v_, d: momentum * v_ + d,
                         state.velocity, delta)
        return v, MomentumState(v, inner_state)

    return Transform(init, update)


def apply_nesterov_momentum(inner: Transform, momentum=0.9) -> Transform:
    """v := mom*v + delta; params += mom*v + delta  (Optimizer.py:62-97)."""
    def init(params):
        return MomentumState(_zeros_like(params), inner.init(params))

    def update(grads, state, params):
        delta, inner_state = inner.update(grads, state.inner, params)
        v = jax.tree.map(lambda v_, d: momentum * v_ + d,
                         state.velocity, delta)
        out = jax.tree.map(lambda v_, d: momentum * v_ + d, v, delta)
        return out, MomentumState(v, inner_state)

    return Transform(init, update)


# Registry (reference Optimizer.py:14-25 lists norm_constraint entries that
# were never implemented there — SURVEY.md §5 quirk 2; omitted here).
algos = {
    "sgd": sgd,
    "adagrad": adagrad,
    "rmsprop": rmsprop,
    "adadelta": adadelta,
    "adam": adam,
    "adamax": adamax,
}


def make_optimizer(algo: str = "adam", algo_params: dict | None = None,
                   nesterov_momentum: float = 0.9) -> Transform:
    """Build the reference's full composition: <algo> + Nesterov 0.9
    (``SCFGP.py:130-131``).  Set ``nesterov_momentum=None`` to disable."""
    if algo not in algos:
        raise ValueError(f"Unknown optimizer {algo!r}; options: {list(algos)}")
    tx = algos[algo](**(algo_params or {}))
    if nesterov_momentum is not None:
        tx = apply_nesterov_momentum(tx, momentum=nesterov_momentum)
    return tx
