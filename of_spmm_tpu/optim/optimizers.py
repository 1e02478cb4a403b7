"""Optimizers — SGD / Adam(W) / LAMB / FTRL, mirroring the reference set.

The reference implements these as Python optimizer classes over C++ update
kernels (python/oneflow/nn/optimizer/: sgd.py, adam.py, adamw.py, lamb.py,
ftrl.py; kernels in oneflow/user/kernels/model_update_kernels.cpp). Here
each optimizer is a pair of pure functions over parameter pytrees:

    opt = adam(lr=1e-3)
    state = opt.init(params)
    params, state = opt.update(grads, state, params)

``lr`` may be a float or a schedule ``step -> lr`` (see lr_scheduler.py);
the step counter lives in the optimizer state, so the whole update is one
jit-compiled pytree map — no per-parameter Python loops at run time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

Schedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


def _lr_at(lr: Schedule, step: jnp.ndarray) -> jnp.ndarray:
    return lr(step) if callable(lr) else jnp.asarray(lr, jnp.float32)


@dataclasses.dataclass(frozen=True)
class Optimizer:
    """A (init, update) pair; update returns (new_params, new_state)."""

    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], Tuple[Any, Any]]


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def sgd(
    lr: Schedule = 1e-2,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> Optimizer:
    """SGD with (optional) momentum / nesterov / L2 weight decay.

    Matches the reference SGD update (momentum buffer
    m <- beta m + g; p <- p - lr * (nesterov ? g + beta m : m)).
    """

    def init(params):
        state = {"step": jnp.zeros((), jnp.int32)}
        if momentum:
            state["m"] = _tmap(jnp.zeros_like, params)
        return state

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)
        if weight_decay:
            grads = _tmap(lambda g, p: g + weight_decay * p, grads, params)
        if momentum:
            m = _tmap(lambda m_, g: momentum * m_ + g, state["m"], grads)
            d = _tmap(lambda g, m_: g + momentum * m_, grads, m) if nesterov else m
            new_state = {"step": step, "m": m}
        else:
            d = grads
            new_state = {"step": step}
        params = _tmap(lambda p, d_: p - lr_t * d_, params, d)
        return params, new_state

    return Optimizer(init=init, update=update)


def _adam_moments(grads, state, b1, b2):
    m = _tmap(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
    v = _tmap(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
    return m, v


def adam(
    lr: Schedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> Optimizer:
    """Adam with bias correction; ``weight_decay`` is L2 (added to grads),
    matching the reference's adam (use ``adamw`` for decoupled decay)."""

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": _tmap(jnp.zeros_like, params),
            "v": _tmap(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)
        if weight_decay:
            grads = _tmap(lambda g, p: g + weight_decay * p, grads, params)
        m, v = _adam_moments(grads, state, b1, b2)
        t = step.astype(jnp.float32)
        c1 = 1 - b1 ** t
        c2 = 1 - b2 ** t
        params = _tmap(
            lambda p, m_, v_: p - lr_t * (m_ / c1) / (jnp.sqrt(v_ / c2) + eps),
            params, m, v,
        )
        return params, {"step": step, "m": m, "v": v}

    return Optimizer(init=init, update=update)


def adamw(
    lr: Schedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> Optimizer:
    """AdamW — decoupled weight decay (p <- p - lr * wd * p)."""

    base = adam(lr=lr, b1=b1, b2=b2, eps=eps, weight_decay=0.0)

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)
        new_params, new_state = base.update(grads, state, params)
        if weight_decay:
            new_params = _tmap(
                lambda np_, p: np_ - lr_t * weight_decay * p, new_params, params
            )
        return new_params, new_state

    return Optimizer(init=base.init, update=update)


def lamb(
    lr: Schedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
) -> Optimizer:
    """LAMB: Adam update rescaled per-tensor by ||p|| / ||update||
    (layer-adaptive large-batch training, as the reference's lamb.py)."""

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": _tmap(jnp.zeros_like, params),
            "v": _tmap(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)
        m, v = _adam_moments(grads, state, b1, b2)
        t = step.astype(jnp.float32)
        c1 = 1 - b1 ** t
        c2 = 1 - b2 ** t

        def one(p, m_, v_):
            u = (m_ / c1) / (jnp.sqrt(v_ / c2) + eps)
            if weight_decay:
                u = u + weight_decay * p
            pn = jnp.linalg.norm(p)
            un = jnp.linalg.norm(u)
            trust = jnp.where((pn > 0) & (un > 0), pn / un, 1.0)
            return p - lr_t * trust * u

        params = _tmap(one, params, m, v)
        return params, {"step": step, "m": m, "v": v}

    return Optimizer(init=init, update=update)


def ftrl(
    lr: Schedule = 1e-1,
    lr_power: float = -0.5,
    lambda1: float = 0.0,
    lambda2: float = 0.0,
    beta: float = 0.0,
) -> Optimizer:
    """FTRL-Proximal (per the reference's ftrl.py / ftrl update kernel)."""

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "accum": _tmap(lambda p: jnp.full_like(p, 0.1), params),
            "z": _tmap(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)

        def one(p, g, n, z):
            n_new = n + g * g
            sigma = (n_new ** -lr_power - n ** -lr_power) / lr_t
            z_new = z + g - sigma * p
            denom = (beta + jnp.sqrt(n_new)) / lr_t + lambda2
            p_new = jnp.where(
                jnp.abs(z_new) <= lambda1,
                0.0,
                -(z_new - jnp.sign(z_new) * lambda1) / denom,
            )
            return p_new, n_new, z_new

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_n = treedef.flatten_up_to(state["accum"])
        flat_z = treedef.flatten_up_to(state["z"])
        out = [one(p, g, n, z) for p, g, n, z in zip(flat_p, flat_g, flat_n, flat_z)]
        params = treedef.unflatten([o[0] for o in out])
        accum = treedef.unflatten([o[1] for o in out])
        z = treedef.unflatten([o[2] for o in out])
        return params, {"step": step, "accum": accum, "z": z}

    return Optimizer(init=init, update=update)


def clip_grad_norm(grads, max_norm: float):
    """Global-norm gradient clipping (reference: clip_grad.py)."""
    leaves = jax.tree_util.tree_leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return _tmap(lambda g: g * scale, grads), total


def rmsprop(
    lr: Schedule = 1e-2,
    alpha: float = 0.99,
    eps: float = 1e-8,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    centered: bool = False,
) -> Optimizer:
    """RMSprop (torch conventions: square_avg ema, optional centered and
    momentum variants; reference: python/oneflow/optim/rmsprop.py)."""

    def init(params):
        state = {
            "step": jnp.zeros((), jnp.int32),
            "sq": _tmap(jnp.zeros_like, params),
        }
        if centered:
            state["g_avg"] = _tmap(jnp.zeros_like, params)
        if momentum:
            state["buf"] = _tmap(jnp.zeros_like, params)
        return state

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)
        if weight_decay:
            grads = _tmap(lambda g, p: g + weight_decay * p, grads, params)
        sq = _tmap(lambda s, g: alpha * s + (1 - alpha) * g * g,
                   state["sq"], grads)
        new_state = {"step": step, "sq": sq}
        if centered:
            g_avg = _tmap(lambda a, g: alpha * a + (1 - alpha) * g,
                          state["g_avg"], grads)
            denom = _tmap(lambda s, a: jnp.sqrt(s - a * a) + eps, sq, g_avg)
            new_state["g_avg"] = g_avg
        else:
            denom = _tmap(lambda s: jnp.sqrt(s) + eps, sq)
        d = _tmap(lambda g, dn: g / dn, grads, denom)
        if momentum:
            buf = _tmap(lambda b, d_: momentum * b + d_, state["buf"], d)
            new_state["buf"] = buf
            d = buf
        params = _tmap(lambda p, d_: p - lr_t * d_, params, d)
        return params, new_state

    return Optimizer(init=init, update=update)


def adagrad(
    lr: Schedule = 1e-2,
    eps: float = 1e-10,
    weight_decay: float = 0.0,
    initial_accumulator_value: float = 0.0,
) -> Optimizer:
    """Adagrad (reference: python/oneflow/optim/adagrad.py)."""

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "sum": _tmap(
                lambda p: jnp.full_like(p, initial_accumulator_value), params
            ),
        }

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)
        if weight_decay:
            grads = _tmap(lambda g, p: g + weight_decay * p, grads, params)
        acc = _tmap(lambda s, g: s + g * g, state["sum"], grads)
        params = _tmap(
            lambda p, g, s: p - lr_t * g / (jnp.sqrt(s) + eps),
            params, grads, acc,
        )
        return params, {"step": step, "sum": acc}

    return Optimizer(init=init, update=update)


def adadelta(
    lr: Schedule = 1.0,
    rho: float = 0.9,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
) -> Optimizer:
    """Adadelta (reference: python/oneflow/optim/adadelta.py)."""

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "sq": _tmap(jnp.zeros_like, params),
            "acc_delta": _tmap(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        step = state["step"] + 1
        lr_t = _lr_at(lr, step)
        if weight_decay:
            grads = _tmap(lambda g, p: g + weight_decay * p, grads, params)
        sq = _tmap(lambda s, g: rho * s + (1 - rho) * g * g,
                   state["sq"], grads)
        delta = _tmap(
            lambda g, s, ad: g * jnp.sqrt(ad + eps) / jnp.sqrt(s + eps),
            grads, sq, state["acc_delta"],
        )
        acc_delta = _tmap(lambda ad, d: rho * ad + (1 - rho) * d * d,
                          state["acc_delta"], delta)
        params = _tmap(lambda p, d: p - lr_t * d, params, delta)
        return params, {"step": step, "sq": sq, "acc_delta": acc_delta}

    return Optimizer(init=init, update=update)
