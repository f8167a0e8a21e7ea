"""Sparse masked Adam over the Gaussian parameter groups + LR schedules.

Functional re-design of the reference's torch::optim::Adam usage
(reference: src/gaussian_model.cpp:477-554): six parameter groups with
independent learning rates, eps=1e-15, default betas (0.9, 0.999), and a
single shared step counter (torch keeps per-tensor steps but all six tensors
step together every iteration). Densify/prune "optimizer surgery"
(densificationPostfix / prunePoints / replaceTensorToOptimizer,
src/gaussian_model.cpp:567-714) becomes zeroing the moment buffers at the
affected slots — no allocation, fully jittable.

Learning rates are passed as a runtime vector (no recompile when the GUI or
the schedule changes them), matching the reference's live-tunable setters.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from photo_slam_tpu.models.gaussian_model import GaussianParams

ADAM_EPS = 1e-15
BETA1 = 0.9
BETA2 = 0.999

# Parameter-group order (reference: src/gaussian_model.cpp:460-466).
GROUPS = ("xyz", "features_dc", "features_rest", "opacity_logit",
          "log_scales", "quats")


class LearningRates(NamedTuple):
    """Per-group LRs; a pytree of scalars so values never trigger recompiles."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    opacity_logit: jnp.ndarray
    log_scales: jnp.ndarray
    quats: jnp.ndarray

    @staticmethod
    def create(position_lr, feature_lr, opacity_lr, scaling_lr, rotation_lr):
        """feature_rest always runs at feature_lr / 20
        (reference: src/gaussian_model.cpp:494-496)."""
        f = jnp.float32
        return LearningRates(
            xyz=f(position_lr),
            features_dc=f(feature_lr),
            features_rest=f(feature_lr) / 20.0,
            opacity_logit=f(opacity_lr),
            log_scales=f(scaling_lr),
            quats=f(rotation_lr),
        )


class AdamState(NamedTuple):
    m: GaussianParams
    v: GaussianParams
    step: jnp.ndarray  # scalar int32


def init_adam(params: GaussianParams) -> AdamState:
    # m and v must be distinct buffers: the train step donates its inputs and
    # XLA rejects donating the same buffer twice.
    return AdamState(
        m=jax.tree.map(jnp.zeros_like, params),
        v=jax.tree.map(jnp.zeros_like, params),
        step=jnp.zeros((), jnp.int32),
    )


def adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    opt_state: AdamState,
    lrs: LearningRates,
    live: jnp.ndarray,
) -> tuple[GaussianParams, AdamState]:
    """One Adam update over all live Gaussians.

    Dead/padded slots are frozen (their grads are already zero because they
    never render, but freezing also guards against NaN poisoning).
    """
    step = opt_state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1**t
    bc2 = 1.0 - BETA2**t

    def upd(p, g, m, v, lr):
        mask = live.reshape((live.shape[0],) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m2 = BETA1 * m + (1.0 - BETA1) * g
        v2 = BETA2 * v + (1.0 - BETA2) * (g * g)
        update = lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + ADAM_EPS)
        p2 = jnp.where(mask, p - update, p)
        return p2, m2, v2

    new_p, new_m, new_v = [], [], []
    for name, p, g, m, v in zip(GROUPS, params, grads, opt_state.m,
                                opt_state.v):
        lr = getattr(lrs, name)
        p2, m2, v2 = upd(p, g, m, v, lr)
        new_p.append(p2)
        new_m.append(m2)
        new_v.append(v2)
    return (
        GaussianParams(*new_p),
        AdamState(m=GaussianParams(*new_m), v=GaussianParams(*new_v),
                  step=step),
    )


def zero_moments_at(opt_state: AdamState, slots: jnp.ndarray,
                    mask: jnp.ndarray) -> AdamState:
    """Zero Adam moments at `slots` where `mask` — the surgery for newly
    created Gaussians (cat with zeros in the reference)."""

    def z(x):
        cur = x[slots]
        m = mask.reshape((mask.shape[0],) + (1,) * (x.ndim - 1))
        return x.at[slots].set(jnp.where(m, 0.0, cur))

    return AdamState(
        m=jax.tree.map(z, opt_state.m),
        v=jax.tree.map(z, opt_state.v),
        step=opt_state.step,
    )


def zero_moments_where(opt_state: AdamState, mask: jnp.ndarray,
                       group: str | None = None) -> AdamState:
    """Zero moments at all slots where mask; optionally only one group
    (resetOpacity zeroes just the opacity group's moments,
    reference: src/gaussian_model.cpp:556-586)."""

    def z(x):
        m = mask.reshape((mask.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    if group is None:
        return AdamState(m=jax.tree.map(z, opt_state.m),
                         v=jax.tree.map(z, opt_state.v), step=opt_state.step)
    gi = GROUPS.index(group)
    new_m = list(opt_state.m)
    new_v = list(opt_state.v)
    new_m[gi] = z(opt_state.m[gi])
    new_v[gi] = z(opt_state.v[gi])
    return AdamState(m=GaussianParams(*new_m), v=GaussianParams(*new_v),
                     step=opt_state.step)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Log-lerp LR schedule with optional sine delay ramp
    (reference: src/gaussian_model.cpp:1118-1131). Works on traced or
    Python scalars.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.float32(0.0)
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(jnp.float32(lr_init)) * (1.0 - t)
        + jnp.log(jnp.float32(lr_final)) * t
    )
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)
