"""Gaussian map state: a functional pytree with padded static capacity.

TPU re-design of the reference's GaussianModel parameter store
(reference: include/gaussian_model.h:59-193, src/gaussian_model.cpp): instead
of dynamically resized torch tensors + in-place Adam-state surgery, the map is
an immutable pytree of fixed-capacity arrays plus a `live` mask. Growth
(increasePcd / densify) writes into dead slots with jittable scatters; when
capacity runs out the host re-buckets to the next power of two (one
recompilation per doubling, amortized like the torch caching allocator).

Parameter layout matches 3DGS (so PLY round-trips are byte-compatible):
  xyz            [C, 3]
  features_dc    [C, 1, 3]
  features_rest  [C, (deg+1)^2 - 1, 3]
  log_scales     [C, 3]   (exp activation)
  quats          [C, 4]   (w,x,y,z; normalize activation)
  opacity_logit  [C, 1]   (sigmoid activation)
plus training stats (max_radii2d, xyz_grad_accum, denom, exist_since_iter)
and the live mask.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from photo_slam_tpu.ops.knn import scale_init_from_points
from photo_slam_tpu.ops.sh import rgb_to_sh
from photo_slam_tpu.utils.math import inverse_sigmoid


class GaussianParams(NamedTuple):
    """The 6 optimizable parameter groups (order mirrors the reference's
    Adam param_groups, src/gaussian_model.cpp:477-510)."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    opacity_logit: jnp.ndarray
    log_scales: jnp.ndarray
    quats: jnp.ndarray


class GaussianState(NamedTuple):
    """Full map state = parameters + live mask + densification stats."""

    params: GaussianParams
    live: jnp.ndarray              # [C] bool
    max_radii2d: jnp.ndarray       # [C] float32
    xyz_grad_accum: jnp.ndarray    # [C] float32
    denom: jnp.ndarray             # [C] float32
    exist_since_iter: jnp.ndarray  # [C] int32

    @property
    def capacity(self) -> int:
        return self.live.shape[0]


def num_live(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.live.astype(jnp.int32))


def activated(params: GaussianParams):
    """(scales, unit quats, opacities[N]) — the activations the renderer
    consumes (reference: src/gaussian_model.cpp:48-71)."""
    scales = jnp.exp(params.log_scales)
    quats = params.quats / jnp.linalg.norm(params.quats, axis=-1,
                                           keepdims=True)
    opacities = jax.nn.sigmoid(params.opacity_logit[:, 0])
    return scales, quats, opacities


def sh_features(params: GaussianParams) -> jnp.ndarray:
    """[C, K, 3] concatenated DC + rest coefficients."""
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def round_capacity(n: int, minimum: int = 4096) -> int:
    """Bucketed capacity: next power of two (bounds recompile count)."""
    return max(minimum, 1 << max(0, math.ceil(math.log2(max(n, 1)))))


def empty_state(capacity: int, sh_degree: int = 3) -> GaussianState:
    k_rest = (sh_degree + 1) ** 2 - 1
    f32 = jnp.float32
    params = GaussianParams(
        xyz=jnp.zeros((capacity, 3), f32),
        features_dc=jnp.zeros((capacity, 1, 3), f32),
        features_rest=jnp.zeros((capacity, k_rest, 3), f32),
        opacity_logit=jnp.full((capacity, 1), -10.0, f32),
        log_scales=jnp.full((capacity, 3), -10.0, f32),
        quats=jnp.zeros((capacity, 4), f32).at[:, 0].set(1.0),
    )
    return GaussianState(
        params=params,
        live=jnp.zeros(capacity, bool),
        max_radii2d=jnp.zeros(capacity, f32),
        xyz_grad_accum=jnp.zeros(capacity, f32),
        denom=jnp.zeros(capacity, f32),
        exist_since_iter=jnp.zeros(capacity, jnp.int32),
    )


def create_from_pcd(points: np.ndarray, colors: np.ndarray,
                    sh_degree: int = 3,
                    capacity: int | None = None) -> GaussianState:
    """Initialize the map from a colored point cloud
    (reference: src/gaussian_model.cpp:114-191):
    DC SH from RGB, log-sqrt 3NN scale init, identity quats, opacity 0.1.
    """
    n = points.shape[0]
    cap = capacity or round_capacity(n * 2)
    state = empty_state(cap, sh_degree)

    pts = jnp.asarray(points, jnp.float32)
    log_s = scale_init_from_points(pts)
    dc = rgb_to_sh(jnp.asarray(colors, jnp.float32))

    params = state.params._replace(
        xyz=state.params.xyz.at[:n].set(pts),
        features_dc=state.params.features_dc.at[:n].set(dc[:, None, :]),
        opacity_logit=state.params.opacity_logit.at[:n].set(
            inverse_sigmoid(jnp.full((n, 1), 0.1))),
        log_scales=state.params.log_scales.at[:n].set(log_s),
        # quats already identity
    )
    return state._replace(
        params=params,
        live=state.live.at[:n].set(True),
    )


def insert_points(state: GaussianState, points: jnp.ndarray,
                  colors: jnp.ndarray, valid_new: jnp.ndarray,
                  iteration: jnp.ndarray) -> tuple[GaussianState, jnp.ndarray]:
    """increasePcd: append new Gaussians into dead slots (jittable).

    Semantics of reference src/gaussian_model.cpp:193-310: DC SH from RGB,
    scale from 3-NN distance AMONG THE NEW POINTS ONLY, identity rotation,
    opacity 0.1, exist_since_iter = iteration, Adam state zeros for the new
    slots (the caller zeroes optimizer moments at the returned slots) and
    grad stats reset (the caller handles via reset_stats).

    Args:
      points/colors: [M, 3] padded arrays of candidates.
      valid_new: [M] bool — which candidates are real.
      iteration: scalar int32.

    Returns (new_state, dst_slots [M] int32 with -1 for dropped/invalid).
    Candidates beyond the free capacity are dropped (counted by comparing
    valid_new.sum() with (dst >= 0).sum()).
    """
    m = points.shape[0]
    cap = state.capacity

    log_s = scale_init_from_points(points, valid_new)
    dc = rgb_to_sh(colors)

    # k-th valid candidate -> k-th dead slot.
    dead_order = jnp.argsort(state.live, stable=True)  # dead slots first
    cand_rank = jnp.cumsum(valid_new.astype(jnp.int32)) - 1      # [M]
    num_dead = jnp.sum((~state.live).astype(jnp.int32))
    can_place = valid_new & (cand_rank < num_dead)
    dst = jnp.where(can_place, dead_order[jnp.clip(cand_rank, 0, cap - 1)], -1)
    # Dropped candidates scatter out of bounds -> discarded (mode="drop"),
    # never clobbering a placed candidate's slot.
    dst_safe = jnp.where(dst >= 0, dst, cap).astype(jnp.int32)

    def scatter(arr, new_vals):
        return arr.at[dst_safe].set(new_vals, mode="drop")

    p = state.params
    params = GaussianParams(
        xyz=scatter(p.xyz, points),
        features_dc=scatter(p.features_dc, dc[:, None, :]),
        features_rest=scatter(p.features_rest,
                              jnp.zeros((m,) + p.features_rest.shape[1:])),
        opacity_logit=scatter(p.opacity_logit,
                              jnp.full((m, 1), float(np.log(0.1 / 0.9)))),
        log_scales=scatter(p.log_scales, log_s),
        quats=scatter(p.quats,
                      jnp.zeros((m, 4)).at[:, 0].set(1.0)),
    )
    live = state.live.at[dst_safe].set(True, mode="drop")
    exist = state.exist_since_iter.at[dst_safe].set(
        jnp.broadcast_to(iteration, (m,)), mode="drop")
    zeros_m = jnp.zeros(m, jnp.float32)
    new_state = state._replace(
        params=params,
        live=live,
        exist_since_iter=exist,
        max_radii2d=state.max_radii2d.at[dst_safe].set(zeros_m, mode="drop"),
        xyz_grad_accum=state.xyz_grad_accum.at[dst_safe].set(zeros_m,
                                                             mode="drop"),
        denom=state.denom.at[dst_safe].set(zeros_m, mode="drop"),
    )
    return new_state, dst


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side re-bucketing: pad every array to `new_capacity`."""
    cap = state.capacity
    assert new_capacity >= cap
    extra = new_capacity - cap
    if extra == 0:
        return state

    def pad(x):
        widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    params = GaussianParams(*(pad(x) for x in state.params))
    # Fresh dead slots need identity quats to stay normalizable.
    params = params._replace(
        quats=params.quats.at[cap:, 0].set(1.0),
        opacity_logit=params.opacity_logit.at[cap:].set(-10.0),
        log_scales=params.log_scales.at[cap:].set(-10.0),
    )
    return GaussianState(
        params=params,
        live=pad(state.live),
        max_radii2d=pad(state.max_radii2d),
        xyz_grad_accum=pad(state.xyz_grad_accum),
        denom=pad(state.denom),
        exist_since_iter=pad(state.exist_since_iter),
    )
