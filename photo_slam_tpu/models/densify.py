"""Adaptive density control: clone / split / prune, as jittable masked ops.

TPU re-design of the reference's densifyAndPrune machinery
(reference: src/gaussian_model.cpp:716-831): where the torch code concatenates
freshly allocated tensors and rebuilds Adam state per event, here everything
happens in-place at a fixed padded capacity:

  * kill = split parents + pruned Gaussians -> their slots become dead;
  * candidates (clones + 2 split children per parent) are placed into dead
    slots with a rank-compaction scatter;
  * Adam moments are zeroed at every changed slot (exactly the reference's
    "new tensors get zero exp_avg/exp_avg_sq" surgery);
  * densification stats reset to zero afterwards (densificationPostfix
    semantics, src/gaussian_model.cpp:705-713).

Decision rules match the reference:
  clone:  |mean grad| >= tau and max(scale) <= percent_dense * extent
  split:  |mean grad| >= tau and max(scale) >  percent_dense * extent,
          children sampled from N(0, S) rotated into world, scale /= 1.6
  prune:  opacity < min_opacity, or (when max_screen_size > 0)
          screen radius > max_screen_size or max(scale) > 0.1 * extent
Pruning also applies to just-created candidates (the reference appends then
prunes over the concatenated array).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from photo_slam_tpu.models.gaussian_model import GaussianParams, GaussianState
from photo_slam_tpu.models.optimizer import AdamState
from photo_slam_tpu.utils.math import quat_to_rotmat

SPLIT_N = 2                  # children per split (reference densifyAndSplit N)
SPLIT_SCALE_DIV = 0.8 * SPLIT_N  # new scale = old / (0.8 * N)


class DensifyInfo(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    num_dropped: jnp.ndarray  # candidates that didn't fit in capacity


def add_densification_stats(state: GaussianState, means2d_grad: jnp.ndarray,
                            visible: jnp.ndarray, width: int = 2,
                            height: int = 2) -> GaussianState:
    """Accumulate ||dL/dmean2d||_2 for visible Gaussians
    (reference: src/gaussian_model.cpp:817-831).

    width/height convert PIXEL-unit position gradients to the reference's
    half-viewport (NDC-like) units: the CUDA backward multiplies
    dL/dmean2D by ddelx_dx = 0.5*W / ddely_dy = 0.5*H
    (cuda_rasterizer/backward.cu:460-465) BEFORE the densify threshold
    (2e-4) sees it. Without this, pixel-unit gradients are ~0.5*W times
    smaller and clone/split never fires — maps only shrink."""
    g = means2d_grad[:, :2] * jnp.array([0.5 * width, 0.5 * height],
                                        jnp.float32)[None, :]
    norm = jnp.linalg.norm(g, axis=-1)
    return state._replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(visible, norm, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
    )


def update_max_radii(state: GaussianState, radii: jnp.ndarray,
                     visible: jnp.ndarray) -> GaussianState:
    """max_radii2D tracking (reference: src/gaussian_mapper.cpp:713-718)."""
    r = radii.astype(jnp.float32)
    return state._replace(
        max_radii2d=jnp.where(visible,
                              jnp.maximum(state.max_radii2d, r),
                              state.max_radii2d)
    )


def densify_and_prune(
    state: GaussianState,
    opt_state: AdamState,
    key: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    extent,
    max_screen_size: int,
    percent_dense: float,
) -> tuple[GaussianState, AdamState, DensifyInfo]:
    """One full densify+prune event at fixed capacity. Jittable.

    `extent` (cameras extent / scene scale) may be traced. `max_screen_size`
    is static (0 disables the screen-size/world-size pruning, matching
    reference src/gaussian_mapper.cpp:722-730).
    """
    p = state.params
    cap = state.capacity
    live = state.live

    grads = state.xyz_grad_accum / state.denom
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    scales = jnp.exp(p.log_scales)
    smax = jnp.max(scales, axis=-1)
    opac = jax.nn.sigmoid(p.opacity_logit[:, 0])

    # Opacity/world-size prune terms also disqualify a parent from cloning
    # or splitting (any child/copy would be prunable on arrival: opacity is
    # inherited, and a world-big parent's children are world-big).
    prune_soft = opac < min_opacity
    if max_screen_size:
        prune_soft = prune_soft | (smax > 0.1 * extent)
    prune_old = prune_soft
    if max_screen_size:
        # Screen-radius prune. A radii-big parent stays SPLITTABLE (excluded
        # from prune_soft, not from hot): the reference splits it and the
        # children survive with max_radii2D = 0. (In the reference this term
        # is in fact vacuous — densificationPostfix zeroes max_radii2D_ for
        # the WHOLE array before densifyAndPrune's final prune,
        # src/gaussian_model.cpp:713-714 — we keep the meaningful reading of
        # max_screen_size, which is strictly more aggressive.)
        prune_old = prune_old | (state.max_radii2d > max_screen_size)
    # Non-finite zombies: NaN params fail every comparison, so they neither
    # rasterize nor prune and accumulate forever (observed +5/1200 iters in
    # the 30k soak). Cull them explicitly.
    finite = (jnp.isfinite(p.xyz).all(-1)
              & jnp.isfinite(p.log_scales).all(-1)
              & jnp.isfinite(p.quats).all(-1)
              & jnp.isfinite(p.opacity_logit).all(-1))
    prune_old = (prune_old | ~finite) & live

    hot = live & finite & ~prune_soft & (grads >= grad_threshold)
    clone = hot & (smax <= percent_dense * extent)
    split = hot & (smax > percent_dense * extent)

    # Capacity budget: each approved clone or split occupies one NET free
    # slot (a split kills its parent but places two children). Approving at
    # most `budget` candidates — highest accumulated gradient first when
    # slots are scarce — guarantees every clone copy / split child places.
    # Without this gate an at-capacity split killed the parent and then
    # DROPPED both children (no dead slot to scatter into), destroying
    # converged content on every densify event; the torch reference never
    # drops (it concatenates grown tensors, src/gaussian_model.cpp:716-831),
    # so parity at fixed capacity requires split-kills to be conditional on
    # placement.
    budget = jnp.sum((~live | prune_old).astype(jnp.int32))
    want = clone | split
    order = jnp.argsort(jnp.where(want, -grads, jnp.inf))
    inv_rank = jnp.zeros(cap, jnp.int32).at[order].set(
        jnp.arange(cap, dtype=jnp.int32))
    approved = want & (inv_rank < budget)
    clone = clone & approved
    split = split & approved

    kill = live & (split | prune_old)
    survivors = live & ~kill

    # ---- Candidate construction (2 per slot) -------------------------------
    k1, k2 = jax.random.split(key)
    R = quat_to_rotmat(p.quats)  # [C,3,3] (normalizes, like build_rotation)

    def make_child(k):
        samples = jax.random.normal(k, (cap, 3)) * scales
        return jnp.einsum("nij,nj->ni", R, samples) + p.xyz

    child_xyz_1 = make_child(k1)
    child_xyz_2 = make_child(k2)
    child_log_scales = jnp.log(scales / SPLIT_SCALE_DIV)

    # Arrival pruning (the reference appends candidates before pruning the
    # concatenated array) is vacuous here: `hot` already excludes prune_soft,
    # which covers every arrival-prune term that can apply to a fresh
    # candidate (opacity < min; world-big parents of world-big children; the
    # screen-radius term never applies to arrivals, whose max_radii2D is 0).
    # Candidate A: clone copy (for clones) or first split child.
    a_valid = clone | split
    a_xyz = jnp.where(split[:, None], child_xyz_1, p.xyz)
    a_log_scales = jnp.where(split[:, None], child_log_scales, p.log_scales)
    # Candidate B: second split child.
    b_valid = split
    b_xyz = child_xyz_2
    b_log_scales = child_log_scales

    cand_valid = jnp.concatenate([a_valid, b_valid])             # [2C]
    cand_src = jnp.concatenate([jnp.arange(cap, dtype=jnp.int32)] * 2)
    cand_xyz = jnp.concatenate([a_xyz, b_xyz])
    cand_log_scales = jnp.concatenate([a_log_scales, b_log_scales])

    # ---- Compaction: place valid candidates into dead slots ----------------
    dead_order = jnp.argsort(survivors, stable=True)  # dead slots first
    num_dead = jnp.sum((~survivors).astype(jnp.int32))
    cand_rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    can_place = cand_valid & (cand_rank < num_dead)
    num_dropped = jnp.sum((cand_valid & ~can_place).astype(jnp.int32))
    # Non-placed candidates scatter out of bounds -> dropped (mode="drop"),
    # so they can never clobber a placed candidate's slot.
    dst = jnp.where(can_place,
                    dead_order[jnp.clip(cand_rank, 0, cap - 1)],
                    cap).astype(jnp.int32)

    def place(arr, cand_vals):
        return arr.at[dst].set(cand_vals, mode="drop")

    src = cand_src
    new_params = GaussianParams(
        xyz=place(p.xyz, cand_xyz),
        features_dc=place(p.features_dc, p.features_dc[src]),
        features_rest=place(p.features_rest, p.features_rest[src]),
        opacity_logit=place(p.opacity_logit, p.opacity_logit[src]),
        log_scales=place(p.log_scales, cand_log_scales),
        quats=place(p.quats, p.quats[src]),
    )
    new_live = survivors.at[dst].set(True, mode="drop")
    new_exist = state.exist_since_iter.at[dst].set(
        state.exist_since_iter[src], mode="drop")

    # ---- Adam surgery: zero moments at every changed slot ------------------
    changed = (kill | (new_live & ~survivors))

    def zero_changed(x):
        m = changed.reshape((cap,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    new_opt = AdamState(
        m=jax.tree.map(zero_changed, opt_state.m),
        v=jax.tree.map(zero_changed, opt_state.v),
        step=opt_state.step,
    )

    zeros = jnp.zeros(cap, jnp.float32)
    new_state = GaussianState(
        params=new_params,
        live=new_live,
        max_radii2d=zeros,
        xyz_grad_accum=zeros,
        denom=zeros,
        exist_since_iter=new_exist,
    )
    info = DensifyInfo(
        num_cloned=jnp.sum(clone.astype(jnp.int32)),
        num_split=jnp.sum(split.astype(jnp.int32)),
        num_pruned=jnp.sum(prune_old.astype(jnp.int32)),
        num_dropped=num_dropped,
    )
    return new_state, new_opt, info


def reset_opacity(state: GaussianState, opt_state: AdamState
                  ) -> tuple[GaussianState, AdamState]:
    """opacity <- min(opacity, 0.01) with opacity-group moment reset
    (reference: src/gaussian_model.cpp:556-565 + replaceTensorToOptimizer)."""
    from photo_slam_tpu.models.optimizer import zero_moments_where
    from photo_slam_tpu.utils.math import inverse_sigmoid

    opac = jax.nn.sigmoid(state.params.opacity_logit)
    new_logit = inverse_sigmoid(jnp.minimum(opac, 0.01))
    mask = state.live.reshape(-1, 1)
    params = state.params._replace(
        opacity_logit=jnp.where(mask, new_logit, state.params.opacity_logit))
    opt2 = zero_moments_where(opt_state, state.live, group="opacity_logit")
    return state._replace(params=params), opt2
