"""Map-level similarity transforms: loop closure + scale refinement.

State-level equivalents of the reference's GaussianModel transform methods
(reference: src/gaussian_model.cpp:379-475), operating on the functional
GaussianState with Adam-moment resets expressed as masked zeroing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from photo_slam_tpu.models.gaussian_model import GaussianState
from photo_slam_tpu.models.optimizer import AdamState
from photo_slam_tpu.ops.point_ops import scale_and_transform_then_mark_visible
from photo_slam_tpu.ops.camera_math import transform_points_43


@functools.partial(jax.jit, donate_argnames=("state", "opt_state"))
def apply_scaled_transformation(
    state: GaussianState,
    opt_state: AdamState,
    T: jnp.ndarray,
    s: jnp.ndarray,
):
    """Whole-map similarity transform: xyz <- T @ (s * xyz), rotations
    composed with T's rotation, sizes scaled by s; xyz/scaling Adam moments
    reset (reference: src/gaussian_model.cpp:379-414 applyScaledTransformation
    + scaledTransformationPostfix).

    Deviation from the reference: the reference multiplies the raw LOG-scale
    tensor by s (`scaling_ *= s`), which does not scale Gaussian sizes by s;
    here sizes scale geometrically (log_scales += log(s)). Rotations are also
    composed with T (the reference leaves them, which shears splats under
    rotation); both changes make the map render identically from the
    transformed keyframes.
    """
    from photo_slam_tpu.utils.math import quat_multiply, rotmat_to_quat

    p = state.params
    new_xyz = transform_points_43(p.xyz * s, T)
    q_T = rotmat_to_quat(T[:3, :3])
    new_quats = quat_multiply(jnp.broadcast_to(q_T, p.quats.shape), p.quats)
    new_log_scales = p.log_scales + jnp.log(s)
    mask = state.live[:, None]
    params = p._replace(
        xyz=jnp.where(mask, new_xyz, p.xyz),
        quats=jnp.where(mask, new_quats, p.quats),
        log_scales=jnp.where(mask, new_log_scales, p.log_scales),
    )

    def zero_live(x):
        m = state.live.reshape((state.live.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    new_m = list(opt_state.m)
    new_v = list(opt_state.v)
    for gi in (0, 4, 5):  # xyz, log_scales, quats moment resets
        new_m[gi] = zero_live(opt_state.m[gi])
        new_v[gi] = zero_live(opt_state.v[gi])
    opt2 = AdamState(m=type(opt_state.m)(*new_m), v=type(opt_state.v)(*new_v),
                     step=opt_state.step)
    return state._replace(params=params), opt2


@functools.partial(jax.jit, donate_argnames=("state", "opt_state",
                                             "not_transformed"))
def scaled_transform_visible_points_of_keyframe(
    state: GaussianState,
    opt_state: AdamState,
    not_transformed: jnp.ndarray,
    diff_pose: jnp.ndarray,
    kf_viewmatrix: jnp.ndarray,
    kf_full_proj: jnp.ndarray,
    kf_creation_iter: jnp.ndarray,
    stable_num_iter: jnp.ndarray,
    scale: jnp.ndarray,
):
    """Loop-closure correction of one keyframe's visible, unstable points
    (reference: src/gaussian_model.cpp:416-475): unstable =
    |exist_since_iter - kf_creation_iter| < stable_num_iter; apply the
    similarity `diff_pose` (with scale) to visible unstable not-yet-moved
    points; reset xyz/rotation Adam moments.

    Returns (state, opt_state, not_transformed, num_transformed).
    """
    p = state.params
    unstable = jnp.abs(state.exist_since_iter - kf_creation_iter) < (
        stable_num_iter)
    quats_act = p.quats / jnp.linalg.norm(p.quats, axis=-1, keepdims=True)
    pts, qs, new_not_transformed, num = scale_and_transform_then_mark_visible(
        p.xyz, quats_act, not_transformed & state.live, unstable,
        diff_pose, kf_viewmatrix, kf_full_proj, scale)
    params = p._replace(xyz=pts, quats=qs)

    changed = (not_transformed & ~new_not_transformed)

    def zero_changed(x):
        m = changed.reshape((changed.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    new_m = list(opt_state.m)
    new_v = list(opt_state.v)
    for gi in (0, 5):  # xyz + rotation groups (reference resets these two)
        new_m[gi] = zero_changed(opt_state.m[gi])
        new_v[gi] = zero_changed(opt_state.v[gi])
    opt2 = AdamState(m=type(opt_state.m)(*new_m), v=type(opt_state.v)(*new_v),
                     step=opt_state.step)
    return state._replace(params=params), opt2, new_not_transformed, num
