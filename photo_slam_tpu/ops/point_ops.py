"""Point-cloud transform ops used by loop closure and scale refinement.

Vectorized jnp equivalents of the reference's point-op CUDA kernels
(reference: src/operate_points.cu:38-143, cuda_rasterizer/operate_points.h:42-200):
rigid/similarity transforms of means, quaternion rotation composition, and
frustum visibility marking. All are O(N) elementwise/MXU work — no custom
kernels needed.

Note: the reference's device-side matrix->quaternion conversion writes one
quaternion component to the wrong index (operate_points.h:192-200 stores
slot +2 twice and never +3); this implementation uses the correct conversion
(utils/math.rotmat_to_quat) rather than replicating that bug.
"""
from __future__ import annotations

import jax.numpy as jnp

from photo_slam_tpu.ops.camera_math import transform_points_43
from photo_slam_tpu.ops.preprocess import NEAR_CULL_Z
from photo_slam_tpu.utils.math import quat_multiply, rotmat_to_quat


def mark_visible(points: jnp.ndarray, viewmatrix: jnp.ndarray,
                 projmatrix: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility: view-space z beyond the near cull plane
    (reference: cuda_rasterizer/rasterizer_impl.cu:54-66 + auxiliary.h
    in_frustum — the screen-bounds test is disabled there too)."""
    del projmatrix  # kept for signature parity; the z test is sufficient
    p_view = transform_points_43(points, viewmatrix)
    return p_view[..., 2] > NEAR_CULL_Z


def transform_points(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform of [N,3] points by a 4x4 matrix
    (reference: src/operate_points.cu transform_points)."""
    return transform_points_43(points, T)


def scale_and_transform_points(
    points: jnp.ndarray,
    quats: jnp.ndarray,
    T: jnp.ndarray,
    mask: jnp.ndarray,
    scale: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked similarity transform of means + rotation composition
    (reference: cuda_rasterizer/operate_points.h:100-180
    scale_and_transform_points): p' = R_T (s * p) + t_T where mask;
    q' = quat(R_T) * q (correct Hamilton composition).
    """
    new_pts = transform_points_43(points * scale, T)
    q_T = rotmat_to_quat(T[:3, :3])
    new_quats = quat_multiply(jnp.broadcast_to(q_T, quats.shape), quats)
    pts_out = jnp.where(mask[:, None], new_pts, points)
    quats_out = jnp.where(mask[:, None], new_quats, quats)
    return pts_out, quats_out


def scale_and_transform_then_mark_visible(
    points: jnp.ndarray,
    quats: jnp.ndarray,
    not_transformed: jnp.ndarray,
    unstable: jnp.ndarray,
    T: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    scale: float,
):
    """Combined driver (reference: src/operate_points.cu:95-143):
    mask = visible-in-keyframe AND not-yet-transformed AND unstable; apply the
    similarity transform there; clear the not_transformed flag for them.

    Returns (points, quats, not_transformed, num_transformed).
    """
    visible = mark_visible(points, viewmatrix, projmatrix)
    final_mask = not_transformed & unstable & visible
    pts, qs = scale_and_transform_points(points, quats, T, final_mask, scale)
    new_not_transformed = not_transformed & ~final_mask
    return pts, qs, new_not_transformed, jnp.sum(final_mask.astype(jnp.int32))
