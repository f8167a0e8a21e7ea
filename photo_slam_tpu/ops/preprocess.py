"""Per-Gaussian preprocessing: projection, covariance, conic, radius, color.

This is the TPU analog of the reference rasterizer's preprocess stage
(reference: cuda_rasterizer/forward.cu:156-256). Instead of one CUDA thread
per Gaussian, everything is a fused batch of vectorized VPU/MXU ops over the
whole (padded) Gaussian array — XLA fuses the chain into a few kernels, and
JAX AD provides the gradient that the reference hand-writes in
cuda_rasterizer/backward.cu:144-396.

Culled / invalid Gaussians are handled by masks (radius == 0), never by
dynamic shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from photo_slam_tpu.ops import sh as sh_ops
from photo_slam_tpu.ops.camera_math import (
    ndc_to_pixel,
    transform_points_43,
    transform_points_44,
)

# Frustum near-cull threshold on view-space z
# (reference: cuda_rasterizer/auxiliary.h:154).
NEAR_CULL_Z = 0.2
# Low-pass filter added to the 2D covariance diagonal so every splat is at
# least ~1px wide (reference: cuda_rasterizer/forward.cu:110-112).
COV2D_LOWPASS = 0.3


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities, all shape [N, ...]."""

    means2d: jnp.ndarray        # [N, 2] pixel-space centers
    depths: jnp.ndarray         # [N] view-space z
    conics: jnp.ndarray         # [N, 3] inverse 2D covariance (a, b, c)
    radii: jnp.ndarray          # [N] int32 screen-space radius, 0 = culled
    rgb: jnp.ndarray            # [N, 3] colors (SH-evaluated or passthrough)
    visible: jnp.ndarray        # [N] bool, radius > 0


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3D covariance from (activated) scales and unit quaternions.

    Returns the 6 upper-triangular entries [N, 6] in the order
    (xx, xy, xz, yy, yz, zz), matching computeCov3D
    (reference: cuda_rasterizer/forward.cu:118-152). Quaternions are assumed
    already normalized (the activation does it), like the reference.
    """
    w, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    # R columns scaled by s: Sigma = R S S^T R^T = (RS)(RS)^T
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s = scales * scale_modifier
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    # M = R @ diag(s): columns of R scaled.
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    c_xx = m00 * m00 + m01 * m01 + m02 * m02
    c_xy = m00 * m10 + m01 * m11 + m02 * m12
    c_xz = m00 * m20 + m01 * m21 + m02 * m22
    c_yy = m10 * m10 + m11 * m11 + m12 * m12
    c_yz = m10 * m20 + m11 * m21 + m12 * m22
    c_zz = m20 * m20 + m21 * m21 + m22 * m22
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def tight_extents(conics: jnp.ndarray, opacities: jnp.ndarray,
                  radii: jnp.ndarray,
                  alpha_min: float = 1.0 / 255.0) -> jnp.ndarray:
    """Opacity-aware per-axis half-extents [N, 2] of the visible footprint.

    The blend skips contributions with alpha < 1/255 (reference:
    cuda_rasterizer/forward.cu:338-341), so any pixel outside the ellipse
    {d : opacity * exp(-0.5 d^T C d) >= alpha_min} never contributes. Its
    axis-aligned bounding box has half-widths sqrt(2 L Sigma_xx/yy) with
    L = ln(opacity/alpha_min) and Sigma = C^-1 — usually much tighter than
    the reference's circumscribed 3-sigma square (especially for the many
    low-opacity splats mid-training), which shrinks tile lists with zero
    image change. A small margin guards float rounding at the boundary.
    """
    a, b, c = conics[..., 0], conics[..., 1], conics[..., 2]
    det = jnp.maximum(a * c - b * b, 1e-12)
    sig_xx = c / det
    sig_yy = a / det
    L = jnp.log(jnp.maximum(opacities, 1e-12) / alpha_min) * 1.001
    dead = L <= 0.0  # alpha below the blend threshold everywhere
    L = jnp.maximum(L, 0.0)
    ext_x = jnp.sqrt(2.0 * L * jnp.maximum(sig_xx, 0.0)) + 1.0
    ext_y = jnp.sqrt(2.0 * L * jnp.maximum(sig_yy, 0.0)) + 1.0
    r = radii.astype(jnp.float32)
    ext = jnp.stack([jnp.minimum(ext_x, r), jnp.minimum(ext_y, r)], axis=-1)
    return jnp.where(dead[..., None], 0.0, ext)


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray,
                  viewmatrix: jnp.ndarray, focal_x: float, focal_y: float,
                  tan_fovx: float, tan_fovy: float) -> jnp.ndarray:
    """EWA-splatting 2D covariance [N, 3] = (a, b, c) of [[a,b],[b,c]].

    Implements the math of computeCov2D (reference:
    cuda_rasterizer/forward.cu:74-113): cov2d = J R Σ Rᵀ Jᵀ with R the
    world->view rotation and J the perspective Jacobian evaluated at the
    FoV-clamped view-space point, then the +0.3 low-pass on the diagonal.
    """
    t = transform_points_43(means3d, viewmatrix)
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz

    # J (2x3 effective rows of the perspective Jacobian)
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    R = viewmatrix[:3, :3]
    # Rows of U = J @ R, shape [N, 3] each.
    u0 = j00[..., None] * R[0][None, :] + j02[..., None] * R[2][None, :]
    u1 = j11[..., None] * R[1][None, :] + j12[..., None] * R[2][None, :]

    # Σ as symmetric matrix application: v -> Σ v for rows u0, u1.
    xx, xy, xz, yy, yz, zz = (cov3d[..., i] for i in range(6))

    def sigma_apply(v):
        return jnp.stack(
            [
                xx * v[..., 0] + xy * v[..., 1] + xz * v[..., 2],
                xy * v[..., 0] + yy * v[..., 1] + yz * v[..., 2],
                xz * v[..., 0] + yz * v[..., 1] + zz * v[..., 2],
            ],
            axis=-1,
        )

    s_u0 = sigma_apply(u0)
    a = jnp.sum(u0 * s_u0, axis=-1) + COV2D_LOWPASS
    b = jnp.sum(u1 * s_u0, axis=-1)
    c = jnp.sum(u1 * sigma_apply(u1), axis=-1) + COV2D_LOWPASS
    return jnp.stack([a, b, c], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    full_proj: jnp.ndarray,
    cam_center: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    sh_degree: int = 3,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    live_mask: Optional[jnp.ndarray] = None,
    principal: Optional[tuple] = None,
) -> Preprocessed:
    """Vectorized per-Gaussian preprocess
    (reference: cuda_rasterizer/forward.cu:156-256).

    Either `shs` [N,K,3] or `colors_precomp` [N,3] must be given; likewise
    cov3d is computed from scales/quats unless `cov3d_precomp` [N,6] is given.
    `live_mask` marks padded/dead slots; they come out with radius 0.
    `principal` (cx, cy) shifts the projection's principal point off the
    image center — off-center real cameras (e.g. TUM's cx=318.6 at 640px)
    render misaligned by (cx - w/2) pixels under the symmetric-frustum
    convention the reference inherits from 3DGS (the reference ignores
    cx/cy in rendering, gaussian_keyframe.cpp:178-210); this corrects it
    exactly: x_pix = fx*X/Z + cx == symmetric + (cx - w/2).
    """
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    p_view = transform_points_43(means3d, viewmatrix)
    depths = p_view[..., 2]
    in_front = depths > NEAR_CULL_Z

    p_hom = transform_points_44(means3d, full_proj)
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]

    cov3d = cov3d_precomp if cov3d_precomp is not None else compute_cov3d(
        scales, quats, scale_modifier)
    cov2d = compute_cov2d(means3d, cov3d, viewmatrix, focal_x, focal_y,
                          tan_fovx, tan_fovy)
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conics = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    # Screen-space radius from the max eigenvalue of cov2d
    # (reference: cuda_rasterizer/forward.cu:229-232).
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))

    means2d = jnp.stack(
        [ndc_to_pixel(p_proj[..., 0], width), ndc_to_pixel(p_proj[..., 1], height)],
        axis=-1,
    )
    if principal is not None:
        means2d = means2d + jnp.array(
            [principal[0] - 0.5 * width, principal[1] - 0.5 * height],
            jnp.float32)

    # A Gaussian survives if it's in front of the near plane, has an
    # invertible cov2d, and its radius rect touches the image at all.
    on_screen = (
        (means2d[..., 0] + radius_f > 0)
        & (means2d[..., 0] - radius_f < width)
        & (means2d[..., 1] + radius_f > 0)
        & (means2d[..., 1] - radius_f < height)
    )
    visible = in_front & det_ok & on_screen
    if live_mask is not None:
        visible = visible & live_mask
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb = sh_ops.sh_to_rgb(sh_degree, shs, means3d, cam_center)

    return Preprocessed(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        rgb=rgb,
        visible=visible,
    )
