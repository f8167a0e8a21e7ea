"""Depth reprojection + monocular neighborhood depth densification.

Vectorized jnp equivalents of the reference's stereo_vision CUDA kernels
(reference: src/stereo_vision.cu:39-136, cuda_rasterizer/stereo_vision.h:41-55):

  * reproject_depth_map: pinhole back-projection of masked depth pixels to
    camera-frame 3D;
  * mono_neighbor_densify: for keypoints without depth, borrow the depth of
    the nearest keypoint (squared pixel distance <= max_pixel_dist) that has
    one, then back-project — the reference's O(N^2) per-pair search becomes
    one [N, N] distance matrix + argmin (an MXU matmul at SLAM keypoint
    counts of a few thousand).
"""
from __future__ import annotations

import jax.numpy as jnp


def backproject_pinhole(u, v, depth, fx, fy, cx, cy):
    """Camera-frame 3D from pixel + depth
    (reference: cuda_rasterizer/stereo_vision.h:41-55)."""
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def reproject_depth_map(depth: jnp.ndarray, mask: jnp.ndarray, fx, fy, cx, cy):
    """[H,W] depth (+ validity mask) -> [H*W, 3] camera-frame points
    (invalid rows keep z = 0) (reference: src/stereo_vision.cu:39-61).
    """
    h, w = depth.shape
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    d = jnp.where(mask, depth, 0.0)
    pts = backproject_pinhole(u, v, d, fx, fy, cx, cy)
    return pts.reshape(-1, 3)


def mono_neighbor_densify(
    pixels: jnp.ndarray,
    has3d: jnp.ndarray,
    points_local: jnp.ndarray,
    max_pixel_dist: float,
    fx, fy, cx, cy,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate camera-frame 3D for depthless keypoints
    (reference: src/stereo_vision.cu:63-136).

    Args:
      pixels: [N, 2] keypoint pixel coords (undistorted).
      has3d: [N] bool — keypoint has a matched map point.
      points_local: [N, 3] camera-frame 3D of matched keypoints (0 if none).
      max_pixel_dist: threshold on SQUARED pixel distance (the reference
        compares squared distances against the config value directly).

    Returns (points [N,3] camera frame, valid [N]):
      * keypoints with 3D keep their original point;
      * others borrow the nearest-with-depth neighbor's z and back-project;
      * valid=False where no donor inside the radius exists.
    """
    n = pixels.shape[0]
    d2 = jnp.sum(
        (pixels[:, None, :] - pixels[None, :, :]) ** 2, axis=-1)  # [N, N]
    big = jnp.float32(1e20)
    eye = jnp.eye(n, dtype=bool)
    cand = has3d[None, :] & ~eye
    d2m = jnp.where(cand, d2, big)
    nn = jnp.argmin(d2m, axis=1)
    nn_dist = jnp.take_along_axis(d2m, nn[:, None], axis=1)[:, 0]
    donor_ok = nn_dist <= max_pixel_dist
    depth = points_local[nn, 2]
    borrowed = backproject_pinhole(pixels[:, 0], pixels[:, 1], depth,
                                   fx, fy, cx, cy)
    pts = jnp.where(has3d[:, None], points_local, borrowed)
    valid = has3d | (donor_ok & (depth > 0.0))
    return pts, valid
