"""Scalar numpy oracle implementing the reference rasterizer semantics
literally (sequential per-pixel loops), used to validate the vectorized JAX
renderers. Math follows reference cuda_rasterizer/forward.cu and
src/gaussian_keyframe.cpp; intentionally slow and simple.
"""
from __future__ import annotations

import numpy as np

SH_C0 = 0.28209479177387814
TILE = 16


def quat_to_rot(q):
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def compute_cov3d(scale, quat, mod=1.0):
    R = quat_to_rot(quat)
    S = np.diag(scale * mod)
    M = R @ S
    return M @ M.T  # full 3x3


def compute_cov2d(mean, cov3d, viewmatrix, fx, fy, tan_fovx, tan_fovy):
    t = viewmatrix[:3, :3] @ mean + viewmatrix[:3, 3]
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txtz, tytz = t[0] / t[2], t[1] / t[2]
    tx = min(limx, max(-limx, txtz)) * t[2]
    ty = min(limy, max(-limy, tytz)) * t[2]
    tz = t[2]
    J = np.array([
        [fx / tz, 0, -fx * tx / (tz * tz)],
        [0, fy / tz, -fy * ty / (tz * tz)],
        [0, 0, 0],
    ])
    W = viewmatrix[:3, :3]
    T = J @ W
    cov = T @ cov3d @ T.T
    return np.array([cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3])


def ndc2pix(v, s):
    return ((v + 1.0) * s - 1.0) * 0.5


def render_reference(
    means3d, scales, quats, opacities, colors, viewmatrix, full_proj,
    width, height, tan_fovx, tan_fovy, bg,
):
    """Sequential renderer with per-tile rect binning, like the CUDA kernels."""
    n = means3d.shape[0]
    fx = width / (2.0 * tan_fovx)
    fy = height / (2.0 * tan_fovy)
    gx, gy = -(-width // TILE), -(-height // TILE)

    means2d = np.zeros((n, 2))
    depths = np.zeros(n)
    conics = np.zeros((n, 3))
    radii = np.zeros(n, dtype=np.int64)
    rects = np.zeros((n, 4), dtype=np.int64)

    for i in range(n):
        p = means3d[i]
        p_view = viewmatrix[:3, :3] @ p + viewmatrix[:3, 3]
        if p_view[2] <= 0.2:
            continue
        p_hom = full_proj @ np.append(p, 1.0)
        pw = 1.0 / (p_hom[3] + 1e-7)
        p_proj = p_hom[:3] * pw
        cov3d = compute_cov3d(scales[i], quats[i])
        cov = compute_cov2d(p, cov3d, viewmatrix, fx, fy, tan_fovx, tan_fovy)
        det = cov[0] * cov[2] - cov[1] ** 2
        if det == 0:
            continue
        conic = np.array([cov[2], -cov[1], cov[0]]) / det
        mid = 0.5 * (cov[0] + cov[2])
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(lam))
        pix = np.array([ndc2pix(p_proj[0], width), ndc2pix(p_proj[1], height)])
        x0 = min(gx, max(0, int((pix[0] - radius) / TILE)))
        y0 = min(gy, max(0, int((pix[1] - radius) / TILE)))
        x1 = min(gx, max(0, int((pix[0] + radius + TILE - 1) / TILE)))
        y1 = min(gy, max(0, int((pix[1] + radius + TILE - 1) / TILE)))
        if (x1 - x0) * (y1 - y0) == 0:
            continue
        means2d[i] = pix
        depths[i] = p_view[2]
        conics[i] = conic
        radii[i] = radius
        rects[i] = (x0, y0, x1, y1)

    order = np.argsort(depths + np.where(radii > 0, 0.0, 1e12), kind="stable")
    image = np.zeros((3, height, width))
    final_T = np.ones((height, width))
    n_contrib = np.zeros((height, width), dtype=np.int64)

    for py in range(height):
        ty = py // TILE
        for px in range(width):
            tx = px // TILE
            T = 1.0
            C = np.zeros(3)
            cnt = 0
            for i in order:
                if radii[i] <= 0:
                    continue
                x0, y0, x1, y1 = rects[i]
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                d = means2d[i] - np.array([px, py])
                power = (
                    -0.5 * (conics[i][0] * d[0] ** 2 + conics[i][2] * d[1] ** 2)
                    - conics[i][1] * d[0] * d[1]
                )
                if power > 0.0:
                    continue
                alpha = min(0.99, opacities[i] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                C += colors[i] * alpha * T
                T = test_T
                cnt += 1
            image[:, py, px] = C + T * bg
            final_T[py, px] = T
            n_contrib[py, px] = cnt
    return image, final_T, n_contrib
