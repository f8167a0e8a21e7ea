"""Dense reference renderer: exact alpha compositing over ALL Gaussians.

O(N * H * W) — the correctness oracle for the tiled/Pallas renderers and the
fallback for tiny scenes. Implements exactly the per-pixel semantics of the
reference render kernel (reference: cuda_rasterizer/forward.cu:261-374):

  * Gaussians blended front-to-back in view-depth order,
  * power = -0.5*(A dx^2 + C dy^2) - B dx dy, skip if power > 0,
  * alpha = min(0.99, opacity * exp(power)), skip if alpha < 1/255,
  * stop when transmittance would drop below 1e-4 (that contribution and all
    later ones are dropped),
  * out = accumulated color + final_T * background.

The sequential early-exit is expressed as a prefix mask over the depth-ordered
cumulative product, which reproduces the loop semantics exactly: the
transmittance sequence only decreases at *counted* contributions, and since it
is non-increasing, "counted" (S_k >= 1e-4) is a prefix of the sorted order.
Differentiable end-to-end by JAX AD.

The per-Gaussian tile-rect coverage test (a Gaussian only ever touches pixels
whose 16x16 tile lies inside its 3-sigma screen rect) is applied per pixel, so
this renderer reproduces the reference's binned output bit-for-bit in exact
arithmetic — including the rect-edge clipping the binning implies.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from photo_slam_tpu.ops.preprocess import Preprocessed

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


class RenderOutput(NamedTuple):
    image: jnp.ndarray      # [3, H, W]
    final_T: jnp.ndarray    # [H, W] final transmittance
    n_contrib: jnp.ndarray  # [H, W] int32 number of counted contributions


def blend_pixels(xy, conic, opacity, rgb, active, pix_x, pix_y, bg,
                 rects=None, tile: int = 16):
    """Blend depth-sorted Gaussians into a flat set of pixels.

    Args:
      xy [N,2], conic [N,3], opacity [N], rgb [N,3], active [N] — per-Gaussian
        data already sorted front-to-back by view depth.
      pix_x, pix_y: [P] pixel center coordinates.
      bg: [3] background color.
      rects: optional (x0, y0, x1, y1) tile rects [N] each; when given, a
        Gaussian only touches pixels whose tile lies inside its rect —
        reproducing the reference's binning-induced clipping exactly.

    Returns (color [P,3] incl. background, final_T [P], n_contrib [P]).

    Semantics follow reference cuda_rasterizer/forward.cu:325-373.
    """
    dx = xy[:, 0:1] - pix_x[None, :]  # [N, P]
    dy = xy[:, 1:2] - pix_y[None, :]
    power = (
        -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
        - conic[:, 1:2] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    alpha = jnp.where(active[:, None], alpha, 0.0)
    if rects is not None:
        x0, y0, x1, y1 = rects
        ptx = (pix_x / tile).astype(jnp.int32)[None, :]
        pty = (pix_y / tile).astype(jnp.int32)[None, :]
        in_rect = (
            (ptx >= x0[:, None]) & (ptx < x1[:, None])
            & (pty >= y0[:, None]) & (pty < y1[:, None])
        )
        alpha = jnp.where(in_rect, alpha, 0.0)

    # S_k = prod_{j<=k} (1 - alpha_j); T_k = S_{k-1}; counted iff S_k >= eps.
    one_minus = 1.0 - alpha
    S = jnp.cumprod(one_minus, axis=0)
    T = jnp.concatenate([jnp.ones_like(S[:1]), S[:-1]], axis=0)
    counted = S >= T_EPS
    w = alpha * T * counted
    color = jnp.einsum("np,nc->pc", w, rgb, preferred_element_type=jnp.float32)
    final_T = jnp.min(jnp.where(counted, S, 1.0), axis=0)
    n_contrib = jnp.sum((counted & (alpha > 0.0)).astype(jnp.int32), axis=0)
    return color + final_T[:, None] * bg[None, :], final_T, n_contrib


def render_dense(prep: Preprocessed, opacities: jnp.ndarray, width: int,
                 height: int, bg_color: jnp.ndarray,
                 row_chunk: int = 8) -> RenderOutput:
    """Render the full image by blending every Gaussian into every pixel.

    `opacities` is the activated (sigmoid) opacity, shape [N].
    """
    from photo_slam_tpu.ops.binning import compute_rects

    order = jnp.argsort(jnp.where(prep.visible, prep.depths, jnp.inf))
    xy = prep.means2d[order]
    conic = prep.conics[order]
    rgb = prep.rgb[order]
    op = opacities[order]
    active = prep.visible[order]
    rects = compute_rects(xy, prep.radii[order], width, height)

    xs = jnp.arange(width, dtype=jnp.float32)

    def do_rows(y0):
        yy = y0 + jnp.arange(row_chunk, dtype=jnp.float32)
        py, px = jnp.meshgrid(yy, xs, indexing="ij")
        c, t, n = blend_pixels(xy, conic, op, rgb, active,
                               px.reshape(-1), py.reshape(-1), bg_color,
                               rects=rects)
        return (
            c.reshape(row_chunk, width, 3),
            t.reshape(row_chunk, width),
            n.reshape(row_chunk, width),
        )

    num_chunks = -(-height // row_chunk)
    y0s = jnp.arange(num_chunks, dtype=jnp.float32) * row_chunk
    colors, ts, ns = jax.lax.map(do_rows, y0s)
    image = colors.reshape(num_chunks * row_chunk, width, 3)[:height]
    final_T = ts.reshape(num_chunks * row_chunk, width)[:height]
    n_contrib = ns.reshape(num_chunks * row_chunk, width)[:height]
    return RenderOutput(
        image=jnp.transpose(image, (2, 0, 1)),
        final_T=final_T,
        n_contrib=n_contrib,
    )
