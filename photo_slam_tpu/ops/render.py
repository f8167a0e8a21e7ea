"""Public differentiable render API.

Mirrors the role of GaussianRenderer::render + GaussianRasterizationSettings
(reference: src/gaussian_renderer.cpp:23-149, include/gaussian_rasterizer.h:25-55)
returning (image, viewspace_points-gradient hook, visibility_filter, radii) —
but as a pure function of activated Gaussian attributes.

The reference's `screenspace_points` zero tensor with retain_grad (used to
accumulate densification stats) becomes an explicit `means2d_offset` argument:
pass zeros and differentiate with respect to it to obtain the per-Gaussian
view-space position gradient.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax.numpy as jnp

from photo_slam_tpu.ops import dense as dense_mod
from photo_slam_tpu.ops import preprocess as prep_mod
from photo_slam_tpu.ops import tiled as tiled_mod
from photo_slam_tpu.ops.camera_math import CameraMatrices


def default_render_mode() -> str:
    """'pallas' on TPU-like platforms, 'tiled' elsewhere (the Pallas kernels
    only run interpreted off-TPU, which is far slower than the jnp path)."""
    import jax

    dev = jax.devices()[0]
    if dev.platform in ("tpu", "axon") or "TPU" in str(
            getattr(dev, "device_kind", "")):
        return "pallas"
    return "tiled"


class RenderSettings(NamedTuple):
    """Static rasterization settings (shapes/FoV are compile-time constants)."""

    width: int
    height: int
    tan_fovx: float
    tan_fovy: float
    sh_degree: int = 3
    scale_modifier: float = 1.0
    tile: int = 16
    max_tiles_per_gaussian: int = 64
    max_per_tile: int = 512
    tiles_per_chunk: int = 16
    mode: str = "tiled"  # "pallas" | "tiled" | "dense"
    # Overflow continuation (pallas mode): extra blend passes over the
    # entries beyond max_per_tile of overflowing tiles, each covering another
    # overflow_capacity entries. Front-to-back compositing is homogeneous in
    # the incoming transmittance, so continuation is exact:
    # C += T_prev * C_pass, T *= T_pass.
    overflow_passes: int = 1
    overflow_capacity: int = 512
    # Principal point (cx, cy) for off-center cameras; None = image center
    # (the symmetric-frustum convention the reference inherits from 3DGS).
    principal: Optional[tuple] = None
    # Continuation passes run only over this many deepest tiles (overflow
    # concentrates; a full-T second pass wastes most of its work). 0 = every
    # tile gets a continuation window (the exhaustive path).
    overflow_compact: int = 128


def principal_for(camera, width: int, height: int):
    """(cx, cy) scaled to a render of (width, height) for an off-center
    camera, or None when the camera is (effectively) centered — None keeps
    the symmetric-frustum fast path and avoids recompilation."""
    sx = width / camera.width
    sy = height / camera.height
    cx, cy = camera.cx * sx, camera.cy * sy
    if abs(cx - 0.5 * width) < 1e-6 and abs(cy - 0.5 * height) < 1e-6:
        return None
    return (float(cx), float(cy))


class RenderResult(NamedTuple):
    image: jnp.ndarray          # [3, H, W]
    radii: jnp.ndarray          # [N] int32
    visible: jnp.ndarray        # [N] bool (radii > 0)
    final_T: jnp.ndarray        # [H, W]
    n_contrib: jnp.ndarray      # [H, W]
    num_clipped: jnp.ndarray    # [] int32 binning diagnostics (0 for dense)
    num_overflow: jnp.ndarray   # [] int32
    # Overflow-shape probes for sizing the continuation (both pre-
    # continuation): tiles whose raw depth exceeds max_per_tile, and the
    # deepest tile's raw entry count. Callers size overflow_compact /
    # overflow_capacity / overflow_passes from these (adaptive continuation).
    num_overflow_tiles: Optional[jnp.ndarray] = None
    max_tile_depth: Optional[jnp.ndarray] = None


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: CameraMatrices,
    settings: RenderSettings,
    bg_color: jnp.ndarray,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    live_mask: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
) -> RenderResult:
    """Render a view of the Gaussian map.

    All Gaussian attributes are ACTIVATED values: scales = exp(log_scale),
    quats normalized, opacities = sigmoid(logit) with shape [N].
    """
    prep = prep_mod.preprocess(
        means3d,
        scales,
        quats,
        cam.viewmatrix,
        cam.full_proj,
        cam.cam_center,
        settings.width,
        settings.height,
        settings.tan_fovx,
        settings.tan_fovy,
        sh_degree=settings.sh_degree,
        shs=shs,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        scale_modifier=settings.scale_modifier,
        live_mask=live_mask,
        principal=settings.principal,
    )
    if means2d_offset is not None:
        prep = prep._replace(means2d=prep.means2d + means2d_offset)

    zero = jnp.zeros((), jnp.int32)
    over_tiles, max_depth = zero, zero
    if settings.mode == "dense":
        out = dense_mod.render_dense(prep, opacities, settings.width,
                                     settings.height, bg_color)
        clipped, overflow = zero, zero
    elif settings.mode == "pallas":
        out, binning = tiled_mod.render_pallas(
            prep,
            opacities,
            settings.width,
            settings.height,
            bg_color,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
            max_per_tile=settings.max_per_tile,
            overflow_passes=settings.overflow_passes,
            overflow_capacity=settings.overflow_capacity,
            overflow_compact=settings.overflow_compact,
        )
        # render_pallas already nets out the continuation coverage (by the
        # actual residual-light tile subset it ran) from num_overflow.
        clipped, overflow = binning.num_clipped, binning.num_overflow
        over_tiles = jnp.sum(
            (binning.raw_counts > settings.max_per_tile).astype(jnp.int32))
        max_depth = jnp.max(binning.raw_counts)
    else:
        out, binning = tiled_mod.render_tiled(
            prep,
            opacities,
            settings.width,
            settings.height,
            bg_color,
            tile=settings.tile,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
            max_per_tile=settings.max_per_tile,
            tiles_per_chunk=settings.tiles_per_chunk,
        )
        clipped, overflow = binning.num_clipped, binning.num_overflow
        over_tiles = jnp.sum(
            (binning.raw_counts > settings.max_per_tile).astype(jnp.int32))
        max_depth = jnp.max(binning.raw_counts)

    return RenderResult(
        image=out.image,
        radii=prep.radii,
        visible=prep.visible,
        final_T=out.final_T,
        n_contrib=out.n_contrib,
        num_clipped=clipped,
        num_overflow=overflow,
        num_overflow_tiles=over_tiles,
        max_tile_depth=max_depth,
    )


@functools.lru_cache(maxsize=64)
def _jitted_render(settings: RenderSettings, with_shs: bool,
                   with_colors: bool, with_live: bool):
    def fn(means3d, scales, quats, opacities, cam, bg_color, shs,
           colors_precomp, live_mask):
        return render(means3d, scales, quats, opacities, cam, settings,
                      bg_color, shs=shs, colors_precomp=colors_precomp,
                      live_mask=live_mask)

    import jax

    return jax.jit(fn)


def render_jit(means3d, scales, quats, opacities, cam,
               settings: RenderSettings, bg_color, shs=None,
               colors_precomp=None, live_mask=None) -> RenderResult:
    """`render` under a cached jit keyed by the (hashable) settings.

    Serving paths (recorder, render_from_pose, view_result, viewer) MUST go
    through this: un-jitted op-by-op dispatch costs seconds per frame over a
    remote-TPU transport (measured ~5.3 s/frame at 640x480 vs ~10 ms jitted),
    and even locally forfeits XLA fusion.
    """
    fn = _jitted_render(settings, shs is not None, colors_precomp is not None,
                        live_mask is not None)
    return fn(means3d, scales, quats, opacities, cam, bg_color, shs,
              colors_precomp, live_mask)
