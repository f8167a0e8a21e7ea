"""Multi-chip scaling over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.6); this module is new
capability, designed TPU-first: the natural SPMD axis for online GS mapping is
the *view batch* — every chip renders and differentiates a different keyframe
of the same (replicated) Gaussian map, and gradients reduce over ICI before
the shared Adam step.

  mesh axes:  ("dp",)  — data parallel over keyframes
  params:     replicated
  cams/gt:    sharded on the batch axis (shard_map, B divisible by mesh)
  loss/grads: explicit psum over "dp"; per-chip views run as a
              gradient-accumulation scan at single-view kernel shapes

Cost model (measured single-chip, BENCH_r03 vs r04): a vmap over views ran
the whole fan of renders+backwards at B-wide shapes and cost ~2x per view;
the scan keeps per-view cost at the single-view step rate, so B views cost
~B single-view steps locally and ~1 step per chip across the mesh. The
batch is a gradient-noise reducer and a multi-chip throughput axis, not a
single-chip speedup.

Densify/prune runs on the replicated state (identical on every chip — the
PRNG key is replicated, so no divergence).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from photo_slam_tpu.models import densify as dz
from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.models import optimizer as optim
from photo_slam_tpu.ops import losses
from photo_slam_tpu.ops.camera_math import CameraMatrices
from photo_slam_tpu.ops.render import RenderSettings, render


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


def batched_loss(state: gm.GaussianState, cams: CameraMatrices,
                 gt_images: jnp.ndarray, masks: jnp.ndarray,
                 bg_color: jnp.ndarray, lambda_dssim: jnp.ndarray,
                 settings: RenderSettings):
    """Mean loss over a batch of views; returns aux per-view stats.

    cams: CameraMatrices with leading batch dim on every leaf.
    gt_images: [B, 3, H, W]; masks: [B, H, W].
    """
    live = state.live

    def one_view(params, m2d_offset, cam, gt, mask):
        scales, quats, opac = gm.activated(params)
        shs = gm.sh_features(params)
        res = render(params.xyz, scales, quats, opac, cam, settings, bg_color,
                     shs=shs, live_mask=live, means2d_offset=m2d_offset)
        masked = res.image * mask[None]
        loss = (1.0 - lambda_dssim) * losses.l1_loss(masked, gt) + (
            lambda_dssim * (1.0 - losses.ssim(masked, gt)))
        return loss, (res.radii, res.visible)

    def total(params, m2d_offset):
        loss_b, aux = jax.vmap(
            one_view, in_axes=(None, None, 0, 0, 0))(
            params, m2d_offset, cams, gt_images, masks)
        return jnp.mean(loss_b), aux

    return total


def _accumulate_view_grads(params, live, offset0, cams, gt_images, masks,
                           bg_color, lambda_dssim, settings):
    """Scanned per-view value_and_grad with gradient accumulation.

    The scan keeps every render/backward at its SINGLE-view shapes: a vmap
    over views made the binning sort, Pallas grids and the whole backward
    liveness B-wide at once, which measured ~2x the per-view cost of the
    single-view step on one chip (BENCH_r03: 9.22 views/s at B=4 vs 18.97
    it/s at B=1). One chip executes views sequentially either way — scanning
    makes that explicit and reuses the exact single-view program shapes.

    Returns (loss_sum, grad_sum, g2d_sum, visible_any, radii_max) over the
    views in this shard.
    """

    def one_view(p, m2d, cam, gt, mask):
        scales, quats, opac = gm.activated(p)
        shs = gm.sh_features(p)
        res = render(p.xyz, scales, quats, opac, cam, settings, bg_color,
                     shs=shs, live_mask=live, means2d_offset=m2d)
        masked = res.image * mask[None]
        loss = (1.0 - lambda_dssim) * losses.l1_loss(masked, gt) + (
            lambda_dssim * (1.0 - losses.ssim(masked, gt)))
        return loss, (res.radii, res.visible)

    vg = jax.value_and_grad(one_view, argnums=(0, 1), has_aux=True)
    cap = live.shape[0]

    def body(carry, xs):
        cam, gt, mask = xs
        (loss, (radii, visible)), (g, g2d) = vg(params, offset0, cam, gt,
                                                mask)
        loss_s, g_s, g2d_s, vis_s, rad_s = carry
        return (loss_s + loss,
                jax.tree.map(jnp.add, g_s, g),
                g2d_s + g2d,
                vis_s | visible,
                jnp.maximum(rad_s, radii)), None

    init = (jnp.float32(0.0),
            jax.tree.map(jnp.zeros_like, params),
            jnp.zeros((cap, 2), jnp.float32),
            jnp.zeros(cap, bool),
            jnp.zeros(cap, jnp.int32))
    carry, _ = jax.lax.scan(body, init, (cams, gt_images, masks))
    return carry


@functools.partial(
    jax.jit,
    static_argnames=("settings", "mesh"),
    donate_argnames=("state", "opt_state"),
)
def train_step_batched(
    state: gm.GaussianState,
    opt_state: optim.AdamState,
    cams: CameraMatrices,
    gt_images: jnp.ndarray,
    masks: jnp.ndarray,
    lrs: optim.LearningRates,
    bg_color: jnp.ndarray,
    lambda_dssim: jnp.ndarray,
    settings: RenderSettings,
    mesh: Mesh | None = None,
):
    """One multi-view optimization step (B views, mean gradient).

    Without a mesh the B views scan sequentially on the local chip (per-view
    cost == the single-view step, with one shared Adam update). With a mesh,
    the batch axis splits over "dp" via shard_map — each chip scans its own
    B/n_devices views and gradients/stats reduce over ICI (psum/pmax). B
    must divide by the mesh size.
    """
    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)
    b = gt_images.shape[0]
    if mesh is None:
        loss_s, grads_s, g2d_s, visible, radii = _accumulate_view_grads(
            state.params, state.live, offset0, cams, gt_images, masks,
            bg_color, lambda_dssim, settings)
    else:
        from jax import shard_map

        def shard_fn(params, live, off, cams_l, gts_l, masks_l, bg_l, lam_l):
            loss_s, g_s, g2d_s, vis, rad = _accumulate_view_grads(
                params, live, off, cams_l, gts_l, masks_l, bg_l, lam_l,
                settings)
            return (jax.lax.psum(loss_s, "dp"),
                    jax.tree.map(lambda x: jax.lax.psum(x, "dp"), g_s),
                    jax.lax.psum(g2d_s, "dp"),
                    jax.lax.psum(vis.astype(jnp.int32), "dp") > 0,
                    jax.lax.pmax(rad, "dp"))

        loss_s, grads_s, g2d_s, visible, radii = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P("dp"), P("dp"), P("dp"), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )(state.params, state.live, offset0, cams, gt_images, masks,
          bg_color, lambda_dssim)

    inv_b = jnp.float32(1.0 / b)
    loss = loss_s * inv_b
    grads = jax.tree.map(lambda x: x * inv_b, grads_s)
    g2d = g2d_s * inv_b

    # Stats: a Gaussian is visible if visible in ANY view; radii take the max;
    # the view-space grad accumulates the batch-mean like the loss gradient.
    state = dz.update_max_radii(state, radii, visible)
    state = dz.add_densification_stats(state, g2d, visible,
                                       settings.width, settings.height)

    params, opt_state = optim.adam_step(state.params, grads, opt_state, lrs,
                                        state.live)
    state = state._replace(params=params)
    return state, opt_state, {"loss": loss,
                              "num_visible": jnp.sum(visible.astype(jnp.int32))}


def render_image_sharded(
    mesh: Mesh,
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: CameraMatrices,
    settings: RenderSettings,
    bg_color: jnp.ndarray,
    shs: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    live_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Single-view render, tile-stripe-parallel over the mesh: every device
    rasterizes a horizontal band of tile rows of the SAME view (model
    replicated). Tile rasterization is embarrassingly parallel in image
    space — per-band binning + blending needs no collectives at all; only
    the band concat at the end touches ICI. This is the serving-latency
    axis, complementary to `train_step_batched`'s throughput axis (which
    parallelizes over *different* views).

    Returns the full [3, H, W] image.
    """
    from jax import shard_map

    from photo_slam_tpu.ops import preprocess as prep_mod

    n_dev = mesh.devices.size
    tile = 32 if settings.mode == "pallas" else settings.tile
    width, height = settings.width, settings.height
    gy = -(-height // tile)
    gy_band = -(-gy // n_dev)
    band_px = gy_band * tile

    prep = prep_mod.preprocess(
        means3d, scales, quats, cam.viewmatrix, cam.full_proj,
        cam.cam_center, width, height, settings.tan_fovx, settings.tan_fovy,
        sh_degree=settings.sh_degree, shs=shs,
        colors_precomp=colors_precomp,
        scale_modifier=settings.scale_modifier, live_mask=live_mask)

    def render_band(prep_rep, opac_rep, bg_rep):
        d = jax.lax.axis_index("dp")
        y0 = (d * band_px).astype(jnp.float32)
        # Shift projected means into band-local pixel coordinates; the
        # binning rect clip then drops Gaussians whose footprint misses the
        # band (empty rects), exactly like off-screen culling.
        shifted = prep_rep._replace(
            means2d=prep_rep.means2d - jnp.stack(
                [jnp.float32(0.0), y0])[None, :])
        from photo_slam_tpu.ops import tiled as tiled_mod
        if settings.mode == "pallas":
            out, _ = tiled_mod.render_pallas(
                shifted, opac_rep, width, band_px, bg_rep,
                max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
                max_per_tile=settings.max_per_tile,
                overflow_passes=settings.overflow_passes,
                overflow_capacity=settings.overflow_capacity)
        else:
            out, _ = tiled_mod.render_tiled(
                shifted, opac_rep, width, band_px, bg_rep,
                tile=settings.tile,
                max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
                max_per_tile=settings.max_per_tile,
                tiles_per_chunk=settings.tiles_per_chunk)
        return out.image[None]  # [1, 3, band_px, W]

    bands = shard_map(
        render_band, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P("dp", None, None, None),
        check_vma=False,
    )(prep, opacities, bg_color)
    img = bands.transpose(1, 0, 2, 3).reshape(3, n_dev * band_px, width)
    return img[:, :height, :]


def shard_batch_args(mesh: Mesh, cams: CameraMatrices, gt_images, masks):
    """Place batch-leading arrays on the mesh, sharded over 'dp'."""
    batch_sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        return jax.device_put(x, batch_sharding)

    return (
        jax.tree.map(put, cams),
        put(gt_images),
        put(masks),
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


# ---------------------------------------------------------------------------
# Gaussian-parallel (map-sharded) training — SURVEY §7 step 8, second half.
#
# The "dp" axis above replicates the map and shards VIEWS: throughput scales,
# capacity doesn't. This axis ("gp") shards the MAP: params + Adam moments
# live split over chips (capacity scales ~linearly with mesh size — the
# single-chip HBM budget caps a replicated map at ~2M splats,
# mapper/trainer._ensure_capacity), and each step runs:
#
#   1. per-shard preprocess (cull/project/cov2D/SH) on the chip that owns the
#      Gaussians — O(N/D), no communication;
#   2. all_gather of the compact per-Gaussian screen features (~10 floats vs
#      ~59 param + 118 Adam floats held shard-local) over ICI — the
#      "all-gather tile survivors" design from SURVEY §2.6;
#   3. every chip rasterizes its own horizontal band of tile rows (binning +
#      blend are image-local: zero communication);
#   4. bands all_gather into the full frame; the global loss (L1 + SSIM —
#      SSIM windows cross band boundaries, so it must see the full image) is
#      computed redundantly on every chip;
#   5. JAX AD routes cotangents back through the two gathers
#      (transpose = psum_scatter over ICI): band grads -> gathered-feature
#      grads -> shard-local feature grads -> shard-local param grads. The
#      redundant loss makes band cotangents arrive D-fold (D identical
#      copies psum_scattered), so grads are rescaled by 1/D;
#   6. Adam runs shard-local. No scatter anywhere: both collective
#      transposes are reduce-scatters, which ride ICI.
# ---------------------------------------------------------------------------


def make_gp_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("gp",))


def shard_gaussian_state(mesh: Mesh, state: gm.GaussianState,
                         opt_state: optim.AdamState):
    """Place a (replicated/host) state on the mesh, capacity axis sharded
    over 'gp'. Capacity must divide the mesh size (gm.round_capacity keeps
    power-of-2 capacities, so any power-of-2 mesh works)."""
    shard = NamedSharding(mesh, P("gp"))
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, shard)  # noqa: E731
    state = jax.tree.map(put, state)
    opt_state = optim.AdamState(m=jax.tree.map(put, opt_state.m),
                                v=jax.tree.map(put, opt_state.v),
                                step=jax.device_put(opt_state.step, rep))
    return state, opt_state


@functools.partial(
    jax.jit,
    static_argnames=("settings", "mesh"),
    donate_argnames=("state", "opt_state"),
)
def train_step_gaussian_sharded(
    state: gm.GaussianState,
    opt_state: optim.AdamState,
    cam: CameraMatrices,
    gt_image: jnp.ndarray,
    mask: jnp.ndarray,
    lrs: optim.LearningRates,
    bg_color: jnp.ndarray,
    lambda_dssim: jnp.ndarray,
    settings: RenderSettings,
    mesh: Mesh,
):
    """One optimization step with the Gaussian map sharded over mesh axis
    'gp'. Semantics match mapper.trainer.train_step on the union of the
    shards exactly, except per-tile entry-cap clipping: a Gaussian whose
    footprint is clipped to max_tiles_per_gaussian may pick different tiles
    when its rect is band-clipped (both paths are approximations there; with
    no clipping the step is bit-comparable, see test_sharding.py)."""
    from jax import shard_map

    from photo_slam_tpu.ops import preprocess as prep_mod
    from photo_slam_tpu.ops import tiled as tiled_mod

    n_dev = int(mesh.devices.size)
    tile = 32 if settings.mode == "pallas" else settings.tile
    width, height = settings.width, settings.height
    gy = -(-height // tile)
    gy_band = -(-gy // n_dev)
    band_px = gy_band * tile

    def shard_fn(params, live, m, v, step, cam_r, gt, mask_r, lrs_r, bg,
                 lam):
        cap_local = live.shape[0]

        def loss_fn(p, m2d_offset):
            scales, quats, opac = gm.activated(p)
            shs = gm.sh_features(p)
            prep = prep_mod.preprocess(
                p.xyz, scales, quats, cam_r.viewmatrix, cam_r.full_proj,
                cam_r.cam_center, width, height, settings.tan_fovx,
                settings.tan_fovy, sh_degree=settings.sh_degree, shs=shs,
                scale_modifier=settings.scale_modifier, live_mask=live,
                principal=settings.principal)
            prep = prep._replace(means2d=prep.means2d + m2d_offset)
            # 2. gather compact screen features; Adam/params stay sharded.
            gat = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "gp", axis=0, tiled=True),
                prep)
            opac_g = jax.lax.all_gather(opac, "gp", axis=0, tiled=True)
            # 3. rasterize this chip's band of tile rows.
            d = jax.lax.axis_index("gp")
            y0 = (d * band_px).astype(jnp.float32)
            shifted = gat._replace(
                means2d=gat.means2d - jnp.stack(
                    [jnp.float32(0.0), y0])[None, :])
            if settings.mode == "pallas":
                out, binning = tiled_mod.render_pallas(
                    shifted, opac_g, width, band_px, bg,
                    max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
                    max_per_tile=settings.max_per_tile,
                    overflow_passes=settings.overflow_passes,
                    overflow_capacity=settings.overflow_capacity,
                    overflow_compact=settings.overflow_compact)
            else:
                out, binning = tiled_mod.render_tiled(
                    shifted, opac_g, width, band_px, bg,
                    tile=settings.tile,
                    max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
                    max_per_tile=settings.max_per_tile,
                    tiles_per_chunk=settings.tiles_per_chunk)
            # 4. full frame on every chip (SSIM crosses band boundaries).
            bands = jax.lax.all_gather(out.image, "gp", axis=0)  # [D,3,b,W]
            img = bands.transpose(1, 0, 2, 3).reshape(
                3, n_dev * band_px, width)[:, :height, :]
            masked = img * mask_r[None]
            loss = (1.0 - lam) * losses.l1_loss(masked, gt) + (
                lam * (1.0 - losses.ssim(masked, gt)))
            return loss, (prep.radii, prep.visible, binning.num_clipped,
                          binning.num_overflow)

        offset0 = jnp.zeros((cap_local, 2), jnp.float32)
        (loss, (radii, visible, clipped, overflow)), (grads, g2d) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, offset0))
        # 5. the loss is computed identically on all D chips, so the band
        # all_gather's transpose (psum_scatter) delivered D identical
        # cotangent copies: rescale.
        inv_d = jnp.float32(1.0 / n_dev)
        grads = jax.tree.map(lambda x: x * inv_d, grads)
        g2d = g2d * inv_d

        st = gm.GaussianState(params=params, live=live,
                              max_radii2d=jnp.zeros(cap_local, jnp.float32),
                              xyz_grad_accum=jnp.zeros(cap_local, jnp.float32),
                              denom=jnp.zeros(cap_local, jnp.float32),
                              exist_since_iter=jnp.zeros(cap_local, jnp.int32))
        st = dz.update_max_radii(st, radii, visible)
        st = dz.add_densification_stats(st, g2d, visible, width, height)

        # 6. shard-local Adam.
        new_params, new_opt = optim.adam_step(
            params, grads, optim.AdamState(m=m, v=v, step=step), lrs_r, live)
        num_vis = jax.lax.psum(jnp.sum(visible.astype(jnp.int32)), "gp")
        metrics = (loss, num_vis,
                   jax.lax.psum(clipped, "gp"), jax.lax.psum(overflow, "gp"))
        return (new_params, new_opt.m, new_opt.v, new_opt.step,
                st.max_radii2d, st.xyz_grad_accum, st.denom, metrics)

    pspec = jax.tree.map(lambda _: P("gp"), state.params)
    (new_params, new_m, new_v, new_step, dr, dg, dd, metrics) = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(pspec, P("gp"), pspec, pspec, P(), P(), P(), P(), P(),
                  P(), P()),
        out_specs=(pspec, pspec, pspec, P(), P("gp"), P("gp"), P("gp"),
                   (P(), P(), P(), P())),
        check_vma=False,
    )(state.params, state.live, opt_state.m, opt_state.v, opt_state.step,
      cam, gt_image, mask, lrs, bg_color, lambda_dssim)

    loss, num_vis, clipped, overflow = metrics
    new_state = state._replace(
        params=new_params,
        max_radii2d=jnp.maximum(state.max_radii2d, dr),
        xyz_grad_accum=state.xyz_grad_accum + dg,
        denom=state.denom + dd,
    )
    new_opt = optim.AdamState(m=new_m, v=new_v, step=new_step)
    return new_state, new_opt, {"loss": loss, "num_visible": num_vis,
                                "binning_clipped": clipped,
                                "binning_overflow": overflow}


@functools.partial(
    jax.jit,
    static_argnames=("max_screen_size", "grad_threshold", "min_opacity",
                     "percent_dense", "mesh"),
    donate_argnames=("state", "opt_state"),
)
def densify_step_gaussian_sharded(state, opt_state, key, extent,
                                  grad_threshold, min_opacity,
                                  max_screen_size, percent_dense, mesh):
    """Densify/clone/split/prune with the map sharded over 'gp': every shard
    runs the budget-approved event over its own slots (its own free-slot
    budget, its own gradient ranking, a per-shard folded PRNG key). Candidate
    placement never crosses shards — clones/split children stay on the parent
    chip, which keeps the event communication-free; the global behavior
    matches the replicated event up to the partitioning of the free-slot
    budget."""
    from jax import shard_map

    def shard_fn(st_params, live, mr, ga, dn, ex, m, v, step, key_r, ext):
        d = jax.lax.axis_index("gp")
        st = gm.GaussianState(params=st_params, live=live, max_radii2d=mr,
                              xyz_grad_accum=ga, denom=dn,
                              exist_since_iter=ex)
        ost = optim.AdamState(m=m, v=v, step=step)
        st2, ost2, info = dz.densify_and_prune(
            st, ost, jax.random.fold_in(key_r, d), grad_threshold,
            min_opacity, ext, max_screen_size, percent_dense)
        info = dz.DensifyInfo(*(jax.lax.psum(x, "gp") for x in info))
        return (st2.params, st2.live, st2.max_radii2d, st2.xyz_grad_accum,
                st2.denom, st2.exist_since_iter, ost2.m, ost2.v, ost2.step,
                info)

    pspec = jax.tree.map(lambda _: P("gp"), state.params)
    out = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(pspec, P("gp"), P("gp"), P("gp"), P("gp"), P("gp"),
                  pspec, pspec, P(), P(), P()),
        out_specs=(pspec, P("gp"), P("gp"), P("gp"), P("gp"), P("gp"),
                   pspec, pspec, P(), dz.DensifyInfo(P(), P(), P(), P())),
        check_vma=False,
    )(state.params, state.live, state.max_radii2d, state.xyz_grad_accum,
      state.denom, state.exist_since_iter, opt_state.m, opt_state.v,
      opt_state.step, key, extent)
    (params, live, mr, ga, dn, ex, m, v, step, info) = out
    return (gm.GaussianState(params=params, live=live, max_radii2d=mr,
                             xyz_grad_accum=ga, denom=dn,
                             exist_since_iter=ex),
            optim.AdamState(m=m, v=v, step=step),
            dz.DensifyInfo(*info))


def deal_gaussian_shards(state: gm.GaussianState, opt_state: optim.AdamState,
                         n_shards: int):
    """Permute capacity slots so live and free slots spread evenly across
    the n contiguous shard blocks (round-robin deal of live-first order).

    Shard-local densify (densify_step_gaussian_sharded) budgets candidate
    placement against each shard's OWN free slots: a freshly grown or
    prefix-compacted map concentrates all free slots on the last shards,
    starving densification on the full ones. Call this when first sharding a
    map and after any capacity growth; subsequent clone/split events place
    children on the parent's shard, which keeps the balance roughly even.
    Slot order is semantically irrelevant (rendering sorts by depth; Adam is
    elementwise), so this is a pure relabeling. Host-side numpy (a rare
    structural event, like capacity growth)."""
    live = np.asarray(state.live)
    cap = live.shape[0]
    assert cap % n_shards == 0
    per = cap // n_shards
    order = np.argsort(~live, kind="stable")       # live rows first
    dest = (np.arange(cap) % n_shards) * per + np.arange(cap) // n_shards
    gather_idx = np.empty(cap, np.int64)
    gather_idx[dest] = order                       # new_row[d] = old[order[i]]
    take = lambda x: x[jnp.asarray(gather_idx)]    # noqa: E731
    state = jax.tree.map(take, state)
    opt_state = optim.AdamState(m=jax.tree.map(take, opt_state.m),
                                v=jax.tree.map(take, opt_state.v),
                                step=opt_state.step)
    return state, opt_state
