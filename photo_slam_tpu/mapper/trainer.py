"""The training engine: jitted train step + the offline training loop.

This is the TPU re-design of trainForOneIteration + trainColmap
(reference: src/gaussian_mapper.cpp:614-774, 544-608 and
src/gaussian_trainer.cpp:22-140). One compiled XLA program per
(image size, SH degree) pair covers render -> loss -> backward -> Adam; the
rare structural events (densify/prune, opacity reset) are separate jitted
programs; capacity growth re-buckets on the host.

Design notes vs the reference:
  * the viewspace-gradient densification stat comes from differentiating
    against an explicit zero `means2d_offset` (the torch version retains the
    grad of a zero screenspace tensor);
  * the whole step runs with donated state, so the map is updated in place
    on device with zero host traffic;
  * metrics return as a small dict of scalars (fetched asynchronously).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from photo_slam_tpu.config import Config
from photo_slam_tpu.models import densify as dz
from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.models import optimizer as optim
from photo_slam_tpu.models.keyframe import Keyframe
from photo_slam_tpu.models.scene import Scene
from photo_slam_tpu.mapper.sampler import KeyframeSampler
from photo_slam_tpu.ops import losses
from photo_slam_tpu.ops.camera_math import CameraMatrices
from photo_slam_tpu.ops.render import RenderSettings, render


def _train_step_impl(
    state: gm.GaussianState,
    opt_state: optim.AdamState,
    cam: CameraMatrices,
    gt_image: jnp.ndarray,
    mask: jnp.ndarray,
    lrs: optim.LearningRates,
    bg_color: jnp.ndarray,
    lambda_dssim: jnp.ndarray,
    settings: RenderSettings,
):
    """One optimization iteration (render/loss/grad/stats/Adam)."""
    live = state.live

    def loss_fn(params: gm.GaussianParams, means2d_offset: jnp.ndarray):
        scales, quats, opac = gm.activated(params)
        shs = gm.sh_features(params)
        res = render(
            params.xyz, scales, quats, opac, cam, settings, bg_color,
            shs=shs, live_mask=live, means2d_offset=means2d_offset,
        )
        masked = res.image * mask[None, :, :]
        loss = (1.0 - lambda_dssim) * losses.l1_loss(masked, gt_image) + (
            lambda_dssim * (1.0 - losses.ssim(masked, gt_image))
        )
        return loss, res

    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)
    (loss, res), (grads, g2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, offset0)

    # Densification statistics (reference: src/gaussian_mapper.cpp:703-719).
    state = dz.update_max_radii(state, res.radii, res.visible)
    state = dz.add_densification_stats(state, g2d, res.visible,
                                       settings.width, settings.height)

    params, opt_state = optim.adam_step(state.params, grads, opt_state, lrs,
                                        live)
    state = state._replace(params=params)

    metrics = {
        "loss": loss,
        "psnr": losses.psnr(res.image * mask[None], gt_image),
        "num_visible": jnp.sum(res.visible.astype(jnp.int32)),
        "binning_clipped": res.num_clipped,
        "binning_overflow": res.num_overflow,
    }
    return state, opt_state, metrics


train_step = functools.partial(
    jax.jit,
    static_argnames=("settings",),
    donate_argnames=("state", "opt_state"),
)(_train_step_impl)


@functools.partial(
    jax.jit,
    static_argnames=("settings", "num_steps"),
    donate_argnames=("state", "opt_state"),
)
def train_chunk(
    state: gm.GaussianState,
    opt_state: optim.AdamState,
    cams: CameraMatrices,
    gt_images: jnp.ndarray,
    mask: jnp.ndarray,
    lrs: optim.LearningRates,
    bg_color: jnp.ndarray,
    lambda_dssim: jnp.ndarray,
    start_iter: jnp.ndarray,
    settings: RenderSettings,
    num_steps: int,
):
    """`num_steps` sequential train iterations in ONE XLA dispatch.

    Semantically identical to calling train_step `num_steps` times on views
    (start_iter + j) % V of the resident view ring — but the per-call host
    dispatch (an execute RPC over the remote-TPU tunnel per iteration)
    amortizes across the whole chunk. Offline protocol loops (the 30k
    quality soak, trainColmap-style fits) call this between structural
    events (densify boundaries), which is where the reference's hot loop
    spends its life (reference: src/gaussian_mapper.cpp:505-525).

    Args:
      cams: CameraMatrices pytree with a leading view axis [V, ...].
      gt_images: [V, 3, H, W] device-resident ground-truth ring.
      start_iter: int32 scalar — 0-based global index of the chunk's first
        iteration; step j trains on view (start_iter + j) % V.
      num_steps: static chunk length.

    Returns (state, opt_state, metrics) where each metrics entry is stacked
    over the chunk ([num_steps] per scalar; callers typically read [-1]).
    """
    v_count = gt_images.shape[0]

    def body(carry, j):
        st, opt = carry
        v = (start_iter.astype(jnp.int32) + j) % v_count
        cam = jax.tree.map(lambda x: x[v], cams)
        gt = jax.lax.dynamic_index_in_dim(gt_images, v, keepdims=False)
        st, opt, m = _train_step_impl(st, opt, cam, gt, mask, lrs,
                                      bg_color, lambda_dssim, settings)
        return (st, opt), m

    (state, opt_state), metrics = jax.lax.scan(
        body, (state, opt_state), jnp.arange(num_steps, dtype=jnp.int32))
    return state, opt_state, metrics


@functools.partial(
    jax.jit,
    static_argnames=("max_screen_size", "grad_threshold", "min_opacity",
                     "percent_dense"),
    donate_argnames=("state", "opt_state"),
)
def densify_step(state, opt_state, key, extent, grad_threshold, min_opacity,
                 max_screen_size, percent_dense):
    return dz.densify_and_prune(
        state, opt_state, key, grad_threshold, min_opacity, extent,
        max_screen_size, percent_dense)


@functools.partial(jax.jit, donate_argnames=("state", "opt_state"))
def opacity_reset_step(state, opt_state):
    return dz.reset_opacity(state, opt_state)


@dataclass
class TrainerMetrics:
    iteration: int = 0
    ema_loss: float = 0.0
    last_loss: float = 0.0
    last_psnr: float = 0.0
    num_live: int = 0
    num_dropped: int = 0


class GaussianTrainer:
    """Owns the device-resident map state and runs training iterations.

    Replaces GaussianTrainer/GaussianMapper's per-iteration body for both the
    offline (trainColmap) and online (run) paths — the online mapper drives
    this object from its queue-consumer loop.
    """

    def __init__(self, cfg: Config, scene: Scene, seed: int = 0):
        self.cfg = cfg
        self.scene = scene
        self.sampler = KeyframeSampler(seed)
        self.key = jax.random.PRNGKey(seed)
        self.iteration = 0
        self.default_sh = 0
        self.ema_loss = 0.0
        self.state: Optional[gm.GaussianState] = None
        self.opt_state: Optional[optim.AdamState] = None
        self.spatial_lr_scale = 1.0
        self.position_lr_init_live = cfg.opt.position_lr_init
        self.bg_color = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
        self.metrics = TrainerMetrics()
        # Online mode: per-keyframe used-times drive the position LR schedule
        # (reference: src/gaussian_mapper.cpp:661-669).
        self.online_lr = False
        # Device-side ground-truth cache: keyframes are sampled many times
        # (times-of-use scheduling), but a naive jnp.asarray per step
        # re-uploads ~10 MB per iteration — over the remote-TPU tunnel that
        # dominates the step. LRU-bounded by bytes; masks are tiny and
        # per-(camera, size), cached unbounded.
        self._gt_cache: "dict[tuple, jnp.ndarray]" = {}
        self._gt_cache_bytes = 0
        self.gt_cache_budget = 2 << 30
        self._mask_cache: "dict[tuple, jnp.ndarray]" = {}

    def _device_gt(self, kf: Keyframe, level: int) -> jnp.ndarray:
        key = (kf.fid, level)
        hit = self._gt_cache.pop(key, None)
        if hit is not None:
            self._gt_cache[key] = hit  # LRU: move to back
            return hit
        arr = jnp.asarray(kf.level_image(level))
        self._gt_cache[key] = arr
        self._gt_cache_bytes += arr.nbytes
        while self._gt_cache_bytes > self.gt_cache_budget and len(
                self._gt_cache) > 1:
            oldest = next(iter(self._gt_cache))
            self._gt_cache_bytes -= self._gt_cache.pop(oldest).nbytes
        return arr

    def _device_mask(self, kf: Keyframe, height: int) -> jnp.ndarray:
        key = (kf.camera.camera_id, height)
        hit = self._mask_cache.get(key)
        if hit is None:
            hit = jnp.asarray(
                kf.camera.undistort_mask(scale=height / kf.camera.height))
            self._mask_cache[key] = hit
        return hit

    def drop_keyframe_cache(self, fid: int) -> None:
        """Release cached device images of a culled keyframe."""
        for key in [k for k in self._gt_cache if k[0] == fid]:
            self._gt_cache_bytes -= self._gt_cache[key].nbytes
            del self._gt_cache[key]

    # -- state management ----------------------------------------------------

    def initialize_map(self, points: np.ndarray, colors: np.ndarray) -> None:
        """createFromPcd + trainingSetup
        (reference: src/gaussian_mapper.cpp:480-489)."""
        self.spatial_lr_scale = self.scene.compute_nerfpp_norm()
        # Degenerate-camera floor: getNerfppNorm measures CAMERA spread,
        # which matches scene scale only because real sequences roam the
        # scene. A near-stationary camera (synthetic orbits, tripod-style
        # captures) yields an extent far below the scene radius, and then
        # percent_dense * extent drops below the median splat size — every
        # gradient spike (e.g. post-opacity-reset) mass-splits the map into
        # shards (measured: ~7k splits/event steady-state, quality pinned
        # ~7 dB). When cameras clearly don't span the scene, floor the
        # extent with the observed point-cloud radius.
        if len(points):
            pt_radius = 1.1 * float(np.percentile(
                np.linalg.norm(points - points.mean(0), axis=1), 95))
            if self.scene.cameras_extent < 0.25 * pt_radius:
                self.scene.cameras_extent = pt_radius
                self.spatial_lr_scale = pt_radius
        cap = gm.round_capacity(points.shape[0] * 2,
                                minimum=self.cfg.renderer.initial_capacity)
        self.state = gm.create_from_pcd(points, colors,
                                        sh_degree=self.cfg.model.sh_degree,
                                        capacity=cap)
        self.opt_state = optim.init_adam(self.state.params)

    def increase_pcd(self, points: np.ndarray, colors: np.ndarray) -> int:
        """Insert new Gaussians, growing capacity if needed. Returns number
        inserted."""
        if points.shape[0] == 0:
            return 0
        self._ensure_capacity(points.shape[0])
        pts = jnp.asarray(points, jnp.float32)
        cols = jnp.asarray(colors, jnp.float32)
        valid = jnp.ones(points.shape[0], bool)
        self.state, dst = gm.insert_points(
            self.state, pts, cols, valid, jnp.int32(self.iteration))
        placed_mask = dst >= 0
        self.opt_state = optim.zero_moments_at(
            self.opt_state, jnp.where(placed_mask, dst, 0).astype(jnp.int32),
            placed_mask)
        return int(placed_mask.sum())

    def _ensure_capacity(self, incoming: int = 0) -> None:
        cap = self.state.capacity
        live = int(gm.num_live(self.state))
        headroom = int(cap * self.cfg.renderer.capacity_headroom)
        if cap >= self.cfg.renderer.max_capacity:
            # At the HBM-budget ceiling: structural inserts overflow-drop
            # (mode="drop") instead of growing the buckets — unbounded
            # densification otherwise compiles itself out of device memory
            # (observed: 24 GB of HLO temps at a 4M bucket on a 16 GB v5e).
            return
        if live + incoming + headroom > cap:
            new_cap = gm.round_capacity(
                int((live + incoming) * (1.0 + self.cfg.renderer.capacity_headroom) * 2))
            new_cap = max(new_cap, cap * 2)
            new_cap = min(new_cap, self.cfg.renderer.max_capacity)
            if new_cap <= cap:
                return
            self.state = gm.grow_capacity(self.state, new_cap)
            self.opt_state = optim.AdamState(
                m=jax.tree.map(
                    lambda m, p: jnp.zeros_like(p).at[: m.shape[0]].set(m),
                    self.opt_state.m, self.state.params),
                v=jax.tree.map(
                    lambda v, p: jnp.zeros_like(p).at[: v.shape[0]].set(v),
                    self.opt_state.v, self.state.params),
                step=self.opt_state.step,
            )

    # -- LR schedule ----------------------------------------------------------

    def _current_lrs(self, kf: Keyframe) -> optim.LearningRates:
        o = self.cfg.opt
        if self.online_lr:
            # Online: LR driven by this keyframe's use count, clamped
            # (reference: src/gaussian_mapper.cpp:661-669).
            used = self.sampler.use_counts.get(kf.fid, 0)
            step = min(used, o.position_lr_max_steps)
        else:
            step = min(self.iteration, o.position_lr_max_steps)
        pos_lr = optim.expon_lr(
            step,
            self.position_lr_init_live * self.spatial_lr_scale,
            o.position_lr_final * self.spatial_lr_scale,
            lr_delay_mult=o.position_lr_delay_mult,
            max_steps=o.position_lr_max_steps,
        )
        return optim.LearningRates(
            xyz=pos_lr,
            features_dc=jnp.float32(o.feature_lr),
            features_rest=jnp.float32(o.feature_lr) / 20.0,
            opacity_logit=jnp.float32(o.opacity_lr),
            log_scales=jnp.float32(o.scaling_lr),
            quats=jnp.float32(o.rotation_lr),
        )

    # -- one iteration ---------------------------------------------------------

    def _render_settings(self, width: int, height: int) -> RenderSettings:
        r = self.cfg.renderer
        return RenderSettings(
            width=width, height=height,
            tan_fovx=float(np.tan(0.5 * next(iter(self.scene.cameras.values())).fovx)),
            tan_fovy=float(np.tan(0.5 * next(iter(self.scene.cameras.values())).fovy)),
            sh_degree=self.default_sh,
            tile=r.tile,
            max_tiles_per_gaussian=r.max_tiles_per_gaussian,
            max_per_tile=r.max_per_tile,
            tiles_per_chunk=r.tiles_per_chunk,
        )

    def train_iteration(self, kf: Optional[Keyframe] = None,
                        fetch_metrics: bool = True,
                        allow_opacity_reset: bool = True) -> dict[str, Any]:
        """One full pass of trainForOneIteration
        (reference: src/gaussian_mapper.cpp:614-774).

        With fetch_metrics=False the step is dispatched asynchronously (no
        host sync — the reference synchronizes every iteration, we don't have
        to); host-side metric fields keep their last fetched values.
        """
        self.iteration += 1
        it = self.iteration
        o = self.cfg.opt

        if kf is None:
            kf = self.sampler.sample_sliding_window(self.scene.keyframes)
        if kf is None:
            self.iteration -= 1
            return {}

        # SH degree warmup: +1 every 1000 iterations
        # (reference: src/gaussian_mapper.cpp:653-658).
        if it % 1000 == 0 and self.default_sh < self.cfg.model.sh_degree:
            self.default_sh += 1

        # Pyramid level selection (reference: 631-647).
        level = kf.current_pyramid_level() if (
            self.cfg.mapper.do_gaus_pyramid_training and kf.pyramid
        ) else len(kf.pyramid)
        gt = self._device_gt(kf, level)
        height, width = gt.shape[1], gt.shape[2]
        mask = self._device_mask(kf, height)

        tan_fovx = float(np.tan(0.5 * kf.camera.fovx))
        tan_fovy = float(np.tan(0.5 * kf.camera.fovy))
        r = self.cfg.renderer
        from photo_slam_tpu.ops.render import (default_render_mode,
                                               principal_for)
        mode = default_render_mode()
        k_dup, per_tile = r.caps_for_mode(mode)
        settings = RenderSettings(
            width=width, height=height, tan_fovx=tan_fovx, tan_fovy=tan_fovy,
            sh_degree=self.default_sh, tile=r.tile,
            max_tiles_per_gaussian=k_dup,
            max_per_tile=per_tile, tiles_per_chunk=r.tiles_per_chunk,
            mode=mode,
            principal=principal_for(kf.camera, width, height),
        )

        lrs = self._current_lrs(kf)
        self.state, self.opt_state, metrics = train_step(
            self.state, self.opt_state, kf.matrices,
            gt, mask, lrs, self.bg_color,
            jnp.float32(o.lambda_dssim), settings,
        )

        # Densify / prune on schedule (reference: 721-730).
        if it < o.densify_until_iter:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                size_threshold = 20 if it > o.prune_big_point_after_iter else 0
                self._ensure_capacity()
                self.key, sub = jax.random.split(self.key)
                self.state, self.opt_state, info = densify_step(
                    self.state, self.opt_state, sub,
                    jnp.float32(self.scene.cameras_extent),
                    grad_threshold=o.densify_grad_threshold,
                    min_opacity=o.densify_min_opacity,
                    max_screen_size=size_threshold,
                    percent_dense=o.percent_dense,
                )
                self.metrics.num_dropped += int(info.num_dropped)

            if allow_opacity_reset and o.opacity_reset_interval and (
                it % o.opacity_reset_interval == 0
                or (self.cfg.model.white_background and it == o.densify_from_iter)
            ):
                self.state, self.opt_state = opacity_reset_step(
                    self.state, self.opt_state)

        self.metrics.iteration = it
        if fetch_metrics:
            loss = float(metrics["loss"])
            self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
            self.metrics.last_loss = loss
            self.metrics.ema_loss = self.ema_loss
            self.metrics.last_psnr = float(metrics["psnr"])
            self.metrics.num_live = int(gm.num_live(self.state))
        return {k: v for k, v in metrics.items()}

    def train_iteration_batched(self, kfs: list[Keyframe],
                                fetch_metrics: bool = True,
                                allow_opacity_reset: bool = True
                                ) -> dict[str, Any]:
        """One multi-view optimization step over B keyframes (all at full
        resolution with a shared camera). Single-chip the B views run as a
        gradient-accumulation scan (per-view cost == the single-view step,
        one shared Adam update — a gradient-noise reducer, not a speedup);
        under a device mesh the batch axis shards one view per chip
        (parallel/sharding.py) — capability beyond the reference's strictly
        sequential per-view iterations."""
        import jax.numpy as jnp

        from photo_slam_tpu.ops.camera_math import CameraMatrices
        from photo_slam_tpu.parallel.sharding import train_step_batched

        if not kfs:
            return {}
        self.iteration += 1
        it = self.iteration
        o = self.cfg.opt
        if it % 1000 == 0 and self.default_sh < self.cfg.model.sh_degree:
            self.default_sh += 1

        cam0 = kfs[0].camera
        cams = CameraMatrices(
            viewmatrix=jnp.stack([k.matrices.viewmatrix for k in kfs]),
            full_proj=jnp.stack([k.matrices.full_proj for k in kfs]),
            cam_center=jnp.stack([k.matrices.cam_center for k in kfs]),
        )
        gts = jnp.stack([jnp.asarray(k.image) for k in kfs])
        masks = jnp.stack([jnp.asarray(k.camera.undistort_mask())
                           for k in kfs])
        r = self.cfg.renderer
        from photo_slam_tpu.ops.render import (default_render_mode,
                                               principal_for)
        mode = default_render_mode()
        k_dup, per_tile = r.caps_for_mode(mode)
        settings = RenderSettings(
            width=cam0.width, height=cam0.height,
            tan_fovx=float(np.tan(0.5 * cam0.fovx)),
            tan_fovy=float(np.tan(0.5 * cam0.fovy)),
            sh_degree=self.default_sh, tile=r.tile,
            max_tiles_per_gaussian=k_dup,
            max_per_tile=per_tile, tiles_per_chunk=r.tiles_per_chunk,
            mode=mode,
            principal=principal_for(cam0, cam0.width, cam0.height),
        )
        lrs = self._current_lrs(kfs[0])
        self.state, self.opt_state, metrics = train_step_batched(
            self.state, self.opt_state, cams, gts, masks, lrs, self.bg_color,
            jnp.float32(o.lambda_dssim), settings)

        # Densify / prune / opacity reset on the same schedule as the
        # single-view step (reference: src/gaussian_mapper.cpp:721-735) —
        # the batched step accumulates the same view-space stats.
        if it < o.densify_until_iter:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                size_threshold = 20 if it > o.prune_big_point_after_iter else 0
                self._ensure_capacity()
                self.key, sub = jax.random.split(self.key)
                self.state, self.opt_state, info = densify_step(
                    self.state, self.opt_state, sub,
                    jnp.float32(self.scene.cameras_extent),
                    grad_threshold=o.densify_grad_threshold,
                    min_opacity=o.densify_min_opacity,
                    max_screen_size=size_threshold,
                    percent_dense=o.percent_dense,
                )
                self.metrics.num_dropped += int(info.num_dropped)
            if allow_opacity_reset and o.opacity_reset_interval and (
                it % o.opacity_reset_interval == 0
                or (self.cfg.model.white_background
                    and it == o.densify_from_iter)
            ):
                self.state, self.opt_state = opacity_reset_step(
                    self.state, self.opt_state)

        self.metrics.iteration = it
        if fetch_metrics:
            loss = float(metrics["loss"])
            self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
            self.metrics.last_loss = loss
            self.metrics.ema_loss = self.ema_loss
            self.metrics.num_live = int(gm.num_live(self.state))
        return metrics

    # -- offline loop ------------------------------------------------------------

    def train(self, num_iterations: Optional[int] = None,
              log_every: int = 0) -> TrainerMetrics:
        """trainColmap-style offline loop
        (reference: src/gaussian_mapper.cpp:544-608)."""
        n = num_iterations or self.cfg.opt.max_num_iterations
        for _ in range(n):
            self.train_iteration()
            if log_every and self.iteration % log_every == 0:
                print(
                    f"[trainer] iter {self.iteration}: "
                    f"loss {self.metrics.last_loss:.4f} "
                    f"ema {self.ema_loss:.4f} "
                    f"psnr {self.metrics.last_psnr:.2f} "
                    f"live {self.metrics.num_live}"
                )
        return self.metrics

    # -- persistence --------------------------------------------------------------

    def save_ply(self, path) -> None:
        """3DGS checkpoint of live Gaussians (reference savePly,
        src/gaussian_model.cpp:956-1047)."""
        from photo_slam_tpu.utils import ply
        live = np.asarray(self.state.live)
        p = self.state.params
        ply.save_gaussian_ply(
            path,
            np.asarray(p.xyz)[live],
            np.asarray(p.features_dc)[live],
            np.asarray(p.features_rest)[live],
            np.asarray(p.opacity_logit)[live],
            np.asarray(p.log_scales)[live],
            np.asarray(p.quats)[live],
        )

    def save_checkpoint(self, path) -> None:
        """FULL training state checkpoint (map + optimizer moments + step +
        schedule state) for mid-training resume — capability beyond the
        reference, whose PLY checkpoints drop optimizer state
        (SURVEY.md §5: 'Optimizer state is NOT checkpointed')."""
        import numpy as np
        from pathlib import Path

        payload = {}
        for name, arr in self.state.params._asdict().items():
            payload[f"p_{name}"] = np.asarray(arr)
        for name, arr in [("live", self.state.live),
                          ("max_radii2d", self.state.max_radii2d),
                          ("xyz_grad_accum", self.state.xyz_grad_accum),
                          ("denom", self.state.denom),
                          ("exist_since_iter", self.state.exist_since_iter)]:
            payload[f"s_{name}"] = np.asarray(arr)
        for name, arr in self.opt_state.m._asdict().items():
            payload[f"m_{name}"] = np.asarray(arr)
        for name, arr in self.opt_state.v._asdict().items():
            payload[f"v_{name}"] = np.asarray(arr)
        payload["meta"] = np.array([
            self.iteration, self.default_sh, int(self.opt_state.step),
        ])
        payload["meta_f"] = np.array([
            self.ema_loss, self.spatial_lr_scale, self.position_lr_init_live,
        ])
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path, **payload)

    def load_checkpoint(self, path) -> None:
        import jax.numpy as jnp
        import numpy as np

        data = np.load(path)
        params = gm.GaussianParams(
            **{k: jnp.asarray(data[f"p_{k}"])
               for k in gm.GaussianParams._fields})
        self.state = gm.GaussianState(
            params=params,
            live=jnp.asarray(data["s_live"]),
            max_radii2d=jnp.asarray(data["s_max_radii2d"]),
            xyz_grad_accum=jnp.asarray(data["s_xyz_grad_accum"]),
            denom=jnp.asarray(data["s_denom"]),
            exist_since_iter=jnp.asarray(data["s_exist_since_iter"]),
        )
        self.opt_state = optim.AdamState(
            m=gm.GaussianParams(**{k: jnp.asarray(data[f"m_{k}"])
                                   for k in gm.GaussianParams._fields}),
            v=gm.GaussianParams(**{k: jnp.asarray(data[f"v_{k}"])
                                   for k in gm.GaussianParams._fields}),
            step=jnp.asarray(data["meta"][2], jnp.int32),
        )
        self.iteration = int(data["meta"][0])
        self.default_sh = int(data["meta"][1])
        self.ema_loss = float(data["meta_f"][0])
        self.spatial_lr_scale = float(data["meta_f"][1])
        self.position_lr_init_live = float(data["meta_f"][2])

    def load_ply(self, path) -> None:
        from photo_slam_tpu.utils import ply
        xyz, f_dc, f_rest, opac, log_s, quats = ply.load_gaussian_ply(path)
        n = xyz.shape[0]
        cap = max(self.cfg.renderer.initial_capacity, gm.round_capacity(n))
        sh_deg = int(round((f_rest.shape[1] + 1) ** 0.5)) - 1
        state = gm.empty_state(cap, sh_degree=sh_deg)
        params = state.params._replace(
            xyz=state.params.xyz.at[:n].set(xyz),
            features_dc=state.params.features_dc.at[:n].set(f_dc),
            features_rest=state.params.features_rest.at[:n].set(f_rest),
            opacity_logit=state.params.opacity_logit.at[:n].set(opac),
            log_scales=state.params.log_scales.at[:n].set(log_s),
            quats=state.params.quats.at[:n].set(quats),
        )
        self.state = state._replace(params=params,
                                    live=state.live.at[:n].set(True))
        self.opt_state = optim.init_adam(self.state.params)
        self.default_sh = sh_deg
