"""Per-keyframe quality recording: dssim / psnr / psnr_gs / render_time files.

Produces the same artifact set as the reference's renderAndRecordAllKeyframes
(reference: src/gaussian_mapper.cpp:1571-1656): per-keyframe metric text files
plus optional rendered/gt/loss images, so the Photo-SLAM-eval tooling flow
works unchanged.
"""
from __future__ import annotations

import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.ops import losses
from photo_slam_tpu.ops.render import RenderSettings, render_jit


def render_keyframe(mapper, kf):
    """Render one keyframe at full resolution from the current map."""
    from photo_slam_tpu.ops.render import default_render_mode

    cam = kf.camera
    mode = default_render_mode()
    k_dup, per_tile = mapper.cfg.renderer.caps_for_mode(mode)
    from photo_slam_tpu.ops.render import principal_for
    settings = RenderSettings(
        width=cam.width, height=cam.height,
        tan_fovx=float(np.tan(cam.fovx / 2)),
        tan_fovy=float(np.tan(cam.fovy / 2)),
        principal=principal_for(cam, cam.width, cam.height),
        sh_degree=mapper.trainer.default_sh,
        max_tiles_per_gaussian=k_dup,
        max_per_tile=per_tile,
        # Recorded metrics are the run's quality artifacts — render them
        # overflow-exact (continuation passes cost only where tiles overflow).
        overflow_passes=(mapper.cfg.renderer.record_overflow_passes
                         if mode == "pallas" else 1),
        mode=mode)
    state = mapper.trainer.state
    scales, quats, opac = gm.activated(state.params)
    res = render_jit(state.params.xyz, scales, quats, opac, kf.matrices,
                     settings, mapper.trainer.bg_color,
                     shs=gm.sh_features(state.params), live_mask=state.live)
    return res.image


def render_and_record_keyframes(mapper, out_dir, suffix: str = "") -> dict:
    out = Path(out_dir)
    rec = mapper.cfg.record
    metrics = {"dssim": [], "psnr": [], "psnr_gs": [], "render_time_ms": []}
    files = {k: [] for k in metrics}

    for fid, kf in sorted(mapper.scene.keyframes.items()):
        if kf.image is None or kf.matrices is None:
            continue
        t0 = time.time()
        img = render_keyframe(mapper, kf)
        img.block_until_ready()
        dt_ms = (time.time() - t0) * 1000.0
        mask = jnp.asarray(kf.camera.undistort_mask())
        masked = img * mask[None]
        gt = jnp.asarray(kf.image)
        dssim = float(1.0 - losses.ssim(masked, gt))
        p = float(losses.psnr(masked, gt))
        pgs = float(losses.psnr_gaussian_splatting(masked, gt))
        metrics["dssim"].append(dssim)
        metrics["psnr"].append(p)
        metrics["psnr_gs"].append(pgs)
        metrics["render_time_ms"].append(dt_ms)
        files["dssim"].append(f"{fid} {dssim:.6f}")
        files["psnr"].append(f"{fid} {p:.6f}")
        files["psnr_gs"].append(f"{fid} {pgs:.6f}")
        files["render_time_ms"].append(f"{fid} {dt_ms:.3f}")

        if rec.record_rendered_image:
            from photo_slam_tpu.io.images import save_image_chw
            save_image_chw(out / "image_rendered" / f"{fid}{suffix}.png",
                           np.asarray(masked))
        if rec.record_ground_truth_image:
            from photo_slam_tpu.io.images import save_image_chw
            save_image_chw(out / "image_gt" / f"{fid}{suffix}.png",
                           np.asarray(gt))
        if rec.record_loss_image:
            from photo_slam_tpu.io.images import save_image_chw
            save_image_chw(out / "image_loss" / f"{fid}{suffix}.png",
                           np.abs(np.asarray(masked) - np.asarray(gt)))

    out.mkdir(parents=True, exist_ok=True)
    name_map = {"dssim": "dssim.txt", "psnr": "psnr.txt",
                "psnr_gs": "psnr_gaussian_splatting.txt",
                "render_time_ms": "render_time.txt"}
    for k, fname in name_map.items():
        (out / (fname.replace(".txt", suffix + ".txt") if suffix else fname)
         ).write_text("\n".join(files[k]) + "\n")

    return {k: (float(np.mean(v)) if v else float("nan"))
            for k, v in metrics.items()}
