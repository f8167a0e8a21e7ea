"""View a saved map: load PLY + camera yaml, render requested poses.

Equivalent of the reference's view_result example
(reference: examples/view_result.cpp:43-69 + GaussianMapper::loadPly,
src/gaussian_mapper.cpp:1982-2055) with a headless surface: renders a sweep
of poses (or poses from cameras.json) to PNG files instead of an ImGui
window; the interactive path is photo_slam_tpu/viewer.

Usage:
  python -m photo_slam_tpu.apps.view_result --ply <point_cloud.ply> \
      --out <dir> [--cameras cameras.json] [--width 1200 --height 680]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from photo_slam_tpu.config import Config
from photo_slam_tpu.io.images import save_image_chw
from photo_slam_tpu.mapper.trainer import GaussianTrainer
from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.models.scene import Scene
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render_jit

import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cameras", default=None, help="cameras.json")
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--height", type=int, default=680)
    ap.add_argument("--fx", type=float, default=600.0)
    ap.add_argument("--fy", type=float, default=600.0)
    ap.add_argument("--max-views", type=int, default=10)
    args = ap.parse_args(argv)

    cfg = Config()
    trainer = GaussianTrainer(cfg, Scene())
    trainer.load_ply(args.ply)
    state = trainer.state
    n = int(np.asarray(state.live).sum())
    print(f"[view_result] loaded {n} gaussians from {args.ply}")

    fovx = 2 * np.arctan(args.width / (2 * args.fx))
    fovy = 2 * np.arctan(args.height / (2 * args.fy))
    settings = RenderSettings(
        width=args.width, height=args.height,
        tan_fovx=float(np.tan(fovx / 2)), tan_fovy=float(np.tan(fovy / 2)),
        sh_degree=trainer.default_sh, mode="pallas")

    views = []
    if args.cameras:
        for c in json.loads(Path(args.cameras).read_text())[: args.max_views]:
            Rwc = np.array(c["rotation"])
            twc = np.array(c["position"])
            Rcw = Rwc.T
            tcw = -Rcw @ twc
            views.append((c["img_name"], Rcw, tcw))
    else:
        for i in range(args.max_views):
            views.append((f"sweep_{i:03d}",
                          np.eye(3), np.array([0.15 * i, 0.0, 0.0])))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    scales, quats, opac = gm.activated(state.params)
    shs = gm.sh_features(state.params)
    for name, R, t in views:
        mats = build_camera_matrices(R, t, 0.01, 100.0, fovx, fovy)
        res = render_jit(state.params.xyz, scales, quats, opac, mats,
                         settings, jnp.zeros(3), shs=shs,
                         live_mask=state.live)
        save_image_chw(out / f"{Path(str(name)).stem}.png",
                       np.asarray(res.image))
    print(f"[view_result] wrote {len(views)} renders -> {out}")


if __name__ == "__main__":
    main()
