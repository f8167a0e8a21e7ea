"""Generate a synthetic Replica-format RGBD sequence for end-to-end soaks.

A textured splat cylinder-room (full angular coverage) viewed by a camera
that pans out and back with a small circular translation — the return sweep
revisits the start views, so the sequence contains a genuine loop-closure
opportunity. Frames render through the production renderer; depth is the
analytic cylinder intersection. Output layout matches the Photo-SLAM Replica
packaging (<seq>/results/frame*.jpg depth*.png + traj.txt with 4x4
camera-to-world rows; reference: examples/replica_rgbd.cpp loader).

Hardening (so the soak is not self-graded on the repo's own clean renders):
the world is textured from a photographic-statistics atlas (bench.photo_atlas
— real photo + 1/f noise) instead of uniform random splat colors, and the
WRITTEN frames carry a sensor model (exposure drift, shot noise, motion blur
on every third frame — bench.corrupt_frame) by default; pass --clean to get
the raw renders. GT depth stays analytic and exact, like a dataset's GT.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/gen_synth_replica.py \
           <out_dir> [num_frames] [width] [height] [--clean]
"""
import sys
from pathlib import Path

import numpy as np


CYL_R = 5.0


def cylinder_world(n=60000, seed=3):
    from bench import photo_atlas, photo_colors

    rng = np.random.RandomState(seed)
    phi = rng.uniform(-np.pi, np.pi, n)
    y = rng.uniform(-2.2, 2.2, n)
    r = CYL_R + rng.uniform(-0.12, 0.12, n)
    pts = np.stack([r * np.sin(phi), y, r * np.cos(phi)], 1).astype(
        np.float32)
    scales = np.full((n, 3), 0.045, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(0.75, 0.98, n).astype(np.float32)
    cols = photo_colors(pts, photo_atlas()).astype(np.float32)
    return pts, scales, quats, opac, cols


def main():
    import cv2
    import jax.numpy as jnp

    from photo_slam_tpu.io.datasets import REPLICA_DEPTH_SCALE
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.render import RenderSettings, render

    from bench import corrupt_frame

    argv = [a for a in sys.argv[1:] if a != "--clean"]
    clean = "--clean" in sys.argv[1:]
    out = Path(argv[0] if len(argv) > 0 else "/tmp/synth_replica")
    num = int(argv[1]) if len(argv) > 1 else 120
    width = int(argv[2]) if len(argv) > 2 else 640
    height = int(argv[3]) if len(argv) > 3 else 480
    sensor_rng = np.random.RandomState(99)
    # Focal scaled from the Replica camera so the loader's intrinsics
    # rescaling (io/datasets.ReplicaDataset) reproduces it exactly.
    fx = 600.0 * width / 1200.0
    fy = 600.0 * height / 680.0
    cx = (599.5 + 0.5) * width / 1200.0 - 0.5
    cy = (339.5 + 0.5) * height / 680.0 - 0.5
    fovx = 2 * np.arctan(width / (2 * fx))
    fovy = 2 * np.arctan(height / (2 * fy))

    world = cylinder_world()
    pts, scales, quats, opac, cols = world
    settings = RenderSettings(width=width, height=height,
                              tan_fovx=float(np.tan(fovx / 2)),
                              tan_fovy=float(np.tan(fovy / 2)),
                              max_per_tile=1024, max_tiles_per_gaussian=8,
                              mode="pallas")

    results = out / "results"
    results.mkdir(parents=True, exist_ok=True)
    half = num // 2
    yaw_max = 1.1
    traj = []
    u, v = np.meshgrid(np.arange(width), np.arange(height))
    for i in range(num):
        f = i / max(half, 1)
        yaw = yaw_max * (f if i < half else max(2.0 - f, 0.0))
        cy_, sy_ = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy_, 0, -sy_], [0, 1, 0], [sy_, 0, cy_]])
        # Small circular translation for parallax (camera center in world).
        c_w = np.array([0.25 * np.sin(2 * np.pi * i / num),
                        0.05 * np.sin(4 * np.pi * i / num),
                        0.25 * np.cos(2 * np.pi * i / num) - 0.25])
        t = -R @ c_w  # world->camera translation
        mats = build_camera_matrices(R, t, 0.01, 100.0, fovx, fovy)
        res = render(jnp.asarray(pts), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), mats, settings,
                     jnp.zeros(3), colors_precomp=jnp.asarray(cols))
        chw = np.asarray(res.image)
        if not clean:
            chw = corrupt_frame(chw, i, sensor_rng)
        img = (np.clip(np.transpose(chw, (1, 2, 0)), 0, 1)
               * 255).astype(np.uint8)
        cv2.imwrite(str(results / f"frame{i:06d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        # Analytic cylinder z-depth: ray o + s*d hits |radial| = CYL_R.
        d_cam = np.stack([(u - cx) / fx, (v - cy) / fy,
                          np.ones((height, width))], -1)
        d_w = d_cam @ R  # rows: R^T d_cam
        ox, oz = c_w[0], c_w[2]
        a = d_w[..., 0] ** 2 + d_w[..., 2] ** 2
        b = 2 * (ox * d_w[..., 0] + oz * d_w[..., 2])
        c0 = ox * ox + oz * oz - CYL_R * CYL_R
        disc = np.maximum(b * b - 4 * a * c0, 0.0)
        s = (-b + np.sqrt(disc)) / np.maximum(2 * a, 1e-12)
        depth = (s * 1.0).astype(np.float32)  # d_cam_z == 1 -> z-depth == s
        d16 = np.clip(depth * REPLICA_DEPTH_SCALE, 0, 65535).astype(
            np.uint16)
        cv2.imwrite(str(results / f"depth{i:06d}.png"), d16)
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = c_w
        traj.append(c2w.reshape(-1))
        if i % 20 == 0:
            print(f"frame {i}/{num}", flush=True)
    np.savetxt(out / "traj.txt", np.stack(traj))
    print(f"wrote {num} frames -> {out}", flush=True)


if __name__ == "__main__":
    main()
