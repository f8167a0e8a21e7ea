"""Generate a synthetic COLMAP-format dataset (cameras/images/points3D.bin
+ rendered images) from the cylinder-room splat world — drives the offline
train_colmap product path at realistic scale (reference:
examples/train_colmap.cpp + scripts/colmap.sh).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/gen_synth_colmap.py \
           <out_dir> [num_views] [width] [height]
"""
import sys
from pathlib import Path

import numpy as np


def main():
    import jax.numpy as jnp

    from photo_slam_tpu.io import colmap
    from photo_slam_tpu.io.images import save_image_chw
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.render import RenderSettings, render
    from tools.gen_synth_replica import cylinder_world

    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_colmap")
    num = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    height = int(sys.argv[4]) if len(sys.argv) > 4 else 480
    f = 0.55 * width
    fovx = 2 * np.arctan(width / (2 * f))
    fovy = 2 * np.arctan(height / (2 * f))

    pts, scales, quats, opac, cols = cylinder_world()
    settings = RenderSettings(width=width, height=height,
                              tan_fovx=float(np.tan(fovx / 2)),
                              tan_fovy=float(np.tan(fovy / 2)),
                              max_per_tile=1024, max_tiles_per_gaussian=8,
                              mode="pallas")
    sparse = out / "sparse" / "0"
    sparse.mkdir(parents=True, exist_ok=True)
    imgdir = out / "images"
    imgdir.mkdir(exist_ok=True)

    from photo_slam_tpu.utils.math import rotmat_to_quat_numpy

    cams = {1: colmap.ColmapCamera(
        1, "PINHOLE", width, height,
        np.array([f, f, width / 2 - 0.5, height / 2 - 0.5]))}
    images = {}
    rng = np.random.RandomState(0)
    for i in range(num):
        yaw = 2 * np.pi * i / num
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
        c_w = np.array([0.4 * np.sin(yaw + 1.2), rng.uniform(-0.2, 0.2),
                        0.4 * np.cos(yaw + 1.2)])
        t = -R @ c_w
        mats = build_camera_matrices(R, t, 0.01, 100.0, fovx, fovy)
        res = render(jnp.asarray(pts), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), mats, settings,
                     jnp.zeros(3), colors_precomp=jnp.asarray(cols))
        name = f"frame_{i:04d}.png"
        save_image_chw(imgdir / name, np.asarray(res.image))
        images[i + 1] = colmap.ColmapImage(
            image_id=i + 1, quat_wxyz=rotmat_to_quat_numpy(R), trans=t,
            camera_id=1, name=name, xys=np.zeros((0, 2)),
            point3d_ids=np.zeros(0, np.int64))
        if i % 10 == 0:
            print(f"view {i}/{num}", flush=True)

    # Sparse init: a noisy subsample of the world (the role of COLMAP's SfM
    # triangulated points).
    sel = rng.choice(len(pts), 20000, replace=False)
    colmap.write_cameras_bin(sparse / "cameras.bin", cams)
    colmap.write_images_bin(sparse / "images.bin", images)
    colmap.write_points3d_bin(
        sparse / "points3D.bin", np.arange(len(sel)),
        pts[sel] + rng.randn(len(sel), 3).astype(np.float32) * 0.02,
        cols[sel])
    print(f"wrote {num} views -> {out}", flush=True)


if __name__ == "__main__":
    main()
