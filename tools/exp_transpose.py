"""Experiment: entry_gather backward cost vs k_dup and routing dtype.

The backward transpose (ops/tiled._entry_gather_bwd) is the train step's
largest cost; its three stages (permutation sort, row gather, reshape-sum)
all scale with the entry-stream length N*k_dup. This measures the end-to-end
step time and binning fidelity counters across k_dup choices to pick the
production setting.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.ops.binning import bin_gaussians, tile_grid
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.preprocess import preprocess, tight_extents
from photo_slam_tpu.ops.render import RenderSettings, render
from photo_slam_tpu.ops.tiled import entry_gather
from photo_slam_tpu.ops.pallas.blend import FEAT
from bench_room import room_scene


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    pts, cols = room_scene(n)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, fovx,
                                fovx * height / width)
    params = state.params
    live = state.live
    bg = jnp.zeros(3)

    ks = [int(v) for v in sys.argv[1:]] or [12, 8, 6, 4]
    ref_img = None
    for k_dup in ks:
        settings = RenderSettings(
            width=width, height=height, tan_fovx=float(np.tan(fovx / 2)),
            tan_fovy=float(np.tan(fovx / 2) * height / width), sh_degree=3,
            mode="pallas", max_tiles_per_gaussian=k_dup, max_per_tile=1024)

        prep_fn = jax.jit(lambda p: preprocess(
            p.xyz, gm.activated(p)[0], gm.activated(p)[1],
            cam.viewmatrix, cam.full_proj, cam.cam_center,
            width, height, settings.tan_fovx, settings.tan_fovy,
            sh_degree=3, shs=gm.sh_features(p), live_mask=live))
        prep = prep_fn(params)
        opacities = gm.activated(params)[2]
        bin_fn = jax.jit(lambda pr: bin_gaussians(
            pr.means2d, pr.depths, pr.radii, pr.visible, width, height,
            tile=32, max_tiles_per_gaussian=k_dup, max_per_tile=1024,
            extents=tight_extents(pr.conics, opacities, pr.radii)))
        binning = timeit(f"k={k_dup} binning", bin_fn, prep)
        print(f"  clipped={int(binning.num_clipped)} "
              f"overflow={int(binning.num_overflow)} "
              f"entries={int(jnp.sum(binning.tile_counts))}", flush=True)

        feat = jnp.concatenate([
            prep.means2d, prep.conics, opacities[:, None], prep.rgb,
            jnp.zeros((n, FEAT - 9), jnp.float32)], axis=-1)
        data_tiles = entry_gather(feat, binning.tile_lists,
                                  binning.sorted_entries,
                                  binning.sorted_tiles, binning.starts,
                                  binning.tile_counts,
                                  binning.entry_counts, k_dup)
        gather_vjp = jax.jit(lambda f, b: jax.vjp(
            lambda ff: entry_gather(ff, b.tile_lists, b.sorted_entries,
                                    b.sorted_tiles, b.starts, b.tile_counts,
                                    b.entry_counts, k_dup), f)[1](data_tiles))
        timeit(f"k={k_dup} entry_gather bwd", gather_vjp, feat, binning)

        # Image fidelity vs k_dup=12.
        img = render(params.xyz, gm.activated(params)[0],
                     gm.activated(params)[1], opacities, cam, settings, bg,
                     shs=gm.sh_features(params), live_mask=live).image
        img = np.asarray(img)
        if ref_img is None:
            ref_img = img
        else:
            mse = float(np.mean((img - ref_img) ** 2))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            print(f"  psnr vs k12: {psnr:.2f} dB", flush=True)


if __name__ == "__main__":
    sys.exit(main())
