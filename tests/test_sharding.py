"""Multi-chip sharding: batched train step over a virtual 8-device mesh."""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class TestMultichip:
    def test_mesh_has_8_devices(self):
        assert len(jax.devices()) == 8

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_dryrun_2_devices(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(2)

    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (3, 96, 128)
        assert np.isfinite(np.asarray(out)).all()

    def test_batched_matches_mean_of_single(self):
        """The multi-view loss equals the mean of per-view losses."""
        import jax.numpy as jnp

        import __graft_entry__ as ge
        from photo_slam_tpu.models import gaussian_model as gm
        from photo_slam_tpu.ops import losses
        from photo_slam_tpu.ops.camera_math import (CameraMatrices,
                                                    build_camera_matrices)
        from photo_slam_tpu.ops.render import RenderSettings, render
        from photo_slam_tpu.parallel.sharding import batched_loss

        width, height = 64, 48
        state, _, _, _, tanf = ge._make_scene(n=128, width=width,
                                              height=height)
        settings = RenderSettings(width=width, height=height, tan_fovx=tanf,
                                  tan_fovy=tanf * height / width, sh_degree=3,
                                  max_per_tile=128, max_tiles_per_gaussian=16,
                                  tiles_per_chunk=4)
        rng = np.random.RandomState(0)
        cams_list = [
            build_camera_matrices(np.eye(3), np.array([0.1 * i, 0, 0]),
                                  0.01, 100.0, 1.0, 1.0)
            for i in range(2)
        ]
        cams = CameraMatrices(
            viewmatrix=jnp.stack([c.viewmatrix for c in cams_list]),
            full_proj=jnp.stack([c.full_proj for c in cams_list]),
            cam_center=jnp.stack([c.cam_center for c in cams_list]),
        )
        gts = jnp.asarray(rng.rand(2, 3, height, width).astype(np.float32))
        masks = jnp.ones((2, height, width), jnp.float32)
        bg = jnp.zeros(3)
        lam = jnp.float32(0.2)

        total = batched_loss(state, cams, gts, masks, bg, lam, settings)
        offset0 = jnp.zeros((state.capacity, 2), jnp.float32)
        batch_val = float(total(state.params, offset0)[0])

        singles = []
        for i in range(2):
            scales, quats, opac = gm.activated(state.params)
            res = render(state.params.xyz, scales, quats, opac, cams_list[i],
                         settings, bg, shs=gm.sh_features(state.params),
                         live_mask=state.live)
            masked = res.image * masks[i][None]
            li = (1 - 0.2) * losses.l1_loss(masked, gts[i]) + 0.2 * (
                1 - losses.ssim(masked, gts[i]))
            singles.append(float(li))
        assert batch_val == pytest.approx(np.mean(singles), rel=1e-5)


def test_default_render_mode_cpu():
    """On the CPU test platform the mode helper must pick the jnp path
    (pallas would run interpreted); TPU runs pick 'pallas'."""
    from photo_slam_tpu.ops.render import default_render_mode
    assert default_render_mode() == "tiled"


class TestImageShardedRender:
    def test_matches_single_device_render(self):
        """Tile-stripe-parallel render == plain render (model replicated;
        per-band rasterization is exact as long as nothing clips)."""
        import numpy as np
        import jax.numpy as jnp
        from photo_slam_tpu.ops.camera_math import build_camera_matrices
        from photo_slam_tpu.ops.render import RenderSettings, render
        from photo_slam_tpu.parallel.sharding import (make_mesh,
                                                      render_image_sharded)

        rng = np.random.RandomState(0)
        n = 400
        means = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                          rng.uniform(3, 9, n)], 1).astype(np.float32)
        scales = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
        quats = rng.randn(n, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
        cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                    1.0, 0.8)
        settings = RenderSettings(width=96, height=128, tan_fovx=0.546,
                                  tan_fovy=0.422, mode="tiled", tile=16,
                                  max_per_tile=256,
                                  max_tiles_per_gaussian=64)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = render(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), cam, settings,
                     bg, colors_precomp=jnp.asarray(cols))
        mesh = make_mesh(4)
        img = render_image_sharded(
            mesh, jnp.asarray(means), jnp.asarray(scales),
            jnp.asarray(quats), jnp.asarray(opac), cam, settings, bg,
            colors_precomp=jnp.asarray(cols))
        assert img.shape == (3, 128, 96)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                                   atol=2e-5)
