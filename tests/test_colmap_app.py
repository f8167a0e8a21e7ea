"""COLMAP reader round-trip + offline app slice + reference YAML config."""
import numpy as np
import pytest

from photo_slam_tpu.config import Config, load_reference_yaml, parse_cv_yaml
from photo_slam_tpu.io import colmap


class TestColmapIO:
    def test_roundtrip(self, tmp_path):
        cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                       np.array([60.0, 60.0, 32.0, 24.0]))}
        rng = np.random.RandomState(0)
        images = {}
        for i in range(3):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            images[i + 1] = colmap.ColmapImage(
                image_id=i + 1, quat_wxyz=q, trans=rng.randn(3),
                camera_id=1, name=f"frame_{i:03d}.png",
                xys=rng.rand(5, 2) * 64,
                point3d_ids=np.array([1, 2, -1, 3, -1], np.int64))
        ids = np.array([1, 2, 3], np.int64)
        xyz = rng.randn(3, 3)
        rgb = rng.rand(3, 3)

        colmap.write_cameras_bin(tmp_path / "cameras.bin", cams)
        colmap.write_images_bin(tmp_path / "images.bin", images)
        colmap.write_points3d_bin(tmp_path / "points3D.bin", ids, xyz, rgb)

        cams2, images2, (ids2, xyz2, rgb2) = colmap.load_reconstruction(tmp_path)
        assert cams2[1].model == "PINHOLE"
        assert cams2[1].width == 64
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        for i in images:
            np.testing.assert_allclose(images2[i].quat_wxyz,
                                       images[i].quat_wxyz)
            np.testing.assert_allclose(images2[i].xys, images[i].xys)
            np.testing.assert_array_equal(images2[i].point3d_ids,
                                          images[i].point3d_ids)
            assert images2[i].name == images[i].name
        np.testing.assert_array_equal(ids2, ids)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_allclose(rgb2, rgb, atol=1 / 255.0)


class TestReferenceYaml:
    def test_parse_cv_yaml(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text(
            "%YAML:1.0\n"
            "# comment\n"
            "Model.sh_degree: 3 # maximum\n"
            "Optimization.position_lr_init: 0.00032\n"
            "Mapper.inactive_geo_densify: 1\n"
            'Some.string: "hello"\n'
        )
        d = parse_cv_yaml(p)
        assert d["Model.sh_degree"] == 3
        assert d["Optimization.position_lr_init"] == pytest.approx(0.00032)
        assert d["Mapper.inactive_geo_densify"] == 1
        assert d["Some.string"] == "hello"

    def test_load_reference_config_file(self):
        """Load the actual upstream Replica RGBD config."""
        path = ("/root/reference/cfg/gaussian_mapper/RGB-D/Replica/"
                "replica_rgbd.yaml")
        import os
        if not os.path.exists(path):
            pytest.skip("reference tree not mounted")
        cfg = load_reference_yaml(path)
        assert cfg.model.sh_degree == 3
        assert cfg.opt.max_num_iterations == 30100
        assert cfg.opt.position_lr_init == pytest.approx(0.00032)
        assert cfg.opt.densify_from_iter == 600
        assert cfg.opt.densify_grad_threshold == pytest.approx(0.001)
        assert cfg.mapper.min_num_initial_map_kfs == 10
        assert cfg.mapper.new_keyframe_times_of_use == 8
        assert cfg.mapper.do_gaus_pyramid_training is True
        assert cfg.mapper.num_gaus_pyramid_sub_levels == 2
        assert cfg.record.record_rendered_image is True
        assert cfg.opt.opacity_reset_interval == 0

    def test_dataset_config_matches_reference_yaml(self):
        """dataset_config() (the no---cfg app default) must equal loading the
        corresponding shipped reference YAML."""
        import os

        from photo_slam_tpu.config import dataset_config
        base = "/root/reference/cfg/gaussian_mapper"
        pairs = {
            "replica_rgbd": "RGB-D/Replica/replica_rgbd.yaml",
            "replica_mono": "Monocular/Replica/replica_mono.yaml",
            "tum_rgbd": "RGB-D/TUM/tum_rgbd.yaml",
            "tum_mono": "Monocular/TUM/tum_mono.yaml",
            "euroc_stereo": "Stereo/EuRoC/EuRoC.yaml",
        }
        if not os.path.exists(base):
            pytest.skip("reference tree not mounted")
        for app, rel in pairs.items():
            ref = load_reference_yaml(os.path.join(base, rel))
            got = dataset_config(app)
            for field in ("opacity_reset_interval", "densify_grad_threshold",
                          "densify_min_opacity", "densify_from_iter",
                          "densify_until_iter", "max_num_iterations",
                          "position_lr_init", "position_lr_final",
                          "prune_big_point_after_iter"):
                assert getattr(got.opt, field) == pytest.approx(
                    getattr(ref.opt, field)), (app, field)
            for field in ("min_num_initial_map_kfs",
                          "new_keyframe_times_of_use",
                          "local_BA_increased_times_of_use",
                          "large_rotation_threshold",
                          "large_translation_threshold",
                          "inactive_geo_densify", "max_depth_cached"):
                assert getattr(got.mapper, field) == pytest.approx(
                    getattr(ref.mapper, field)), (app, field)
            if app == "euroc_stereo":
                assert got.mapper.stereo_min_disparity == \
                    ref.mapper.stereo_min_disparity


class TestTrainColmapApp:
    @pytest.fixture()
    def colmap_dataset(self, tmp_path):
        """Synthesize a tiny COLMAP dataset with rendered GT images."""
        import jax.numpy as jnp
        from photo_slam_tpu.io.images import save_image_chw
        from photo_slam_tpu.ops.camera_math import build_camera_matrices
        from photo_slam_tpu.ops.render import RenderSettings, render
        from photo_slam_tpu.utils.math import quat_to_rotmat

        W, H, F = 64, 48, 60.0
        rng = np.random.RandomState(1)
        n = 50
        pts = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
                        rng.uniform(4, 7, n)], 1).astype(np.float32)
        scales = rng.uniform(0.1, 0.3, (n, 3)).astype(np.float32)
        quats = rng.randn(n, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = rng.uniform(0.5, 0.9, n).astype(np.float32)
        cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)

        sparse = tmp_path / "sparse" / "0"
        sparse.mkdir(parents=True)
        imgdir = tmp_path / "images"
        imgdir.mkdir()

        cams = {1: colmap.ColmapCamera(
            1, "PINHOLE", W, H, np.array([F, F, W / 2, H / 2]))}
        images = {}
        settings = RenderSettings(width=W, height=H, tan_fovx=W / (2 * F),
                                  tan_fovy=H / (2 * F))
        for i, dx in enumerate((-0.3, 0.0, 0.3)):
            q = np.array([1.0, 0, 0, 0])
            t = np.array([dx, 0.0, 0.0])
            mats = build_camera_matrices(
                np.asarray(quat_to_rotmat(jnp.asarray(q))), t, 0.01, 100.0,
                2 * np.arctan(W / (2 * F)), 2 * np.arctan(H / (2 * F)))
            res = render(jnp.asarray(pts), jnp.asarray(scales),
                         jnp.asarray(quats), jnp.asarray(opac), mats,
                         settings, jnp.zeros(3),
                         colors_precomp=jnp.asarray(cols))
            name = f"frame_{i:03d}.png"
            save_image_chw(imgdir / name, np.asarray(res.image))
            images[i + 1] = colmap.ColmapImage(
                image_id=i + 1, quat_wxyz=q, trans=t, camera_id=1, name=name,
                xys=np.zeros((0, 2)), point3d_ids=np.zeros(0, np.int64))

        colmap.write_cameras_bin(sparse / "cameras.bin", cams)
        colmap.write_images_bin(sparse / "images.bin", images)
        colmap.write_points3d_bin(sparse / "points3D.bin",
                                  np.arange(n), pts, cols)
        return tmp_path

    @pytest.mark.slow
    def test_app_runs_end_to_end(self, colmap_dataset, tmp_path):
        from photo_slam_tpu.apps.train_colmap import main
        out = tmp_path / "out"
        main(["--data", str(colmap_dataset), "--out", str(out),
              "--iters", "30", "--log-every", "0"])
        import json
        summary = json.loads((out / "summary.json").read_text())
        assert summary["iterations"] == 30
        assert np.isfinite(summary["ema_loss"])
        plys = list((out / "point_cloud").rglob("point_cloud.ply"))
        assert len(plys) == 1
        assert (out / "input.ply").exists()
