"""Gaussian-pyramid coarse-to-fine training path (GausPyramid.* behavior)."""
import numpy as np
import pytest

from photo_slam_tpu.config import Config
from photo_slam_tpu.mapper.trainer import GaussianTrainer
from photo_slam_tpu.models.camera import PINHOLE, Camera
from photo_slam_tpu.models.keyframe import Keyframe
from photo_slam_tpu.models.scene import Scene

W, H = 64, 48


def test_pyramid_levels_schedule():
    cam = Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                 fx=60.0, fy=60.0, cx=W / 2, cy=H / 2)
    kf = Keyframe(fid=0, camera=cam)
    kf.set_pose(np.array([1.0, 0, 0, 0]), np.zeros(3))
    img = np.random.RandomState(0).rand(3, H, W).astype(np.float32)
    kf.set_image(img, num_sub_levels=2, sub_level_times_of_use=2)
    # Level budget: 2x level 0, 2x level 1, then full resolution forever
    # (reference: src/gaussian_keyframe.cpp:206-216).
    levels = [kf.current_pyramid_level() for _ in range(6)]
    assert levels == [0, 0, 1, 1, 2, 2]
    assert kf.level_image(0).shape == (3, H // 4, W // 4)
    assert kf.level_image(1).shape == (3, H // 2, W // 2)
    assert kf.level_image(2).shape == (3, H, W)


def test_training_across_pyramid_levels():
    """The trainer must handle per-level image sizes (separate jit variants)
    without error and still reduce the loss."""
    cfg = Config()
    cfg.renderer.initial_capacity = 512
    cfg.mapper.do_gaus_pyramid_training = True
    cfg.mapper.num_gaus_pyramid_sub_levels = 2
    cfg.mapper.gaus_pyramid_sub_level_times_of_use = 2
    cfg.opt.densify_from_iter = 10**9

    cam = Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                 fx=60.0, fy=60.0, cx=W / 2, cy=H / 2)
    scene = Scene()
    scene.add_camera(cam)
    rng = np.random.RandomState(0)
    kf = Keyframe(fid=0, camera=cam)
    kf.set_pose(np.array([1.0, 0, 0, 0]), np.zeros(3))
    img = np.zeros((3, H, W), np.float32)
    img[0] = 0.8  # solid-ish target
    kf.set_image(img, num_sub_levels=2, sub_level_times_of_use=2)
    kf.remaining_times_of_use = 10**9
    scene.add_keyframe(kf)

    trainer = GaussianTrainer(cfg, scene)
    pts = np.stack([rng.uniform(-1, 1, 60), rng.uniform(-0.8, 0.8, 60),
                    rng.uniform(4, 6, 60)], 1).astype(np.float32)
    trainer.initialize_map(pts, rng.rand(60, 3).astype(np.float32))

    losses = []
    for _ in range(8):  # crosses level 0 -> 1 -> 2 boundaries
        m = trainer.train_iteration()
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # Coarse-to-fine ran three different image sizes; final losses lower than
    # the first at the same (full) resolution is not guaranteed in 8 iters,
    # but the loop must not blow up and the map must stay finite.
    import jax
    for leaf in jax.tree.leaves(trainer.state.params):
        assert np.isfinite(np.asarray(leaf)).all()
