"""Full-state checkpoint/resume: training continues bit-exactly."""
import numpy as np
import pytest

from photo_slam_tpu.config import Config
from photo_slam_tpu.mapper.trainer import GaussianTrainer
from photo_slam_tpu.models.camera import PINHOLE, Camera
from photo_slam_tpu.models.keyframe import Keyframe
from photo_slam_tpu.models.scene import Scene

W, H = 64, 48


def make_trainer(seed=0):
    cfg = Config()
    cfg.renderer.initial_capacity = 256
    cfg.mapper.do_gaus_pyramid_training = False
    cfg.opt.densify_from_iter = 10**9
    cam = Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                 fx=60.0, fy=60.0, cx=W / 2, cy=H / 2)
    scene = Scene()
    scene.add_camera(cam)
    rng = np.random.RandomState(7)
    kf = Keyframe(fid=0, camera=cam)
    kf.set_pose(np.array([1.0, 0, 0, 0]), np.zeros(3))
    kf.set_image(rng.rand(3, H, W).astype(np.float32))
    kf.remaining_times_of_use = 10**9
    scene.add_keyframe(kf)
    trainer = GaussianTrainer(cfg, scene, seed=seed)
    pts = np.stack([rng.uniform(-1, 1, 50), rng.uniform(-0.8, 0.8, 50),
                    rng.uniform(4, 6, 50)], 1).astype(np.float32)
    trainer.initialize_map(pts, rng.rand(50, 3).astype(np.float32))
    return trainer


def test_resume_is_bit_exact(tmp_path):
    t1 = make_trainer()
    for _ in range(5):
        t1.train_iteration()
    ckpt = tmp_path / "state.npz"
    t1.save_checkpoint(ckpt)

    # Continue original for 3 more steps.
    for _ in range(3):
        t1.train_iteration()

    # Resume a fresh trainer from the checkpoint and run the same 3 steps.
    t2 = make_trainer()
    t2.load_checkpoint(ckpt)
    assert t2.iteration == 5
    for _ in range(3):
        t2.train_iteration()

    a = np.asarray(t1.state.params.xyz)
    b = np.asarray(t2.state.params.xyz)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(t1.opt_state.m.xyz),
                                  np.asarray(t2.opt_state.m.xyz))
    assert int(t1.opt_state.step) == int(t2.opt_state.step)


def test_checkpoint_preserves_counts(tmp_path):
    t1 = make_trainer()
    t1.train_iteration()
    ckpt = tmp_path / "s.npz"
    t1.save_checkpoint(ckpt)
    t2 = make_trainer(seed=9)
    t2.load_checkpoint(ckpt)
    assert int(np.asarray(t2.state.live).sum()) == int(
        np.asarray(t1.state.live).sum())
    assert t2.default_sh == t1.default_sh
    assert t2.ema_loss == pytest.approx(t1.ema_loss)
