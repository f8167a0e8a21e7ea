"""Multi-view batched training through the trainer API."""
import numpy as np

from photo_slam_tpu.config import Config
from photo_slam_tpu.mapper.trainer import GaussianTrainer
from photo_slam_tpu.models.camera import PINHOLE, Camera
from photo_slam_tpu.models.keyframe import Keyframe
from photo_slam_tpu.models.scene import Scene

W, H = 64, 48


def test_batched_iteration_trains():
    cfg = Config()
    cfg.renderer.initial_capacity = 256
    cfg.mapper.do_gaus_pyramid_training = False
    cam = Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                 fx=60.0, fy=60.0, cx=W / 2, cy=H / 2)
    scene = Scene()
    scene.add_camera(cam)
    rng = np.random.RandomState(0)
    kfs = []
    for i in range(4):
        kf = Keyframe(fid=i, camera=cam)
        kf.set_pose(np.array([1.0, 0, 0, 0]), np.array([0.05 * i, 0, 0]))
        kf.set_image(np.full((3, H, W), 0.6, np.float32))
        kf.remaining_times_of_use = 10**9
        scene.add_keyframe(kf)
        kfs.append(kf)
    trainer = GaussianTrainer(cfg, scene)
    pts = np.stack([rng.uniform(-1, 1, 40), rng.uniform(-0.8, 0.8, 40),
                    rng.uniform(4, 6, 40)], 1).astype(np.float32)
    trainer.initialize_map(pts, rng.rand(40, 3).astype(np.float32))

    losses = []
    for _ in range(6):
        m = trainer.train_iteration_batched(kfs)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # fitting a constant image converges fast
    assert trainer.iteration == 6
