"""End-to-end training slice: fit a synthetic scene and verify convergence,
densification scheduling, capacity growth, and PLY checkpointing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photo_slam_tpu.config import Config
from photo_slam_tpu.mapper.trainer import GaussianTrainer
from photo_slam_tpu.models.camera import PINHOLE, Camera
from photo_slam_tpu.models.keyframe import Keyframe
from photo_slam_tpu.models.scene import Scene
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render
from photo_slam_tpu.utils.math import quat_to_rotmat

W, H = 64, 48
FX = FY = 60.0


def make_camera():
    return Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                  fx=FX, fy=FY, cx=W / 2, cy=H / 2)


def gt_model(n=60, seed=3):
    rng = np.random.RandomState(seed)
    pts = np.stack([
        rng.uniform(-1.5, 1.5, n), rng.uniform(-1.2, 1.2, n),
        rng.uniform(4.0, 7.0, n),
    ], 1).astype(np.float32)
    scales = rng.uniform(0.08, 0.25, (n, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.5, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    return pts, scales, quats, opac, colors


def render_gt(pts, scales, quats, opac, colors, cam_matrices):
    settings = RenderSettings(width=W, height=H,
                              tan_fovx=W / (2 * FX), tan_fovy=H / (2 * FY))
    res = render(jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
                 jnp.asarray(opac), cam_matrices, settings, jnp.zeros(3),
                 colors_precomp=jnp.asarray(colors))
    return np.asarray(res.image)


def poses():
    out = []
    for dx in (-0.3, 0.0, 0.3):
        R = np.eye(3)
        t = np.array([dx, 0.0, 0.0])
        out.append((R, t))
    return out


@pytest.fixture(scope="module")
def trained():
    cfg = Config()
    cfg.renderer.initial_capacity = 512
    cfg.opt.densify_from_iter = 20
    cfg.opt.densification_interval = 25
    cfg.opt.densify_until_iter = 100
    cfg.opt.opacity_reset_interval = 0
    cfg.opt.position_lr_max_steps = 150
    cfg.mapper.do_gaus_pyramid_training = False

    cam = make_camera()
    scene = Scene()
    scene.add_camera(cam)

    pts, scales, quats, opac, colors = gt_model()
    gts = []
    for i, (R, t) in enumerate(poses()):
        kf = Keyframe(fid=i, camera=cam)
        kf.set_pose(np.array([1.0, 0, 0, 0]), t)
        gt = render_gt(pts, scales, quats, opac, colors, kf.matrices)
        kf.set_image(gt)
        kf.remaining_times_of_use = 10**9
        scene.add_keyframe(kf)
        gts.append(gt)

    trainer = GaussianTrainer(cfg, scene, seed=0)
    # Initialize from the true points with noisy colors (SLAM-like sparse init).
    rng = np.random.RandomState(0)
    init_cols = np.clip(colors + rng.randn(*colors.shape) * 0.2, 0, 1)
    trainer.initialize_map(pts.astype(np.float32),
                           init_cols.astype(np.float32))
    psnr0 = float(trainer.train_iteration()["psnr"])
    trainer.train(num_iterations=149)
    return trainer, gts, psnr0


class TestEndToEnd:
    def test_psnr_improves(self, trained):
        trainer, gts, psnr0 = trained
        assert trainer.metrics.last_psnr > psnr0 + 3.0, (
            f"PSNR did not improve: {psnr0:.2f} -> {trainer.metrics.last_psnr:.2f}")
        assert trainer.metrics.last_psnr > 20.0

    def test_loss_finite_and_small(self, trained):
        trainer, _, _ = trained
        assert np.isfinite(trainer.metrics.ema_loss)
        assert trainer.metrics.ema_loss < 0.1

    def test_densification_ran(self, trained):
        trainer, _, _ = trained
        # Densify events should have changed the live count from 60.
        assert trainer.metrics.num_live != 60 or trainer.metrics.num_dropped > 0

    def test_state_finite(self, trained):
        trainer, _, _ = trained
        for leaf in jax.tree.leaves(trainer.state.params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_ply_checkpoint_roundtrip(self, trained, tmp_path):
        trainer, gts, _ = trained
        p = tmp_path / "ckpt.ply"
        trainer.save_ply(p)

        cfg2 = Config()
        cfg2.renderer.initial_capacity = 512
        trainer2 = GaussianTrainer(cfg2, trainer.scene, seed=1)
        trainer2.load_ply(p)
        assert int(np.asarray(trainer2.state.live).sum()) == trainer.metrics.num_live

        # Rendering from the restored state reproduces the same image.
        kf = trainer.scene.keyframes[0]
        from photo_slam_tpu.models.gaussian_model import activated, sh_features
        settings = RenderSettings(width=W, height=H, tan_fovx=W / (2 * FX),
                                  tan_fovy=H / (2 * FY),
                                  sh_degree=trainer.default_sh)

        def img_of(state):
            s, q, o = activated(state.params)
            res = render(state.params.xyz, s, q, o, kf.matrices, settings,
                         jnp.zeros(3), shs=sh_features(state.params),
                         live_mask=state.live)
            return np.asarray(res.image)

        a = img_of(trainer.state)
        b = img_of(trainer2.state)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_capacity_growth(self):
        cfg = Config()
        cfg.renderer.initial_capacity = 64
        scene = Scene()
        cam = make_camera()
        scene.add_camera(cam)
        kf = Keyframe(fid=0, camera=cam)
        kf.set_pose(np.array([1.0, 0, 0, 0]), np.zeros(3))
        kf.set_image(np.zeros((3, H, W), np.float32))
        kf.remaining_times_of_use = 10**9
        scene.add_keyframe(kf)
        trainer = GaussianTrainer(cfg, scene)
        rng = np.random.RandomState(0)
        trainer.initialize_map(
            rng.randn(40, 3).astype(np.float32) + [0, 0, 5],
            rng.rand(40, 3).astype(np.float32))
        cap0 = trainer.state.capacity
        inserted = trainer.increase_pcd(
            rng.randn(100, 3).astype(np.float32) + [0, 0, 5],
            rng.rand(100, 3).astype(np.float32))
        assert inserted == 100
        assert trainer.state.capacity > cap0
        assert int(np.asarray(trainer.state.live).sum()) == 140


class TestTrainChunk:
    """train_chunk == the same sequence of train_step calls (one dispatch
    vs num_steps dispatches; the offline protocol loops use the chunk)."""

    def test_chunk_matches_sequential_steps(self):
        from photo_slam_tpu.mapper.trainer import train_chunk, train_step
        from photo_slam_tpu.models import gaussian_model as gm
        from photo_slam_tpu.models import optimizer as optim

        pts, scales, quats, opac, colors = gt_model(n=40, seed=5)
        cams = []
        gts = []
        for R, t in poses():
            cm = build_camera_matrices(R, t, 0.01, 100.0,
                                       2 * np.arctan(W / (2 * FX)),
                                       2 * np.arctan(H / (2 * FY)))
            cams.append(cm)
            gts.append(render_gt(pts, scales, quats, opac, colors, cm))

        rng = np.random.RandomState(1)
        init = pts + rng.randn(*pts.shape).astype(np.float32) * 0.05
        settings = RenderSettings(width=W, height=H, tan_fovx=W / (2 * FX),
                                  tan_fovy=H / (2 * FY), sh_degree=0)
        lrs = optim.LearningRates.create(1.6e-4, 2.5e-3, 0.05, 5e-3, 1e-3)
        mask = jnp.ones((H, W), jnp.float32)
        bg = jnp.zeros(3)
        lam = jnp.float32(0.2)
        num_steps = 7
        start = 2  # exercise a non-zero ring offset

        def fresh():
            st = gm.create_from_pcd(init, np.full_like(init, 0.5),
                                    sh_degree=0, capacity=64)
            return st, optim.init_adam(st.params)

        # Sequential reference.
        st_a, opt_a = fresh()
        for j in range(num_steps):
            v = (start + j) % len(cams)
            st_a, opt_a, m_a = train_step(st_a, opt_a, cams[v],
                                          jnp.asarray(gts[v]), mask, lrs,
                                          bg, lam, settings)

        # One chunk dispatch.
        st_b, opt_b = fresh()
        cams_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        gts_stack = jnp.stack([jnp.asarray(g) for g in gts])
        st_b, opt_b, metrics = train_chunk(
            st_b, opt_b, cams_stack, gts_stack, mask, lrs, bg, lam,
            jnp.int32(start), settings, num_steps)

        for la, lb in zip(jax.tree.leaves(st_a.params),
                          jax.tree.leaves(st_b.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-6, rtol=1e-5)
        for la, lb in zip(jax.tree.leaves(opt_a), jax.tree.leaves(opt_b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-6, rtol=1e-5)
        assert metrics["loss"].shape == (num_steps,)
        np.testing.assert_allclose(float(metrics["loss"][-1]),
                                   float(m_a["loss"]), atol=1e-6, rtol=1e-5)
        # Densify stats accumulated identically (they feed the protocol).
        np.testing.assert_allclose(np.asarray(st_a.xyz_grad_accum),
                                   np.asarray(st_b.xyz_grad_accum),
                                   atol=1e-6, rtol=1e-5)
