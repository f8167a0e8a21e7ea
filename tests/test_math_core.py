"""Golden tests for the math core: quaternions, SH, losses, camera matrices."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photo_slam_tpu.ops import camera_math, losses, sh
from photo_slam_tpu.utils import math as psmath


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


class TestQuat:
    def test_identity(self):
        R = psmath.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_round_trip(self):
        qs = rand_quats(jax.random.PRNGKey(0), 64)
        Rs = psmath.quat_to_rotmat(qs)
        qs2 = psmath.rotmat_to_quat(Rs)
        # q and -q are the same rotation
        dot = jnp.abs(jnp.sum(qs * qs2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_orthonormal(self):
        qs = rand_quats(jax.random.PRNGKey(1), 32)
        Rs = psmath.quat_to_rotmat(qs)
        eye = jnp.einsum("nij,nkj->nik", Rs, Rs)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                                   atol=1e-5)

    def test_multiply_matches_matmul(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        qa, qb = rand_quats(k1, 16), rand_quats(k2, 16)
        Rab = psmath.quat_to_rotmat(psmath.quat_multiply(qa, qb))
        RaRb = jnp.einsum("nij,njk->nik", psmath.quat_to_rotmat(qa),
                          psmath.quat_to_rotmat(qb))
        np.testing.assert_allclose(Rab, RaRb, atol=1e-5)

    def test_inverse_sigmoid(self):
        x = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            jax.nn.sigmoid(psmath.inverse_sigmoid(x)), x, atol=1e-6)

    def test_fov_focal_roundtrip(self):
        fov = psmath.focal2fov(600.0, 1200)
        assert abs(psmath.fov2focal(fov, 1200) - 600.0) < 1e-6


class TestSH:
    def test_dc_only(self):
        # degree 0: color = C0 * sh0 + 0.5
        shs = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
        means = jnp.array([[0.0, 0, 5]] * 4)
        campos = jnp.zeros(3)
        rgb = sh.sh_to_rgb(0, shs, means, campos)
        np.testing.assert_allclose(rgb, sh.SH_C0 + 0.5, atol=1e-6)

    def test_rgb2sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_to_rgb_dc(sh.rgb_to_sh(rgb)), rgb,
                                   atol=1e-6)

    def test_clamp(self):
        shs = jnp.zeros((1, 16, 3)).at[0, 0, :].set(-10.0)
        rgb = sh.sh_to_rgb(0, shs, jnp.array([[0.0, 0, 5]]), jnp.zeros(3))
        assert (rgb >= 0).all()

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_degree_rotational_structure(self, deg):
        # Evaluating at +z vs -z flips odd-degree terms.
        key = jax.random.PRNGKey(3)
        shs = jax.random.normal(key, (1, 25, 3))
        up = sh.eval_sh(deg, shs, jnp.array([[0.0, 0.0, 1.0]]))
        down = sh.eval_sh(deg, shs, jnp.array([[0.0, 0.0, -1.0]]))
        assert not np.allclose(up, down)

    def test_basis_orthonormality_deg4(self):
        """The 25 implied basis functions (degrees 0..4, reference
        include/sh_utils.h:33-148) must satisfy (1/4pi) * integral of
        Y_i * Y_j over the sphere = delta_ij / (4pi) — i.e. with quasi-
        uniform sphere samples, mean(Y_i * Y_j) ~ delta_ij / (4pi).
        Non-circular: validates constants AND polynomial terms against the
        defining property of real spherical harmonics."""
        n = 200_000
        i = np.arange(n, dtype=np.float64)
        # Spherical Fibonacci lattice: quasi-uniform on S^2.
        phi = np.pi * (3.0 - np.sqrt(5.0)) * i
        z = 1.0 - 2.0 * (i + 0.5) / n
        r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
        dirs = np.stack([r * np.cos(phi), r * np.sin(phi), z], 1)
        # Basis via one-hot coefficients: eval_sh is linear in shs.
        shs = jnp.eye(25)[None, :, :]           # [1, 25, 25-as-"rgb"] trick
        # eval_sh expects [..., K, 3]; evaluate 25 one-hot coeff sets by
        # batching over the channel axis in groups of 3.
        basis = np.zeros((n, 25), np.float64)
        dirs_j = jnp.asarray(dirs, jnp.float32)
        for k0 in range(0, 25, 3):
            cols = min(3, 25 - k0)
            coef = jnp.zeros((1, 25, 3))
            for c in range(cols):
                coef = coef.at[0, k0 + c, c].set(1.0)
            out = np.asarray(sh.eval_sh(4, coef, dirs_j))  # [n, 3]
            basis[:, k0:k0 + cols] = out[:, :cols]
        gram = basis.T @ basis / n * (4.0 * np.pi)
        np.testing.assert_allclose(gram, np.eye(25), atol=0.02)


class TestLosses:
    def test_l1(self):
        a = jnp.ones((3, 8, 8))
        b = jnp.zeros((3, 8, 8))
        assert float(losses.l1_loss(a, b)) == pytest.approx(1.0)

    def test_psnr_identical(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 16, 16))
        assert float(losses.psnr(img, img * 0.5)) < float(losses.psnr(img, img * 0.99))

    def test_ssim_identical_is_one(self):
        img = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32))
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_range_and_sensitivity(self):
        img = jax.random.uniform(jax.random.PRNGKey(2), (3, 32, 32))
        noisy = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(3),
                                                       img.shape), 0, 1)
        s = float(losses.ssim(img, noisy))
        assert 0.0 < s < 0.95

    def test_ssim_matches_torch_formula(self):
        # Independent check against a literal numpy implementation.
        rng = np.random.RandomState(0)
        a = rng.rand(1, 20, 20).astype(np.float32)
        b = rng.rand(1, 20, 20).astype(np.float32)

        xs = np.arange(11) - 5
        g = np.exp(-(xs**2) / (2 * 1.5**2))
        g /= g.sum()
        win = np.outer(g, g)

        def conv(img):
            from scipy.signal import convolve2d
            return convolve2d(img[0], win, mode="same", boundary="fill")

        try:
            mu1, mu2 = conv(a), conv(b)
        except ImportError:
            pytest.skip("scipy not available")
        s1 = conv(a * a) - mu1**2
        s2 = conv(b * b) - mu2**2
        s12 = conv(a * b) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
        expected = ssim_map.mean()
        got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(expected, abs=1e-4)

    def test_training_loss_blend(self):
        img = jax.random.uniform(jax.random.PRNGKey(4), (3, 32, 32))
        gt = jax.random.uniform(jax.random.PRNGKey(5), (3, 32, 32))
        l0 = float(losses.training_loss(img, gt, 0.0))
        assert l0 == pytest.approx(float(losses.l1_loss(img, gt)), abs=1e-6)
        l1 = float(losses.training_loss(img, gt, 1.0))
        assert l1 == pytest.approx(1.0 - float(losses.ssim(img, gt)), abs=1e-6)


class TestCameraMath:
    def test_world_to_view_identity(self):
        w2v = camera_math.world_to_view(np.eye(3), np.zeros(3))
        np.testing.assert_allclose(w2v, np.eye(4), atol=1e-6)

    def test_projection_matches_reference_formula(self):
        znear, zfar = 0.01, 100.0
        fovx, fovy = 1.2, 0.9
        P = camera_math.projection_matrix(znear, zfar, fovx, fovy)
        # Reference formula (src/gaussian_keyframe.cpp:176-204)
        tx, ty = np.tan(fovx / 2), np.tan(fovy / 2)
        top, right = ty * znear, tx * znear
        assert P[0, 0] == pytest.approx(2 * znear / (2 * right), rel=1e-6)
        assert P[1, 1] == pytest.approx(2 * znear / (2 * top), rel=1e-6)
        assert P[3, 2] == pytest.approx(1.0)
        assert P[2, 2] == pytest.approx(zfar / (zfar - znear), rel=1e-6)
        assert P[2, 3] == pytest.approx(-(zfar * znear) / (zfar - znear), rel=1e-6)

    def test_full_proj_w_is_view_depth(self):
        # After full projection, the homogeneous w must equal view-space z.
        from photo_slam_tpu.utils.math import quat_to_rotmat
        q = np.array([0.9, 0.1, -0.2, 0.3])
        q /= np.linalg.norm(q)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        t = np.array([0.5, -1.0, 2.0])
        cams = camera_math.build_camera_matrices(R, t, 0.01, 100.0, 1.2, 0.9)
        pts = jnp.asarray(np.random.RandomState(0).randn(10, 3) * 2 + [0, 0, 5])
        hom = camera_math.transform_points_44(pts, cams.full_proj)
        view = camera_math.transform_points_43(pts, cams.viewmatrix)
        np.testing.assert_allclose(hom[:, 3], view[:, 2], rtol=1e-4)

    def test_camera_center(self):
        from photo_slam_tpu.utils.math import quat_to_rotmat
        q = np.array([0.7, 0.3, 0.2, -0.1])
        q /= np.linalg.norm(q)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        t = np.array([1.0, 2.0, 3.0])
        cams = camera_math.build_camera_matrices(R, t, 0.01, 100.0, 1.0, 1.0)
        expected = -R.T @ t
        np.testing.assert_allclose(cams.cam_center, expected, atol=1e-5)

    def test_ndc_to_pixel(self):
        # ((v+1)*S-1)*0.5 — reference auxiliary.h:41-44
        assert float(camera_math.ndc_to_pixel(jnp.array(0.0), 100)) == pytest.approx(49.5)
        assert float(camera_math.ndc_to_pixel(jnp.array(-1.0), 100)) == pytest.approx(-0.5)
