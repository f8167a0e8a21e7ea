"""Pallas blend kernel vs the jnp tiled renderer (interpret mode on CPU):
forward images and hand-derived backward vs JAX-AD gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photo_slam_tpu.ops import preprocess as prep_mod
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render

W, H = 64, 64  # 2x2 tiles of 32px
FOVX = FOVY = 1.0


def make_scene(n=60, seed=0):
    rng = np.random.RandomState(seed)
    means = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n),
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    return means, scales, quats, opac, colors


def cam():
    return build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                 FOVX, FOVY)


def settings(mode):
    # tile=32 everywhere so the jnp and pallas paths bin identically (the
    # pallas kernel's pixel block is fixed at 32x32).
    return RenderSettings(width=W, height=H, tan_fovx=np.tan(FOVX / 2),
                          tan_fovy=np.tan(FOVY / 2), mode=mode, tile=32,
                          max_per_tile=128, max_tiles_per_gaussian=16,
                          tiles_per_chunk=2)


class TestPallasForward:
    def test_matches_tiled(self):
        means, scales, quats, opac, colors = make_scene()
        c = cam()
        args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac))
        res_p = render(*args, c, settings("pallas"), jnp.zeros(3),
                       colors_precomp=jnp.asarray(colors))
        res_t = render(*args, c, settings("tiled"), jnp.zeros(3),
                       colors_precomp=jnp.asarray(colors))
        np.testing.assert_allclose(np.asarray(res_p.image),
                                   np.asarray(res_t.image), atol=3e-3)
        np.testing.assert_allclose(np.asarray(res_p.final_T),
                                   np.asarray(res_t.final_T), atol=3e-3)

    def test_background(self):
        means, scales, quats, opac, colors = make_scene(n=5)
        c = cam()
        bg = jnp.array([0.2, 0.4, 0.8])
        res = render(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), c,
                     settings("pallas"), bg,
                     colors_precomp=jnp.asarray(colors))
        img = np.asarray(res.image)
        ft = np.asarray(res.final_T)
        # Where nothing rendered, the image equals the background.
        empty = ft > 0.999
        if empty.any():
            for ch in range(3):
                np.testing.assert_allclose(img[ch][empty], float(bg[ch]),
                                           atol=1e-4)

    def test_empty_scene(self):
        means, scales, quats, opac, colors = make_scene(n=4)
        c = cam()
        live = jnp.zeros(4, bool)
        res = render(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), c,
                     settings("pallas"), jnp.zeros(3),
                     colors_precomp=jnp.asarray(colors), live_mask=live)
        np.testing.assert_allclose(np.asarray(res.image), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.final_T), 1.0)


class TestPallasBackward:
    def _grad(self, mode, wrt="all"):
        means, scales, quats, opac, colors = make_scene()
        c = cam()
        gt = jax.random.uniform(jax.random.PRNGKey(7), (3, H, W))

        def loss_fn(m, s, q, o, col, offset):
            res = render(m, s, q, o, c, settings(mode), jnp.zeros(3),
                         colors_precomp=col, means2d_offset=offset)
            return jnp.mean((res.image - gt) ** 2)

        n = means.shape[0]
        return jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors), jnp.zeros((n, 2)))

    def test_grads_match_tiled(self):
        g_p = self._grad("pallas")
        g_t = self._grad("tiled")
        names = ["means3d", "scales", "quats", "opacity", "colors",
                 "means2d_offset"]
        for name, a, b in zip(names, g_p, g_t):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all(), f"{name}: non-finite pallas grad"
            scale = np.abs(b).max() + 1e-8
            # 6e-3: the pallas path routes backward rows in bf16
            # (ops/tiled._entry_gather_bwd) — ~2e-3 normalized rounding on
            # top of blend-order differences; structural errors are >>1%.
            np.testing.assert_allclose(
                a / scale, b / scale, atol=6e-3,
                err_msg=f"gradient mismatch for {name}")
            assert np.abs(a).max() > 0, f"{name}: zero pallas grad"

    def test_nonzero_bg_grad_path(self):
        """final_T cotangent (background term) must flow correctly."""
        means, scales, quats, opac, colors = make_scene(n=20)
        c = cam()
        bg = jnp.array([1.0, 1.0, 1.0])

        def loss_fn(o, mode):
            res = render(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(quats), o, c, settings(mode), bg,
                         colors_precomp=jnp.asarray(colors))
            return jnp.mean(res.image)

        g_p = jax.grad(lambda o: loss_fn(o, "pallas"))(jnp.asarray(opac))
        g_t = jax.grad(lambda o: loss_fn(o, "tiled"))(jnp.asarray(opac))
        scale = np.abs(np.asarray(g_t)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(g_p) / scale,
                                   np.asarray(g_t) / scale, atol=6e-3)


class TestOverflowContinuation:
    """Multi-pass overflow rendering (ops/tiled.render_pallas
    overflow_passes): the continuation is exact, so a capacity-starved
    2-pass render must match a single pass with enough capacity."""

    def _settings(self, max_per_tile, passes=1, cap=128):
        return RenderSettings(width=W, height=H, tan_fovx=np.tan(FOVX / 2),
                              tan_fovy=np.tan(FOVY / 2), mode="pallas",
                              tile=32, max_per_tile=max_per_tile,
                              max_tiles_per_gaussian=16,
                              overflow_passes=passes, overflow_capacity=cap)

    def test_two_pass_matches_big_capacity(self):
        means, scales, quats, opac, colors = make_scene(n=600, seed=3)
        c = cam()
        args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac))
        bg = jnp.array([0.2, 0.4, 0.1])
        full = render(*args, c, self._settings(512), bg,
                      colors_precomp=jnp.asarray(colors))
        assert int(full.num_overflow) == 0
        starved = render(*args, c, self._settings(128), bg,
                         colors_precomp=jnp.asarray(colors))
        assert int(starved.num_overflow) > 0, "scene must overflow at K=128"
        two = render(*args, c, self._settings(128, passes=2, cap=384), bg,
                     colors_precomp=jnp.asarray(colors))
        assert int(two.num_overflow) == 0
        # Exact continuation: matches the big-capacity render up to the
        # T_EPS cutoff semantics (the single pass stops counting once the
        # GLOBAL transmittance crosses 1e-4; pass 2 tests its local product,
        # so it can include tail terms of magnitude <= 1e-4). The starved
        # single pass differs by far more.
        np.testing.assert_allclose(np.asarray(two.image),
                                   np.asarray(full.image), atol=1e-3)
        np.testing.assert_allclose(np.asarray(two.final_T),
                                   np.asarray(full.final_T), atol=1e-3)
        assert np.abs(np.asarray(starved.image)
                      - np.asarray(full.image)).max() > 1e-3

    def test_overflow_shape_probes(self):
        """RenderResult.num_overflow_tiles / max_tile_depth — the probes
        bench.py sizes the adaptive continuation from — must describe the
        RAW per-tile depth distribution: max_tile_depth is independent of
        max_per_tile, and num_overflow_tiles counts tiles deeper than the
        configured capacity (0 when nothing overflows)."""
        means, scales, quats, opac, colors = make_scene(n=600, seed=3)
        c = cam()
        args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac))
        bg = jnp.zeros(3)
        full = render(*args, c, self._settings(512), bg,
                      colors_precomp=jnp.asarray(colors))
        starved = render(*args, c, self._settings(128), bg,
                         colors_precomp=jnp.asarray(colors))
        assert int(full.num_overflow) == 0
        assert int(full.num_overflow_tiles) == 0
        assert int(starved.num_overflow_tiles) > 0
        # Raw depth distribution does not depend on the capacity knob.
        assert int(full.max_tile_depth) == int(starved.max_tile_depth)
        assert 128 < int(starved.max_tile_depth) <= 512

    def test_compact_continuation_matches_full(self):
        """The compact path (continuation over only the deepest
        `overflow_compact` tiles) must match the exhaustive all-tiles
        continuation exactly when the subset covers every overflowed tile —
        forward AND gradients (entry_gather_windows transpose)."""
        rng = np.random.RandomState(5)
        n = 500
        # Concentrate the scene in the top-left 32px tile so overflow hits
        # exactly one of the 4 tiles.
        means = np.stack([rng.uniform(-1.8, -0.4, n),
                          rng.uniform(-1.8, -0.4, n),
                          rng.uniform(3, 8, n)], 1).astype(np.float32)
        scales = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
        quats = rng.randn(n, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3))
                             .astype(np.float32))
        c = cam()
        bg = jnp.array([0.2, 0.1, 0.3])
        s_full = self._settings(128, passes=2, cap=384)._replace(
            overflow_compact=0)
        s_comp = s_full._replace(overflow_compact=2)

        def run(s, o):
            return render(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), o, c, s, bg,
                          colors_precomp=colors)

        starved = run(self._settings(128), opac)
        assert int(starved.num_overflow) > 0
        full = run(s_full, opac)
        comp = run(s_comp, opac)
        assert int(comp.num_overflow) == int(full.num_overflow) == 0
        np.testing.assert_allclose(np.asarray(comp.image),
                                   np.asarray(full.image), atol=1e-6)

        gt = jnp.asarray(rng.rand(3, H, W).astype(np.float32))

        def loss(o, s):
            return jnp.mean((run(s, o).image - gt) ** 2)

        g_full = jax.grad(loss)(opac, s_full)
        g_comp = jax.grad(loss)(opac, s_comp)
        scale = np.abs(np.asarray(g_full)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(g_comp) / scale,
                                   np.asarray(g_full) / scale, atol=3e-3)

    def test_compact_partial_coverage_overflow_accounting(self):
        """When the compact subset is SMALLER than the overflowed tile set,
        num_overflow must equal the brute-force uncovered-entry count for
        the tiles the continuation actually ran (the residual-light ranked
        subset render_pallas picks), not a top-by-raw-count estimate."""
        rng = np.random.RandomState(9)
        n = 900
        means = np.stack([rng.uniform(-1.8, 1.8, n),
                          rng.uniform(-1.8, 1.8, n),
                          rng.uniform(3, 8, n)], 1).astype(np.float32)
        scales = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
        quats = rng.randn(n, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3))
                             .astype(np.float32))
        c = cam()
        bg = jnp.zeros(3)
        kmax, cap = 96, 64  # starve capacity AND the continuation
        s1 = self._settings(kmax)
        s_comp = self._settings(kmax, passes=2, cap=cap)._replace(
            overflow_compact=1)

        def run(s):
            return render(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), opac, c, s, bg,
                          colors_precomp=colors)

        starved = run(s1)
        # Need >= 2 overflowed tiles so compact=1 leaves residual.
        from photo_slam_tpu.ops import tiled as tiled_mod
        from photo_slam_tpu.ops.preprocess import preprocess as prep_fn
        comp = run(s_comp)
        assert int(starved.num_overflow) > int(comp.num_overflow) > 0
        # Brute-force: rank overflowed tiles by residual light (what
        # render_pallas covers), net out min(over, extra) for the best one.
        ft = np.asarray(starved.final_T)
        over_img = int(starved.num_overflow)
        # Recompute per-tile overflow from a direct binning call.
        from photo_slam_tpu.ops.binning import bin_gaussians
        from photo_slam_tpu.ops.preprocess import tight_extents
        import photo_slam_tpu.models.gaussian_model  # noqa: F401
        pr = prep_fn(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), c.viewmatrix, c.full_proj,
                     c.cam_center, W, H, float(np.tan(FOVX / 2)),
                     float(np.tan(FOVY / 2)), sh_degree=0,
                     colors_precomp=colors)
        b = bin_gaussians(pr.means2d, pr.depths, pr.radii, pr.visible, W, H,
                          tile=32, max_tiles_per_gaussian=16,
                          max_per_tile=kmax,
                          extents=tight_extents(pr.conics, opac, pr.radii))
        rc = np.asarray(b.raw_counts)
        over = np.maximum(rc - kmax, 0)
        gx = (W + 31) // 32
        t_res = np.array([
            ft[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32].sum()
            for ty in range((H + 31) // 32) for tx in range(gx)])
        score = np.where(over > 0, t_res, -1.0)
        covered_tile = int(np.argmax(score))
        expect = over_img - min(over[covered_tile], cap)
        assert int(comp.num_overflow) == expect

    def test_production_config_psnr_floor(self):
        """Regression floor for the production render config (miniature
        analog of bench.py's psnr_2pass_vs_exact_db): a SURFACE scene (a
        dense wall of splats — the structure a converged map has) whose
        overflowing tiles saturate every pixel well within the 2-pass
        coverage, so the truncated tail sits under the T<1e-4 early-exit
        and the continuation's residual-light tile selection
        (ops/tiled.render_pallas) makes skipping the rest lossless:
        >= 45 dB vs the exact render with residual overflow present. Pins
        the headline config's quality so capacity/selection changes can't
        silently degrade it. (A volumetric cloud with per-tile depth far
        beyond coverage genuinely needs the tail — that regime is covered
        by bench.py's measured psnr_2pass_vs_exact_db, not a fixed floor.)"""
        rng = np.random.RandomState(9)
        n = 250
        # Wall spanning the 64x64 image at z~5 with fat opaque splats:
        # every tile overflows, and pixels saturate well within coverage.
        means = np.stack([rng.uniform(-2.6, 1.4, n),
                          rng.uniform(-2.6, 1.4, n),
                          rng.uniform(4.8, 5.2, n)], 1).astype(np.float32)
        scales = rng.uniform(0.45, 0.7, (n, 3)).astype(np.float32)
        quats = rng.randn(n, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = jnp.asarray(rng.uniform(0.85, 0.99, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3))
                             .astype(np.float32))
        c = cam()
        bg = jnp.array([0.2, 0.1, 0.3])

        def run(s):
            return render(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), opac, c, s, bg,
                          colors_precomp=colors)

        exact = run(self._settings(4096))
        assert int(exact.num_overflow) == 0
        # Production-ratio coverage (64+128 of ~360 depth, like 1024+512 at
        # bench scale), continuation restricted to 3 of the 4 overflowed
        # tiles so the residual-light selection must pick the right ones.
        two = run(self._settings(64, passes=2, cap=128)._replace(
            overflow_compact=3))
        assert int(two.num_overflow) > 0, "floor test needs residual overflow"
        mse = float(jnp.mean((two.image - exact.image) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr >= 45.0, f"production-config PSNR floor broken: {psnr}"

    def test_two_pass_gradients_match_big_capacity(self):
        means, scales, quats, opac, colors = make_scene(n=600, seed=3)
        c = cam()
        gt = jnp.asarray(
            np.random.RandomState(1).rand(3, H, W).astype(np.float32))

        def loss(o, col, s):
            res = render(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(quats), o, c, s, jnp.zeros(3),
                         colors_precomp=col)
            return jnp.mean((res.image - gt) ** 2)

        g_full = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(opac), jnp.asarray(colors), self._settings(512))
        g_two = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(opac), jnp.asarray(colors),
            self._settings(128, passes=2, cap=384))
        for a, b in zip(g_two, g_full):
            scale = np.abs(np.asarray(b)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=6e-3)
