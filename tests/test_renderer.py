"""Renderer correctness: dense & tiled JAX renderers vs the literal numpy
oracle (tests/np_reference.py), plus gradient sanity checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photo_slam_tpu.ops import preprocess as prep_mod
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.dense import render_dense
from photo_slam_tpu.ops.render import RenderSettings, render
from photo_slam_tpu.ops.tiled import render_tiled

from np_reference import render_reference

WIDTH, HEIGHT = 64, 48
FOVX, FOVY = 1.0, 0.8


def make_scene(n=40, seed=0, spread=2.0, z_range=(3.0, 8.0), scale=0.12):
    rng = np.random.RandomState(seed)
    means = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread * 0.7, spread * 0.7, n),
        rng.uniform(*z_range, n),
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.3 * scale, scale, (n, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    return means, scales, quats, opac, colors


def make_cam():
    # Identity pose looking down +z.
    return build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, FOVX, FOVY)


def run_prep(means, scales, quats, colors, cam, live=None):
    return prep_mod.preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        cam.viewmatrix, cam.full_proj, cam.cam_center,
        WIDTH, HEIGHT, np.tan(FOVX / 2), np.tan(FOVY / 2),
        colors_precomp=jnp.asarray(colors),
        live_mask=live,
    )


@pytest.fixture(scope="module")
def oracle():
    means, scales, quats, opac, colors = make_scene()
    cam = make_cam()
    img, final_T, n_contrib = render_reference(
        means.astype(np.float64), scales.astype(np.float64),
        quats.astype(np.float64), opac.astype(np.float64),
        colors.astype(np.float64),
        np.asarray(cam.viewmatrix, dtype=np.float64),
        np.asarray(cam.full_proj, dtype=np.float64),
        WIDTH, HEIGHT, np.tan(FOVX / 2), np.tan(FOVY / 2),
        bg=np.zeros(3),
    )
    return means, scales, quats, opac, colors, cam, img, final_T, n_contrib


class TestVsOracle:
    def test_tiled_matches_oracle(self, oracle):
        means, scales, quats, opac, colors, cam, ref_img, ref_T, _ = oracle
        prep = run_prep(means, scales, quats, colors, cam)
        out, binning = render_tiled(prep, jnp.asarray(opac), WIDTH, HEIGHT,
                                    jnp.zeros(3))
        assert int(binning.num_overflow) == 0
        assert int(binning.num_clipped) == 0
        np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.final_T), ref_T, atol=2e-3)

    def test_dense_matches_oracle(self, oracle):
        means, scales, quats, opac, colors, cam, ref_img, ref_T, _ = oracle
        prep = run_prep(means, scales, quats, colors, cam)
        out = render_dense(prep, jnp.asarray(opac), WIDTH, HEIGHT, jnp.zeros(3))
        # Dense blends outside the 3-sigma rect too; those extra
        # contributions are < 1/255 each -> small tolerance.
        np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=5e-3)

    def test_tiled_matches_dense(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        prep = run_prep(means, scales, quats, colors, cam)
        out_d = render_dense(prep, jnp.asarray(opac), WIDTH, HEIGHT, jnp.zeros(3))
        out_t, _ = render_tiled(prep, jnp.asarray(opac), WIDTH, HEIGHT, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(out_t.image),
                                   np.asarray(out_d.image), atol=5e-3)

    def test_background_composited(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        prep = run_prep(means, scales, quats, colors, cam)
        bg = jnp.array([1.0, 0.0, 0.5])
        out, _ = render_tiled(prep, jnp.asarray(opac), WIDTH, HEIGHT, bg)
        img = np.asarray(out.image)
        # Corner pixels with no gaussian coverage = pure background.
        T_corner = float(out.final_T[0, 0])
        if T_corner > 0.999:
            np.testing.assert_allclose(img[:, 0, 0], np.asarray(bg), atol=1e-5)

    def test_live_mask_removes_gaussians(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        live = jnp.zeros(means.shape[0], dtype=bool)
        prep = run_prep(means, scales, quats, colors, cam, live=live)
        out, _ = render_tiled(prep, jnp.asarray(opac), WIDTH, HEIGHT, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(out.image), 0.0, atol=1e-7)
        assert not bool(prep.visible.any())


class TestRenderAPI:
    def test_render_with_sh(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        n = means.shape[0]
        from photo_slam_tpu.ops.sh import rgb_to_sh
        shs = np.zeros((n, 16, 3), dtype=np.float32)
        shs[:, 0, :] = np.asarray(rgb_to_sh(jnp.asarray(colors)))
        settings = RenderSettings(width=WIDTH, height=HEIGHT,
                                  tan_fovx=np.tan(FOVX / 2),
                                  tan_fovy=np.tan(FOVY / 2), sh_degree=0)
        res = render(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), cam, settings,
                     jnp.zeros(3), shs=jnp.asarray(shs))
        # DC-only SH must reproduce the precomputed-color render.
        res2 = render(jnp.asarray(means), jnp.asarray(scales),
                      jnp.asarray(quats), jnp.asarray(opac), cam, settings,
                      jnp.zeros(3), colors_precomp=jnp.asarray(colors))
        np.testing.assert_allclose(np.asarray(res.image),
                                   np.asarray(res2.image), atol=1e-4)
        assert res.radii.shape == (n,)
        assert bool(res.visible.any())

    def test_dense_mode(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        settings = RenderSettings(width=WIDTH, height=HEIGHT,
                                  tan_fovx=np.tan(FOVX / 2),
                                  tan_fovy=np.tan(FOVY / 2), mode="dense")
        res = render(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), cam, settings,
                     jnp.zeros(3), colors_precomp=jnp.asarray(colors))
        assert res.image.shape == (3, HEIGHT, WIDTH)


class TestGradients:
    def test_grad_flows_to_all_params(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        settings = RenderSettings(width=WIDTH, height=HEIGHT,
                                  tan_fovx=np.tan(FOVX / 2),
                                  tan_fovy=np.tan(FOVY / 2))

        def loss_fn(m, s, q, o, c):
            res = render(m, s, q, o, cam, settings, jnp.zeros(3),
                         colors_precomp=c)
            return jnp.sum(res.image ** 2)

        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors))
        names = ["means", "scales", "quats", "opacity", "colors"]
        for name, g in zip(names, grads):
            arr = np.asarray(g)
            assert np.isfinite(arr).all(), f"{name} grad has NaN/Inf"
            assert np.abs(arr).max() > 0, f"{name} grad is all zero"

    def test_tiled_grad_matches_dense_grad(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        base = dict(tan_fovx=np.tan(FOVX / 2), tan_fovy=np.tan(FOVY / 2),
                    width=WIDTH, height=HEIGHT)

        def mk_loss(mode):
            settings = RenderSettings(mode=mode, **base)

            def loss_fn(o, c):
                res = render(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), o, cam, settings,
                             jnp.zeros(3), colors_precomp=c)
                return jnp.mean(res.image)

            return loss_fn

        g_t = jax.grad(mk_loss("tiled"), argnums=(0, 1))(
            jnp.asarray(opac), jnp.asarray(colors))
        g_d = jax.grad(mk_loss("dense"), argnums=(0, 1))(
            jnp.asarray(opac), jnp.asarray(colors))
        np.testing.assert_allclose(np.asarray(g_t[0]), np.asarray(g_d[0]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(g_t[1]), np.asarray(g_d[1]),
                                   atol=2e-4)

    def test_means2d_offset_grad(self, oracle):
        """The viewspace-gradient hook used for densification stats."""
        means, scales, quats, opac, colors, cam, *_ = oracle
        settings = RenderSettings(width=WIDTH, height=HEIGHT,
                                  tan_fovx=np.tan(FOVX / 2),
                                  tan_fovy=np.tan(FOVY / 2))
        n = means.shape[0]

        def loss_fn(offset):
            res = render(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(quats), jnp.asarray(opac), cam, settings,
                         jnp.zeros(3), colors_precomp=jnp.asarray(colors),
                         means2d_offset=offset)
            return jnp.mean((res.image - 0.5) ** 2)

        g = jax.grad(loss_fn)(jnp.zeros((n, 2)))
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0

    def test_numeric_gradcheck_opacity(self, oracle):
        means, scales, quats, opac, colors, cam, *_ = oracle
        settings = RenderSettings(width=WIDTH, height=HEIGHT,
                                  tan_fovx=np.tan(FOVX / 2),
                                  tan_fovy=np.tan(FOVY / 2))

        def loss_fn(o):
            res = render(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(quats), o, cam, settings, jnp.zeros(3),
                         colors_precomp=jnp.asarray(colors))
            return jnp.mean(res.image)

        o0 = jnp.asarray(opac)
        g = np.asarray(jax.grad(loss_fn)(o0))
        # Central differences on a few entries.
        eps = 1e-3
        for i in [0, 5, 17]:
            op = o0.at[i].add(eps)
            om = o0.at[i].add(-eps)
            fd = (float(loss_fn(op)) - float(loss_fn(om))) / (2 * eps)
            assert g[i] == pytest.approx(fd, rel=0.05, abs=1e-6)


class TestWindowLists:
    def test_continuation_windows_partition_the_stream(self):
        """window_lists(offset, cap) must return exactly the depth-ordered
        entries [offset, offset+cap) of each tile's stream segment — the
        contract the multi-pass overflow renderer builds on."""
        import numpy as np
        from photo_slam_tpu.ops.binning import bin_gaussians, window_lists

        rng = np.random.RandomState(0)
        n, w, h, k_dup = 3000, 128, 96, 8
        means = jnp.asarray(rng.rand(n, 2) * [w, h])
        depths = jnp.asarray(rng.rand(n) * 5 + 0.5)
        radii = jnp.asarray(rng.randint(1, 10, n).astype(np.float32))
        b = bin_gaussians(means, depths, radii, jnp.ones(n, bool), w, h,
                          tile=32, max_tiles_per_gaussian=k_dup,
                          max_per_tile=128)
        se = np.asarray(b.sorted_entries)
        starts = np.asarray(b.starts)
        raw = np.asarray(b.raw_counts)
        for offset, cap in ((128, 128), (0, 128), (64, 256)):
            lists, counts = window_lists(b, offset, cap)
            lists, counts = np.asarray(lists), np.asarray(counts)
            for t in range(len(starts)):
                want = se[starts[t] + offset: starts[t] + min(raw[t],
                                                              offset + cap)]
                got = lists[t][: counts[t]]
                np.testing.assert_array_equal(got, want)
                assert (lists[t][counts[t]:] == -1).all()

    def test_pallas_window_gather_clamps_past_stream_end(self):
        """Continuation windows can request starts past the sorted stream's
        end (tiles whose segment is exhausted; counts==0 masks the values).
        The ragged-DMA kernel must clamp those starts so its aligned
        dynamic-offset DMAs stay inside the padded buffer, while in-range
        windows are returned exactly (interpret mode stands in for TPU)."""
        import numpy as np
        from photo_slam_tpu.ops.binning import (_window_gather_pallas,
                                                _window_gather_xla)

        rng = np.random.RandomState(1)
        e_total, k = 5000, 256
        se = jnp.asarray(rng.randint(0, 10 ** 6, e_total).astype(np.int32))
        starts = jnp.asarray(np.array(
            [0, 100, 4999, 5000, 5000 + 1024, 4000, 123, 777], np.int32))
        got = np.asarray(_window_gather_pallas(se, starts, k, interpret=True))
        want = np.asarray(_window_gather_xla(se, starts, k))
        in_range = (np.asarray(starts)[:, None]
                    + np.arange(k)[None, :]) < e_total
        np.testing.assert_array_equal(got[in_range], want[in_range])


class TestEntryGatherTranspose:
    """The scatter-free gradient transpose (ops/tiled.entry_gather): the
    sort-routed MAIN route, the permutation-inverse FALLBACK (taken for
    continuation windows and when dropped entries exceed the static cap),
    and the runtime cond between them must all match a naive scatter-add."""

    def _setup(self, kmax=32):
        from photo_slam_tpu.ops.binning import bin_gaussians
        rng = np.random.RandomState(3)
        n, k_dup, w, h = 3000, 6, 256, 128
        means2d = jnp.asarray(rng.uniform(0, [w, h], (n, 2)).astype(np.float32))
        depths = jnp.asarray(rng.uniform(1, 10, n).astype(np.float32))
        radii = jnp.asarray(rng.randint(1, 40, n).astype(np.int32))
        vis = jnp.asarray(rng.rand(n) > 0.1)
        b = bin_gaussians(means2d, depths, radii, vis, w, h, tile=32,
                          max_tiles_per_gaussian=k_dup, max_per_tile=kmax)
        feat = jnp.asarray(rng.randn(n, 16).astype(np.float32))
        g = jnp.asarray(rng.randn(*(b.tile_lists.shape + (16,)))
                        .astype(np.float32))
        valid = (jnp.arange(kmax)[None, :] < b.tile_counts[:, None])
        g = g * valid[:, :, None]
        idx = np.where(np.asarray(b.tile_lists) >= 0,
                       np.asarray(b.tile_lists) // k_dup, -1)
        ref = np.zeros((n, 16), np.float32)
        gn = np.asarray(g)
        t_idx, k_idx = np.nonzero(idx >= 0)
        np.add.at(ref, idx[t_idx, k_idx], gn[t_idx, k_idx])
        return b, feat, g, ref, n, k_dup

    def _bwd(self, b, feat, g, k_dup, entry_counts):
        from photo_slam_tpu.ops.tiled import entry_gather
        _, vjp = jax.vjp(
            lambda ff: entry_gather(ff, b.tile_lists, b.sorted_entries,
                                    b.sorted_tiles, b.starts, b.tile_counts,
                                    entry_counts, k_dup), feat)
        return np.asarray(vjp(g)[0])

    def test_sort_route_matches_scatter(self):
        b, feat, g, ref, n, k_dup = self._setup()
        assert int(b.num_overflow) > 0  # overflow-dropped entries exercised
        got = self._bwd(b, feat, g, k_dup, b.entry_counts)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-2, rel  # bf16 routing tolerance

    def test_fallback_route_matches_scatter(self):
        b, feat, g, ref, n, k_dup = self._setup()
        got = self._bwd(b, feat, g, k_dup, None)  # no counts -> fallback
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-2, rel

    def test_route_lanes_matches_scatter_on_packed_layout(self):
        """route_lanes=10 (the production packed-FEAT path) must match the
        scatter reference exactly when the cotangent's padding lanes are
        zero — the blend backward writes zeros there, so the production
        step's gradients are unchanged by the byte shrink."""
        from photo_slam_tpu.ops.tiled import ROUTE_LANES_PACKED, entry_gather

        b, feat, g, ref, n, k_dup = self._setup()
        g = g.at[..., ROUTE_LANES_PACKED:].set(0.0)
        ref = ref.copy()
        ref[:, ROUTE_LANES_PACKED:] = 0.0
        for counts in (b.entry_counts, None):   # sort route + fallback
            _, vjp = jax.vjp(
                lambda ff: entry_gather(
                    ff, b.tile_lists, b.sorted_entries, b.sorted_tiles,
                    b.starts, b.tile_counts, counts, k_dup, 0,
                    ROUTE_LANES_PACKED), feat)
            got = np.asarray(vjp(g)[0])
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            assert rel < 2e-2, rel
            assert np.abs(got[:, ROUTE_LANES_PACKED:]).max() == 0.0

    def test_drop_cap_cond_falls_back(self, monkeypatch):
        # Force the runtime cond onto the fallback branch: cap below the
        # actual dropped count.
        from photo_slam_tpu.ops import tiled
        monkeypatch.setattr(tiled, "_DROP_CAP", 64)
        b, feat, g, ref, n, k_dup = self._setup()
        assert int(b.num_overflow) > 64
        got = self._bwd(b, feat, g, k_dup, b.entry_counts)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-2, rel

    def test_sort_route_with_clipped_rects(self):
        # Clipped rects (area > k_dup) emit exactly k_dup entries; an
        # entry_counts overstating them shifts every later segment start
        # (the round-3 12-dB soak regression).
        from photo_slam_tpu.ops.binning import bin_gaussians
        from photo_slam_tpu.ops.tiled import entry_gather
        rng = np.random.RandomState(5)
        n, k_dup, w, h, kmax = 2000, 6, 256, 128, 64
        means2d = jnp.asarray(rng.uniform(0, [w, h], (n, 2)).astype(np.float32))
        depths = jnp.asarray(rng.uniform(1, 10, n).astype(np.float32))
        radii = jnp.asarray(rng.randint(20, 120, n).astype(np.int32))  # big
        vis = jnp.asarray(np.ones(n, bool))
        b = bin_gaussians(means2d, depths, radii, vis, w, h, tile=32,
                          max_tiles_per_gaussian=k_dup, max_per_tile=kmax)
        assert int(b.num_clipped) > 100
        assert int(np.asarray(b.entry_counts).max()) <= k_dup
        feat = jnp.asarray(rng.randn(n, 16).astype(np.float32))
        g = jnp.asarray(rng.randn(*(b.tile_lists.shape + (16,)))
                        .astype(np.float32))
        valid = (jnp.arange(kmax)[None, :] < b.tile_counts[:, None])
        g = g * valid[:, :, None]
        idx = np.where(np.asarray(b.tile_lists) >= 0,
                       np.asarray(b.tile_lists) // k_dup, -1)
        ref = np.zeros((n, 16), np.float32)
        t_idx, k_idx = np.nonzero(idx >= 0)
        np.add.at(ref, idx[t_idx, k_idx], np.asarray(g)[t_idx, k_idx])
        _, vjp = jax.vjp(
            lambda ff: entry_gather(ff, b.tile_lists, b.sorted_entries,
                                    b.sorted_tiles, b.starts, b.tile_counts,
                                    b.entry_counts, k_dup), feat)
        got = np.asarray(vjp(g)[0])
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-2, rel
