"""Native (C++) runtime components, loaded over ctypes.

The reference keeps its host-side hot loops in C++ (g2o optimization, image
plumbing); here the native core is `pose_ba.cpp` — motion-only bundle
adjustment used by the tracking frontend (the role of ORB-SLAM3's
Optimizer::PoseOptimization, reference: ORB-SLAM3/src/Optimizer.cc).

The shared library builds on first use with g++ (cached next to the source);
`pose_optimize` falls back to a numpy implementation when no compiler exists.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _SRC_DIR / "libpose_ba.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    src = _SRC_DIR / "pose_ba.cpp"
    try:
        if (not _LIB_PATH.exists()
                or _LIB_PATH.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(src), "-o", str(_LIB_PATH)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.pose_optimize.restype = ctypes.c_int
        lib.pose_optimize.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _project(T, pts, fx, fy, cx, cy):
    xc = pts @ T[:3, :3].T + T[:3, 3]
    z = np.maximum(xc[:, 2], 1e-9)
    return np.stack([fx * xc[:, 0] / z + cx, fy * xc[:, 1] / z + cy], 1), xc


def _pose_optimize_numpy(points, obs, fx, fy, cx, cy, huber, chi2, iters, T):
    """Pure-numpy Gauss-Newton fallback (same math as pose_ba.cpp)."""
    lam = 1e-4

    def cost_of(Tc):
        uv, xc = _project(Tc, points, fx, fy, cx, cy)
        r = uv - obs
        e = np.linalg.norm(r, axis=1)
        c = np.where(e <= huber, 0.5 * e**2, huber * (e - 0.5 * huber))
        return c[xc[:, 2] > 1e-6].sum()

    cost = cost_of(T)
    for _ in range(iters):
        uv, xc = _project(T, points, fx, fy, cx, cy)
        ok = xc[:, 2] > 1e-6
        r = (uv - obs)[ok]
        X = xc[ok]
        e = np.linalg.norm(r, axis=1)
        w = np.where(e <= huber, 1.0, huber / np.maximum(e, 1e-12))
        iz = 1.0 / X[:, 2]
        Ju = np.stack([fx * iz, np.zeros_like(iz), -fx * X[:, 0] * iz**2], 1)
        Jv = np.stack([np.zeros_like(iz), fy * iz, -fy * X[:, 1] * iz**2], 1)

        def full(Jp):
            rot = -np.stack([
                Jp[:, 1] * X[:, 2] - Jp[:, 2] * X[:, 1],
                Jp[:, 2] * X[:, 0] - Jp[:, 0] * X[:, 2],
                Jp[:, 0] * X[:, 1] - Jp[:, 1] * X[:, 0],
            ], 1)
            return np.concatenate([Jp, rot], 1)

        Ja, Jb = full(Ju), full(Jv)
        H = (w[:, None, None] * (Ja[:, :, None] * Ja[:, None, :]
                                 + Jb[:, :, None] * Jb[:, None, :])).sum(0)
        g = (w[:, None] * (Ja * r[:, 0:1] + Jb * r[:, 1:2])).sum(0)
        try:
            dx = -np.linalg.solve(H + lam * (np.eye(6) * (1 + np.diag(H))), g)
        except np.linalg.LinAlgError:
            lam *= 10
            continue
        th = np.linalg.norm(dx[3:])
        if th < 1e-12:
            R = np.eye(3)
        else:
            k = dx[3:] / th
            K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                          [-k[1], k[0], 0]])
            R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        T_try = T.copy()
        T_try[:3, :3] = R @ T[:3, :3]
        T_try[:3, 3] = R @ T[:3, 3] + dx[:3]
        c2 = cost_of(T_try)
        if c2 < cost:
            T, cost, lam = T_try, c2, max(lam * 0.5, 1e-9)
        else:
            lam *= 10
            if lam > 1e6:
                break
    uv, xc = _project(T, points, fx, fy, cx, cy)
    inl = ((np.linalg.norm(uv - obs, axis=1) < chi2) & (xc[:, 2] > 1e-6)).sum()
    return int(inl), T, cost


def pose_optimize(points_world: np.ndarray, obs_px: np.ndarray, fx, fy, cx,
                  cy, pose_tcw: np.ndarray, huber_delta: float = 3.0,
                  chi2_px: float = 5.0, max_iters: int = 10):
    """Refine a world->camera pose against fixed 3D points.

    Returns (num_inliers, refined_pose_4x4, final_cost). Uses the native
    Gauss-Newton core when available, numpy otherwise.
    """
    pts = np.ascontiguousarray(points_world, np.float64)
    obs = np.ascontiguousarray(obs_px, np.float64)
    T = np.ascontiguousarray(pose_tcw, np.float64).reshape(4, 4).copy()
    lib = _load()
    if lib is None:
        return _pose_optimize_numpy(pts, obs, fx, fy, cx, cy, huber_delta,
                                    chi2_px, max_iters, T)
    cost = ctypes.c_double(0.0)
    flat = np.ascontiguousarray(T.reshape(-1))
    n = lib.pose_optimize(pts.shape[0], pts, obs, fx, fy, cx, cy,
                          huber_delta, chi2_px, max_iters, flat,
                          ctypes.byref(cost))
    return int(n), flat.reshape(4, 4), float(cost.value)


def native_available() -> bool:
    return _load() is not None
