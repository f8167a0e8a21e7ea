"""Native (C++) runtime components, loaded over ctypes.

The reference keeps its host-side hot loops in C++ (g2o optimization, image
plumbing); here the native cores are:

  * `pose_ba.cpp` — motion-only bundle adjustment used by the tracking
    frontend (the role of ORB-SLAM3's Optimizer::PoseOptimization,
    reference: ORB-SLAM3/src/Optimizer.cc);
  * `slam_opt.cpp` — sliding-window local BA with Schur complement (the
    role of Optimizer::LocalBundleAdjustment, reference:
    ORB-SLAM3/src/Optimizer.cc:1116) and SE3 pose-graph optimization (the
    role of Optimizer::OptimizeEssentialGraph, reference:
    ORB-SLAM3/src/Optimizer.cc:1762).

The shared libraries build on first use with g++ (cached next to the
source); every entry point falls back to a numpy implementation when no
compiler exists.
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


# ---------------------------------------------------------------------------
# slam_opt: local BA + pose graph (native with numpy fallbacks)
# ---------------------------------------------------------------------------

_SLAM_LIB_PATH = _SRC_DIR / "libslam_opt.so"
_slam_lib: Optional[ctypes.CDLL] = None
_slam_build_failed = False


def _load_slam() -> Optional[ctypes.CDLL]:
    global _slam_lib, _slam_build_failed
    if _slam_lib is not None or _slam_build_failed:
        return _slam_lib
    src = _SRC_DIR / "slam_opt.cpp"
    try:
        if (not _SLAM_LIB_PATH.exists()
                or _SLAM_LIB_PATH.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(src), "-o", str(_SLAM_LIB_PATH)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SLAM_LIB_PATH))
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.local_ba.restype = ctypes.c_int
        lib.local_ba.argtypes = [
            ctypes.c_int, ctypes.c_int, f64, ctypes.c_int, f64,
            ctypes.c_int, i32, i32, f64, f64, f64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ]
        lib.pose_graph_optimize.restype = ctypes.c_int
        lib.pose_graph_optimize.argtypes = [
            ctypes.c_int, ctypes.c_int, f64, ctypes.c_int, i32, i32, f64,
            f64, ctypes.c_int,
        ]
        _slam_lib = lib
    except Exception:
        _slam_build_failed = True
    return _slam_lib


def _local_ba_numpy(poses, n_fixed, points, obs_pose, obs_point, obs_uv,
                    fx, fy, cx, cy, huber, chi2, iters, obs_depth=None,
                    obs_dw=None):
    """Dense-GN fallback (no Schur): state = free poses (6 each) + points."""
    n_poses, n_points, n_obs = len(poses), len(points), len(obs_pose)
    n_free = n_poses - n_fixed
    np_dim = 6 * n_free
    has_d = obs_dw is not None and (np.asarray(obs_dw) > 0).any()

    def project_all(P, X):
        T = P[obs_pose]
        pw = X[obs_point]
        xc = np.einsum("oij,oj->oi", T[:, :3, :3], pw) + T[:, :3, 3]
        z = np.maximum(xc[:, 2], 1e-9)
        uv = np.stack([fx * xc[:, 0] / z + cx, fy * xc[:, 1] / z + cy], 1)
        return uv, xc

    def cost_of(P, X):
        uv, xc = project_all(P, X)
        e = np.linalg.norm(uv - obs_uv, axis=1)
        c = np.where(e <= huber, 0.5 * e**2, huber * (e - 0.5 * huber))
        c = np.where(xc[:, 2] > 1e-6, c, huber * huber)
        total = c.sum()
        if has_d:
            rd = np.asarray(obs_dw) * (xc[:, 2] - np.asarray(obs_depth))
            rd = np.where(np.asarray(obs_dw) > 0, rd, 0.0)
            ed = np.abs(rd)
            total += np.where(ed <= huber, 0.5 * rd**2,
                              huber * (ed - 0.5 * huber)).sum()
        return total

    P = poses.copy()
    X = points.copy()
    lam = 1e-5
    cost = cost_of(P, X)
    dim = np_dim + 3 * n_points
    for _ in range(iters):
        uv, xc = project_all(P, X)
        ok = xc[:, 2] > 1e-6
        r = uv - obs_uv
        e = np.linalg.norm(r, axis=1)
        w = np.where(e <= huber, 1.0, huber / np.maximum(e, 1e-12))
        w = np.where(ok, w, 0.0)
        iz = 1.0 / np.maximum(xc[:, 2], 1e-9)
        Ju = np.stack([fx * iz, np.zeros_like(iz), -fx * xc[:, 0] * iz**2], 1)
        Jv = np.stack([np.zeros_like(iz), fy * iz, -fy * xc[:, 1] * iz**2], 1)
        rot = lambda Jp: -np.stack([
            Jp[:, 1] * xc[:, 2] - Jp[:, 2] * xc[:, 1],
            Jp[:, 2] * xc[:, 0] - Jp[:, 0] * xc[:, 2],
            Jp[:, 0] * xc[:, 1] - Jp[:, 1] * xc[:, 0]], 1)
        Ja = np.concatenate([Ju, rot(Ju)], 1)  # [O,6]
        Jb = np.concatenate([Jv, rot(Jv)], 1)
        R = P[obs_pose][:, :3, :3]
        JuX = np.einsum("oi,oij->oj", Ju, R)  # [O,3]
        JvX = np.einsum("oi,oij->oj", Jv, R)

        H = np.zeros((dim, dim))
        g = np.zeros(dim)
        for o in range(n_obs):
            idx = []
            Jrow_u = []
            Jrow_v = []
            pi = obs_pose[o]
            if pi >= n_fixed:
                f0 = 6 * (pi - n_fixed)
                idx.extend(range(f0, f0 + 6))
                Jrow_u.extend(Ja[o])
                Jrow_v.extend(Jb[o])
            l0 = np_dim + 3 * obs_point[o]
            idx.extend(range(l0, l0 + 3))
            Jrow_u.extend(JuX[o])
            Jrow_v.extend(JvX[o])
            idx = np.array(idx)
            Jr_u = np.array(Jrow_u)
            Jr_v = np.array(Jrow_v)
            H[np.ix_(idx, idx)] += w[o] * (np.outer(Jr_u, Jr_u)
                                           + np.outer(Jr_v, Jr_v))
            g[idx] += w[o] * (Jr_u * r[o, 0] + Jr_v * r[o, 1])
            if has_d and obs_dw[o] > 0:
                wd = obs_dw[o]
                rd = wd * (xc[o, 2] - obs_depth[o])
                ed = abs(rd)
                wh = 1.0 if (huber <= 0 or ed <= huber) else huber / max(
                    ed, 1e-12)
                Jrow_d = []
                if pi >= n_fixed:
                    Jrow_d.extend([0.0, 0.0, wd, wd * xc[o, 1],
                                   -wd * xc[o, 0], 0.0])
                R3 = P[pi][2, :3]
                Jrow_d.extend(wd * R3)
                Jr_d = np.array(Jrow_d)
                H[np.ix_(idx, idx)] += wh * np.outer(Jr_d, Jr_d)
                g[idx] += wh * Jr_d * rd
        try:
            dx = -np.linalg.solve(H + lam * (np.eye(dim) * (1 + np.diag(H))),
                                  g)
        except np.linalg.LinAlgError:
            lam *= 10
            continue
        P_try = P.copy()
        X_try = X + dx[np_dim:].reshape(-1, 3)
        from photo_slam_tpu.utils.math import se3_exp_numpy
        for f in range(n_free):
            P_try[n_fixed + f] = (se3_exp_numpy(dx[6 * f:6 * f + 6])
                                  @ P_try[n_fixed + f])
        c2 = cost_of(P_try, X_try)
        if c2 < cost:
            P, X, cost, lam = P_try, X_try, c2, max(lam * 0.5, 1e-9)
        else:
            lam *= 10
            if lam > 1e8:
                break
    uv, xc = project_all(P, X)
    inl = ((np.linalg.norm(uv - obs_uv, axis=1) < chi2)
           & (xc[:, 2] > 1e-6)).sum()
    return int(inl), P, X


def _ba_solve_once(P, n_fixed, X, op, ol, uv, fx, fy, cx, cy, huber,
                   chi2_px, max_iters, od, ow):
    lib = _load_slam()
    if lib is None:
        return _local_ba_numpy(P, n_fixed, X, op, ol, uv, fx, fy, cx, cy,
                               huber, chi2_px, max_iters, obs_depth=od,
                               obs_dw=ow)
    flatP = np.ascontiguousarray(P.reshape(len(P), 16))
    n = lib.local_ba(len(P), n_fixed, flatP, len(X), X, len(op), op, ol,
                     uv, od, ow, fx, fy, cx, cy, huber, chi2_px, max_iters)
    return int(n), flatP.reshape(-1, 4, 4), X


def _reproj_err(P, X, op, ol, uv, fx, fy, cx, cy):
    T = P[op]
    xc = np.einsum("oij,oj->oi", T[:, :3, :3], X[ol]) + T[:, :3, 3]
    z = np.maximum(xc[:, 2], 1e-9)
    u = fx * xc[:, 0] / z + cx
    v = fy * xc[:, 1] / z + cy
    err = np.hypot(u - uv[:, 0], v - uv[:, 1])
    return np.where(xc[:, 2] > 1e-6, err, np.inf)


def local_ba(poses_tcw: np.ndarray, n_fixed: int, points: np.ndarray,
             obs_pose: np.ndarray, obs_point: np.ndarray, obs_uv: np.ndarray,
             fx, fy, cx, cy, huber: float = 3.0, chi2_px: float = 5.0,
             max_iters: int = 10, obs_depth=None, obs_depth_weight=None):
    """Sliding-window bundle adjustment (reference:
    ORB-SLAM3/src/Optimizer.cc:1116 LocalBundleAdjustment).

    poses_tcw [P,4,4] world->camera (first n_fixed held constant),
    points [M,3] world, observations (pose idx, point idx, pixel uv).
    Optional per-observation depth constraints (obs_depth [O] metric depth,
    obs_depth_weight [O] residual scale, <=0 disables) — the role of the
    reference's RGBD/stereo BA edges, anchoring landmark depth where the
    window baseline is too narrow to triangulate.
    Two rounds with a chi2 outlier cut between them — the role of the
    reference's inlier re-classification between its BA stages.
    Returns (num_inliers, poses, points) — copies, inputs untouched.
    """
    P = np.ascontiguousarray(poses_tcw, np.float64).copy()
    X = np.ascontiguousarray(points, np.float64).copy()
    op = np.ascontiguousarray(obs_pose, np.int32)
    ol = np.ascontiguousarray(obs_point, np.int32)
    uv = np.ascontiguousarray(obs_uv, np.float64)
    od = (np.zeros(len(op)) if obs_depth is None
          else np.ascontiguousarray(obs_depth, np.float64))
    ow = (np.zeros(len(op)) if obs_depth_weight is None
          else np.ascontiguousarray(obs_depth_weight, np.float64))

    it1 = max(max_iters // 2, 3)
    _, P, X = _ba_solve_once(P, n_fixed, X, op, ol, uv, fx, fy, cx, cy,
                             huber, chi2_px, it1, od, ow)
    for cut in (2.0 * chi2_px, chi2_px):
        err = _reproj_err(P, X, op, ol, uv, fx, fy, cx, cy)
        keep = err < cut
        if keep.sum() < 6 or keep.sum() == len(op):
            continue
        # Points that lost all observations stay untouched by this round.
        _, P, X = _ba_solve_once(P, n_fixed, X, op[keep], ol[keep],
                                 np.ascontiguousarray(uv[keep]), fx, fy,
                                 cx, cy, huber, chi2_px, max_iters,
                                 np.ascontiguousarray(od[keep]),
                                 np.ascontiguousarray(ow[keep]))
    err = _reproj_err(P, X, op, ol, uv, fx, fy, cx, cy)
    return int((err < chi2_px).sum()), P, X


def _pose_graph_numpy(poses, n_fixed, ei, ej, eT, ew, iters):
    """Numeric-Jacobian GN fallback, same math as the native core."""
    from photo_slam_tpu.utils.math import (se3_exp_numpy, se3_log_numpy)

    P = poses.copy()
    n_free = len(P) - n_fixed
    if n_free <= 0:
        return P
    n = 6 * n_free

    def resid(P, e):
        M = np.linalg.inv(eT[e]) @ P[ei[e]] @ np.linalg.inv(P[ej[e]])
        return se3_log_numpy(M)

    def cost_of(P):
        return sum(0.5 * ew[e] * (resid(P, e) ** 2).sum()
                   for e in range(len(ei)))

    lam = 1e-6
    cost = cost_of(P)
    eps = 1e-6
    for _ in range(iters):
        H = np.zeros((n, n))
        g = np.zeros(n)
        for e in range(len(ei)):
            r0 = resid(P, e)
            rows = []
            for node in (ei[e], ej[e]):
                if node < n_fixed:
                    rows.append(None)
                    continue
                J = np.zeros((6, 6))
                for d in range(6):
                    xi = np.zeros(6)
                    xi[d] = eps
                    save = P[node].copy()
                    P[node] = se3_exp_numpy(xi) @ P[node]
                    J[:, d] = (resid(P, e) - r0) / eps
                    P[node] = save
                rows.append((node, J))
            for item in rows:
                if item is None:
                    continue
                node, J = item
                f0 = 6 * (node - n_fixed)
                g[f0:f0 + 6] += ew[e] * J.T @ r0
                for item2 in rows:
                    if item2 is None:
                        continue
                    node2, J2 = item2
                    f1 = 6 * (node2 - n_fixed)
                    H[f0:f0 + 6, f1:f1 + 6] += ew[e] * J.T @ J2
        try:
            dx = -np.linalg.solve(H + lam * (np.eye(n) * (1 + np.diag(H))), g)
        except np.linalg.LinAlgError:
            lam *= 10
            continue
        P_try = P.copy()
        for f in range(n_free):
            P_try[n_fixed + f] = (se3_exp_numpy(dx[6 * f:6 * f + 6])
                                  @ P_try[n_fixed + f])
        c2 = cost_of(P_try)
        if c2 < cost:
            P, cost, lam = P_try, c2, max(lam * 0.5, 1e-10)
        else:
            lam *= 10
            if lam > 1e8:
                break
    return P


def pose_graph_optimize(poses_tcw: np.ndarray, n_fixed: int,
                        edges_i: np.ndarray, edges_j: np.ndarray,
                        edges_T: np.ndarray, edges_w=None,
                        max_iters: int = 20) -> np.ndarray:
    """SE3 pose-graph optimization (reference:
    ORB-SLAM3/src/Optimizer.cc:1762 OptimizeEssentialGraph).

    poses_tcw [N,4,4]; edges (i, j, T_ij = Ti @ inv(Tj) measured, weight).
    Returns corrected poses (copy).
    """
    P = np.ascontiguousarray(poses_tcw, np.float64).copy()
    ei = np.ascontiguousarray(edges_i, np.int32)
    ej = np.ascontiguousarray(edges_j, np.int32)
    eT = np.ascontiguousarray(edges_T, np.float64)
    ew = (np.ones(len(ei)) if edges_w is None
          else np.ascontiguousarray(edges_w, np.float64))
    lib = _load_slam()
    if lib is None:
        return _pose_graph_numpy(P, n_fixed, ei, ej, eT, ew, max_iters)
    flat = np.ascontiguousarray(P.reshape(len(P), 16))
    lib.pose_graph_optimize(len(P), n_fixed, flat, len(ei), ei, ej,
                            np.ascontiguousarray(eT.reshape(len(ei), 16)),
                            ew, max_iters)
    return flat.reshape(-1, 4, 4)


def slam_native_available() -> bool:
    return _load_slam() is not None
