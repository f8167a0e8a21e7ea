// Sliding-window bundle adjustment and SE3 pose-graph optimization: the
// native optimization cores of the SLAM frontend. These play the roles of
// ORB-SLAM3's g2o-based Optimizer::LocalBundleAdjustment (reference:
// ORB-SLAM3/src/Optimizer.cc:1116) and Optimizer::OptimizeEssentialGraph
// (reference: ORB-SLAM3/src/Optimizer.cc:1762) in this framework — built
// from scratch as dependency-free C++17 (no g2o/Eigen), exposed over a C ABI
// for ctypes.
//
// local_ba: Gauss-Newton with the standard Schur complement over landmarks —
//   H = [Hpp Hpl; Hlp Hll] with Hll block-diagonal (3x3 per point), reduced
//   camera system S = Hpp - Hpl Hll^-1 Hlp solved densely (windows are
//   small: 6*P <= ~60 unknowns), then landmark back-substitution.
//
// pose_graph_optimize: relative-SE3 constraints r = log(T_meas^-1 Ti Tj^-1),
//   numeric Jacobians, dense Cholesky of the 6N system with LM damping.
//   At keyframe counts seen online (N <= a few hundred) the dense solve is
//   milliseconds.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 slam_opt.cpp -o libslam_opt.so

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Small SE3 toolbox (row-major 4x4, world->camera convention).
// ---------------------------------------------------------------------------

void mat4_mul(const double* A, const double* B, double* C) {
    double R[16];
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) {
            double s = 0;
            for (int k = 0; k < 4; ++k) s += A[i * 4 + k] * B[k * 4 + j];
            R[i * 4 + j] = s;
        }
    std::memcpy(C, R, sizeof(R));
}

void mat4_inv_se3(const double* T, double* Ti) {
    // [R t; 0 1]^-1 = [R' -R't; 0 1]
    double R[16] = {0};
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) R[i * 4 + j] = T[j * 4 + i];
    for (int i = 0; i < 3; ++i) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += R[i * 4 + k] * T[k * 4 + 3];
        R[i * 4 + 3] = -s;
    }
    R[15] = 1.0;
    std::memcpy(Ti, R, sizeof(R));
}

void so3_exp(const double w[3], double R[9]) {
    double theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
    double theta = std::sqrt(theta2);
    double a, b;
    if (theta < 1e-9) {
        a = 1.0 - theta2 / 6.0;
        b = 0.5 - theta2 / 24.0;
    } else {
        a = std::sin(theta) / theta;
        b = (1.0 - std::cos(theta)) / theta2;
    }
    double wx = w[0], wy = w[1], wz = w[2];
    double K[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
    double K2[9];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += K[i * 3 + k] * K[k * 3 + j];
            K2[i * 3 + j] = s;
        }
    for (int i = 0; i < 9; ++i)
        R[i] = (i % 4 == 0 ? 1.0 : 0.0) + a * K[i] + b * K2[i];
}

void so3_log(const double R[9], double w[3]) {
    double tr = R[0] + R[4] + R[8];
    double c = 0.5 * (tr - 1.0);
    if (c > 1.0) c = 1.0;
    if (c < -1.0) c = -1.0;
    double theta = std::acos(c);
    double v[3] = {R[7] - R[5], R[2] - R[6], R[3] - R[1]};
    if (theta < 1e-9) {
        w[0] = 0.5 * v[0];
        w[1] = 0.5 * v[1];
        w[2] = 0.5 * v[2];
        return;
    }
    if (theta > M_PI - 1e-6) {
        // Near pi: R ~ 2*u*u^T - I. Pivot on the largest diagonal element
        // (its axis component is largest and safely nonzero) and derive the
        // other two components from the symmetric off-diagonals — sign
        // fixes keyed off a single fixed component are wrong when that
        // component vanishes (e.g. axis (0, a, -a)).
        int k = 0;
        if (R[4] > R[k * 3 + k]) k = 1;
        if (R[8] > R[k * 3 + k]) k = 2;
        int i = (k + 1) % 3, j = (k + 2) % 3;
        double uk = std::sqrt(std::fmax((R[k * 3 + k] + 1.0) / 2.0, 1e-12));
        double ui = (R[k * 3 + i] + R[i * 3 + k]) / (4.0 * uk);
        double uj = (R[k * 3 + j] + R[j * 3 + k]) / (4.0 * uk);
        w[k] = uk; w[i] = ui; w[j] = uj;
        double n = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
        if (n > 1e-12) {
            w[0] *= theta / n;
            w[1] *= theta / n;
            w[2] *= theta / n;
        }
        return;
    }
    double s = theta / (2.0 * std::sin(theta));
    w[0] = s * v[0];
    w[1] = s * v[1];
    w[2] = s * v[2];
}

// se3 exp as 4x4; xi = (t[3], w[3]) with left-Jacobian applied to t.
void se3_exp(const double xi[6], double T[16]) {
    double R[9];
    so3_exp(xi + 3, R);
    double theta2 = xi[3] * xi[3] + xi[4] * xi[4] + xi[5] * xi[5];
    double theta = std::sqrt(theta2);
    double a, b;
    if (theta < 1e-9) {
        a = 0.5 - theta2 / 24.0;
        b = 1.0 / 6.0 - theta2 / 120.0;
    } else {
        a = (1.0 - std::cos(theta)) / theta2;
        b = (theta - std::sin(theta)) / (theta2 * theta);
    }
    double wx = xi[3], wy = xi[4], wz = xi[5];
    double K[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
    double K2[9];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += K[i * 3 + k] * K[k * 3 + j];
            K2[i * 3 + j] = s;
        }
    double V[9];
    for (int i = 0; i < 9; ++i)
        V[i] = (i % 4 == 0 ? 1.0 : 0.0) + a * K[i] + b * K2[i];
    for (int i = 0; i < 3; ++i) {
        for (int j = 0; j < 3; ++j) T[i * 4 + j] = R[i * 3 + j];
        double s = 0;
        for (int k = 0; k < 3; ++k) s += V[i * 3 + k] * xi[k];
        T[i * 4 + 3] = s;
    }
    T[12] = T[13] = T[14] = 0;
    T[15] = 1;
}

void se3_log(const double T[16], double xi[6]) {
    double R[9];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) R[i * 3 + j] = T[i * 4 + j];
    so3_log(R, xi + 3);
    double theta2 = xi[3] * xi[3] + xi[4] * xi[4] + xi[5] * xi[5];
    double theta = std::sqrt(theta2);
    // V^-1 t
    double wx = xi[3], wy = xi[4], wz = xi[5];
    double K[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
    double K2[9];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += K[i * 3 + k] * K[k * 3 + j];
            K2[i * 3 + j] = s;
        }
    double c;
    if (theta < 1e-9) {
        c = 1.0 / 12.0;
    } else {
        c = (1.0 - theta * std::cos(theta / 2.0) /
                       (2.0 * std::sin(theta / 2.0))) /
            theta2;
    }
    double Vi[9];
    for (int i = 0; i < 9; ++i)
        Vi[i] = (i % 4 == 0 ? 1.0 : 0.0) - 0.5 * K[i] + c * K2[i];
    double t[3] = {T[3], T[7], T[11]};
    for (int i = 0; i < 3; ++i) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += Vi[i * 3 + k] * t[k];
        xi[i] = s;
    }
}

// Dense Cholesky solve (in place); returns false if not SPD.
bool chol_solve(std::vector<double>& A, std::vector<double>& b, int n) {
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j <= i; ++j) {
            double s = A[i * n + j];
            for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
            if (i == j) {
                if (s <= 0) return false;
                A[i * n + i] = std::sqrt(s);
            } else {
                A[i * n + j] = s / A[j * n + j];
            }
        }
    }
    for (int i = 0; i < n; ++i) {
        double s = b[i];
        for (int k = 0; k < i; ++k) s -= A[i * n + k] * b[k];
        b[i] = s / A[i * n + i];
    }
    for (int i = n - 1; i >= 0; --i) {
        double s = b[i];
        for (int k = i + 1; k < n; ++k) s -= A[k * n + i] * b[k];
        b[i] = s / A[i * n + i];
    }
    return true;
}

bool inv3(const double A[9], double B[9]) {
    double det = A[0] * (A[4] * A[8] - A[5] * A[7]) -
                 A[1] * (A[3] * A[8] - A[5] * A[6]) +
                 A[2] * (A[3] * A[7] - A[4] * A[6]);
    if (std::fabs(det) < 1e-18) return false;
    double id = 1.0 / det;
    B[0] = (A[4] * A[8] - A[5] * A[7]) * id;
    B[1] = (A[2] * A[7] - A[1] * A[8]) * id;
    B[2] = (A[1] * A[5] - A[2] * A[4]) * id;
    B[3] = (A[5] * A[6] - A[3] * A[8]) * id;
    B[4] = (A[0] * A[8] - A[2] * A[6]) * id;
    B[5] = (A[2] * A[3] - A[0] * A[5]) * id;
    B[6] = (A[3] * A[7] - A[4] * A[6]) * id;
    B[7] = (A[1] * A[6] - A[0] * A[7]) * id;
    B[8] = (A[0] * A[4] - A[1] * A[3]) * id;
    return true;
}

struct BAProblem {
    int n_poses, n_fixed, n_points, n_obs;
    double* poses;           // [P,16]
    double* points;          // [M,3]
    const int* obs_pose;
    const int* obs_point;
    const double* obs_uv;
    double fx, fy, cx, cy, huber;
    // Optional depth constraints (RGBD/stereo BA, the role of ORB-SLAM3's
    // stereo edges): residual r_d = obs_dw[o] * (z_cam - obs_depth[o]) when
    // obs_dw[o] > 0. Anchors landmark depth so narrow-baseline windows
    // cannot re-triangulate depth-seeded points badly.
    const double* obs_depth;  // nullable
    const double* obs_dw;     // nullable
};

double ba_cost(const BAProblem& p, const double* poses, const double* points) {
    double cost = 0;
    for (int o = 0; o < p.n_obs; ++o) {
        const double* T = poses + 16 * p.obs_pose[o];
        const double* X = points + 3 * p.obs_point[o];
        double xc = T[0] * X[0] + T[1] * X[1] + T[2] * X[2] + T[3];
        double yc = T[4] * X[0] + T[5] * X[1] + T[6] * X[2] + T[7];
        double zc = T[8] * X[0] + T[9] * X[1] + T[10] * X[2] + T[11];
        if (zc <= 1e-6) {
            cost += p.huber * p.huber;  // fixed penalty for behind-camera
            continue;
        }
        double u = p.fx * xc / zc + p.cx;
        double v = p.fy * yc / zc + p.cy;
        double rx = u - p.obs_uv[2 * o], ry = v - p.obs_uv[2 * o + 1];
        double e = std::sqrt(rx * rx + ry * ry);
        cost += (p.huber <= 0 || e <= p.huber) ? 0.5 * e * e
                                               : p.huber * (e - 0.5 * p.huber);
        if (p.obs_dw && p.obs_dw[o] > 0) {
            double rd = p.obs_dw[o] * (zc - p.obs_depth[o]);
            double ed = std::fabs(rd);
            cost += (p.huber <= 0 || ed <= p.huber)
                        ? 0.5 * rd * rd
                        : p.huber * (ed - 0.5 * p.huber);
        }
    }
    return cost;
}

}  // namespace

extern "C" {

// Sliding-window bundle adjustment (Schur complement). Poses [n_poses,16]
// row-major world->camera SE3; the first n_fixed poses are held constant.
// Points [n_points,3] world. Observations: (pose index, point index, u, v).
// Poses and points are updated in place. Returns the number of observations
// whose final reprojection error is below chi2_px (or -1 on failure).
int local_ba(int n_poses, int n_fixed, double* poses, int n_points,
             double* points, int n_obs, const int* obs_pose,
             const int* obs_point, const double* obs_uv,
             const double* obs_depth, const double* obs_dw, double fx,
             double fy, double cx, double cy, double huber, double chi2_px,
             int max_iters) {
    if (n_poses <= 0 || n_points <= 0 || n_obs <= 0) return -1;
    BAProblem p{n_poses, n_fixed, n_points, n_obs, poses,   points,
                obs_pose, obs_point, obs_uv, fx,    fy,     cx,
                cy,       huber,     obs_depth, obs_dw};
    int n_free = n_poses - n_fixed;
    if (n_free < 0) return -1;
    int np = 6 * n_free;

    std::vector<double> Hpp(np * np), gp(np);
    std::vector<double> Hll(9 * n_points), gl(3 * n_points);
    // Hpl blocks stored per observation (6x3 each), with obs grouping.
    std::vector<double> W(n_obs * 18);
    std::vector<double> S(np * np), gs(np);

    double lambda = 1e-5;
    double cost = ba_cost(p, poses, points);

    std::vector<double> poses_try(16 * n_poses), points_try(3 * n_points);

    for (int it = 0; it < max_iters; ++it) {
        std::fill(Hpp.begin(), Hpp.end(), 0.0);
        std::fill(gp.begin(), gp.end(), 0.0);
        std::fill(Hll.begin(), Hll.end(), 0.0);
        std::fill(gl.begin(), gl.end(), 0.0);
        std::fill(W.begin(), W.end(), 0.0);

        // Accumulate.
        for (int o = 0; o < n_obs; ++o) {
            int pi = obs_pose[o], li = obs_point[o];
            const double* T = poses + 16 * pi;
            const double* X = points + 3 * li;
            double xc = T[0] * X[0] + T[1] * X[1] + T[2] * X[2] + T[3];
            double yc = T[4] * X[0] + T[5] * X[1] + T[6] * X[2] + T[7];
            double zc = T[8] * X[0] + T[9] * X[1] + T[10] * X[2] + T[11];
            if (zc <= 1e-6) continue;
            double iz = 1.0 / zc, iz2 = iz * iz;
            double u = fx * xc * iz + cx, v = fy * yc * iz + cy;
            double rx = u - obs_uv[2 * o], ry = v - obs_uv[2 * o + 1];
            double e = std::sqrt(rx * rx + ry * ry);
            double wgt = (huber <= 0 || e <= huber)
                             ? 1.0
                             : huber / std::fmax(e, 1e-12);

            // Jacobians w.r.t. camera coords.
            double Ju[3] = {fx * iz, 0.0, -fx * xc * iz2};
            double Jv[3] = {0.0, fy * iz, -fy * yc * iz2};
            // Pose part (left-mult se3: [I | -[Xc]x]).
            double Xc[3] = {xc, yc, zc};
            double Ja[6], Jb[6];
            for (int k = 0; k < 3; ++k) {
                Ja[k] = Ju[k];
                Jb[k] = Jv[k];
            }
            Ja[3] = -(Ju[1] * Xc[2] - Ju[2] * Xc[1]);
            Ja[4] = -(Ju[2] * Xc[0] - Ju[0] * Xc[2]);
            Ja[5] = -(Ju[0] * Xc[1] - Ju[1] * Xc[0]);
            Jb[3] = -(Jv[1] * Xc[2] - Jv[2] * Xc[1]);
            Jb[4] = -(Jv[2] * Xc[0] - Jv[0] * Xc[2]);
            Jb[5] = -(Jv[0] * Xc[1] - Jv[1] * Xc[0]);
            // Point part: J_uv,X = J_uv,Xc * R.
            double JpX[6];  // [2,3]
            for (int j = 0; j < 3; ++j) {
                JpX[j] = Ju[0] * T[0 * 4 + j] + Ju[1] * T[1 * 4 + j] +
                         Ju[2] * T[2 * 4 + j];
                JpX[3 + j] = Jv[0] * T[0 * 4 + j] + Jv[1] * T[1 * 4 + j] +
                             Jv[2] * T[2 * 4 + j];
            }

            // Landmark block + gradient.
            double* Hl = &Hll[9 * li];
            double* gL = &gl[3 * li];
            for (int a = 0; a < 3; ++a) {
                gL[a] += wgt * (JpX[a] * rx + JpX[3 + a] * ry);
                for (int b = 0; b < 3; ++b)
                    Hl[a * 3 + b] +=
                        wgt * (JpX[a] * JpX[b] + JpX[3 + a] * JpX[3 + b]);
            }

            if (pi >= n_fixed) {
                int pf = pi - n_fixed;
                double* gP = &gp[6 * pf];
                for (int a = 0; a < 6; ++a) {
                    gP[a] += wgt * (Ja[a] * rx + Jb[a] * ry);
                    for (int b = 0; b < 6; ++b)
                        Hpp[(6 * pf + a) * np + (6 * pf + b)] +=
                            wgt * (Ja[a] * Ja[b] + Jb[a] * Jb[b]);
                }
                // W block (6x3).
                double* Wb = &W[18 * o];
                for (int a = 0; a < 6; ++a)
                    for (int b = 0; b < 3; ++b)
                        Wb[a * 3 + b] =
                            wgt * (Ja[a] * JpX[b] + Jb[a] * JpX[3 + b]);
            }

            // Depth residual (RGBD/stereo anchoring): rd = wd*(zc - d).
            if (obs_dw && obs_dw[o] > 0) {
                double wd = obs_dw[o];
                double rd = wd * (zc - obs_depth[o]);
                double ed = std::fabs(rd);
                double wh = (huber <= 0 || ed <= huber)
                                ? 1.0
                                : huber / std::fmax(ed, 1e-12);
                // Pose row: wd * [0,0,1, Xc_y, -Xc_x, 0]; point row: wd*R[2].
                double Jd[6] = {0, 0, wd, wd * Xc[1], -wd * Xc[0], 0};
                double JdX[3] = {wd * T[8], wd * T[9], wd * T[10]};
                double* Hl = &Hll[9 * li];
                double* gL = &gl[3 * li];
                for (int a = 0; a < 3; ++a) {
                    gL[a] += wh * JdX[a] * rd;
                    for (int b = 0; b < 3; ++b)
                        Hl[a * 3 + b] += wh * JdX[a] * JdX[b];
                }
                if (pi >= n_fixed) {
                    int pf = pi - n_fixed;
                    double* gP = &gp[6 * pf];
                    double* Wb = &W[18 * o];
                    for (int a = 0; a < 6; ++a) {
                        gP[a] += wh * Jd[a] * rd;
                        for (int b = 0; b < 6; ++b)
                            Hpp[(6 * pf + a) * np + (6 * pf + b)] +=
                                wh * Jd[a] * Jd[b];
                        for (int b = 0; b < 3; ++b)
                            Wb[a * 3 + b] += wh * Jd[a] * JdX[b];
                    }
                }
            }
        }

        // Damp landmark blocks and invert.
        std::vector<double> Hll_inv(9 * n_points);
        std::vector<char> l_ok(n_points, 0);
        for (int l = 0; l < n_points; ++l) {
            double A[9];
            std::memcpy(A, &Hll[9 * l], sizeof(A));
            for (int d = 0; d < 3; ++d)
                A[d * 3 + d] += lambda * (1.0 + A[d * 3 + d]);
            l_ok[l] = inv3(A, &Hll_inv[9 * l]) ? 1 : 0;
        }

        // Schur: S = Hpp(damped) - sum_obs W Hll^-1 W^T (paired over obs of
        // the same landmark). Since W is stored per observation, accumulate
        // cross terms per landmark: first collect per-landmark lists.
        S.assign(np * np, 0.0);
        gs.assign(gp.begin(), gp.end());
        for (int i = 0; i < np * np; ++i) S[i] = Hpp[i];
        for (int d = 0; d < np; ++d)
            S[d * np + d] += lambda * (1.0 + S[d * np + d]);

        // For each pair of observations of the same landmark (including
        // self-pairs), subtract W_i Hll^-1 W_j^T. Build landmark -> obs list.
        std::vector<int> head(n_points, -1), nxt(n_obs, -1);
        for (int o = 0; o < n_obs; ++o) {
            int li = obs_point[o];
            nxt[o] = head[li];
            head[li] = o;
        }
        for (int l = 0; l < n_points; ++l) {
            if (!l_ok[l]) continue;
            const double* Hi = &Hll_inv[9 * l];
            // y_l = Hll^-1 gl
            double y[3];
            for (int a = 0; a < 3; ++a)
                y[a] = Hi[a * 3 + 0] * gl[3 * l + 0] +
                       Hi[a * 3 + 1] * gl[3 * l + 1] +
                       Hi[a * 3 + 2] * gl[3 * l + 2];
            for (int o1 = head[l]; o1 != -1; o1 = nxt[o1]) {
                int p1 = obs_pose[o1];
                if (p1 < n_fixed) continue;
                int f1 = p1 - n_fixed;
                const double* W1 = &W[18 * o1];
                // gs -= W1 y
                for (int a = 0; a < 6; ++a)
                    gs[6 * f1 + a] -= W1[a * 3 + 0] * y[0] +
                                      W1[a * 3 + 1] * y[1] +
                                      W1[a * 3 + 2] * y[2];
                // WH = W1 * Hll^-1 (6x3)
                double WH[18];
                for (int a = 0; a < 6; ++a)
                    for (int b = 0; b < 3; ++b)
                        WH[a * 3 + b] = W1[a * 3 + 0] * Hi[0 * 3 + b] +
                                        W1[a * 3 + 1] * Hi[1 * 3 + b] +
                                        W1[a * 3 + 2] * Hi[2 * 3 + b];
                for (int o2 = head[l]; o2 != -1; o2 = nxt[o2]) {
                    int p2 = obs_pose[o2];
                    if (p2 < n_fixed) continue;
                    int f2 = p2 - n_fixed;
                    const double* W2 = &W[18 * o2];
                    for (int a = 0; a < 6; ++a)
                        for (int b = 0; b < 6; ++b)
                            S[(6 * f1 + a) * np + (6 * f2 + b)] -=
                                WH[a * 3 + 0] * W2[b * 3 + 0] +
                                WH[a * 3 + 1] * W2[b * 3 + 1] +
                                WH[a * 3 + 2] * W2[b * 3 + 2];
                }
            }
        }

        std::vector<double> Ssolve = S, dxp = gs;
        bool ok = (np == 0) || chol_solve(Ssolve, dxp, np);
        if (!ok) {
            lambda *= 10;
            if (lambda > 1e8) break;
            continue;
        }
        for (int i = 0; i < np; ++i) dxp[i] = -dxp[i];

        // Back-substitute landmarks: dxl = Hll^-1 (-gl - W^T dxp).
        std::vector<double> rhs(3 * n_points);
        for (int l = 0; l < n_points; ++l) {
            rhs[3 * l + 0] = -gl[3 * l + 0];
            rhs[3 * l + 1] = -gl[3 * l + 1];
            rhs[3 * l + 2] = -gl[3 * l + 2];
        }
        for (int o = 0; o < n_obs; ++o) {
            int pi = obs_pose[o];
            if (pi < n_fixed) continue;
            int pf = pi - n_fixed;
            int li = obs_point[o];
            const double* Wb = &W[18 * o];
            for (int b = 0; b < 3; ++b) {
                double s = 0;
                for (int a = 0; a < 6; ++a)
                    s += Wb[a * 3 + b] * dxp[6 * pf + a];
                rhs[3 * li + b] -= s;
            }
        }
        // Apply updates to trial copies.
        std::memcpy(poses_try.data(), poses, 16 * n_poses * sizeof(double));
        std::memcpy(points_try.data(), points, 3 * n_points * sizeof(double));
        for (int f = 0; f < n_free; ++f) {
            double dT[16];
            se3_exp(&dxp[6 * f], dT);
            mat4_mul(dT, &poses_try[16 * (n_fixed + f)],
                     &poses_try[16 * (n_fixed + f)]);
        }
        for (int l = 0; l < n_points; ++l) {
            if (!l_ok[l]) continue;
            const double* Hi = &Hll_inv[9 * l];
            for (int a = 0; a < 3; ++a) {
                double s = 0;
                for (int b = 0; b < 3; ++b)
                    s += Hi[a * 3 + b] * rhs[3 * l + b];
                points_try[3 * l + a] += s;
            }
        }
        double cost2 = ba_cost(p, poses_try.data(), points_try.data());
        if (cost2 < cost) {
            std::memcpy(poses, poses_try.data(),
                        16 * n_poses * sizeof(double));
            std::memcpy(points, points_try.data(),
                        3 * n_points * sizeof(double));
            cost = cost2;
            lambda = std::fmax(lambda * 0.5, 1e-9);
        } else {
            lambda *= 10;
            if (lambda > 1e8) break;
        }
    }

    // Final chi2 inlier count.
    int inliers = 0;
    for (int o = 0; o < n_obs; ++o) {
        const double* T = poses + 16 * obs_pose[o];
        const double* X = points + 3 * obs_point[o];
        double xc = T[0] * X[0] + T[1] * X[1] + T[2] * X[2] + T[3];
        double yc = T[4] * X[0] + T[5] * X[1] + T[6] * X[2] + T[7];
        double zc = T[8] * X[0] + T[9] * X[1] + T[10] * X[2] + T[11];
        if (zc <= 1e-6) continue;
        double u = fx * xc / zc + cx, v = fy * yc / zc + cy;
        double rx = u - obs_uv[2 * o], ry = v - obs_uv[2 * o + 1];
        if (rx * rx + ry * ry < chi2_px * chi2_px) ++inliers;
    }
    return inliers;
}

// SE3 pose-graph optimization. poses [n,16] world->camera, updated in place;
// edges (i, j) with measured relative transform T_ij = Ti * Tj^-1 (at the
// time the constraint was created), weight per edge. The first n_fixed poses
// are held constant. Returns iterations executed (or -1 on failure).
int pose_graph_optimize(int n_poses, int n_fixed, double* poses, int n_edges,
                        const int* edge_i, const int* edge_j,
                        const double* edge_T, const double* edge_w,
                        int max_iters) {
    if (n_poses <= 0 || n_edges <= 0 || n_fixed < 0) return -1;
    int n_free = n_poses - n_fixed;
    if (n_free <= 0) return 0;
    int n = 6 * n_free;

    auto residual = [&](const double* P, int e, double r[6]) {
        // r = log( T_meas^-1 * Ti * Tj^-1 )
        double Tji[16], M[16], Tm_inv[16];
        mat4_inv_se3(P + 16 * edge_j[e], Tji);
        mat4_mul(P + 16 * edge_i[e], Tji, M);
        mat4_inv_se3(edge_T + 16 * e, Tm_inv);
        mat4_mul(Tm_inv, M, M);
        se3_log(M, r);
    };
    auto total_cost = [&](const double* P) {
        double c = 0;
        for (int e = 0; e < n_edges; ++e) {
            double r[6];
            residual(P, e, r);
            double w = edge_w ? edge_w[e] : 1.0;
            for (int a = 0; a < 6; ++a) c += 0.5 * w * r[a] * r[a];
        }
        return c;
    };

    std::vector<double> H(n * n), g(n), P_try(16 * n_poses);
    double lambda = 1e-6;
    double cost = total_cost(poses);
    int it = 0;
    const double eps = 1e-6;
    for (; it < max_iters; ++it) {
        std::fill(H.begin(), H.end(), 0.0);
        std::fill(g.begin(), g.end(), 0.0);
        for (int e = 0; e < n_edges; ++e) {
            int i = edge_i[e], j = edge_j[e];
            double w = edge_w ? edge_w[e] : 1.0;
            double r0[6];
            residual(poses, e, r0);
            // Numeric Jacobians w.r.t. left-multiplied se3 of pose i and j.
            double Ji[36], Jj[36];
            for (int d = 0; d < 6; ++d) {
                double xi[6] = {0, 0, 0, 0, 0, 0};
                xi[d] = eps;
                double dT[16], save[16], rp[6];
                se3_exp(xi, dT);
                if (i >= n_fixed) {
                    std::memcpy(save, poses + 16 * i, sizeof(save));
                    mat4_mul(dT, poses + 16 * i, poses + 16 * i);
                    residual(poses, e, rp);
                    std::memcpy(poses + 16 * i, save, sizeof(save));
                    for (int a = 0; a < 6; ++a)
                        Ji[a * 6 + d] = (rp[a] - r0[a]) / eps;
                }
                if (j >= n_fixed) {
                    std::memcpy(save, poses + 16 * j, sizeof(save));
                    mat4_mul(dT, poses + 16 * j, poses + 16 * j);
                    residual(poses, e, rp);
                    std::memcpy(poses + 16 * j, save, sizeof(save));
                    for (int a = 0; a < 6; ++a)
                        Jj[a * 6 + d] = (rp[a] - r0[a]) / eps;
                }
            }
            int fi = i - n_fixed, fj = j - n_fixed;
            for (int a = 0; a < 6; ++a) {
                for (int d = 0; d < 6; ++d) {
                    if (i >= n_fixed) g[6 * fi + d] += w * Ji[a * 6 + d] * r0[a];
                    if (j >= n_fixed) g[6 * fj + d] += w * Jj[a * 6 + d] * r0[a];
                }
            }
            for (int d1 = 0; d1 < 6; ++d1)
                for (int d2 = 0; d2 < 6; ++d2) {
                    double hii = 0, hjj = 0, hij = 0;
                    for (int a = 0; a < 6; ++a) {
                        if (i >= n_fixed)
                            hii += Ji[a * 6 + d1] * Ji[a * 6 + d2];
                        if (j >= n_fixed)
                            hjj += Jj[a * 6 + d1] * Jj[a * 6 + d2];
                        if (i >= n_fixed && j >= n_fixed)
                            hij += Ji[a * 6 + d1] * Jj[a * 6 + d2];
                    }
                    if (i >= n_fixed)
                        H[(6 * fi + d1) * n + (6 * fi + d2)] += w * hii;
                    if (j >= n_fixed)
                        H[(6 * fj + d1) * n + (6 * fj + d2)] += w * hjj;
                    if (i >= n_fixed && j >= n_fixed) {
                        H[(6 * fi + d1) * n + (6 * fj + d2)] += w * hij;
                        H[(6 * fj + d2) * n + (6 * fi + d1)] += w * hij;
                    }
                }
        }
        std::vector<double> A = H, b = g;
        for (int d = 0; d < n; ++d) A[d * n + d] += lambda * (1.0 + A[d * n + d]);
        if (!chol_solve(A, b, n)) {
            lambda *= 10;
            if (lambda > 1e8) break;
            continue;
        }
        std::memcpy(P_try.data(), poses, 16 * n_poses * sizeof(double));
        for (int f = 0; f < n_free; ++f) {
            double xi[6], dT[16];
            for (int d = 0; d < 6; ++d) xi[d] = -b[6 * f + d];
            se3_exp(xi, dT);
            mat4_mul(dT, &P_try[16 * (n_fixed + f)],
                     &P_try[16 * (n_fixed + f)]);
        }
        double cost2 = total_cost(P_try.data());
        if (cost2 < cost) {
            std::memcpy(poses, P_try.data(), 16 * n_poses * sizeof(double));
            double drop = cost - cost2;
            cost = cost2;
            lambda = std::fmax(lambda * 0.5, 1e-10);
            if (drop < 1e-12 * (1.0 + cost)) break;
        } else {
            lambda *= 10;
            if (lambda > 1e8) break;
        }
    }
    return it;
}

}  // extern "C"
