// Motion-only bundle adjustment: Gauss-Newton pose refinement with a Huber
// robustifier — the native core that plays the role of ORB-SLAM3's
// g2o-based Optimizer::PoseOptimization (reference: ORB-SLAM3/src/Optimizer.cc)
// in this framework's tracking frontend. Pure C++17, no dependencies;
// exposed over a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 pose_ba.cpp -o libpose_ba.so

#include <cmath>
#include <cstring>

namespace {

struct Mat3 {
    double m[9];
};

// exp map of so(3) (Rodrigues).
Mat3 so3_exp(const double w[3]) {
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
    // R = I + a*[w]x + b*[w]x^2
    double wx = w[0], wy = w[1], wz = w[2];
    double K[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
    double K2[9];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += K[i * 3 + k] * K[k * 3 + j];
            K2[i * 3 + j] = s;
        }
    Mat3 R;
    for (int i = 0; i < 9; ++i)
        R.m[i] = (i % 4 == 0 ? 1.0 : 0.0) + a * K[i] + b * K2[i];
    return R;
}

// Solve the 6x6 normal equations via Cholesky (with adaptive damping).
bool solve6(double H[36], const double g[6], double dx[6], double lambda) {
    double A[36];
    std::memcpy(A, H, sizeof(A));
    for (int i = 0; i < 6; ++i) A[i * 6 + i] += lambda * (1.0 + A[i * 6 + i]);
    // Cholesky A = L L^T
    double L[36] = {0};
    for (int i = 0; i < 6; ++i) {
        for (int j = 0; j <= i; ++j) {
            double s = A[i * 6 + j];
            for (int k = 0; k < j; ++k) s -= L[i * 6 + k] * L[j * 6 + k];
            if (i == j) {
                if (s <= 0) return false;
                L[i * 6 + i] = std::sqrt(s);
            } else {
                L[i * 6 + j] = s / L[j * 6 + j];
            }
        }
    }
    // Forward/back substitution
    double y[6];
    for (int i = 0; i < 6; ++i) {
        double s = g[i];
        for (int k = 0; k < i; ++k) s -= L[i * 6 + k] * y[k];
        y[i] = s / L[i * 6 + i];
    }
    for (int i = 5; i >= 0; --i) {
        double s = y[i];
        for (int k = i + 1; k < 6; ++k) s -= L[k * 6 + i] * dx[k];
        dx[i] = s / L[i * 6 + i];
    }
    return true;
}

double accumulate(const int n, const double* pts, const double* obs,
                  const unsigned char* inlier_mask, double fx, double fy,
                  double cx, double cy, double huber, const double* T,
                  double H[36], double g[6], int* num_valid) {
    std::memset(H, 0, 36 * sizeof(double));
    std::memset(g, 0, 6 * sizeof(double));
    double cost = 0.0;
    int valid = 0;
    for (int i = 0; i < n; ++i) {
        if (inlier_mask && !inlier_mask[i]) continue;
        const double* X = pts + 3 * i;
        double xc = T[0] * X[0] + T[1] * X[1] + T[2] * X[2] + T[3];
        double yc = T[4] * X[0] + T[5] * X[1] + T[6] * X[2] + T[7];
        double zc = T[8] * X[0] + T[9] * X[1] + T[10] * X[2] + T[11];
        if (zc <= 1e-6) continue;
        double iz = 1.0 / zc, iz2 = iz * iz;
        double u = fx * xc * iz + cx;
        double v = fy * yc * iz + cy;
        double rx = u - obs[2 * i];
        double ry = v - obs[2 * i + 1];
        double e = std::sqrt(rx * rx + ry * ry);
        // Huber weight
        double wgt = (e <= huber || huber <= 0) ? 1.0 : huber / e;
        cost += (e <= huber || huber <= 0)
                    ? 0.5 * e * e
                    : huber * (e - 0.5 * huber);
        ++valid;

        // d(u,v)/dXc
        double Ju[3] = {fx * iz, 0.0, -fx * xc * iz2};
        double Jv[3] = {0.0, fy * iz, -fy * yc * iz2};
        // dXc/dxi with xi = (t, w): [I | -[Xc]x]
        double Xc[3] = {xc, yc, zc};
        double Ja[6], Jb[6];
        for (int k = 0; k < 3; ++k) {
            Ja[k] = Ju[k];
            Jb[k] = Jv[k];
        }
        // -J * [Xc]x  ->  columns for rotation part
        Ja[3] = -(Ju[1] * Xc[2] - Ju[2] * Xc[1]);
        Ja[4] = -(Ju[2] * Xc[0] - Ju[0] * Xc[2]);
        Ja[5] = -(Ju[0] * Xc[1] - Ju[1] * Xc[0]);
        Jb[3] = -(Jv[1] * Xc[2] - Jv[2] * Xc[1]);
        Jb[4] = -(Jv[2] * Xc[0] - Jv[0] * Xc[2]);
        Jb[5] = -(Jv[0] * Xc[1] - Jv[1] * Xc[0]);

        for (int a = 0; a < 6; ++a) {
            g[a] += wgt * (Ja[a] * rx + Jb[a] * ry);
            for (int b = a; b < 6; ++b)
                H[a * 6 + b] += wgt * (Ja[a] * Ja[b] + Jb[a] * Jb[b]);
        }
    }
    for (int a = 0; a < 6; ++a)
        for (int b = 0; b < a; ++b) H[a * 6 + b] = H[b * 6 + a];
    *num_valid = valid;
    return cost;
}

void apply_update(double* T, const double dx[6]) {
    // Tcw <- exp(xi) * Tcw, xi = (t, w), left multiplication.
    Mat3 R = so3_exp(dx + 3);
    double Tn[16];
    for (int i = 0; i < 3; ++i) {
        for (int j = 0; j < 4; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += R.m[i * 3 + k] * T[k * 4 + j];
            Tn[i * 4 + j] = s + (j == 3 ? dx[i] : 0.0);
        }
    }
    Tn[12] = 0;
    Tn[13] = 0;
    Tn[14] = 0;
    Tn[15] = 1;
    std::memcpy(T, Tn, sizeof(Tn));
}

}  // namespace

extern "C" {

// Refine a world->camera pose against fixed 3D points. Returns the number of
// chi2 inliers at the final pose; pose_tcw (row-major 4x4) is updated in
// place; final_cost receives the robust cost.
int pose_optimize(int num_obs, const double* points_world,
                  const double* obs_px, double fx, double fy, double cx,
                  double cy, double huber_delta, double chi2_px,
                  int max_iters, double* pose_tcw, double* final_cost) {
    double H[36], g[6], dx[6];
    double lambda = 1e-4;
    int valid = 0;
    double cost = accumulate(num_obs, points_world, obs_px, nullptr, fx, fy,
                             cx, cy, huber_delta, pose_tcw, H, g, &valid);
    for (int it = 0; it < max_iters; ++it) {
        if (!solve6(H, g, dx, lambda)) {
            lambda *= 10;
            continue;
        }
        for (int a = 0; a < 6; ++a) dx[a] = -dx[a];
        double T_try[16];
        std::memcpy(T_try, pose_tcw, sizeof(T_try));
        apply_update(T_try, dx);
        double H2[36], g2[6];
        int valid2;
        double cost2 = accumulate(num_obs, points_world, obs_px, nullptr, fx,
                                  fy, cx, cy, huber_delta, T_try, H2, g2,
                                  &valid2);
        if (cost2 < cost) {
            std::memcpy(pose_tcw, T_try, sizeof(T_try));
            std::memcpy(H, H2, sizeof(H));
            std::memcpy(g, g2, sizeof(g));
            cost = cost2;
            valid = valid2;
            lambda = std::max(lambda * 0.5, 1e-9);
        } else {
            lambda *= 10;
            if (lambda > 1e6) break;
        }
    }
    if (final_cost) *final_cost = cost;

    // Count chi2 inliers at the final pose.
    int inliers = 0;
    for (int i = 0; i < num_obs; ++i) {
        const double* X = points_world + 3 * i;
        const double* T = pose_tcw;
        double xc = T[0] * X[0] + T[1] * X[1] + T[2] * X[2] + T[3];
        double yc = T[4] * X[0] + T[5] * X[1] + T[6] * X[2] + T[7];
        double zc = T[8] * X[0] + T[9] * X[1] + T[10] * X[2] + T[11];
        if (zc <= 1e-6) continue;
        double u = fx * xc / zc + cx;
        double v = fy * yc / zc + cy;
        double rx = u - obs_px[2 * i];
        double ry = v - obs_px[2 * i + 1];
        if (rx * rx + ry * ry < chi2_px * chi2_px) ++inliers;
    }
    return inliers;
}

}  // extern "C"
