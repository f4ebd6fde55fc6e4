// sgnerf_native: host-side runtime kernels for the TPU framework.
//
// The reference leans on CUDA for everything; on TPU the device side is
// XLA/Pallas, but the HOST side still has hot loops that would starve the
// accelerator if left in Python (SURVEY.md §7 "BPNet's per-step CPU work"):
//   * computeLinking: project N voxel centers into V views with depth
//     occlusion tests (reference models/bpneter/bpnet.py:117-142) — runs
//     every training step when the semantic branch is on;
//   * voxel downsampling closest-to-centroid (reference
//     models/mvs/mvs_utils.py:538-562) over up-to-80M-point clouds at
//     bootstrap;
//   * binary PLY vertex parsing into packed float arrays.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// OpenMP parallel where it matters. Build: python native/build.py

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <unordered_map>
#include <cstdio>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Project points into a view and test depth agreement.
//   c2w: 4x4 row-major camera-to-world; intr: fx, fy, cx, cy
//   depth: H*W row-major metres; out_link: N*3 int32 [row, col, valid]
void compute_linking(const float* xyz, int64_t n,
                     const double* c2w16, double fx, double fy,
                     double cx, double cy,
                     const float* depth, int64_t H, int64_t W,
                     double voxel_size, int32_t* out_link) {
    // invert the rigid transform: R^T, -R^T t
    double R[9], t[3];
    for (int i = 0; i < 3; i++) {
        for (int j = 0; j < 3; j++) R[i * 3 + j] = c2w16[j * 4 + i];
        t[i] = c2w16[i * 4 + 3];
    }
    double ti[3];
    for (int i = 0; i < 3; i++)
        ti[i] = -(R[i * 3 + 0] * t[0] + R[i * 3 + 1] * t[1]
                  + R[i * 3 + 2] * t[2]);

#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < n; p++) {
        const float* q = xyz + p * 3;
        double x = R[0] * q[0] + R[1] * q[1] + R[2] * q[2] + ti[0];
        double y = R[3] * q[0] + R[4] * q[1] + R[5] * q[2] + ti[1];
        double z = R[6] * q[0] + R[7] * q[1] + R[8] * q[2] + ti[2];
        int32_t* o = out_link + p * 3;
        o[0] = 0; o[1] = 0; o[2] = 0;
        if (z <= 1e-6) continue;
        long px = lround(x * fx / z + cx);
        long py = lround(y * fy / z + cy);
        if (px < 0 || py < 0 || px >= W || py >= H) continue;
        double d = depth[py * W + px];
        if (std::fabs(d - z) <= voxel_size) {
            o[0] = (int32_t)py; o[1] = (int32_t)px; o[2] = 1;
        }
    }
}

// Voxel-downsample: closest-point-to-centroid representative per voxel.
// Returns the number of kept points; indices written to out_idx (caller
// allocates n entries; only the first `ret` are valid).
int64_t vox_downsample_closest(const float* xyz, int64_t n, int64_t vox_res,
                               int64_t* out_idx) {
    // bounding cube, edge *1.05 (reference semantics)
    double mn[3] = {1e30, 1e30, 1e30}, mx[3] = {-1e30, -1e30, -1e30};
    for (int64_t i = 0; i < n; i++)
        for (int d = 0; d < 3; d++) {
            double v = xyz[i * 3 + d];
            if (v < mn[d]) mn[d] = v;
            if (v > mx[d]) mx[d] = v;
        }
    double edge = 0.0;
    for (int d = 0; d < 3; d++) edge = std::max(edge, mx[d] - mn[d]);
    edge *= 1.05;
    double smin[3];
    for (int d = 0; d < 3; d++)
        smin[d] = (mx[d] + mn[d]) / 2 - edge / 2;
    double vsz = edge / (double)vox_res;

    struct Acc { double sx, sy, sz; int64_t cnt; };
    std::unordered_map<int64_t, Acc> acc;
    acc.reserve(n / 4);
    std::vector<int64_t> key(n);
    for (int64_t i = 0; i < n; i++) {
        int64_t kx = (int64_t)std::floor((xyz[i * 3] - smin[0]) / vsz);
        int64_t ky = (int64_t)std::floor((xyz[i * 3 + 1] - smin[1]) / vsz);
        int64_t kz = (int64_t)std::floor((xyz[i * 3 + 2] - smin[2]) / vsz);
        int64_t k = (kx << 42) | (ky << 21) | kz;
        key[i] = k;
        auto& a = acc[k];
        a.sx += xyz[i * 3]; a.sy += xyz[i * 3 + 1]; a.sz += xyz[i * 3 + 2];
        a.cnt += 1;
    }
    struct Best { double d2; int64_t idx; };
    std::unordered_map<int64_t, Best> best;
    best.reserve(acc.size());
    for (int64_t i = 0; i < n; i++) {
        const Acc& a = acc[key[i]];
        double cxm = a.sx / a.cnt, cym = a.sy / a.cnt, czm = a.sz / a.cnt;
        double dx = xyz[i * 3] - cxm, dy = xyz[i * 3 + 1] - cym,
               dz = xyz[i * 3 + 2] - czm;
        double d2 = dx * dx + dy * dy + dz * dz;
        auto it = best.find(key[i]);
        if (it == best.end() || d2 < it->second.d2)
            best[key[i]] = {d2, i};
    }
    int64_t m = 0;
    for (auto& kv : best) out_idx[m++] = kv.second.idx;
    std::sort(out_idx, out_idx + m);
    return m;
}

// Parallel brute-force nearest-view assignment (bootstrap):
// score = cos(angle to view dir) / sqrt(dist); out: argmax view per point.
void nearest_view(const float* xyz, int64_t n, const float* campos,
                  const float* camdir, int64_t v, int32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        double bests = -1e30; int32_t bestv = 0;
        for (int64_t c = 0; c < v; c++) {
            double dx = xyz[i * 3] - campos[c * 3];
            double dy = xyz[i * 3 + 1] - campos[c * 3 + 1];
            double dz = xyz[i * 3 + 2] - campos[c * 3 + 2];
            double dist = std::sqrt(dx * dx + dy * dy + dz * dz) + 1e-6;
            double cosv = (dx * camdir[c * 3] + dy * camdir[c * 3 + 1]
                           + dz * camdir[c * 3 + 2]) / dist;
            double s = cosv / std::sqrt(dist);
            if (s > bests) { bests = s; bestv = (int32_t)c; }
        }
        out[i] = bestv;
    }
}

}  // extern "C"
