// Z-buffer triangle depth rasterizer.
//
// TPU-native replacement for the reference's pyrender/EGL depth renderer
// (preprocessing/facescape/renderer.py render_cvcam): preprocessing only
// needs a depth map of the mesh under a cv-convention camera to derive
// foreground masks and per-vertex visibility, so a small CPU rasterizer
// removes the OpenGL/EGL dependency entirely. Vertices arrive already
// projected to pixel space (x_px, y_px, z_cam); this routine does the
// edge-function coverage walk and the z-test.
//
// Build: make -C native   (produces libmdtpu_raster.so, loaded via ctypes)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// verts: (n_verts, 3) float32 [x_px, y_px, z_cam]; tris: (n_tris, 3) int32.
// depth_out: (h, w) float32, must be pre-filled with 0; 0 means background.
// Back-facing and degenerate triangles are rasterized too (depth only, no
// shading, so winding does not matter). z values <= 0 (behind camera) skip.
void rasterize_depth(const float* verts, int64_t n_verts,
                     const int32_t* tris, int64_t n_tris,
                     int32_t h, int32_t w, float* depth_out) {
    const float INF = std::numeric_limits<float>::infinity();
    // z-buffer initialised to +inf, folded to 0 at the end
    float* zbuf = new float[(size_t)h * w];
    std::fill(zbuf, zbuf + (size_t)h * w, INF);

    for (int64_t t = 0; t < n_tris; ++t) {
        const int32_t ia = tris[3 * t], ib = tris[3 * t + 1], ic = tris[3 * t + 2];
        if (ia < 0 || ib < 0 || ic < 0 || ia >= n_verts || ib >= n_verts ||
            ic >= n_verts)
            continue;
        const float ax = verts[3 * ia], ay = verts[3 * ia + 1], az = verts[3 * ia + 2];
        const float bx = verts[3 * ib], by = verts[3 * ib + 1], bz = verts[3 * ib + 2];
        const float cx = verts[3 * ic], cy = verts[3 * ic + 1], cz = verts[3 * ic + 2];
        if (az <= 0.f || bz <= 0.f || cz <= 0.f) continue;

        const int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx})));
        const int x1 = std::min((int)w - 1, (int)std::ceil(std::max({ax, bx, cx})));
        const int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy})));
        const int y1 = std::min((int)h - 1, (int)std::ceil(std::max({ay, by, cy})));
        if (x0 > x1 || y0 > y1) continue;

        const float area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
        if (std::fabs(area) < 1e-12f) continue;
        const float inv_area = 1.f / area;

        // interpolate 1/z for perspective-correct depth
        const float iza = 1.f / az, izb = 1.f / bz, izc = 1.f / cz;

        for (int y = y0; y <= y1; ++y) {
            const float py = (float)y + 0.5f;
            for (int x = x0; x <= x1; ++x) {
                const float px = (float)x + 0.5f;
                float w0 = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * inv_area;
                float w1 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area;
                // barycentric wrt (a,b,c): lambda_c = w0, lambda_a = w1,
                // lambda_b = 1 - w0 - w1  (derived from the two edge functions)
                float w2 = 1.f - w0 - w1;
                if (w0 < 0.f || w1 < 0.f || w2 < 0.f) continue;
                const float iz = w1 * iza + w2 * izb + w0 * izc;
                if (iz <= 0.f) continue;
                const float z = 1.f / iz;
                float* zp = &zbuf[(size_t)y * w + x];
                if (z < *zp) *zp = z;
            }
        }
    }

    for (int64_t i = 0; i < (int64_t)h * w; ++i)
        depth_out[i] = std::isinf(zbuf[i]) ? 0.f : zbuf[i];
    delete[] zbuf;
}

}  // extern "C"
