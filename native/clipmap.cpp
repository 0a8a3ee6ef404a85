// Clipmap ocean-mesh generator (native runtime component).
//
// The reference ships pre-baked clipmap planes (assets/water/clipmap_*.obj:
// 512x512 m, vertex density decreasing away from the center, ~23.6k verts for
// the low variant — SURVEY.md C19) that the camera-follow logic snaps in
// whole tiles (main.gd:32-37). This generator produces the same kind of
// graded grid procedurally: a 1D coordinate ladder with `center_res` cells at
// the finest step and `levels` outward rings whose cell size doubles per
// ring, tensor-produced into a triangulated plane.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All outputs are
// caller-allocated; call clipmap_counts first.

#include <cstdint>
#include <vector>

namespace {

// Build the symmetric 1D coordinate ladder. Returns coords sorted ascending.
std::vector<double> axis_coords(int levels, int center_res, int ring_cells,
                                double extent) {
    // finest step such that the ladder spans [-extent/2, extent/2]
    double span_units = center_res * 0.5;  // in units of the finest step
    double scale = 1.0;
    for (int l = 1; l <= levels; ++l) {
        scale *= 2.0;
        span_units += ring_cells * scale;
    }
    const double step0 = (extent * 0.5) / span_units;

    std::vector<double> pos;  // positive side, excluding 0
    double x = 0.0, s = step0;
    for (int i = 0; i < center_res / 2; ++i) { x += s; pos.push_back(x); }
    for (int l = 1; l <= levels; ++l) {
        s *= 2.0;
        for (int i = 0; i < ring_cells; ++i) { x += s; pos.push_back(x); }
    }
    std::vector<double> coords;
    coords.reserve(pos.size() * 2 + 1);
    for (auto it = pos.rbegin(); it != pos.rend(); ++it) coords.push_back(-*it);
    coords.push_back(0.0);
    for (double v : pos) coords.push_back(v);
    return coords;
}

}  // namespace

extern "C" {

// Query output sizes. Returns 0 on success.
int clipmap_counts(int levels, int center_res, int ring_cells,
                   int32_t* n_verts, int32_t* n_indices) {
    if (levels < 0 || center_res < 2 || (center_res & 1) || ring_cells < 0)
        return 1;
    const int64_t k = 2 * ((int64_t)center_res / 2 + (int64_t)levels * ring_cells) + 1;
    *n_verts = (int32_t)(k * k);
    *n_indices = (int32_t)((k - 1) * (k - 1) * 6);
    return 0;
}

// Fill verts (n_verts * 2 floats: x, z) and indices (n_indices uint32,
// CCW triangles). Returns 0 on success.
int clipmap_build(int levels, int center_res, int ring_cells, float extent,
                  float* verts, uint32_t* indices) {
    if (levels < 0 || center_res < 2 || (center_res & 1) || ring_cells < 0)
        return 1;
    const std::vector<double> coords =
        axis_coords(levels, center_res, ring_cells, (double)extent);
    const int64_t k = (int64_t)coords.size();

    for (int64_t j = 0; j < k; ++j) {
        for (int64_t i = 0; i < k; ++i) {
            verts[2 * (j * k + i) + 0] = (float)coords[i];
            verts[2 * (j * k + i) + 1] = (float)coords[j];
        }
    }
    int64_t t = 0;
    for (int64_t j = 0; j + 1 < k; ++j) {
        for (int64_t i = 0; i + 1 < k; ++i) {
            const uint32_t a = (uint32_t)(j * k + i);
            const uint32_t b = (uint32_t)(j * k + i + 1);
            const uint32_t c = (uint32_t)((j + 1) * k + i);
            const uint32_t d = (uint32_t)((j + 1) * k + i + 1);
            indices[t++] = a; indices[t++] = c; indices[t++] = b;
            indices[t++] = b; indices[t++] = c; indices[t++] = d;
        }
    }
    return 0;
}

}  // extern "C"
