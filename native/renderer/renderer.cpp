// Offscreen mesh renderer: depth / segmask / lambertian-shaded color.
//
// Native replacement for the reference's `meshrender` C++ module
// (reference: meshpy/meshpy/CMakeLists.txt builds meshrender.cpp with
// Boost.Python + OpenGL/GLUT/OSMesa; called from meshpy/mesh_renderer.py:492
// as meshrender.render_mesh([P], width, height, verts, tris, norms, ...)).
// The original sources are absent from the snapshot and depended on OSMesa
// offscreen GL; this is a self-contained software rasterizer with a plain C
// ABI (loaded via ctypes), rendering the same quantities: a z-buffered depth
// image and a shaded color image from a 3x4 camera projection P = K [R | t].
//
// Build: g++ -O3 -shared -fPIC -o librenderer.so renderer.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline Vec3 normalize(const Vec3& a) {
  double n = std::sqrt(dot(a, a));
  if (n < 1e-12) return {0, 0, 1};
  return {a.x / n, a.y / n, a.z / n};
}

}  // namespace

extern "C" {

// Render one view.
//   proj:        row-major 3x4 projection P = K [R | t] (world -> pixel)
//   cam_world:   camera center in world coords (for backface/lighting)
//   verts:       n_verts * 3 doubles (world)
//   tris:        n_tris * 3 ints
//   depth_out:   height * width floats   — z in camera frame, 0 = no hit
//   color_out:   height * width floats   — lambertian intensity in [0, 1]
//   mask_out:    height * width uint8    — 1 where the mesh covers the pixel
// Returns 0 on success.
int render_mesh(const double* proj, const double* cam_world, int width,
                int height, const double* verts, int n_verts, const int* tris,
                int n_tris, float* depth_out, float* color_out,
                uint8_t* mask_out) {
  const int n_pix = width * height;
  std::fill(depth_out, depth_out + n_pix, 0.0f);
  std::fill(color_out, color_out + n_pix, 0.0f);
  std::memset(mask_out, 0, n_pix);
  std::vector<float> zbuf(n_pix, std::numeric_limits<float>::infinity());

  // project all vertices once: u = P x / w, depth = (P x).z
  std::vector<double> px(n_verts), py(n_verts), pz(n_verts);
  for (int i = 0; i < n_verts; ++i) {
    const double* v = verts + 3 * i;
    double X = proj[0] * v[0] + proj[1] * v[1] + proj[2] * v[2] + proj[3];
    double Y = proj[4] * v[0] + proj[5] * v[1] + proj[6] * v[2] + proj[7];
    double Z = proj[8] * v[0] + proj[9] * v[1] + proj[10] * v[2] + proj[11];
    pz[i] = Z;
    if (Z > 1e-9) {
      px[i] = X / Z;
      py[i] = Y / Z;
    } else {
      px[i] = -1e9;  // behind the camera: degenerate, clipped per-triangle
      py[i] = -1e9;
    }
  }

  const Vec3 cam = {cam_world[0], cam_world[1], cam_world[2]};
  // light co-located with the camera (headlight), like the reference's
  // default light placement at the camera pose
  for (int t = 0; t < n_tris; ++t) {
    const int i0 = tris[3 * t], i1 = tris[3 * t + 1], i2 = tris[3 * t + 2];
    if (pz[i0] <= 1e-9 || pz[i1] <= 1e-9 || pz[i2] <= 1e-9) continue;

    const double x0 = px[i0], y0 = py[i0];
    const double x1 = px[i1], y1 = py[i1];
    const double x2 = px[i2], y2 = py[i2];

    const double area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
    if (std::fabs(area) < 1e-14) continue;

    // lambertian shade from the face normal vs the view direction
    const Vec3 a = {verts[3 * i0], verts[3 * i0 + 1], verts[3 * i0 + 2]};
    const Vec3 b = {verts[3 * i1], verts[3 * i1 + 1], verts[3 * i1 + 2]};
    const Vec3 c = {verts[3 * i2], verts[3 * i2 + 1], verts[3 * i2 + 2]};
    Vec3 n = normalize(cross(sub(b, a), sub(c, a)));
    Vec3 center = {(a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3,
                   (a.z + b.z + c.z) / 3};
    Vec3 view = normalize(sub(cam, center));
    double shade = std::fabs(dot(n, view));  // two-sided shading

    const int min_x = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    const int max_x =
        std::min(width - 1, (int)std::ceil(std::max({x0, x1, x2})));
    const int min_y = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    const int max_y =
        std::min(height - 1, (int)std::ceil(std::max({y0, y1, y2})));
    if (min_x > max_x || min_y > max_y) continue;

    const double inv_area = 1.0 / area;
    const double inv_z0 = 1.0 / pz[i0], inv_z1 = 1.0 / pz[i1],
                 inv_z2 = 1.0 / pz[i2];

    for (int yy = min_y; yy <= max_y; ++yy) {
      for (int xx = min_x; xx <= max_x; ++xx) {
        const double sx = xx + 0.5, sy = yy + 0.5;
        double w0 = ((x1 - sx) * (y2 - sy) - (x2 - sx) * (y1 - sy)) * inv_area;
        double w1 = ((x2 - sx) * (y0 - sy) - (x0 - sx) * (y2 - sy)) * inv_area;
        double w2 = 1.0 - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        // perspective-correct depth from inverse-z interpolation
        const double inv_z = w0 * inv_z0 + w1 * inv_z1 + w2 * inv_z2;
        const float z = (float)(1.0 / inv_z);
        const int idx = yy * width + xx;
        if (z < zbuf[idx]) {
          zbuf[idx] = z;
          depth_out[idx] = z;
          color_out[idx] = (float)shade;
          mask_out[idx] = 1;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
