// ropes3d native runtime — host-side fast paths.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// host runtime around it, replacing the third-party native code the
// reference leaned on (trimesh's loaders, Klamp't's parsing, OpenCV bits):
//
//   - binary/ASCII STL parsing            (reference: trimesh C paths)
//   - vertex-clustering mesh decimation   (scene preparation for the
//     rasterizer's packed triangle tensors)
//   - a scalar reference rasterizer       (golden-image oracle for the
//     TPU kernels, independent of JAX)
//
// Exposed as a plain C ABI consumed via ctypes (ropes3d_tpu/native/).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- STL
// Returns triangle count, or -1 on error.
long ropes3d_stl_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char header[84];
  if (fread(header, 1, 84, f) != 84) {
    fclose(f);
    return -1;
  }
  uint32_t n;
  memcpy(&n, header + 80, 4);
  // Validate binary layout by file size; fall back to ASCII scan.
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  if ((long)(84 + (uint64_t)n * 50) == size) {
    fclose(f);
    return (long)n;
  }
  // ASCII: count "facet" occurrences.
  fseek(f, 0, SEEK_SET);
  std::string contents(size, '\0');
  if (fread(contents.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);
  long count = 0;
  size_t pos = 0;
  while ((pos = contents.find("facet normal", pos)) != std::string::npos) {
    ++count;
    pos += 12;
  }
  return count;
}

// Fills out[n*9] with triangle vertices; returns triangles written.
long ropes3d_stl_load(const char* path, float* out, long n) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char header[84];
  if (fread(header, 1, 84, f) != 84) {
    fclose(f);
    return -1;
  }
  uint32_t count;
  memcpy(&count, header + 80, 4);
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  if ((long)(84 + (uint64_t)count * 50) == size) {
    fseek(f, 84, SEEK_SET);
    long todo = std::min((long)count, n);
    std::vector<unsigned char> rec(50);
    for (long i = 0; i < todo; ++i) {
      if (fread(rec.data(), 1, 50, f) != 50) {
        fclose(f);
        return i;
      }
      memcpy(out + i * 9, rec.data() + 12, 36);  // skip normal
    }
    fclose(f);
    return todo;
  }
  // ASCII parse.
  fseek(f, 0, SEEK_SET);
  std::string contents(size, '\0');
  if (fread(contents.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);
  long tri = 0;
  size_t pos = 0;
  int vtx = 0;
  while (tri < n) {
    pos = contents.find("vertex", pos);
    if (pos == std::string::npos) break;
    pos += 6;
    float x, y, z;
    if (sscanf(contents.c_str() + pos, "%f %f %f", &x, &y, &z) != 3) break;
    float* t = out + tri * 9 + vtx * 3;
    t[0] = x;
    t[1] = y;
    t[2] = z;
    if (++vtx == 3) {
      vtx = 0;
      ++tri;
    }
  }
  return tri;
}

// ---------------------------------------------------------------- decimation
// Vertex-clustering decimation to <= target triangles.  Same algorithm as
// ropes3d_tpu/robot/mesh.py::decimate (iteratively coarsened uniform grid,
// cluster-centroid snapping, degenerate/duplicate removal).
// in: tris[n*9]; out: out[target_cap*9]; returns triangles written.
long ropes3d_decimate(const float* tris, long n, long target, float* out,
                      long out_cap) {
  if (n <= target) {
    long c = std::min(n, out_cap);
    memcpy(out, tris, (size_t)c * 9 * sizeof(float));
    return c;
  }
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (long i = 0; i < n * 3; ++i) {
    for (int d = 0; d < 3; ++d) {
      float v = tris[i * 3 + d];
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  }
  float extent = std::max({hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]});
  if (extent <= 0) extent = 1.0f;

  int cells = 64;
  std::vector<float> result;
  for (int iter = 0; iter < 12; ++iter) {
    float cell = extent / cells;
    std::unordered_map<uint64_t, uint32_t> cluster_of;
    std::vector<double> sums;   // 3 per cluster
    std::vector<uint32_t> cnts;
    std::vector<uint32_t> vert_cluster((size_t)n * 3);
    cluster_of.reserve((size_t)n);
    for (long i = 0; i < n * 3; ++i) {
      const float* p = tris + i * 3;
      uint64_t qx = (uint64_t)llroundf((p[0] - lo[0]) / cell);
      uint64_t qy = (uint64_t)llroundf((p[1] - lo[1]) / cell);
      uint64_t qz = (uint64_t)llroundf((p[2] - lo[2]) / cell);
      uint64_t key = (qx << 42) | (qy << 21) | qz;
      auto it = cluster_of.find(key);
      uint32_t c;
      if (it == cluster_of.end()) {
        c = (uint32_t)cnts.size();
        cluster_of.emplace(key, c);
        sums.insert(sums.end(), {0.0, 0.0, 0.0});
        cnts.push_back(0);
      } else {
        c = it->second;
      }
      vert_cluster[i] = c;
      for (int d = 0; d < 3; ++d) sums[(size_t)c * 3 + d] += p[d];
      cnts[c]++;
    }
    std::vector<float> centroids(cnts.size() * 3);
    for (size_t c = 0; c < cnts.size(); ++c)
      for (int d = 0; d < 3; ++d)
        centroids[c * 3 + d] = (float)(sums[c * 3 + d] / cnts[c]);

    // Drop collapsed triangles; dedup by sorted cluster triple.
    struct TriKey {
      uint32_t a, b, c;
      bool operator==(const TriKey& o) const {
        return a == o.a && b == o.b && c == o.c;
      }
    };
    struct TriKeyHash {
      size_t operator()(const TriKey& k) const {
        return ((size_t)k.a * 73856093u) ^ ((size_t)k.b * 19349663u) ^
               ((size_t)k.c * 83492791u);
      }
    };
    std::unordered_map<TriKey, char, TriKeyHash> seen;
    result.clear();
    for (long i = 0; i < n; ++i) {
      uint32_t a = vert_cluster[i * 3], b = vert_cluster[i * 3 + 1],
               c = vert_cluster[i * 3 + 2];
      if (a == b || b == c || a == c) continue;
      uint32_t s0 = std::min({a, b, c}), s2 = std::max({a, b, c});
      uint32_t s1 = a + b + c - s0 - s2;
      TriKey key{s0, s1, s2};
      if (seen.count(key)) continue;
      seen.emplace(key, 1);
      for (uint32_t v : {a, b, c})
        result.insert(result.end(), centroids.begin() + (size_t)v * 3,
                      centroids.begin() + (size_t)v * 3 + 3);
    }
    long nt = (long)(result.size() / 9);
    if (nt <= target) break;
    cells = std::max(4, (int)(cells / 1.5));
  }
  long nt = std::min((long)(result.size() / 9), out_cap);
  memcpy(out, result.data(), (size_t)nt * 9 * sizeof(float));
  return nt;
}

// ---------------------------------------------------------------- raster
// Scalar reference rasterizer (golden oracle): perspective projection with
// the framework's camera convention, edge-function coverage at pixel
// centers, perspective-correct inverse-depth interpolation.
// verts: [n*9] camera-space triangles; link_ids: [n];
// depth_out: [h*w]; lid_out: [h*w] (-1 background).
void ropes3d_raster_reference(const float* verts, const int* link_ids, long n,
                              float fx, float fy, float cx, float cy, int h,
                              int w, float row0, float col0, float* depth_out,
                              int* lid_out) {
  const float near = 0.01f;
  std::vector<float> qbuf((size_t)h * w, 0.0f);
  std::fill(lid_out, lid_out + (size_t)h * w, -1);
  for (long t = 0; t < n; ++t) {
    const float* v = verts + t * 9;
    float z[3], u[3], vv[3], q[3];
    bool front = true;
    for (int k = 0; k < 3; ++k) {
      z[k] = -v[k * 3 + 2];
      if (z[k] <= near) front = false;
    }
    if (!front) continue;
    for (int k = 0; k < 3; ++k) {
      q[k] = 1.0f / z[k];
      u[k] = fx * v[k * 3 + 0] * q[k] + cx;
      vv[k] = cy - fy * v[k * 3 + 1] * q[k];
    }
    float area = (u[1] - u[0]) * (vv[2] - vv[0]) - (vv[1] - vv[0]) * (u[2] - u[0]);
    if (std::fabs(area) < 1e-9f) continue;
    float qmin = std::min({q[0], q[1], q[2]});
    float qmax = std::max({q[0], q[1], q[2]});
    int rmin = std::max(0, (int)std::floor(std::min({vv[0], vv[1], vv[2]}) - row0 - 0.5f));
    int rmax = std::min(h - 1, (int)std::ceil(std::max({vv[0], vv[1], vv[2]}) - row0));
    int cmin = std::max(0, (int)std::floor(std::min({u[0], u[1], u[2]}) - col0 - 0.5f));
    int cmax = std::min(w - 1, (int)std::ceil(std::max({u[0], u[1], u[2]}) - col0));
    for (int r = rmin; r <= rmax; ++r) {
      float py = row0 + r + 0.5f;
      for (int c = cmin; c <= cmax; ++c) {
        float px = col0 + c + 0.5f;
        float w0 = (u[2] - u[1]) * (py - vv[1]) - (vv[2] - vv[1]) * (px - u[1]);
        float w1 = (u[0] - u[2]) * (py - vv[2]) - (vv[0] - vv[2]) * (px - u[2]);
        float w2 = (u[1] - u[0]) * (py - vv[0]) - (vv[1] - vv[0]) * (px - u[0]);
        bool inside = (w0 >= 0 && w1 >= 0 && w2 >= 0) ||
                      (w0 <= 0 && w1 <= 0 && w2 <= 0);
        if (!inside) continue;
        float qp = (w0 * q[0] + w1 * q[1] + w2 * q[2]) / area;
        qp = std::min(std::max(qp, qmin), qmax);
        size_t idx = (size_t)r * w + c;
        if (qp > qbuf[idx]) {
          qbuf[idx] = qp;
          depth_out[idx] = 1.0f / qp;
          lid_out[idx] = link_ids[t];
        }
      }
    }
  }
  for (size_t i = 0; i < (size_t)h * w; ++i)
    if (lid_out[i] < 0) depth_out[i] = 0.0f;
}

}  // extern "C"
