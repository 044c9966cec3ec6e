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
#include <functional>

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

// ---------------------------------------------------------------- QEM
// Quadric-error-metric edge-collapse decimation.  Higher-fidelity than
// vertex clustering at equal triangle budgets — silhouette accuracy of the
// decimated scene bounds the pose-estimation accuracy floor.
// in: tris[n*9]; out: out[out_cap*9]; returns triangles written.
namespace {

struct Quadric {
  double m[10] = {0};  // symmetric 4x4: xx xy xz xw yy yz yw zz zw ww
  void add_plane(double a, double b, double c, double d) {
    m[0] += a * a; m[1] += a * b; m[2] += a * c; m[3] += a * d;
    m[4] += b * b; m[5] += b * c; m[6] += b * d;
    m[7] += c * c; m[8] += c * d; m[9] += d * d;
  }
  void add(const Quadric& o) {
    for (int i = 0; i < 10; ++i) m[i] += o.m[i];
  }
  double eval(const double* v) const {
    double x = v[0], y = v[1], z = v[2];
    return m[0]*x*x + 2*m[1]*x*y + 2*m[2]*x*z + 2*m[3]*x
         + m[4]*y*y + 2*m[5]*y*z + 2*m[6]*y
         + m[7]*z*z + 2*m[8]*z + m[9];
  }
};

}  // namespace

extern "C" long ropes3d_decimate_qem(const float* tris, long n, long target,
                                     float* out, long out_cap) {
  if (n <= target) {
    long c = std::min(n, out_cap);
    memcpy(out, tris, (size_t)c * 9 * sizeof(float));
    return c;
  }
  // Weld vertices exactly (STL repeats them per face).
  struct VKey {
    float x, y, z;
    bool operator==(const VKey& o) const {
      return x == o.x && y == o.y && z == o.z;
    }
  };
  struct VKeyHash {
    size_t operator()(const VKey& k) const {
      auto h = [](float f) {
        uint32_t u; memcpy(&u, &f, 4); return (size_t)u * 2654435761u;
      };
      return h(k.x) ^ (h(k.y) << 1) ^ (h(k.z) << 2);
    }
  };
  std::unordered_map<VKey, int, VKeyHash> vmap;
  std::vector<double> verts;   // 3 per vertex
  std::vector<int> faces((size_t)n * 3);
  for (long i = 0; i < n * 3; ++i) {
    VKey k{tris[i * 3], tris[i * 3 + 1], tris[i * 3 + 2]};
    auto it = vmap.find(k);
    int idx;
    if (it == vmap.end()) {
      idx = (int)(verts.size() / 3);
      vmap.emplace(k, idx);
      verts.insert(verts.end(), {k.x, k.y, k.z});
    } else {
      idx = it->second;
    }
    faces[i] = idx;
  }
  long nv = (long)(verts.size() / 3);

  // Per-vertex quadrics from face planes.
  std::vector<Quadric> Q(nv);
  auto face_alive = std::vector<char>((size_t)n, 1);
  for (long f = 0; f < n; ++f) {
    const double* p0 = &verts[(size_t)faces[f * 3] * 3];
    const double* p1 = &verts[(size_t)faces[f * 3 + 1] * 3];
    const double* p2 = &verts[(size_t)faces[f * 3 + 2] * 3];
    double ux = p1[0]-p0[0], uy = p1[1]-p0[1], uz = p1[2]-p0[2];
    double vx = p2[0]-p0[0], vy = p2[1]-p0[1], vz = p2[2]-p0[2];
    double a = uy*vz - uz*vy, b = uz*vx - ux*vz, c = ux*vy - uy*vx;
    double len = std::sqrt(a*a + b*b + c*c);
    if (len < 1e-18) { face_alive[f] = 0; continue; }
    a /= len; b /= len; c /= len;
    double d = -(a*p0[0] + b*p0[1] + c*p0[2]);
    for (int k = 0; k < 3; ++k) Q[faces[f * 3 + k]].add_plane(a, b, c, d);
  }

  // Union-find over vertices; iterative greedy collapse passes.
  std::vector<int> parent(nv);
  for (long i = 0; i < nv; ++i) parent[i] = (int)i;
  std::function<int(int)> find = [&](int x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  };

  auto live_faces = [&]() {
    long cnt = 0;
    for (long f = 0; f < n; ++f) {
      if (!face_alive[f]) continue;
      int a = find(faces[f*3]), b = find(faces[f*3+1]), c = find(faces[f*3+2]);
      if (a == b || b == c || a == c) { face_alive[f] = 0; continue; }
      ++cnt;
    }
    return cnt;
  };

  long alive = live_faces();
  // Collapse cheapest edges in rounds until under target.
  for (int round = 0; round < 60 && alive > target; ++round) {
    // Gather candidate edges from live faces with collapse cost.
    struct Edge { double cost; int a, b; };
    std::vector<Edge> edges;
    edges.reserve((size_t)alive * 3);
    for (long f = 0; f < n; ++f) {
      if (!face_alive[f]) continue;
      int vs[3] = {find(faces[f*3]), find(faces[f*3+1]), find(faces[f*3+2])};
      for (int e = 0; e < 3; ++e) {
        int a = vs[e], b = vs[(e+1)%3];
        if (a == b) continue;
        if (a > b) std::swap(a, b);
        Quadric q = Q[a]; q.add(Q[b]);
        // Midpoint placement (robust, no 4x4 solve).
        double mid[3] = {(verts[(size_t)a*3]+verts[(size_t)b*3])/2,
                         (verts[(size_t)a*3+1]+verts[(size_t)b*3+1])/2,
                         (verts[(size_t)a*3+2]+verts[(size_t)b*3+2])/2};
        edges.push_back({q.eval(mid), a, b});
      }
    }
    std::sort(edges.begin(), edges.end(),
              [](const Edge& x, const Edge& y) { return x.cost < y.cost; });
    // Collapse up to the needed number this round, skipping touched verts.
    long want = (alive - target + 1) / 2 + 1;
    std::vector<char> touched(nv, 0);
    long done = 0;
    for (const Edge& e : edges) {
      if (done >= want) break;
      int a = find(e.a), b = find(e.b);
      if (a == b || touched[a] || touched[b]) continue;
      // Collapse b into a at the midpoint.
      for (int d = 0; d < 3; ++d)
        verts[(size_t)a*3+d] = (verts[(size_t)a*3+d] + verts[(size_t)b*3+d]) / 2;
      Q[a].add(Q[b]);
      parent[b] = a;
      touched[a] = touched[b] = 1;
      ++done;
    }
    if (done == 0) break;
    alive = live_faces();
  }

  // Emit surviving faces (deduped on representative triples).
  struct TriKey2 {
    int a, b, c;
    bool operator==(const TriKey2& o) const {
      return a == o.a && b == o.b && c == o.c;
    }
  };
  struct TriKey2Hash {
    size_t operator()(const TriKey2& k) const {
      return ((size_t)k.a * 73856093u) ^ ((size_t)k.b * 19349663u) ^
             ((size_t)k.c * 83492791u);
    }
  };
  std::unordered_map<TriKey2, char, TriKey2Hash> seen;
  long nt = 0;
  for (long f = 0; f < n && nt < out_cap; ++f) {
    if (!face_alive[f]) continue;
    int a = find(faces[f*3]), b = find(faces[f*3+1]), c = find(faces[f*3+2]);
    if (a == b || b == c || a == c) continue;
    int s0 = std::min({a,b,c}), s2 = std::max({a,b,c});
    int s1 = a + b + c - s0 - s2;
    TriKey2 key{s0, s1, s2};
    if (seen.count(key)) continue;
    seen.emplace(key, 1);
    float* t = out + nt * 9;
    const int vi[3] = {a, b, c};
    for (int k = 0; k < 3; ++k)
      for (int d = 0; d < 3; ++d)
        t[k*3+d] = (float)verts[(size_t)vi[k]*3 + d];
    ++nt;
  }
  return nt;
}
