// Native host runtime for wgpu_physics_engine_tpu.
//
// The reference's host tier is Rust (wgpu-bootstrap Runner/Context, geometry
// generation, topology building, frame pacing — SURVEY C17, C5, C13). This
// library is the C++ equivalent for the TPU build's host side:
//
//   * UV-sphere generator        (parity with sphere_vertices.rs:21-82)
//   * spring topology builder    (parity with cloth.rs:907-962)
//   * CPU cloth substep oracle   (parity with forces.wgsl + compute_movement
//                                 .wgsl, edge-list accumulation order — the
//                                 second, reference-ordered oracle next to
//                                 the NumPy grid-ordered one)
//   * async shard writer         (datagen egress: background thread writes
//                                 .npy files so TPU launches aren't blocked
//                                 on disk)
//   * monotonic frame clock      (frame pacing for interactive loops)
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Build:
//   make -C native        →  native/libwpe_host.so
//
// All float math is strictly fp32 (no -ffast-math; each expression mirrors
// the WGSL operation order).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Geometry: UV sphere. Vertex layout: 8 floats (pos3, normal3, uv2) per
// vertex, (stacks+1)*(sectors+1) vertices; triangle index list.
// ---------------------------------------------------------------------------
void wpe_uv_sphere_counts(int stacks, int sectors, int* n_verts, int* n_indices) {
  *n_verts = (stacks + 1) * (sectors + 1);
  *n_indices = (2 * stacks - 2) * sectors * 3;
}

void wpe_generate_uv_sphere(float radius, int stacks, int sectors,
                            float* verts /* [n_verts*8] */,
                            uint32_t* indices /* [n_indices] */) {
  const float pi = 3.14159265358979323846f;
  const float sector_step = 2.0f * pi / (float)sectors;
  const float stack_step = pi / (float)stacks;
  float* v = verts;
  for (int i = 0; i <= stacks; ++i) {
    float phi = pi / 2.0f - (float)i * stack_step;
    float xy = radius * std::cos(phi);
    float z = radius * std::sin(phi);
    for (int j = 0; j <= sectors; ++j) {
      float theta = (float)j * sector_step;
      float x = xy * std::cos(theta);
      float y = xy * std::sin(theta);
      float len = std::sqrt(x * x + y * y + z * z);
      *v++ = x; *v++ = y; *v++ = z;
      if (len != 0.0f) { *v++ = x / len; *v++ = y / len; *v++ = z / len; }
      else             { *v++ = 0.0f;   *v++ = 1.0f;    *v++ = 0.0f;   }
      *v++ = (float)j / (float)sectors;
      *v++ = (float)i / (float)stacks;
    }
  }
  uint32_t* idx = indices;
  for (int i = 0; i < stacks; ++i) {
    uint32_t k1 = (uint32_t)(i * (sectors + 1));
    uint32_t k2 = k1 + (uint32_t)sectors + 1u;
    for (int j = 0; j < sectors; ++j) {
      uint32_t a = k1 + j, b = k2 + j, c = k1 + j + 1, d = k2 + j + 1;
      if (i != 0)          { *idx++ = a; *idx++ = b; *idx++ = c; }
      if (i != stacks - 1) { *idx++ = c; *idx++ = b; *idx++ = d; }
    }
  }
}

// ---------------------------------------------------------------------------
// Spring topology for an H×W grid. Emission order identical to the Python
// builder (and the reference): rows, cols; struct right/down; shear dr/dl;
// bend 2r/2d. Returns counts; p0/p1 arrays are per-type concatenated
// struct|shear|bend.
// ---------------------------------------------------------------------------
void wpe_spring_counts(int h, int w, int* counts /* [3] */) {
  counts[0] = h * (w - 1) + (h - 1) * w;
  counts[1] = 2 * (h - 1) * (w - 1);
  counts[2] = h * (w > 2 ? w - 2 : 0) + (h > 2 ? h - 2 : 0) * w;
}

void wpe_spring_topology(int h, int w, int32_t* p0, int32_t* p1) {
  int cs[3]; wpe_spring_counts(h, w, cs);
  int32_t* sp0 = p0;            int32_t* sp1 = p1;
  int32_t* hp0 = p0 + cs[0];    int32_t* hp1 = p1 + cs[0];
  int32_t* bp0 = hp0 + cs[1];   int32_t* bp1 = hp1 + cs[1];
  for (int r = 0; r < h; ++r) {
    for (int c = 0; c < w; ++c) {
      int i = r * w + c;
      if (c + 1 < w) { *sp0++ = i; *sp1++ = i + 1; }
      if (r + 1 < h) { *sp0++ = i; *sp1++ = i + w; }
      if (r + 1 < h && c + 1 < w) { *hp0++ = i; *hp1++ = i + w + 1; }
      if (r + 1 < h && c >= 1)    { *hp0++ = i; *hp1++ = (r + 1) * w + (c - 1); }
      if (c + 2 < w) { *bp0++ = i; *bp1++ = i + 2; }
      if (r + 2 < h) { *bp0++ = i; *bp1++ = i + 2 * w; }
    }
  }
}

// ---------------------------------------------------------------------------
// CPU cloth substep (oracle, edge-list order). params layout must match
// ops/cloth_pallas.py: 0..2 k, 3..5 c, 6..8 rest, 9 k_contact, 10 mu,
// 11 mass, 12 gravity, 13 speed_damp (RAW, not predamped), 14 min_dist,
// 15 dt.
// ---------------------------------------------------------------------------
void wpe_cloth_substep(int h, int w, float* pos /* [N*3] */, float* vel,
                       float* force_scratch /* [N*3] */,
                       const float* prm) {
  const int n = h * w;
  const float eps = 1e-6f;
  const float dt = prm[15];
  const float mass = prm[11];
  const float min_dist = prm[14];

  for (int i = 0; i < 3 * n; ++i) force_scratch[i] = 0.0f;

  // springs, edge-list order (forces.wgsl semantics; accumulation order =
  // struct then shear then bend, springs in emission order)
  auto do_edge = [&](int a, int b, float k, float c, float rest) {
    float dx = pos[3 * b] - pos[3 * a];
    float dy = pos[3 * b + 1] - pos[3 * a + 1];
    float dz = pos[3 * b + 2] - pos[3 * a + 2];
    float dist = std::sqrt(dx * dx + dy * dy + dz * dz);
    if (dist < eps) return;
    float inv = 1.0f / dist;
    float ux = dx * inv, uy = dy * inv, uz = dz * inv;
    float stretch = dist - rest;
    float rvx = vel[3 * b] - vel[3 * a];
    float rvy = vel[3 * b + 1] - vel[3 * a + 1];
    float rvz = vel[3 * b + 2] - vel[3 * a + 2];
    float va = rvx * ux + rvy * uy + rvz * uz;
    float s = k * stretch + c * va;
    float fx = s * ux, fy = s * uy, fz = s * uz;
    force_scratch[3 * a] += fx; force_scratch[3 * a + 1] += fy; force_scratch[3 * a + 2] += fz;
    force_scratch[3 * b] -= fx; force_scratch[3 * b + 1] -= fy; force_scratch[3 * b + 2] -= fz;
  };

  for (int pass = 0; pass < 3; ++pass) {
    float k = prm[pass], c = prm[3 + pass], rest = prm[6 + pass];
    for (int r = 0; r < h; ++r) {
      for (int col = 0; col < w; ++col) {
        int i = r * w + col;
        if (pass == 0) {
          if (col + 1 < w) do_edge(i, i + 1, k, c, rest);
          if (r + 1 < h) do_edge(i, i + w, k, c, rest);
        } else if (pass == 1) {
          if (r + 1 < h && col + 1 < w) do_edge(i, i + w + 1, k, c, rest);
          if (r + 1 < h && col >= 1) do_edge(i, (r + 1) * w + (col - 1), k, c, rest);
        } else {
          if (col + 2 < w) do_edge(i, i + 2, k, c, rest);
          if (r + 2 < h) do_edge(i, i + 2 * w, k, c, rest);
        }
      }
    }
  }

  // integrate (compute_movement.wgsl:70-174)
  const float damp = std::pow(prm[13], dt);
  for (int i = 0; i < n; ++i) {
    float x = pos[3 * i], y = pos[3 * i + 1], z = pos[3 * i + 2];
    float fx = force_scratch[3 * i];
    float fy = force_scratch[3 * i + 1] + mass * prm[12];
    float fz = force_scratch[3 * i + 2];

    float dist = std::sqrt(x * x + y * y + z * z);
    if (dist < min_dist && dist > eps) {
      float inv = 1.0f / dist;
      float nx = x * inv, ny = y * inv, nz = z * inv;
      float pen = prm[9] * (min_dist - dist);
      fx += pen * nx; fy += pen * ny; fz += pen * nz;
      float ron = fx * nx + fy * ny + fz * nz;
      float tx = fx - ron * nx, ty = fy - ron * ny, tz = fz - ron * nz;
      float tm = std::sqrt(tx * tx + ty * ty + tz * tz);
      if (tm > eps) {
        float inv_t = 1.0f / tm;
        float fm = -(std::min(tm, prm[10] * std::fabs(ron)));
        fx += fm * tx * inv_t; fy += fm * ty * inv_t; fz += fm * tz * inv_t;
      }
    }
    float vx = (vel[3 * i] + fx / mass * dt) * damp;
    float vy = (vel[3 * i + 1] + fy / mass * dt) * damp;
    float vz = (vel[3 * i + 2] + fz / mass * dt) * damp;
    x += vx * dt; y += vy * dt; z += vz * dt;

    float fd = std::sqrt(x * x + y * y + z * z);
    if (fd < min_dist) {
      if (fd > eps) {
        float s = min_dist / fd;
        x *= s; y *= s; z *= s;
      } else {
        x = 0.0f; y = min_dist; z = 0.0f;
      }
      vx = vy = vz = 0.0f;
    }
    pos[3 * i] = x; pos[3 * i + 1] = y; pos[3 * i + 2] = z;
    vel[3 * i] = vx; vel[3 * i + 1] = vy; vel[3 * i + 2] = vz;
  }
}

void wpe_cloth_simulate(int h, int w, float* pos, float* vel,
                        float* force_scratch, const float* prm, int n_steps) {
  for (int s = 0; s < n_steps; ++s) wpe_cloth_substep(h, w, pos, vel, force_scratch, prm);
}

// ---------------------------------------------------------------------------
// Async shard writer: background thread drains a queue of buffers to .npy
// files (v1 format, fp32 C-order). Lets datagen overlap TPU compute with
// disk egress.
// ---------------------------------------------------------------------------
namespace {

struct Shard {
  std::string path;
  std::vector<int64_t> shape;
  std::vector<uint8_t> data;
  std::string descr = "<f4";  // numpy dtype descr (e.g. "<f4", "|u1")
};

struct Writer {
  std::thread th;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Shard> q;
  std::atomic<bool> closing{false};
  std::atomic<int64_t> written{0};
  std::atomic<int64_t> errors{0};

  void run() {
    for (;;) {
      Shard s;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return !q.empty() || closing.load(); });
        if (q.empty() && closing.load()) return;
        s = std::move(q.front());
        q.pop_front();
      }
      if (!write_npy(s)) errors.fetch_add(1);
      else written.fetch_add(1);
    }
  }

  static bool write_npy(const Shard& s) {
    FILE* f = std::fopen(s.path.c_str(), "wb");
    if (!f) return false;
    std::string shape = "(";
    for (size_t i = 0; i < s.shape.size(); ++i) {
      shape += std::to_string(s.shape[i]);
      if (i + 1 < s.shape.size() || s.shape.size() == 1) shape += ", ";
    }
    shape += ")";
    std::string header = "{'descr': '" + s.descr +
                         "', 'fortran_order': False, 'shape': " + shape + ", }";
    size_t hlen = 10 + header.size() + 1;
    size_t pad = (64 - hlen % 64) % 64;
    header += std::string(pad, ' ');
    header += '\n';
    uint16_t hsize = (uint16_t)header.size();
    bool ok = std::fwrite("\x93NUMPY\x01\x00", 1, 8, f) == 8 &&
              std::fwrite(&hsize, 1, 2, f) == 2 &&
              std::fwrite(header.data(), 1, header.size(), f) == header.size() &&
              std::fwrite(s.data.data(), 1, s.data.size(), f) == s.data.size();
    std::fclose(f);
    return ok;
  }
};

}  // namespace

void* wpe_writer_open() {
  Writer* wr = new Writer();
  wr->th = std::thread([wr] { wr->run(); });
  return wr;
}

// dtype-general submit: descr is a numpy descr literal ("<f4", "|u1",
// "<i4", ...), itemsize its byte width. Data is copied synchronously so
// the caller's buffer can be reused immediately.
int wpe_writer_submit2(void* handle, const char* path, const void* data,
                       const int64_t* shape, int ndim, const char* descr,
                       int itemsize) {
  Writer* wr = (Writer*)handle;
  Shard s;
  s.path = path;
  s.descr = descr;
  int64_t count = 1;
  for (int i = 0; i < ndim; ++i) {
    s.shape.push_back(shape[i]);
    count *= shape[i];
  }
  s.data.resize((size_t)count * (size_t)itemsize);
  std::memcpy(s.data.data(), data, s.data.size());
  {
    std::lock_guard<std::mutex> lk(wr->mu);
    wr->q.push_back(std::move(s));
  }
  wr->cv.notify_one();
  return 0;
}

int wpe_writer_submit(void* handle, const char* path, const float* data,
                      const int64_t* shape, int ndim) {
  return wpe_writer_submit2(handle, path, data, shape, ndim, "<f4", 4);
}

int64_t wpe_writer_pending(void* handle) {
  Writer* wr = (Writer*)handle;
  std::lock_guard<std::mutex> lk(wr->mu);
  return (int64_t)wr->q.size();
}

// Returns number of shards written; blocks until queue drains and thread exits.
int64_t wpe_writer_close(void* handle) {
  Writer* wr = (Writer*)handle;
  wr->closing.store(true);
  wr->cv.notify_all();
  wr->th.join();
  int64_t n = wr->written.load();
  int64_t e = wr->errors.load();
  delete wr;
  return e > 0 ? -e : n;
}

// ---------------------------------------------------------------------------
// Frame clock (Runner's delta_time, frame pacing)
// ---------------------------------------------------------------------------
double wpe_now() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

void wpe_sleep_until(double t) {
  double now = wpe_now();
  if (t <= now) return;
  struct timespec ts;
  double sec;
  double frac = std::modf(t - now, &sec);
  ts.tv_sec = (time_t)sec;
  ts.tv_nsec = (long)(frac * 1e9);
  nanosleep(&ts, nullptr);
}

}  // extern "C"
