// Fast OBJ geometry parser (native tier).
//
// The reference loads scene meshes through PyTorch3D's C++ OBJ loader and
// trimesh (macarons/utility/macarons_utils.py:554-609); this is the
// equivalent native component for nextbestpath_tpu, exposed to Python via
// ctypes (nextbestpath_tpu/assets/obj_native.py). Parses only geometry
// (v / f records), fan-triangulates polygons, resolves negative indices.
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Mesh {
  std::vector<float> verts;   // 3 * n_verts
  std::vector<int32_t> faces; // 3 * n_faces
};

// Parse a float fast (strtof is fine; locale-independent enough for OBJ).
inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

}  // namespace

extern "C" {

// Opaque handle API: parse once, query sizes, copy out, free.
void* obj_parse(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  // +1 NUL terminator: strtof/strtol require a terminated string and would
  // read past the heap buffer when the file's last token is a number at
  // EOF with no trailing newline.
  std::vector<char> buf(static_cast<size_t>(size) + 1, '\0');
  if (size > 0 && std::fread(buf.data(), 1, size, f) != (size_t)size) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  Mesh* mesh = new Mesh();
  mesh->verts.reserve(1 << 16);
  mesh->faces.reserve(1 << 16);

  const char* p = buf.data();
  const char* end = buf.data() + static_cast<size_t>(size);  // excl. the NUL
  std::vector<int32_t> poly;
  while (p < end) {
    p = skip_ws(p, end);
    if (p + 1 < end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      char* q = nullptr;
      const char* s = p + 1;
      for (int k = 0; k < 3; ++k) {
        float val = std::strtof(s, &q);
        mesh->verts.push_back(val);
        s = q;
      }
    } else if (p + 1 < end && p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      poly.clear();
      const char* s = p + 1;
      while (s < end && *s != '\n') {
        s = skip_ws(s, end);
        if (s >= end || *s == '\n' || *s == '#') break;
        char* q = nullptr;
        long idx = std::strtol(s, &q, 10);
        if (q == s) break;
        s = q;
        // Skip texture/normal refs: /vt/vn tokens until whitespace.
        while (s < end && *s != ' ' && *s != '\t' && *s != '\n' &&
               *s != '\r') {
          ++s;
        }
        long n_verts = static_cast<long>(mesh->verts.size() / 3);
        int32_t resolved =
            idx > 0 ? static_cast<int32_t>(idx - 1)
                    : static_cast<int32_t>(n_verts + idx);
        poly.push_back(resolved);
      }
      for (size_t k = 1; k + 1 < poly.size(); ++k) {
        mesh->faces.push_back(poly[0]);
        mesh->faces.push_back(poly[k]);
        mesh->faces.push_back(poly[k + 1]);
      }
    }
    p = next_line(p, end);
  }
  return mesh;
}

int64_t obj_n_verts(void* handle) {
  return handle ? static_cast<Mesh*>(handle)->verts.size() / 3 : -1;
}

int64_t obj_n_faces(void* handle) {
  return handle ? static_cast<Mesh*>(handle)->faces.size() / 3 : -1;
}

void obj_copy(void* handle, float* verts_out, int32_t* faces_out) {
  Mesh* mesh = static_cast<Mesh*>(handle);
  std::memcpy(verts_out, mesh->verts.data(),
              mesh->verts.size() * sizeof(float));
  std::memcpy(faces_out, mesh->faces.data(),
              mesh->faces.size() * sizeof(int32_t));
}

void obj_free(void* handle) { delete static_cast<Mesh*>(handle); }

}  // extern "C"
