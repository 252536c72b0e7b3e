// Append-only binary record store (native replay DB tier).
//
// Replaces the reference's LMDB experience database
// (next_best_path/utility/nbp_utils.py:32-141, lmdb.open with a 200 GiB map
// at trainers/train_nbp_model.py:61-63) with a minimal, dependency-free
// log-structured store: one data file of length-prefixed records + an
// in-memory offset index rebuilt on open. Exposed to Python via ctypes
// (nextbestpath_tpu/train/replay_native.py).
//
// Record framing: [u64 magic][u64 payload_len][payload bytes].

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x4e42505245434f52ULL;  // "NBPRECOR"

struct Store {
  std::FILE* file = nullptr;
  std::vector<uint64_t> offsets;  // payload offsets
  std::vector<uint64_t> lengths;
};

}  // namespace

extern "C" {

void* replay_open(const char* path) {
  Store* s = new Store();
  s->file = std::fopen(path, "a+b");
  if (!s->file) {
    delete s;
    return nullptr;
  }
  // Rebuild the index by scanning the log.
  std::fseek(s->file, 0, SEEK_SET);
  while (true) {
    uint64_t header[2];
    long pos = std::ftell(s->file);
    if (std::fread(header, sizeof(uint64_t), 2, s->file) != 2) break;
    if (header[0] != kMagic) break;  // truncated/corrupt tail: stop
    s->offsets.push_back(static_cast<uint64_t>(pos) + 2 * sizeof(uint64_t));
    s->lengths.push_back(header[1]);
    if (std::fseek(s->file, static_cast<long>(header[1]), SEEK_CUR) != 0)
      break;
  }
  std::fseek(s->file, 0, SEEK_END);
  return s;
}

int64_t replay_count(void* handle) {
  return handle ? static_cast<int64_t>(static_cast<Store*>(handle)
                                           ->offsets.size())
                : -1;
}

int64_t replay_append(void* handle, const uint8_t* data, uint64_t len) {
  Store* s = static_cast<Store*>(handle);
  std::fseek(s->file, 0, SEEK_END);
  long pos = std::ftell(s->file);
  uint64_t header[2] = {kMagic, len};
  if (std::fwrite(header, sizeof(uint64_t), 2, s->file) != 2) return -1;
  if (len && std::fwrite(data, 1, len, s->file) != len) return -1;
  std::fflush(s->file);
  s->offsets.push_back(static_cast<uint64_t>(pos) + 2 * sizeof(uint64_t));
  s->lengths.push_back(len);
  return static_cast<int64_t>(s->offsets.size() - 1);
}

int64_t replay_record_len(void* handle, int64_t index) {
  Store* s = static_cast<Store*>(handle);
  if (index < 0 || index >= (int64_t)s->offsets.size()) return -1;
  return static_cast<int64_t>(s->lengths[index]);
}

int64_t replay_read(void* handle, int64_t index, uint8_t* out,
                    uint64_t out_len) {
  Store* s = static_cast<Store*>(handle);
  if (index < 0 || index >= (int64_t)s->offsets.size()) return -1;
  uint64_t len = s->lengths[index];
  if (out_len < len) return -1;
  std::fseek(s->file, static_cast<long>(s->offsets[index]), SEEK_SET);
  if (len && std::fread(out, 1, len, s->file) != len) return -1;
  std::fseek(s->file, 0, SEEK_END);
  return static_cast<int64_t>(len);
}

void replay_close(void* handle) {
  Store* s = static_cast<Store*>(handle);
  if (s->file) std::fclose(s->file);
  delete s;
}

}  // extern "C"
