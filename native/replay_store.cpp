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
//
// Concurrency contract: SINGLE writer, SINGLE thread per open handle. The
// handle shares one FILE* whose position both append and read mutate, and
// appends are two fwrites — concurrent access from two processes or
// threads would interleave frames and corrupt everything after the
// interleave point. (The LMDB tier this replaces was transactional; the
// training pipeline is strictly single-process per store, so the contract
// is documented rather than locked.)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#if !defined(_WIN32)
#include <unistd.h>
#endif

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
  // Rebuild the index by scanning the log. A record is indexed only when
  // its payload fits INSIDE the file: fseek past EOF succeeds, so without
  // the bound a crash-truncated tail record would be indexed as valid,
  // later appends would land inside its claimed extent, and reads of it
  // would return framing bytes of the following records. The file is also
  // truncated at the last valid record so subsequent appends re-align.
  std::fseek(s->file, 0, SEEK_END);
  long file_size = std::ftell(s->file);
  std::fseek(s->file, 0, SEEK_SET);
  long valid_end = 0;
  while (true) {
    uint64_t header[2];
    long pos = std::ftell(s->file);
    if (std::fread(header, sizeof(uint64_t), 2, s->file) != 2) break;
    if (header[0] != kMagic) break;  // corrupt tail: stop
    long payload_end =
        pos + static_cast<long>(2 * sizeof(uint64_t) + header[1]);
    if (payload_end > file_size) break;  // truncated tail record: drop
    s->offsets.push_back(static_cast<uint64_t>(pos) + 2 * sizeof(uint64_t));
    s->lengths.push_back(header[1]);
    valid_end = payload_end;
    if (std::fseek(s->file, static_cast<long>(header[1]), SEEK_CUR) != 0)
      break;
  }
  if (valid_end < file_size) {
    // Drop the corrupt/truncated tail so the next append starts aligned.
    std::fflush(s->file);
#if defined(_WIN32)
    // ftruncate unavailable: the corrupt tail stays on disk (it is never
    // indexed, but appends in "a" mode land after it — re-open on POSIX
    // to repair).
#else
    if (ftruncate(fileno(s->file), valid_end) != 0) {
      // Best effort: reads/appends still work via the index.
    }
#endif
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
