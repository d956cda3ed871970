// gtest-free smoke tests for the vdbstore storage engine (the environment
// has no network for FetchContent, so assertions are plain C).
// Covers: open/append/load roundtrip, delete, snapshot+truncate, last-write
// wins, torn-write recovery (reference test analog: test_simple.cpp +
// VectorStorageTest.java persistence roundtrips).

#include <unistd.h>

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int64_t vdb_open(const char* dir, uint32_t dim);
int32_t vdb_append_add(int64_t h, int32_t id, const float* vec);
int32_t vdb_append_add_batch(int64_t h, const int32_t* ids, const float* vecs,
                             int32_t n);
int32_t vdb_append_delete(int64_t h, int32_t id);
int32_t vdb_flush(int64_t h);
int32_t vdb_snapshot(int64_t h, const int32_t* ids, const float* vecs,
                     uint32_t n);
int32_t vdb_load(int64_t h, uint32_t max_n, int32_t* out_ids, float* out_vecs);
int32_t vdb_close(int64_t h);
}

static int tests_run = 0;
#define CHECK(cond)                                                      \
  do {                                                                   \
    if (!(cond)) {                                                       \
      fprintf(stderr, "FAILED %s:%d: %s\n", __FILE__, __LINE__, #cond);  \
      exit(1);                                                           \
    }                                                                    \
  } while (0)

static const char* kDir = "/tmp/vdbstore_test";

static void reset_dir() {
  char cmd[256];
  snprintf(cmd, sizeof(cmd), "rm -rf %s", kDir);
  system(cmd);
}

static void test_roundtrip() {
  reset_dir();
  int64_t h = vdb_open(kDir, 4);
  CHECK(h > 0);
  float v1[4] = {1, 2, 3, 4};
  float v2[4] = {5, 6, 7, 8};
  CHECK(vdb_append_add(h, 10, v1) == 1);
  CHECK(vdb_append_add(h, 20, v2) == 1);
  CHECK(vdb_flush(h) == 1);

  int32_t ids[8];
  std::vector<float> vecs(8 * 4);
  int32_t n = vdb_load(h, 8, ids, vecs.data());
  CHECK(n == 2);
  CHECK(ids[0] == 10 && ids[1] == 20);
  CHECK(memcmp(vecs.data(), v1, sizeof(v1)) == 0);
  CHECK(vdb_close(h) == 1);
  tests_run++;
}

static void test_delete_and_lastwrite() {
  reset_dir();
  int64_t h = vdb_open(kDir, 2);
  float a[2] = {1, 1}, b[2] = {2, 2}, c[2] = {3, 3};
  vdb_append_add(h, 1, a);
  vdb_append_add(h, 2, b);
  vdb_append_delete(h, 1);
  vdb_append_add(h, 2, c);  // overwrite
  vdb_flush(h);
  int32_t ids[4];
  float vecs[8];
  int32_t n = vdb_load(h, 4, ids, vecs);
  CHECK(n == 1);
  CHECK(ids[0] == 2);
  CHECK(vecs[0] == 3.0f);
  vdb_close(h);
  tests_run++;
}

static void test_snapshot_and_reopen() {
  reset_dir();
  int64_t h = vdb_open(kDir, 2);
  float a[2] = {1, 1}, b[2] = {2, 2};
  vdb_append_add(h, 1, a);
  int32_t sids[1] = {7};
  float svecs[2] = {9, 9};
  CHECK(vdb_snapshot(h, sids, svecs, 1) == 1);  // snapshot supersedes WAL
  vdb_append_add(h, 8, b);                       // post-snapshot WAL record
  vdb_close(h);

  h = vdb_open(kDir, 2);
  int32_t ids[4];
  float vecs[8];
  int32_t n = vdb_load(h, 4, ids, vecs);
  CHECK(n == 2);  // snapshot id 7 + wal id 8
  CHECK(ids[0] == 7 && ids[1] == 8);
  CHECK(vecs[0] == 9.0f && vecs[2] == 2.0f);
  vdb_close(h);
  tests_run++;
}

static void test_torn_write_recovery() {
  reset_dir();
  int64_t h = vdb_open(kDir, 2);
  float a[2] = {1, 1}, b[2] = {2, 2};
  vdb_append_add(h, 1, a);
  vdb_append_add(h, 2, b);
  vdb_close(h);
  // truncate mid-record: keep header(16) + rec1(16+8) + half of rec2
  FILE* f = fopen("/tmp/vdbstore_test/wal.bin", "rb+");
  CHECK(f);
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  CHECK(truncate("/tmp/vdbstore_test/wal.bin", size - 5) == 0);
  fclose(f);

  h = vdb_open(kDir, 2);
  int32_t ids[4];
  float vecs[8];
  int32_t n = vdb_load(h, 4, ids, vecs);
  CHECK(n == 1);  // only the intact record survives
  CHECK(ids[0] == 1);
  vdb_close(h);
  tests_run++;
}

static void test_batch_append() {
  reset_dir();
  int64_t h = vdb_open(kDir, 3);
  int32_t ids[3] = {5, 6, 7};
  float vecs[9] = {1, 1, 1, 2, 2, 2, 3, 3, 3};
  CHECK(vdb_append_add_batch(h, ids, vecs, 3) == 3);
  int32_t out_ids[4];
  float out[12];
  CHECK(vdb_load(h, 4, out_ids, out) == 3);
  CHECK(out_ids[2] == 7 && out[8] == 3.0f);
  vdb_close(h);
  tests_run++;
}

#include <unistd.h>

#include <atomic>
#include <thread>

// Concurrent stress (reference analog: test_performance.cpp:170-232 runs
// 1/2/4/8-thread searches): one writer streams appends while reader threads
// load snapshots from their own handles on the same directory.  The engine's
// contract is per-handle confinement + crash-consistent files, so readers
// must always see a prefix of acknowledged writes, never torn data.
static void test_concurrent_readers_during_appends() {
  reset_dir();
  const int kWrites = 400;
  std::atomic<int> acked{0};
  std::atomic<bool> ok{true};

  std::thread writer([&] {
    int64_t h = vdb_open(kDir, 4);
    float v[4];
    for (int i = 0; i < kWrites; ++i) {
      for (int j = 0; j < 4; ++j) v[j] = (float)i;
      if (vdb_append_add(h, i, v) != 1) { ok = false; break; }
      vdb_flush(h);
      acked.store(i + 1, std::memory_order_release);
    }
    vdb_close(h);
  });

  auto reader = [&](int /*tid*/) {
    std::vector<int32_t> ids(kWrites + 8);
    std::vector<float> vecs((kWrites + 8) * 4);
    for (int round = 0; round < 20; ++round) {
      int floor_acked = acked.load(std::memory_order_acquire);
      int64_t h = vdb_open(kDir, 4);
      int n = vdb_load(h, kWrites + 8, ids.data(), vecs.data());
      vdb_close(h);
      if (n < 0) { ok = false; return; }
      // every record a reader sees must be intact (id i carries value i)
      for (int r = 0; r < n; ++r) {
        if (vecs[r * 4] != (float)ids[r]) { ok = false; return; }
      }
      // and at least the writes acknowledged before the read must be there
      if (n < floor_acked) { ok = false; return; }
    }
  };
  std::thread r1(reader, 1), r2(reader, 2), r3(reader, 3), r4(reader, 4);
  writer.join(); r1.join(); r2.join(); r3.join(); r4.join();
  CHECK(ok.load());
  tests_run++;
}

int main() {
  test_roundtrip();
  test_delete_and_lastwrite();
  test_snapshot_and_reopen();
  test_torn_write_recovery();
  test_batch_append();
  test_concurrent_readers_during_appends();
  printf("OK: %d storage tests passed\n", tests_run);
  return 0;
}
