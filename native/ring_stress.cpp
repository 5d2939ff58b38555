// ring_stress: concurrent writer/reader stress test for fdoct_ring.
//
// One writer thread pushes sequence-stamped frames as fast as possible;
// N reader threads poll the latest frame and verify internal consistency
// (every pixel of a frame carries the same stamp — a torn read would mix
// stamps, which the ring's per-slot sequence protocol must prevent).
// Built under TSan/ASan via `make tsan` / `make asan`; exit 0 = clean.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <pthread.h>
#include <unistd.h>
#include <vector>

extern "C" {
void *fdoct_ring_open(const char *, int, uint32_t, uint32_t, uint32_t, uint32_t);
uint64_t fdoct_ring_push(void *, const uint8_t *);
uint64_t fdoct_ring_latest(void *, uint64_t, uint8_t *);
void fdoct_ring_close(void *);
}

static const char *PATH = "/tmp/fdoct_ring_stress.bin";
static const uint32_t W = 256, H = 64, SLOTS = 4;
static const int FRAMES = 20000;
static std::atomic<bool> done{false};
static std::atomic<long> torn{0};
static std::atomic<long> reads{0};

static void *writer(void *) {
  void *ring = fdoct_ring_open(PATH, 1, W, H, 8, SLOTS);
  std::vector<uint8_t> buf(W * H);
  for (int i = 0; i < FRAMES; i++) {
    memset(buf.data(), (uint8_t)(i & 0xff), buf.size());
    fdoct_ring_push(ring, buf.data());
  }
  done.store(true, std::memory_order_release);
  fdoct_ring_close(ring);
  return nullptr;
}

static void *reader(void *) {
  void *ring = nullptr;
  while (!ring) {
    ring = fdoct_ring_open(PATH, 0, 0, 0, 0, 0);
    if (!ring) usleep(100);
  }
  std::vector<uint8_t> buf(W * H);
  uint64_t last = 0;
  while (!done.load(std::memory_order_acquire)) {
    uint64_t seq = fdoct_ring_latest(ring, last, buf.data());
    if (seq) {
      last = seq;
      reads.fetch_add(1);
      uint8_t v0 = buf[0];
      for (size_t j = 1; j < buf.size(); j++) {
        if (buf[j] != v0) {          // mixed stamps = torn read escaped
          torn.fetch_add(1);
          break;
        }
      }
    }
  }
  fdoct_ring_close(ring);
  return nullptr;
}

int main() {
  unlink(PATH);
  pthread_t w, r[3];
  pthread_create(&w, nullptr, writer, nullptr);
  usleep(1000);
  for (auto &t : r) pthread_create(&t, nullptr, reader, nullptr);
  pthread_join(w, nullptr);
  for (auto &t : r) pthread_join(t, nullptr);
  printf("reads=%ld torn=%ld\n", reads.load(), torn.load());
  unlink(PATH);
  return torn.load() == 0 ? 0 : 1;
}
