// ring_stress: concurrent writer/reader stress test for fdoct_ring.
//
// One writer thread pushes sequence-stamped frames as fast as possible;
// N reader threads poll the latest frame and verify internal consistency
// (every pixel of a frame carries the same stamp — a torn read would mix
// stamps, which the ring's per-slot sequence protocol must prevent).
// A control-writer thread hammers the seqlock control block with paired
// values while a poller verifies every delivered snapshot is consistent
// (exposure == gain by construction — a torn seqlock read would mix
// generations).  Built under TSan/ASan via `make tsan` / `make asan`;
// exit 0 = clean.

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
void fdoct_ring_set_ctrl(void *, uint32_t, double);
int fdoct_ring_poll_ctrl(void *, double *);
void fdoct_ring_close(void *);
}

static const char *PATH = "/tmp/fdoct_ring_stress.bin";
static const uint32_t W = 256, H = 64, SLOTS = 4;
static const int FRAMES = 20000;
static std::atomic<bool> done{false};
static std::atomic<long> torn{0};
static std::atomic<long> reads{0};
static std::atomic<long> ctrl_polls{0};
static std::atomic<long> ctrl_torn{0};

// seqlock stress: host writes paired (exposure, gain) with exposure == gain
// per generation; the daemon-side poller must never observe a mixed pair.
static void *ctrl_writer(void *) {
  void *ring = nullptr;
  while (!ring) {
    ring = fdoct_ring_open(PATH, 0, 0, 0, 0, 0);
    if (!ring) usleep(100);
  }
  for (uint64_t g = 1; !done.load(std::memory_order_acquire); g++) {
    fdoct_ring_set_ctrl(ring, 0, (double)g);
    fdoct_ring_set_ctrl(ring, 1, (double)g);
  }
  fdoct_ring_close(ring);
  return nullptr;
}

static void *ctrl_poller(void *) {
  void *ring = nullptr;
  while (!ring) {
    ring = fdoct_ring_open(PATH, 0, 0, 0, 0, 0);
    if (!ring) usleep(100);
  }
  double vals[8];
  while (!done.load(std::memory_order_acquire)) {
    if (fdoct_ring_poll_ctrl(ring, vals)) {
      ctrl_polls.fetch_add(1);
      // exposure may lead gain by exactly one generation (two set_ctrl
      // calls per pair), never trail it and never differ by more
      double d = vals[0] - vals[1];
      if (d != 0.0 && d != 1.0) ctrl_torn.fetch_add(1);
    }
  }
  fdoct_ring_close(ring);
  return nullptr;
}

static void *writer(void *) {
  void *ring = fdoct_ring_open(PATH, 1, W, H, 8, SLOTS);
  std::vector<uint8_t> buf(W * H);
  for (int i = 0; i < FRAMES; i++) {
    memset(buf.data(), (uint8_t)(i & 0xff), buf.size());
    fdoct_ring_push(ring, buf.data());
  }
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
  pthread_t w, r[3], cw, cp;
  pthread_create(&w, nullptr, writer, nullptr);
  usleep(1000);
  for (auto &t : r) pthread_create(&t, nullptr, reader, nullptr);
  pthread_create(&cw, nullptr, ctrl_writer, nullptr);
  pthread_create(&cp, nullptr, ctrl_poller, nullptr);
  pthread_join(w, nullptr);
  usleep(300000);   // guarantee the ctrl threads real contention time
  done.store(true, std::memory_order_release);
  for (auto &t : r) pthread_join(t, nullptr);
  pthread_join(cw, nullptr);
  pthread_join(cp, nullptr);
  printf("reads=%ld torn=%ld ctrl_polls=%ld ctrl_torn=%ld\n",
         reads.load(), torn.load(), ctrl_polls.load(), ctrl_torn.load());
  unlink(PATH);
  // ctrl_polls must be nonzero or the seqlock stress validated nothing
  // (a poll-side livelock would otherwise pass as "clean")
  return (torn.load() == 0 && ctrl_torn.load() == 0 &&
          reads.load() > 0 && ctrl_polls.load() > 0) ? 0 : 1;
}
