// fdoct_ring: file/shm-backed lock-free frame ring buffer (C ABI).
//
// The native seam between acquisition hardware and the Python/JAX host
// process.  Plays the role the USB bus + GetQHYCCDLiveFrame blocking call
// plays in the reference (hn-88/FDOCT BscanFFT.cpp:948): a capture daemon
// (capture_daemon.cpp) pushes raw frames, the host reader
// (fdoct_tpu/sources/camera.py, via ctypes) polls the newest complete
// frame and feeds the device pipeline.  Single writer, any number of
// readers, no locks: per-slot sequence numbers with acquire/release
// ordering detect torn reads.
//
// Build: g++ -O2 -shared -fPIC -o libfdoct_ring.so fdoct_ring.cpp

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t MAGIC = 0xFD0C7B1F;
constexpr uint32_t VERSION = 4;
constexpr uint32_t NCTRL = 8;  // control slots: 0=exposure_us 1=gain 2=gamma 3=fps

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t width;
  uint32_t height;
  uint32_t bpp;        // 8 or 16
  uint32_t nslots;
  uint64_t frame_bytes;
  uint64_t head;       // frames written so far (monotonic)
  // v2: host→daemon control channel (the live SetQHYCCDParam seat,
  // hn-88/FDOCT BscanFFT.cpp:1600-1624 — exposure/gain keys applied to the
  // running camera).  Seqlock with the HOST as the only writer: ctrl_seq is
  // odd while a write is in progress, even when the snapshot is stable.
  // The daemon polls between frames, applies, and acknowledges by storing
  // the consumed seq into ctrl_applied (the deferred-apply pattern of
  // BscanFFTspin.cpp:1895-1903).
  uint64_t ctrl_seq;
  uint64_t ctrl_applied;
  double ctrl_values[NCTRL];
  // v3: per-slot "host has written this knob" bitmask, updated inside the
  // same seqlock write as the value.  Distinguishes a COMMANDED 0 (the '-'
  // key legitimately drives exposure to 0) from a never-touched slot, so a
  // restarted daemon's startup merge takes exactly the knobs the host set
  // and keeps its argv defaults for the rest.
  uint64_t ctrl_mask;
  // v4: writer-lifetime generation counter, incremented every time a
  // writer (re-)creates the header.  A daemon restart that races head past
  // a reader's last_seq within one poll interval is otherwise
  // indistinguishable from progress (the new stream's seq numbers look
  // in-sequence); readers resync on any epoch change (RingReader._poll).
  // Plays the role of the reference's incomplete-frame retry hardening
  // (hn-88/FDOCT BscanFFTspin.cpp:1059-1066) for the restart seam.
  uint64_t epoch;
  // explicit pad to a fixed 256-byte header (the previous formula-derived
  // pad silently doubled sizeof(Header) when the field sum hit a multiple
  // of 128; the static_assert makes the size intentional)
  uint8_t pad[256 - (6 * 4 + 6 * 8 + NCTRL * 8)];
};
static_assert(sizeof(Header) == 256, "ring header must stay 256 bytes");

struct Ring {
  int fd;
  size_t map_bytes;
  Header *hdr;
  uint8_t *slots;      // nslots x (8-byte seq + frame_bytes)
};

inline uint64_t slot_stride(const Header *h) { return 8 + h->frame_bytes; }

inline uint64_t *slot_seq(Ring *r, uint64_t idx) {
  return reinterpret_cast<uint64_t *>(r->slots + idx * slot_stride(r->hdr));
}

inline uint8_t *slot_data(Ring *r, uint64_t idx) {
  return r->slots + idx * slot_stride(r->hdr) + 8;
}

}  // namespace

extern "C" {

// Create (writer) or open (reader) a ring at `path`.  create=1 truncates
// and initializes.  Returns an opaque handle or nullptr.
void *fdoct_ring_open(const char *path, int create, uint32_t width,
                      uint32_t height, uint32_t bpp, uint32_t nslots) {
  int flags = create ? (O_RDWR | O_CREAT) : O_RDWR;
  int fd = open(path, flags, 0644);
  if (fd < 0) return nullptr;

  uint64_t frame_bytes = 0;
  size_t map_bytes = 0;
  if (create) {
    frame_bytes = (uint64_t)width * height * (bpp > 8 ? 2 : 1);
    map_bytes = sizeof(Header) + (size_t)nslots * (8 + frame_bytes);
    if (ftruncate(fd, (off_t)map_bytes) != 0) { close(fd); return nullptr; }
  } else {
    Header probe;
    if (pread(fd, &probe, sizeof(probe), 0) != (ssize_t)sizeof(probe) ||
        probe.magic != MAGIC || probe.version != VERSION) {
      close(fd);
      return nullptr;
    }
    frame_bytes = probe.frame_bytes;
    nslots = probe.nslots;
    map_bytes = sizeof(Header) + (size_t)nslots * (8 + frame_bytes);
  }

  void *mem = mmap(nullptr, map_bytes, PROT_READ | PROT_WRITE, MAP_SHARED,
                   fd, 0);
  if (mem == MAP_FAILED) { close(fd); return nullptr; }

  Ring *r = new Ring;
  r->fd = fd;
  r->map_bytes = map_bytes;
  r->hdr = reinterpret_cast<Header *>(mem);
  r->slots = reinterpret_cast<uint8_t *>(mem) + sizeof(Header);

  if (create) {
    // A writer re-creating an existing, geometry-compatible ring (daemon
    // restart) preserves the host's control snapshot: exposure/gain
    // survive the failover and are re-applied by the fresh daemon
    // (ctrl_applied resets to 0, so its first poll delivers them).
    uint64_t keep_seq = 0;
    uint64_t keep_mask = 0;
    uint64_t old_epoch = 0;
    double keep_vals[NCTRL] = {0};
    Header *old_hdr = reinterpret_cast<Header *>(mem);
    if (old_hdr->magic == MAGIC && old_hdr->version == VERSION) {
      // the generation advances across ANY restart, geometry change or not
      old_epoch = old_hdr->epoch;
      if (old_hdr->frame_bytes == frame_bytes && old_hdr->nslots == nslots) {
        keep_seq = old_hdr->ctrl_seq & ~1ull;  // round down a mid-write seq
        keep_mask = old_hdr->ctrl_mask;
        memcpy(keep_vals, old_hdr->ctrl_values, sizeof(keep_vals));
      }
    }
    memset(mem, 0, map_bytes);
    // RELEASE: readers load the epoch with ACQUIRE (fdoct_ring_epoch), so
    // a reader that observes the bumped epoch is guaranteed to also see
    // the memset-zeroed header (release orders the PRIOR writes before
    // this store).  The other direction — epoch visible before the new
    // writer's first head/frame publications — is closed by the RELEASE
    // store on head in fdoct_ring_push (which orders this earlier epoch
    // write before head); keep BOTH release stores or the
    // restart-races-head window reopens on weakly-ordered architectures.
    __atomic_store_n(&r->hdr->epoch, old_epoch + 1, __ATOMIC_RELEASE);
    r->hdr->ctrl_seq = keep_seq;
    r->hdr->ctrl_mask = keep_mask;
    memcpy(r->hdr->ctrl_values, keep_vals, sizeof(keep_vals));
    r->hdr->width = width;
    r->hdr->height = height;
    r->hdr->bpp = bpp;
    r->hdr->nslots = nslots;
    r->hdr->frame_bytes = frame_bytes;
    r->hdr->head = 0;
    r->hdr->version = VERSION;
    __atomic_store_n(&r->hdr->magic, MAGIC, __ATOMIC_RELEASE);
  }
  return r;
}

void fdoct_ring_close(void *handle) {
  Ring *r = static_cast<Ring *>(handle);
  if (!r) return;
  munmap(r->hdr, r->map_bytes);
  close(r->fd);
  delete r;
}

uint32_t fdoct_ring_width(void *h)  { return static_cast<Ring *>(h)->hdr->width; }
uint32_t fdoct_ring_height(void *h) { return static_cast<Ring *>(h)->hdr->height; }
uint32_t fdoct_ring_bpp(void *h)    { return static_cast<Ring *>(h)->hdr->bpp; }
uint64_t fdoct_ring_frame_bytes(void *h) {
  return static_cast<Ring *>(h)->hdr->frame_bytes;
}

// Writer: push one frame (frame_bytes long).  Returns the new sequence
// number (1-based).
uint64_t fdoct_ring_push(void *handle, const uint8_t *data) {
  Ring *r = static_cast<Ring *>(handle);
  const uint64_t head = __atomic_load_n(&r->hdr->head, __ATOMIC_RELAXED);
  const uint64_t idx = head % r->hdr->nslots;
  __atomic_store_n(slot_seq(r, idx), 0, __ATOMIC_RELEASE);  // mark in-flight
  memcpy(slot_data(r, idx), data, r->hdr->frame_bytes);
  __atomic_store_n(slot_seq(r, idx), head + 1, __ATOMIC_RELEASE);
  __atomic_store_n(&r->hdr->head, head + 1, __ATOMIC_RELEASE);
  return head + 1;
}

// Reader: copy out the newest frame if its sequence is > last_seq.
// Returns the frame's sequence number, or 0 if nothing new / torn.
uint64_t fdoct_ring_latest(void *handle, uint64_t last_seq, uint8_t *out) {
  Ring *r = static_cast<Ring *>(handle);
  const uint64_t head = __atomic_load_n(&r->hdr->head, __ATOMIC_ACQUIRE);
  if (head == 0 || head <= last_seq) return 0;
  const uint64_t idx = (head - 1) % r->hdr->nslots;
  const uint64_t seq_before = __atomic_load_n(slot_seq(r, idx), __ATOMIC_ACQUIRE);
  if (seq_before != head) return 0;  // writer mid-overwrite
  memcpy(out, slot_data(r, idx), r->hdr->frame_bytes);
  const uint64_t seq_after = __atomic_load_n(slot_seq(r, idx), __ATOMIC_ACQUIRE);
  if (seq_after != seq_before) return 0;  // torn read, caller retries
  return head;
}

// Reader: copy out a specific sequence (for in-order consumption when the
// reader keeps up).  Returns seq on success, 0 if that slot was overwritten.
uint64_t fdoct_ring_get(void *handle, uint64_t seq, uint8_t *out) {
  Ring *r = static_cast<Ring *>(handle);
  if (seq == 0) return 0;
  const uint64_t head = __atomic_load_n(&r->hdr->head, __ATOMIC_ACQUIRE);
  if (seq > head || head - seq >= r->hdr->nslots) return 0;
  const uint64_t idx = (seq - 1) % r->hdr->nslots;
  if (__atomic_load_n(slot_seq(r, idx), __ATOMIC_ACQUIRE) != seq) return 0;
  memcpy(out, slot_data(r, idx), r->hdr->frame_bytes);
  if (__atomic_load_n(slot_seq(r, idx), __ATOMIC_ACQUIRE) != seq) return 0;
  return seq;
}

uint64_t fdoct_ring_head(void *handle) {
  return __atomic_load_n(&static_cast<Ring *>(handle)->hdr->head,
                         __ATOMIC_ACQUIRE);
}

uint32_t fdoct_ring_nslots(void *handle) {
  return static_cast<Ring *>(handle)->hdr->nslots;
}

// Writer-lifetime generation (v4).  Increments at every header re-create;
// readers compare against the epoch they last synced to and reset their
// last_seq on any change — the only reliable restart signal when the new
// writer's head races past the reader's position within one poll.
uint64_t fdoct_ring_epoch(void *handle) {
  return __atomic_load_n(&static_cast<Ring *>(handle)->hdr->epoch,
                         __ATOMIC_ACQUIRE);
}

// --- control channel (host → daemon) --------------------------------------

// Host: set one control parameter.  The host session loop is the single
// control writer (the reference's key-dispatch thread is likewise the only
// caller of SetQHYCCDParam, BscanFFT.cpp:1600).
void fdoct_ring_set_ctrl(void *handle, uint32_t param, double value) {
  if (param >= NCTRL) return;
  Header *h = static_cast<Ring *>(handle)->hdr;
  const uint64_t s = __atomic_load_n(&h->ctrl_seq, __ATOMIC_RELAXED);
  __atomic_store_n(&h->ctrl_seq, s + 1, __ATOMIC_RELAXED);  // odd: in progress
  // the data store must not sink above the odd store or float below the
  // even store on weakly-ordered CPUs — full seqlock write fencing
  __atomic_thread_fence(__ATOMIC_RELEASE);
  h->ctrl_values[param] = value;
  h->ctrl_mask |= 1ull << param;   // v3: slot is now host-commanded
  __atomic_thread_fence(__ATOMIC_RELEASE);
  __atomic_store_n(&h->ctrl_seq, s + 2, __ATOMIC_RELEASE);  // even: stable
}

// Which control slots the host has ever written (v3).  Lets a restarted
// daemon merge exactly the commanded knobs and keep argv defaults for the
// rest — value-based "0 means unset" heuristics cannot represent a
// commanded 0 (exposure '-' clamps at 0 and the sensor legitimately goes
// dark).
uint64_t fdoct_ring_ctrl_mask(void *handle) {
  return __atomic_load_n(&static_cast<Ring *>(handle)->hdr->ctrl_mask,
                         __ATOMIC_ACQUIRE);
}

double fdoct_ring_get_ctrl(void *handle, uint32_t param) {
  if (param >= NCTRL) return 0.0;
  return static_cast<Ring *>(handle)->hdr->ctrl_values[param];
}

// Daemon: poll for a new stable control snapshot.  Copies all NCTRL values
// into `out` and acknowledges the seq; returns 1 on a new snapshot, 0 when
// nothing changed or a write is mid-flight (caller re-polls next frame).
int fdoct_ring_poll_ctrl(void *handle, double *out) {
  Header *h = static_cast<Ring *>(handle)->hdr;
  const uint64_t s1 = __atomic_load_n(&h->ctrl_seq, __ATOMIC_ACQUIRE);
  if (s1 & 1) return 0;  // writer mid-update
  if (s1 == __atomic_load_n(&h->ctrl_applied, __ATOMIC_RELAXED)) return 0;
  double vals[NCTRL];
  memcpy(vals, h->ctrl_values, sizeof(vals));
  // the data reads must complete before the seq re-check — an acquire
  // LOAD only orders later accesses, so an explicit fence is required for
  // the seqlock read side on weakly-ordered CPUs
  __atomic_thread_fence(__ATOMIC_ACQUIRE);
  if (__atomic_load_n(&h->ctrl_seq, __ATOMIC_RELAXED) != s1) return 0;  // torn
  memcpy(out, vals, sizeof(vals));
  __atomic_store_n(&h->ctrl_applied, s1, __ATOMIC_RELEASE);
  return 1;
}

// Host: what the daemon last acknowledged (for "did my '+' land" tests and
// the Status window).
uint64_t fdoct_ring_ctrl_applied(void *handle) {
  return __atomic_load_n(&static_cast<Ring *>(handle)->hdr->ctrl_applied,
                         __ATOMIC_ACQUIRE);
}

uint64_t fdoct_ring_ctrl_seq(void *handle) {
  return __atomic_load_n(&static_cast<Ring *>(handle)->hdr->ctrl_seq,
                         __ATOMIC_ACQUIRE);
}

}  // extern "C"
