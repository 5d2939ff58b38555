// capture_daemon: native frame producer feeding an fdoct_ring.
//
// The native acquisition half of the framework — the role the reference's
// QHY/Spinnaker/V4L SDK loops play (hn-88/FDOCT BscanFFT.cpp:729-948,
// BscanFFTspin.cpp:1047-1100), decoupled behind the shared-memory ring so
// the Python/JAX host never links camera SDKs.  Sources:
//
//   --synthetic            deterministic moving interference pattern
//   --pgm DIR              replay P5/PGM frames from a directory (loop)
//   --v4l2 /dev/videoN     V4L2 capture via raw ioctls (YUYV -> Y plane),
//                          no OpenCV/SDK dependency
//
// Usage: capture_daemon RING_PATH WIDTH HEIGHT BPP NSLOTS FPS SOURCE [ARG]
// Build: g++ -O2 -o capture_daemon capture_daemon.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <fcntl.h>
#include <string>
#include <vector>
#include <unistd.h>

#ifdef __linux__
#include <linux/videodev2.h>
#include <sys/ioctl.h>
#include <sys/mman.h>
#endif

// from fdoct_ring.cpp (linked together or via dlopen; here we just compile
// both translation units into the daemon)
extern "C" {
void *fdoct_ring_open(const char *, int, uint32_t, uint32_t, uint32_t, uint32_t);
uint64_t fdoct_ring_push(void *, const uint8_t *);
void fdoct_ring_close(void *);
}

static volatile int g_stop = 0;
extern "C" void handle_sigterm(int) { g_stop = 1; }

// ---------------------------------------------------------------------------

static void synthetic_frame(std::vector<uint8_t> &buf, uint32_t w, uint32_t h,
                            uint64_t t) {
  // moving cosine fringe + gaussian envelope: cheap stand-in for a live
  // interferogram so end-to-end streaming runs without hardware
  for (uint32_t y = 0; y < h; y++) {
    uint8_t *row = buf.data() + (size_t)y * w;
    for (uint32_t x = 0; x < w; x++) {
      double u = (double)x / w - 0.5;
      double env = std::exp(-u * u * 18.0);
      double fringe = std::cos(2.0 * M_PI * (0.08 * x + 0.01 * (double)t));
      row[x] = (uint8_t)(127.5 * env * (1.0 + fringe));
    }
  }
}

static bool read_pgm(const std::string &path, std::vector<uint8_t> &buf,
                     uint32_t w, uint32_t h) {
  FILE *f = fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[3] = {0};
  unsigned pw = 0, ph = 0, maxv = 0;
  if (fscanf(f, "%2s %u %u %u", magic, &pw, &ph, &maxv) != 4 ||
      strcmp(magic, "P5") != 0 || pw != w || ph != h) {
    fclose(f);
    return false;
  }
  fgetc(f);  // single whitespace after header
  size_t n = (size_t)w * h * (maxv > 255 ? 2 : 1);
  bool ok = fread(buf.data(), 1, n, f) == n;
  fclose(f);
  return ok;
}

#ifdef __linux__
struct V4L2Source {
  int fd = -1;
  std::vector<void *> maps;
  std::vector<size_t> lens;
  uint32_t w = 0, h = 0;

  bool open_dev(const char *dev, uint32_t width, uint32_t height) {
    fd = ::open(dev, O_RDWR);
    if (fd < 0) return false;
    v4l2_format fmt = {};
    fmt.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    fmt.fmt.pix.width = width;
    fmt.fmt.pix.height = height;
    fmt.fmt.pix.pixelformat = V4L2_PIX_FMT_YUYV;
    fmt.fmt.pix.field = V4L2_FIELD_NONE;
    if (ioctl(fd, VIDIOC_S_FMT, &fmt) < 0) return false;
    w = fmt.fmt.pix.width;
    h = fmt.fmt.pix.height;
    v4l2_requestbuffers req = {};
    req.count = 4;
    req.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    req.memory = V4L2_MEMORY_MMAP;
    if (ioctl(fd, VIDIOC_REQBUFS, &req) < 0) return false;
    for (uint32_t i = 0; i < req.count; i++) {
      v4l2_buffer b = {};
      b.type = req.type;
      b.memory = V4L2_MEMORY_MMAP;
      b.index = i;
      if (ioctl(fd, VIDIOC_QUERYBUF, &b) < 0) return false;
      void *m = mmap(nullptr, b.length, PROT_READ, MAP_SHARED, fd, b.m.offset);
      if (m == MAP_FAILED) return false;
      maps.push_back(m);
      lens.push_back(b.length);
      if (ioctl(fd, VIDIOC_QBUF, &b) < 0) return false;
    }
    int type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    return ioctl(fd, VIDIOC_STREAMON, &type) >= 0;
  }

  bool grab_y(std::vector<uint8_t> &out) {
    v4l2_buffer b = {};
    b.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    b.memory = V4L2_MEMORY_MMAP;
    if (ioctl(fd, VIDIOC_DQBUF, &b) < 0) return false;
    const uint8_t *yuyv = static_cast<const uint8_t *>(maps[b.index]);
    for (size_t i = 0; i < (size_t)w * h; i++) out[i] = yuyv[2 * i];
    ioctl(fd, VIDIOC_QBUF, &b);
    return true;
  }
};
#endif

int main(int argc, char **argv) {
  if (argc < 8) {
    fprintf(stderr,
            "usage: %s RING WIDTH HEIGHT BPP NSLOTS FPS "
            "(--synthetic | --pgm DIR | --v4l2 DEV)\n",
            argv[0]);
    return 2;
  }
  const char *ring_path = argv[1];
  const uint32_t w = atoi(argv[2]), h = atoi(argv[3]);
  const uint32_t bpp = atoi(argv[4]), nslots = atoi(argv[5]);
  const double fps = atof(argv[6]);
  const std::string mode = argv[7];

  void *ring = fdoct_ring_open(ring_path, 1, w, h, bpp, nslots);
  if (!ring) {
    fprintf(stderr, "cannot create ring %s\n", ring_path);
    return 1;
  }
  const size_t frame_bytes = (size_t)w * h * (bpp > 8 ? 2 : 1);
  std::vector<uint8_t> buf(frame_bytes, 0);
  const useconds_t sleep_us = fps > 0 ? (useconds_t)(1e6 / fps) : 0;

  std::vector<std::string> pgms;
  if (mode == "--pgm") {
    DIR *d = opendir(argv[8]);
    if (!d) { fprintf(stderr, "no dir %s\n", argv[8]); return 1; }
    dirent *e;
    while ((e = readdir(d)))
      if (strstr(e->d_name, ".pgm"))
        pgms.push_back(std::string(argv[8]) + "/" + e->d_name);
    closedir(d);
    if (pgms.empty()) { fprintf(stderr, "no .pgm files\n"); return 1; }
  }

#ifdef __linux__
  V4L2Source cam;
  if (mode == "--v4l2" && !cam.open_dev(argv[8], w, h)) {
    fprintf(stderr, "v4l2 open failed for %s\n", argv[8]);
    return 1;
  }
#endif

  for (uint64_t t = 0; !g_stop; t++) {
    if (mode == "--synthetic") {
      synthetic_frame(buf, w, h, t);
    } else if (mode == "--pgm") {
      if (!read_pgm(pgms[t % pgms.size()], buf, w, h)) continue;
#ifdef __linux__
    } else if (mode == "--v4l2") {
      if (!cam.grab_y(buf)) break;
#endif
    } else {
      fprintf(stderr, "unknown source %s\n", mode.c_str());
      return 2;
    }
    fdoct_ring_push(ring, buf.data());
    if (sleep_us) usleep(sleep_us);
  }
  fdoct_ring_close(ring);
  return 0;
}
