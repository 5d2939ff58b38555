// capture_daemon: native frame producer feeding an fdoct_ring.
//
// The native acquisition half of the framework — the role the reference's
// QHY/Spinnaker/V4L SDK loops play (hn-88/FDOCT BscanFFT.cpp:729-948,
// BscanFFTspin.cpp:1047-1100), decoupled behind the shared-memory ring so
// the Python/JAX host never links camera SDKs.  Sources:
//
//   --synthetic            deterministic moving interference pattern
//                          (models exposure/gain: counts scale with the
//                          commanded exposure like a real sensor)
//   --pgm DIR              replay P5/PGM frames from a directory (loop)
//   --v4l2 /dev/videoN     V4L2 capture via raw ioctls (YUYV -> Y plane),
//                          no OpenCV/SDK dependency
//   --qhy                  QHY SDK live stream (compile with
//                          -DFDOCT_WITH_QHY; see stubs/qhyccd.h for the
//                          CI-compilable seam) — the init chain of
//                          hn-88/FDOCT BscanFFT.cpp:729-901
//   --spinnaker            FLIR Spinnaker C-API stream (compile with
//                          -DFDOCT_WITH_SPINNAKER; stubs/SpinnakerC.h) —
//                          the nodemap config of BscanFFTspin.cpp:790-1100
//
// Control: the host writes exposure/gain/gamma/fps into the ring header's
// control block (fdoct_ring_set_ctrl); this daemon polls it once per frame
// and applies — the live-camera control loop the reference runs through
// SetQHYCCDParam on the +/-/u/d/U/D keys (BscanFFT.cpp:1600-1624) and
// Spinnaker's deferred expchanged apply (BscanFFTspin.cpp:1895-1903).
//
// Trigger modes (--trigger sw|hw, default free-running): the triggered
// acquisition of BscanFFTspinj.cpp — ConfigureTrigger (TriggerMode Off →
// TriggerSource Software/Line0 → TriggerMode On, reference :123-189),
// GrabNextImageByTrigger (:192-230), ResetTrigger at shutdown (:232-256).
// In 'sw' mode the host fires pulses by bumping the CTRL_TRIGGER counter in
// the ring control block (RingReader.trigger()); the daemon emits exactly
// one frame per pulse — for EVERY source, so the trigger flow is CI-testable
// with --synthetic and maps to TriggerSoftware.Execute() on Spinnaker.  In
// 'hw' mode Spinnaker blocks in GetNextImage until a Line0 pulse arrives;
// other sources treat hw like sw (the counter stands in for the pulse line).
//
// Acquisition geometry (--offsetx/--offsety/--cambinx/--cambiny/--camspeed/
// --usbtraffic/--exposure/--gain/--gamma): plumbed into the SDK init chains —
// QHY SetQHYCCDResolution(offsets) + CONTROL_USBTRAFFIC/SPEED
// (BscanFFT.cpp:808-871), Spinnaker OffsetX/Y, Width/Height, PixelFormat
// Mono8/16, AcquisitionFrameRate[Enable] (BscanFFTspin.cpp:809-979).
//
// Usage: capture_daemon RING_PATH WIDTH HEIGHT BPP NSLOTS FPS SOURCE [ARG]
//                       [--trigger sw|hw] [--offsetx N] [--offsety N]
//                       [--cambinx N] [--cambiny N] [--camspeed N]
//                       [--usbtraffic N] [--exposure US] [--gain N]
//                       [--gamma F]
// Build: g++ -O2 -o capture_daemon capture_daemon.cpp

#include <algorithm>
#include <cmath>
#include <csignal>
#include <utility>
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
int fdoct_ring_poll_ctrl(void *, double *);
uint64_t fdoct_ring_ctrl_mask(void *);
}

// control-slot indices (must match fdoct_tpu/sources/camera.py CTRL_PARAMS).
// CTRL_TRIGGER is a monotonically increasing pulse counter: each increment
// commands one triggered frame (the software-trigger seam).
enum { CTRL_EXPOSURE_US = 0, CTRL_GAIN = 1, CTRL_GAMMA = 2, CTRL_FPS = 3,
       CTRL_TRIGGER = 4 };

// acquisition geometry from the ini, passed on argv (see header comment)
struct CamGeom {
  int offsetx = 0, offsety = 0;
  int cambinx = 1, cambiny = 1;
  double camspeed = 2;     // QHY CONTROL_SPEED 0..2 / Spinnaker fps
  double usbtraffic = 20;  // QHY CONTROL_USBTRAFFIC 0..100
  double exposure_us = 1000.0, gain = 0.0, gamma = 0.0;
};

static volatile int g_stop = 0;
extern "C" void handle_sigterm(int) { g_stop = 1; }

// ---------------------------------------------------------------------------

static void synthetic_frame(std::vector<uint8_t> &buf, uint32_t w, uint32_t h,
                            uint32_t bpp, uint64_t t, double exposure_us,
                            double gain) {
  // moving cosine fringe + gaussian envelope: cheap stand-in for a live
  // interferogram so end-to-end streaming runs without hardware.  Counts
  // scale linearly with exposure (full scale at the 1000 µs default) and
  // with gain (percent), saturating at full scale like a real sensor — so
  // the host's '+'/'-' keys have a measurable photometric effect.
  // bpp 16 writes native-endian uint16 (the QHY 16-bit mode,
  // SetQHYCCDBitsMode; the host reader views the ring as uint16).
  const double scale = (exposure_us / 1000.0) * (1.0 + gain / 100.0);
  const double full = bpp > 8 ? 65535.0 : 255.0;
  uint16_t *row16 = reinterpret_cast<uint16_t *>(buf.data());
  for (uint32_t y = 0; y < h; y++) {
    uint8_t *row = buf.data() + (size_t)y * w;
    for (uint32_t x = 0; x < w; x++) {
      double u = (double)x / w - 0.5;
      double env = std::exp(-u * u * 18.0);
      double fringe = std::cos(2.0 * M_PI * (0.08 * x + 0.01 * (double)t));
      double v = (full / 2.0) * env * (1.0 + fringe) * scale;
      v = v < 0 ? 0 : (v > full ? full : v);
      if (bpp > 8)
        row16[(size_t)y * w + x] = (uint16_t)v;
      else
        row[x] = (uint8_t)v;
    }
  }
}

static bool read_pgm(const std::string &path, std::vector<uint8_t> &buf,
                     uint32_t w, uint32_t h, uint32_t bpp) {
  FILE *f = fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[3] = {0};
  unsigned pw = 0, ph = 0, maxv = 0;
  if (fscanf(f, "%2s %u %u %u", magic, &pw, &ph, &maxv) != 4 ||
      strcmp(magic, "P5") != 0 || pw != w || ph != h) {
    fclose(f);
    return false;
  }
  // the file's sample depth must match the ring's: a mismatch would either
  // half-fill the frame (8-bit file → 16-bit ring: garbage pixels) or
  // overflow buf (16-bit file → 8-bit ring)
  if ((maxv > 255) != (bpp > 8)) {
    fprintf(stderr, "pgm %s: maxval %u does not match ring bpp %u\n",
            path.c_str(), maxv, bpp);
    fclose(f);
    return false;
  }
  fgetc(f);  // single whitespace after header
  size_t n = (size_t)w * h * (maxv > 255 ? 2 : 1);
  bool ok = fread(buf.data(), 1, n, f) == n;
  fclose(f);
  if (ok && maxv > 255) {
    // PGM stores >8-bit samples most-significant-byte first (netpbm spec);
    // the ring is native little-endian uint16 — swap, or every intensity
    // is byte-scrambled with no diagnostic
    for (size_t i = 0; i + 1 < n; i += 2)
      std::swap(buf[i], buf[i + 1]);
  }
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
    // V4L2 S_FMT "succeeds" by ADJUSTING the format to the nearest mode
    // the driver supports; streaming an adjusted geometry into the
    // argv-sized ring buffer would overflow it (larger) or scramble the
    // frames (smaller) — refuse loudly instead
    if (fmt.fmt.pix.width != width || fmt.fmt.pix.height != height ||
        fmt.fmt.pix.pixelformat != V4L2_PIX_FMT_YUYV) {
      fprintf(stderr,
              "v4l2: driver adjusted format to %ux%u fourcc 0x%08x "
              "(requested %ux%u YUYV) — set the ini width/height to a "
              "mode the camera supports\n",
              fmt.fmt.pix.width, fmt.fmt.pix.height, fmt.fmt.pix.pixelformat,
              width, height);
      return false;
    }
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

  // host control → driver controls.  Exposure lands on
  // V4L2_CID_EXPOSURE_ABSOLUTE (units of 100 µs, manual mode forced);
  // gain on V4L2_CID_GAIN.  Best-effort: devices without the control
  // just ignore it (the reference's webcam variant likewise has no
  // exposure control, BscanFFTwebcam.cpp).
  void apply_ctrl(const double *vals) {
    v4l2_control c = {};
    c.id = V4L2_CID_EXPOSURE_AUTO;
    c.value = V4L2_EXPOSURE_MANUAL;
    ioctl(fd, VIDIOC_S_CTRL, &c);
    c.id = V4L2_CID_EXPOSURE_ABSOLUTE;
    c.value = (int32_t)(vals[CTRL_EXPOSURE_US] / 100.0 + 0.5);
    if (c.value < 1) c.value = 1;
    ioctl(fd, VIDIOC_S_CTRL, &c);
    c.id = V4L2_CID_GAIN;
    c.value = (int32_t)vals[CTRL_GAIN];
    ioctl(fd, VIDIOC_S_CTRL, &c);
  }
};
#endif

// ---------------------------------------------------------------------------
// SDK seams.  These compile against stub headers in native/stubs/ (CI) or
// the real vendor SDKs (deployments); the daemon code is identical either
// way, so the integration seam cannot rot.  With stubs, init fails cleanly
// at "no camera found".

#ifdef FDOCT_WITH_QHY
#include <qhyccd.h>

// QHY live-stream source: the init chain the reference runs at
// BscanFFT.cpp:729-901 (InitQHYCCDResource → ScanQHYCCD → GetQHYCCDId →
// OpenQHYCCD → SetQHYCCDStreamMode(live) → InitQHYCCD → bits/resolution →
// SetQHYCCDParam(traffic, speed, exposure, gain) → BeginQHYCCDLive), then
// GetQHYCCDLiveFrame per frame (BscanFFT.cpp:948).
struct QHYSource {
  qhyccd_handle *cam = nullptr;

  bool open_dev(uint32_t w, uint32_t h, uint32_t bpp, const CamGeom &g) {
    if (InitQHYCCDResource() != QHYCCD_SUCCESS) return false;
    const int n = ScanQHYCCD();
    if (n <= 0) { fprintf(stderr, "qhy: no camera found\n"); return false; }
    char id[64] = {0};
    if (GetQHYCCDId(0, id) != QHYCCD_SUCCESS) return false;
    cam = OpenQHYCCD(id);
    if (!cam) return false;
    if (SetQHYCCDStreamMode(cam, 1) != QHYCCD_SUCCESS) return false;  // live
    if (InitQHYCCD(cam) != QHYCCD_SUCCESS) return false;
    SetQHYCCDBitsMode(cam, bpp);
    // ROI with offsets + USB link parameters from the ini, exactly the
    // init chain of BscanFFT.cpp:808-871
    SetQHYCCDResolution(cam, g.offsetx, g.offsety, w, h);
    SetQHYCCDParam(cam, CONTROL_USBTRAFFIC, g.usbtraffic);
    SetQHYCCDParam(cam, CONTROL_SPEED, g.camspeed);
    SetQHYCCDParam(cam, CONTROL_EXPOSURE, g.exposure_us);
    SetQHYCCDParam(cam, CONTROL_GAIN, g.gain);
    if (g.gamma > 0) SetQHYCCDParam(cam, CONTROL_GAMMA, g.gamma);
    return BeginQHYCCDLive(cam) == QHYCCD_SUCCESS;
  }

  bool grab(std::vector<uint8_t> &out, uint32_t w, uint32_t h) {
    uint32_t rw = 0, rh = 0, rbpp = 0, rch = 0;
    // the reference polls until a frame arrives (BscanFFT.cpp:946-950)
    for (int tries = 0; tries < 1000; tries++) {
      if (GetQHYCCDLiveFrame(cam, &rw, &rh, &rbpp, &rch, out.data()) ==
          QHYCCD_SUCCESS && rw == w && rh == h)
        return true;
      usleep(100);
    }
    return false;
  }

  // live control re-apply: the SetQHYCCDParam key seam (BscanFFT.cpp:1600)
  void apply_ctrl(const double *vals) {
    SetQHYCCDParam(cam, CONTROL_EXPOSURE, vals[CTRL_EXPOSURE_US]);
    SetQHYCCDParam(cam, CONTROL_GAIN, vals[CTRL_GAIN]);
    if (vals[CTRL_GAMMA] > 0) SetQHYCCDParam(cam, CONTROL_GAMMA, vals[CTRL_GAMMA]);
  }

  void close_dev() {
    if (cam) { StopQHYCCDLive(cam); CloseQHYCCD(cam); cam = nullptr; }
    ReleaseQHYCCDResource();
  }
};
#endif  // FDOCT_WITH_QHY

#ifdef FDOCT_WITH_SPINNAKER
#include <SpinnakerC.h>

// FLIR source via the Spinnaker C API: the GenICam nodemap configuration of
// BscanFFTspin.cpp:790-1045 (AcquisitionMode=Continuous, ExposureAuto/
// GainAuto Off, manual ExposureTime/Gain) and the GetNextImage loop of
// BscanFFTspin.cpp:1047-1100.  Exposure changes are deferred to between
// frames (the expchanged pattern, BscanFFTspin.cpp:1895-1903) — which the
// daemon's poll-then-grab loop gives us for free.
struct SpinSource {
  spinSystem sys = nullptr;
  spinCameraList list = nullptr;
  spinCamera cam = nullptr;
  spinNodeMapHandle nodemap = nullptr;

  bool node_set_enum(const char *node, const char *entry) {
    spinNodeHandle h = nullptr, e = nullptr;
    int64_t v = 0;
    if (spinNodeMapGetNode(nodemap, node, &h) != SPINNAKER_ERR_SUCCESS)
      return false;
    if (spinEnumerationGetEntryByName(h, entry, &e) != SPINNAKER_ERR_SUCCESS)
      return false;
    if (spinEnumerationEntryGetIntValue(e, &v) != SPINNAKER_ERR_SUCCESS)
      return false;
    return spinEnumerationSetIntValue(h, v) == SPINNAKER_ERR_SUCCESS;
  }

  bool node_set_float(const char *node, double v) {
    spinNodeHandle h = nullptr;
    if (spinNodeMapGetNode(nodemap, node, &h) != SPINNAKER_ERR_SUCCESS)
      return false;
    return spinFloatSetValue(h, v) == SPINNAKER_ERR_SUCCESS;
  }

  bool node_set_int(const char *node, int64_t v) {
    spinNodeHandle h = nullptr;
    if (spinNodeMapGetNode(nodemap, node, &h) != SPINNAKER_ERR_SUCCESS)
      return false;
    return spinIntegerSetValue(h, v) == SPINNAKER_ERR_SUCCESS;
  }

  bool node_set_bool(const char *node, bool8_t v) {
    spinNodeHandle h = nullptr;
    if (spinNodeMapGetNode(nodemap, node, &h) != SPINNAKER_ERR_SUCCESS)
      return false;
    return spinBooleanSetValue(h, v) == SPINNAKER_ERR_SUCCESS;
  }

  bool node_execute(const char *node) {
    spinNodeHandle h = nullptr;
    if (spinNodeMapGetNode(nodemap, node, &h) != SPINNAKER_ERR_SUCCESS)
      return false;
    return spinCommandExecute(h) == SPINNAKER_ERR_SUCCESS;
  }

  bool open_dev(uint32_t w, uint32_t h, uint32_t bpp, const CamGeom &g) {
    if (spinSystemGetInstance(&sys) != SPINNAKER_ERR_SUCCESS) return false;
    if (spinCameraListCreateEmpty(&list) != SPINNAKER_ERR_SUCCESS) return false;
    if (spinSystemGetCameras(sys, list) != SPINNAKER_ERR_SUCCESS) return false;
    size_t n = 0;
    spinCameraListGetSize(list, &n);
    if (n == 0) { fprintf(stderr, "spinnaker: no camera found\n"); return false; }
    if (spinCameraListGet(list, 0, &cam) != SPINNAKER_ERR_SUCCESS) return false;
    if (spinCameraInit(cam) != SPINNAKER_ERR_SUCCESS) return false;
    if (spinCameraGetNodeMap(cam, &nodemap) != SPINNAKER_ERR_SUCCESS)
      return false;
    node_set_enum("AcquisitionMode", "Continuous");   // BscanFFTspin.cpp:860
    node_set_enum("ExposureAuto", "Off");             // :920
    node_set_enum("GainAuto", "Off");                 // :907
    // image geometry: PixelFormat then ROI with offsets
    // (BscanFFTspin.cpp:934-979, 990-1015)
    node_set_enum("PixelFormat", bpp > 8 ? "Mono16" : "Mono8");
    node_set_int("OffsetX", g.offsetx);
    node_set_int("OffsetY", g.offsety);
    node_set_int("Width", w);
    node_set_int("Height", h);
    node_set_int("BinningHorizontal", g.cambinx);
    node_set_int("BinningVertical", g.cambiny);
    // fixed frame rate = camspeed (BscanFFTspin.cpp:824-831)
    node_set_bool("AcquisitionFrameRateEnable", 1);
    node_set_float("AcquisitionFrameRate", g.camspeed);
    node_set_float("ExposureTime", g.exposure_us < 8 ? 8 : g.exposure_us);
    node_set_float("Gain", g.gain);
    return spinCameraBeginAcquisition(cam) == SPINNAKER_ERR_SUCCESS;
  }

  // ConfigureTrigger (BscanFFTspinj.cpp:123-189): trigger must be OFF while
  // selecting the source, then re-enabled
  bool configure_trigger(bool hardware) {
    if (!node_set_enum("TriggerMode", "Off")) return false;
    if (!node_set_enum("TriggerSource", hardware ? "Line0" : "Software"))
      return false;
    return node_set_enum("TriggerMode", "On");
  }

  // ResetTrigger (BscanFFTspinj.cpp:232-256)
  void reset_trigger() { node_set_enum("TriggerMode", "Off"); }

  // the software half of GrabNextImageByTrigger (:192-230); the pulse
  // arrives from the host's CTRL_TRIGGER counter, then this executes the
  // TriggerSoftware command and the regular grab() collects the frame
  bool fire_software_trigger() { return node_execute("TriggerSoftware"); }

  bool grab(std::vector<uint8_t> &out, size_t frame_bytes) {
    spinImage img = nullptr;
    if (spinCameraGetNextImageEx(cam, 1000, &img) != SPINNAKER_ERR_SUCCESS)
      return false;
    bool8_t incomplete = 0;
    spinImageIsIncomplete(img, &incomplete);
    bool ok = false;
    if (!incomplete) {  // incomplete frames are skipped (BscanFFTspin.cpp:1059)
      void *data = nullptr;
      size_t sz = 0;
      if (spinImageGetData(img, &data) == SPINNAKER_ERR_SUCCESS &&
          spinImageGetBufferSize(img, &sz) == SPINNAKER_ERR_SUCCESS &&
          sz >= frame_bytes) {
        memcpy(out.data(), data, frame_bytes);
        ok = true;
      }
    }
    spinImageRelease(img);
    return ok;
  }

  void apply_ctrl(const double *vals) {
    // Spinnaker clamps exposure at 8 µs (BscanFFTspinjnt '-' key handler)
    double e = vals[CTRL_EXPOSURE_US];
    node_set_float("ExposureTime", e < 8 ? 8 : e);
    node_set_float("Gain", vals[CTRL_GAIN]);
  }

  void close_dev() {
    if (cam) {
      reset_trigger();  // leave the camera free-running (ResetTrigger)
      spinCameraEndAcquisition(cam);
      spinCameraDeInit(cam);
      spinCameraRelease(cam);
    }
    if (list) { spinCameraListClear(list); spinCameraListDestroy(list); }
    if (sys) spinSystemReleaseInstance(sys);
  }
};
#endif  // FDOCT_WITH_SPINNAKER

int main(int argc, char **argv) {
  if (argc < 8) {
    fprintf(stderr,
            "usage: %s RING WIDTH HEIGHT BPP NSLOTS FPS "
            "(--synthetic | --pgm DIR | --v4l2 DEV | --qhy | --spinnaker) "
            "[--trigger sw|hw] [--offsetx N] [--offsety N] [--cambinx N] "
            "[--cambiny N] [--camspeed N] [--usbtraffic N] [--exposure US] "
            "[--gain N] [--gamma F]\n",
            argv[0]);
    return 2;
  }
  // graceful shutdown: SIGTERM/SIGINT finish the current frame, then run
  // the SDK close chain (StopQHYCCDLive/CloseQHYCCD, ResetTrigger/
  // EndAcquisition) and release the ring — required for the ASan-clean
  // seam tests and for leaving a real camera in a sane state
  signal(SIGTERM, handle_sigterm);
  signal(SIGINT, handle_sigterm);

  const char *ring_path = argv[1];
  const uint32_t w = atoi(argv[2]), h = atoi(argv[3]);
  const uint32_t bpp = atoi(argv[4]), nslots = atoi(argv[5]);
  const double fps = atof(argv[6]);
  const std::string mode = argv[7];

  // positional source ARG (pgm dir / v4l2 device), then keyword flags
  const char *src_arg = nullptr;
  CamGeom geom;
  int trigger = 0;  // 0 = free-running, 1 = software, 2 = hardware
  for (int i = 8; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&]() -> const char * {
      return (i + 1 < argc) ? argv[++i] : "";
    };
    if (a == "--trigger") {
      std::string t = next();
      trigger = (t == "hw") ? 2 : (t == "sw") ? 1 : 0;
    } else if (a == "--offsetx") geom.offsetx = atoi(next());
    else if (a == "--offsety") geom.offsety = atoi(next());
    else if (a == "--cambinx") geom.cambinx = atoi(next());
    else if (a == "--cambiny") geom.cambiny = atoi(next());
    else if (a == "--camspeed") geom.camspeed = atof(next());
    else if (a == "--usbtraffic") geom.usbtraffic = atof(next());
    else if (a == "--exposure") geom.exposure_us = atof(next());
    else if (a == "--gain") geom.gain = atof(next());
    else if (a == "--gamma") geom.gamma = atof(next());
    else if (a.rfind("--", 0) != 0 && !src_arg) src_arg = argv[i];
    else { fprintf(stderr, "unknown flag %s\n", argv[i]); return 2; }
  }

  void *ring = fdoct_ring_open(ring_path, 1, w, h, bpp, nslots);
  if (!ring) {
    fprintf(stderr, "cannot create ring %s\n", ring_path);
    return 1;
  }
  const size_t frame_bytes = (size_t)w * h * (bpp > 8 ? 2 : 1);
  std::vector<uint8_t> buf(frame_bytes, 0);
  useconds_t sleep_us = fps > 0 ? (useconds_t)(1e6 / fps) : 0;

  // control state, updated from the ring header's control block each frame.
  // The ring preserves the control block across daemon restarts; merge any
  // preserved host snapshot into the initial state BEFORE opening the
  // device, so a restarted daemon reopens with the last commanded values
  // (zero means the host never set that knob — keep the argv default), and
  // already-fired trigger pulses are not replayed.
  double trig_seen = 0.0;
  {
    double snap[8] = {0};
    if (fdoct_ring_poll_ctrl(ring, snap)) {
      // merge exactly the slots the HOST has commanded (the v3 ctrl_mask,
      // written inside the same seqlock as each value) and keep argv
      // defaults for the rest.  A commanded 0 is valid — the '-' keys
      // clamp exposure/gain at 0 and the sensor legitimately goes dark —
      // which a value-based "0 means unset" heuristic cannot represent.
      const uint64_t mask = fdoct_ring_ctrl_mask(ring);
      if (mask & (1ull << CTRL_EXPOSURE_US))
        geom.exposure_us = snap[CTRL_EXPOSURE_US];
      if (mask & (1ull << CTRL_GAIN)) geom.gain = snap[CTRL_GAIN];
      if (mask & (1ull << CTRL_GAMMA)) geom.gamma = snap[CTRL_GAMMA];
      trig_seen = snap[CTRL_TRIGGER];
    }
  }
  double ctrl[8] = {0};
  ctrl[CTRL_EXPOSURE_US] = geom.exposure_us;
  ctrl[CTRL_GAIN] = geom.gain;
  ctrl[CTRL_GAMMA] = geom.gamma;
  ctrl[CTRL_FPS] = fps;
  ctrl[CTRL_TRIGGER] = trig_seen;

  std::vector<std::string> pgms;
  if (mode == "--pgm") {
    if (!src_arg) { fprintf(stderr, "--pgm needs DIR\n"); return 2; }
    DIR *d = opendir(src_arg);
    if (!d) { fprintf(stderr, "no dir %s\n", src_arg); return 1; }
    dirent *e;
    while ((e = readdir(d)))
      if (strstr(e->d_name, ".pgm"))
        pgms.push_back(std::string(src_arg) + "/" + e->d_name);
    closedir(d);
    // readdir order is filesystem-dependent (hash order on ext4/xfs);
    // replay must follow sequence order or averaging groups mix frames
    // from different scan positions
    std::sort(pgms.begin(), pgms.end());
    if (pgms.empty()) { fprintf(stderr, "no .pgm files\n"); return 1; }
  }

#ifdef __linux__
  V4L2Source cam;
  if (mode == "--v4l2") {
    if (bpp > 8) {  // YUYV luma is 8-bit; a 16-bit ring would read garbage
      fprintf(stderr, "v4l2 source is 8-bit only (got bpp=%u)\n", bpp);
      return 2;
    }
    if (!src_arg || !cam.open_dev(src_arg, w, h)) {
      fprintf(stderr, "v4l2 open failed for %s\n", src_arg ? src_arg : "?");
      return 1;
    }
  }
#endif
#ifdef FDOCT_WITH_QHY
  QHYSource qhy;
  if (mode == "--qhy" && !qhy.open_dev(w, h, bpp, geom)) {
    fprintf(stderr, "qhy init failed\n");
    qhy.close_dev();
    return 1;
  }
#endif
#ifdef FDOCT_WITH_SPINNAKER
  SpinSource spin;
  if (mode == "--spinnaker") {
    if (!spin.open_dev(w, h, bpp, geom)) {
      fprintf(stderr, "spinnaker init failed\n");
      spin.close_dev();
      return 1;
    }
    // ConfigureTrigger after acquisition setup (BscanFFTspinj.cpp:1695)
    if (trigger && !spin.configure_trigger(trigger == 2)) {
      fprintf(stderr, "spinnaker trigger config failed\n");
      spin.close_dev();
      return 1;
    }
  }
#endif

  // poll the host control snapshot and apply to the device (the
  // deferred-apply seam, BscanFFTspin.cpp:1895-1903).  All NCTRL values —
  // including the trigger counter — land in the persistent `ctrl` state.
  auto poll_and_apply = [&]() {
    double snap[8];
    memcpy(snap, ctrl, sizeof(snap));
    if (!fdoct_ring_poll_ctrl(ring, snap)) return;
    // only host-COMMANDED slots pass through (the v3 ctrl_mask); a
    // commanded 0 is valid — the reference's '-' key clamps exposure at 0
    // and the sensor goes dark (BscanFFT.cpp '-' handler)
    const uint64_t cmask = fdoct_ring_ctrl_mask(ring);
    for (int p = 0; p < 8; p++)
      if (!(cmask & (1ull << p))) snap[p] = ctrl[p];
    memcpy(ctrl, snap, sizeof(snap));
    if (ctrl[CTRL_FPS] > 0) sleep_us = (useconds_t)(1e6 / ctrl[CTRL_FPS]);
    fprintf(stderr, "ctrl: exposure=%.0fus gain=%.0f fps=%.0f\n",
            ctrl[CTRL_EXPOSURE_US], ctrl[CTRL_GAIN], ctrl[CTRL_FPS]);
#ifdef __linux__
    if (mode == "--v4l2") cam.apply_ctrl(ctrl);
#endif
#ifdef FDOCT_WITH_QHY
    if (mode == "--qhy") qhy.apply_ctrl(ctrl);
#endif
#ifdef FDOCT_WITH_SPINNAKER
    if (mode == "--spinnaker") spin.apply_ctrl(ctrl);
#endif
  };

  for (uint64_t t = 0; !g_stop; t++) {
    poll_and_apply();

    // trigger gating (GrabNextImageByTrigger, BscanFFTspinj.cpp:192-230):
    // in sw mode wait for the host's CTRL_TRIGGER counter to advance, then
    // emit exactly one frame per pulse.  Spinnaker hw mode instead blocks
    // in GetNextImage until the Line0 pulse; other sources use the counter
    // for hw too (it stands in for the pulse line).
    bool spin_hw_trigger = false;
#ifdef FDOCT_WITH_SPINNAKER
    spin_hw_trigger = (mode == "--spinnaker" && trigger == 2);
#endif
    bool pulse_consumed = false;
    if (trigger && !spin_hw_trigger) {
      while (!g_stop && ctrl[CTRL_TRIGGER] <= trig_seen) {
        usleep(200);
        poll_and_apply();
      }
      if (g_stop) break;
      trig_seen += 1.0;  // consume ONE pulse -> one frame
      pulse_consumed = true;
#ifdef FDOCT_WITH_SPINNAKER
      if (mode == "--spinnaker") spin.fire_software_trigger();
#endif
    }
    // a failed grab must NOT eat the pulse, or the daemon permanently
    // emits fewer frames than pulses and the host's triggered capture
    // hangs (it counts one frame per fired pulse)
    auto unconsume = [&]() { if (pulse_consumed) trig_seen -= 1.0; };

    if (mode == "--synthetic") {
      synthetic_frame(buf, w, h, bpp, t, ctrl[CTRL_EXPOSURE_US],
                      ctrl[CTRL_GAIN]);
    } else if (mode == "--pgm") {
      if (!read_pgm(pgms[t % pgms.size()], buf, w, h, bpp)) {
        unconsume();
        continue;
      }
#ifdef __linux__
    } else if (mode == "--v4l2") {
      if (!cam.grab_y(buf)) break;
#endif
#ifdef FDOCT_WITH_QHY
    } else if (mode == "--qhy") {
      if (!qhy.grab(buf, w, h)) break;
#endif
#ifdef FDOCT_WITH_SPINNAKER
    } else if (mode == "--spinnaker") {
      if (!spin.grab(buf, frame_bytes)) {
        if (trigger) {            // triggered grabs time out between pulses
          unconsume();            // retry re-fires TriggerSoftware for it
          continue;
        }
        break;
      }
#endif
    } else {
      fprintf(stderr, "unknown source %s\n", mode.c_str());
      return 2;
    }
    fdoct_ring_push(ring, buf.data());
    if (sleep_us && !trigger) usleep(sleep_us);
  }
#ifdef FDOCT_WITH_QHY
  if (mode == "--qhy") qhy.close_dev();
#endif
#ifdef FDOCT_WITH_SPINNAKER
  if (mode == "--spinnaker") spin.close_dev();
#endif
  fdoct_ring_close(ring);
  return 0;
}
