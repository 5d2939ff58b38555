// Stub of the QHYCCD SDK surface used by capture_daemon.cpp's --qhy seam.
//
// CI compiles the daemon against this header (-Istubs -DFDOCT_WITH_QHY) so
// the SDK integration seam can never rot; deployments with real hardware
// point the include path at the vendor SDK instead and link -lqhyccd.
// Function names/signatures mirror the subset of the public QHYCCD API the
// reference uses (hn-88/FDOCT BscanFFT.cpp:729-948).
//
// Two modes:
//  - default: every stub reports "no camera" so `capture_daemon --qhy`
//    fails cleanly instead of lying;
//  - FDOCT_STUB_FAKE=1 in the environment: a fake camera is "attached" —
//    the full init chain succeeds, every Set* records its value (echoed on
//    stderr as `qhy-stub: ...` so tests can assert the configured geometry
//    reached the SDK calls), and GetQHYCCDLiveFrame synthesizes frames
//    whose brightness scales with the commanded exposure/gain, so the
//    whole daemon loop (init -> stream -> apply_ctrl -> shutdown) executes
//    under CI/ASan with no hardware.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

typedef void qhyccd_handle;

constexpr uint32_t QHYCCD_SUCCESS = 0;
constexpr uint32_t QHYCCD_ERROR = 0xFFFFFFFF;

enum CONTROL_ID {
  CONTROL_GAIN = 6,
  CONTROL_GAMMA = 7,
  CONTROL_EXPOSURE = 8,
  CONTROL_SPEED = 9,
  CONTROL_USBTRAFFIC = 10,
};

namespace qhy_stub {
struct FakeCam {
  uint32_t w = 0, h = 0, bpp = 8;
  uint32_t offsetx = 0, offsety = 0;
  double params[32] = {0};
  uint64_t frame = 0;
  bool live = false;
};
inline FakeCam &cam() {
  static FakeCam c;
  return c;
}
inline bool fake() {
  const char *e = getenv("FDOCT_STUB_FAKE");
  return e && *e == '1';
}
}  // namespace qhy_stub

inline uint32_t InitQHYCCDResource() { return QHYCCD_SUCCESS; }
inline uint32_t ReleaseQHYCCDResource() { return QHYCCD_SUCCESS; }
inline int ScanQHYCCD() { return qhy_stub::fake() ? 1 : 0; }
inline uint32_t GetQHYCCDId(int, char *id) {
  if (!qhy_stub::fake()) return QHYCCD_ERROR;
  strcpy(id, "FAKEQHY-0");
  return QHYCCD_SUCCESS;
}
inline qhyccd_handle *OpenQHYCCD(const char *) {
  return qhy_stub::fake() ? static_cast<qhyccd_handle *>(&qhy_stub::cam())
                          : nullptr;
}
inline uint32_t CloseQHYCCD(qhyccd_handle *) { return QHYCCD_SUCCESS; }
inline uint32_t SetQHYCCDStreamMode(qhyccd_handle *, uint8_t m) {
  if (!qhy_stub::fake()) return QHYCCD_ERROR;
  fprintf(stderr, "qhy-stub: streammode=%u\n", (unsigned)m);
  return QHYCCD_SUCCESS;
}
inline uint32_t InitQHYCCD(qhyccd_handle *) {
  return qhy_stub::fake() ? QHYCCD_SUCCESS : QHYCCD_ERROR;
}
inline uint32_t SetQHYCCDBitsMode(qhyccd_handle *, uint32_t bpp) {
  if (!qhy_stub::fake()) return QHYCCD_ERROR;
  qhy_stub::cam().bpp = bpp;
  fprintf(stderr, "qhy-stub: bits=%u\n", bpp);
  return QHYCCD_SUCCESS;
}
inline uint32_t SetQHYCCDResolution(qhyccd_handle *, uint32_t ox, uint32_t oy,
                                    uint32_t w, uint32_t h) {
  if (!qhy_stub::fake()) return QHYCCD_ERROR;
  auto &c = qhy_stub::cam();
  c.offsetx = ox; c.offsety = oy; c.w = w; c.h = h;
  fprintf(stderr, "qhy-stub: resolution offx=%u offy=%u w=%u h=%u\n",
          ox, oy, w, h);
  return QHYCCD_SUCCESS;
}
inline uint32_t SetQHYCCDParam(qhyccd_handle *, CONTROL_ID p, double v) {
  if (!qhy_stub::fake()) return QHYCCD_ERROR;
  qhy_stub::cam().params[p % 32] = v;
  fprintf(stderr, "qhy-stub: param %d = %g\n", (int)p, v);
  return QHYCCD_SUCCESS;
}
inline uint32_t BeginQHYCCDLive(qhyccd_handle *) {
  if (!qhy_stub::fake()) return QHYCCD_ERROR;
  qhy_stub::cam().live = true;
  fprintf(stderr, "qhy-stub: live begin\n");
  return QHYCCD_SUCCESS;
}
inline uint32_t StopQHYCCDLive(qhyccd_handle *) {
  qhy_stub::cam().live = false;
  return QHYCCD_SUCCESS;
}
inline uint32_t GetQHYCCDLiveFrame(qhyccd_handle *, uint32_t *w, uint32_t *h,
                                   uint32_t *bpp, uint32_t *ch, uint8_t *buf) {
  auto &c = qhy_stub::cam();
  if (!qhy_stub::fake() || !c.live || c.w == 0) return QHYCCD_ERROR;
  *w = c.w; *h = c.h; *bpp = c.bpp; *ch = 1;
  // brightness scales with exposure (full scale at 1000 us) and gain (%),
  // mirroring the daemon's own synthetic source so control-loop tests can
  // assert a photometric effect through the REAL SDK seam
  const double scale =
      (c.params[CONTROL_EXPOSURE] / 1000.0) * (1.0 + c.params[CONTROL_GAIN] / 100.0);
  const double full = c.bpp > 8 ? 65535.0 : 255.0;
  uint16_t *b16 = reinterpret_cast<uint16_t *>(buf);
  for (uint32_t y = 0; y < c.h; y++)
    for (uint32_t x = 0; x < c.w; x++) {
      double v = (full / 2.0) * (1.0 + 0.5 * ((x + c.frame) % 7 == 0)) * scale;
      v = v > full ? full : v;
      if (c.bpp > 8) b16[(size_t)y * c.w + x] = (uint16_t)v;
      else buf[(size_t)y * c.w + x] = (uint8_t)v;
    }
  c.frame++;
  return QHYCCD_SUCCESS;
}
