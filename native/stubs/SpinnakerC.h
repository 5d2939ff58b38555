// Stub of the FLIR Spinnaker C-API surface used by capture_daemon.cpp's
// --spinnaker seam.
//
// CI compiles the daemon against this header (-Istubs
// -DFDOCT_WITH_SPINNAKER); deployments point the include path at the
// vendor SDK and link -lSpinnaker_C.  Names/signatures mirror the public
// SpinnakerC API subset covering what the reference's C++ nodemap code does
// (hn-88/FDOCT BscanFFTspin.cpp:790-1100, BscanFFTspinj.cpp:123-256).
//
// Two modes:
//  - default: every stub reports "no camera" so `capture_daemon
//    --spinnaker` fails cleanly;
//  - FDOCT_STUB_FAKE=1: one fake camera is attached — node writes record
//    their values (echoed as `spin-stub: ...` for test assertions),
//    TriggerMode/TriggerSoftware gate frame delivery exactly like GenICam
//    (On + Software source => GetNextImage yields a frame only after
//    TriggerSoftware.Execute()), and image data synthesizes with
//    brightness scaling by ExposureTime/Gain — so the full triggered
//    acquisition flow executes under CI/ASan without hardware.
#pragma once

#include <cstdint>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unistd.h>

typedef void *spinSystem;
typedef void *spinCameraList;
typedef void *spinCamera;
typedef void *spinNodeMapHandle;
typedef void *spinNodeHandle;
typedef void *spinImage;
typedef uint8_t bool8_t;

enum spinError {
  SPINNAKER_ERR_SUCCESS = 0,
  SPINNAKER_ERR_ERROR = -1001,
};

namespace spin_stub {
constexpr int MAXNODES = 32;
struct FakeCam {
  char node_names[MAXNODES][40];
  char enum_vals[MAXNODES][24];
  double num_vals[MAXNODES];
  int n_nodes = 0;
  int pending_triggers = 0;
  uint64_t frame = 0;
  // image buffer sized at GetNextImage time from Width x Height x bpp
  uint8_t img[4 << 20];
};
inline FakeCam &cam() {
  static FakeCam c;
  return c;
}
inline bool fake() {
  const char *e = getenv("FDOCT_STUB_FAKE");
  return e && *e == '1';
}
// node handles are 1-based indices into the registry, packed into void*
inline int node_index(const char *name) {
  auto &c = cam();
  for (int i = 0; i < c.n_nodes; i++)
    if (strcmp(c.node_names[i], name) == 0) return i;
  if (c.n_nodes >= MAXNODES) return -1;
  snprintf(c.node_names[c.n_nodes], sizeof(c.node_names[0]), "%s", name);
  return c.n_nodes++;
}
inline double num(const char *name) { return cam().num_vals[node_index(name)]; }
inline const char *en(const char *name) {
  return cam().enum_vals[node_index(name)];
}
}  // namespace spin_stub

inline spinError spinSystemGetInstance(spinSystem *s) {
  *s = nullptr;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinSystemReleaseInstance(spinSystem) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraListCreateEmpty(spinCameraList *l) {
  *l = nullptr;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinSystemGetCameras(spinSystem, spinCameraList) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraListGetSize(spinCameraList, size_t *n) {
  *n = spin_stub::fake() ? 1 : 0;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraListGet(spinCameraList, size_t, spinCamera *c) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  *c = &spin_stub::cam();
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraListClear(spinCameraList) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraListDestroy(spinCameraList) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraInit(spinCamera) {
  return spin_stub::fake() ? SPINNAKER_ERR_SUCCESS : SPINNAKER_ERR_ERROR;
}
inline spinError spinCameraDeInit(spinCamera) { return SPINNAKER_ERR_SUCCESS; }
inline spinError spinCameraRelease(spinCamera) { return SPINNAKER_ERR_SUCCESS; }
inline spinError spinCameraGetNodeMap(spinCamera, spinNodeMapHandle *m) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  *m = &spin_stub::cam();
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinNodeMapGetNode(spinNodeMapHandle, const char *name,
                                    spinNodeHandle *h) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  int idx = spin_stub::node_index(name);
  if (idx < 0) return SPINNAKER_ERR_ERROR;
  *h = reinterpret_cast<spinNodeHandle>(static_cast<intptr_t>(idx + 1));
  return SPINNAKER_ERR_SUCCESS;
}
// enum entries: the entry handle encodes (node_index+1) like the node; the
// daemon flow is GetEntryByName -> GetIntValue -> SetIntValue, so the stub
// stashes the entry NAME on the node at GetEntryByName time and commits it
// at SetIntValue time (matching how GenICam round-trips the int value).
namespace spin_stub {
inline char (&pending_entry())[MAXNODES][24] {
  static char p[MAXNODES][24];
  return p;
}
}  // namespace spin_stub
inline spinError spinEnumerationGetEntryByName(spinNodeHandle h,
                                               const char *entry,
                                               spinNodeHandle *e) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  int idx = static_cast<int>(reinterpret_cast<intptr_t>(h)) - 1;
  if (idx < 0 || idx >= spin_stub::MAXNODES) return SPINNAKER_ERR_ERROR;
  snprintf(spin_stub::pending_entry()[idx], 24, "%s", entry);
  *e = h;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinEnumerationEntryGetIntValue(spinNodeHandle, int64_t *v) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  *v = 1;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinEnumerationSetIntValue(spinNodeHandle h, int64_t) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  int idx = static_cast<int>(reinterpret_cast<intptr_t>(h)) - 1;
  if (idx < 0 || idx >= spin_stub::MAXNODES) return SPINNAKER_ERR_ERROR;
  auto &c = spin_stub::cam();
  snprintf(c.enum_vals[idx], 24, "%s", spin_stub::pending_entry()[idx]);
  fprintf(stderr, "spin-stub: %s = %s\n", c.node_names[idx], c.enum_vals[idx]);
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinFloatSetValue(spinNodeHandle h, double v) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  int idx = static_cast<int>(reinterpret_cast<intptr_t>(h)) - 1;
  if (idx < 0 || idx >= spin_stub::MAXNODES) return SPINNAKER_ERR_ERROR;
  auto &c = spin_stub::cam();
  c.num_vals[idx] = v;
  fprintf(stderr, "spin-stub: %s = %g\n", c.node_names[idx], v);
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinIntegerSetValue(spinNodeHandle h, int64_t v) {
  return spinFloatSetValue(h, (double)v);
}
inline spinError spinBooleanSetValue(spinNodeHandle h, bool8_t v) {
  return spinFloatSetValue(h, (double)v);
}
inline spinError spinCommandExecute(spinNodeHandle h) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  int idx = static_cast<int>(reinterpret_cast<intptr_t>(h)) - 1;
  auto &c = spin_stub::cam();
  if (idx >= 0 && strcmp(c.node_names[idx], "TriggerSoftware") == 0)
    c.pending_triggers++;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraBeginAcquisition(spinCamera) {
  return spin_stub::fake() ? SPINNAKER_ERR_SUCCESS : SPINNAKER_ERR_ERROR;
}
inline spinError spinCameraEndAcquisition(spinCamera) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraGetNextImageEx(spinCamera, uint64_t, spinImage *img) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  auto &c = spin_stub::cam();
  // GenICam trigger gating: TriggerMode On withholds frames until a pulse
  using namespace spin_stub;
  if (strcmp(en("TriggerMode"), "On") == 0) {
    if (strcmp(en("TriggerSource"), "Line0") == 0) {
      usleep(10000);  // fake hardware pulse generator: a pulse every 10 ms
    } else {
      if (c.pending_triggers <= 0) return SPINNAKER_ERR_ERROR;  // grab timeout
      c.pending_triggers--;
    }
  }
  const uint32_t w = (uint32_t)num("Width"), h = (uint32_t)num("Height");
  const bool m16 = strcmp(en("PixelFormat"), "Mono16") == 0;
  size_t bytes = (size_t)w * h * (m16 ? 2 : 1);
  if (w == 0 || h == 0 || bytes > sizeof(c.img)) return SPINNAKER_ERR_ERROR;
  const double scale =
      (num("ExposureTime") / 1000.0) * (1.0 + num("Gain") / 100.0);
  const double full = m16 ? 65535.0 : 255.0;
  uint16_t *b16 = reinterpret_cast<uint16_t *>(c.img);
  for (size_t i = 0; i < (size_t)w * h; i++) {
    double v = (full / 2.0) * (1.0 + 0.5 * ((i + c.frame) % 7 == 0)) * scale;
    v = v > full ? full : v;
    if (m16) b16[i] = (uint16_t)v;
    else c.img[i] = (uint8_t)v;
  }
  c.frame++;
  *img = &c.img;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinImageIsIncomplete(spinImage, bool8_t *inc) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  *inc = 0;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinImageGetData(spinImage, void **d) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  *d = spin_stub::cam().img;
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinImageGetBufferSize(spinImage, size_t *sz) {
  if (!spin_stub::fake()) return SPINNAKER_ERR_ERROR;
  *sz = sizeof(spin_stub::cam().img);
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinImageRelease(spinImage) { return SPINNAKER_ERR_SUCCESS; }
