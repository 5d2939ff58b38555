// Stub of the QHYCCD SDK surface used by capture_daemon.cpp's --qhy seam.
//
// CI compiles the daemon against this header (-Istubs -DFDOCT_WITH_QHY) so
// the SDK integration seam can never rot; deployments with real hardware
// point the include path at the vendor SDK instead and link -lqhyccd.
// Function names/signatures mirror the subset of the public QHYCCD API the
// reference uses (hn-88/FDOCT BscanFFT.cpp:729-948); every stub reports
// "no camera" so `capture_daemon --qhy` fails cleanly instead of lying.
#pragma once

#include <cstdint>

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

inline uint32_t InitQHYCCDResource() { return QHYCCD_SUCCESS; }
inline uint32_t ReleaseQHYCCDResource() { return QHYCCD_SUCCESS; }
inline int ScanQHYCCD() { return 0; }  // stub: no camera attached
inline uint32_t GetQHYCCDId(int, char *) { return QHYCCD_ERROR; }
inline qhyccd_handle *OpenQHYCCD(const char *) { return nullptr; }
inline uint32_t CloseQHYCCD(qhyccd_handle *) { return QHYCCD_SUCCESS; }
inline uint32_t SetQHYCCDStreamMode(qhyccd_handle *, uint8_t) {
  return QHYCCD_ERROR;
}
inline uint32_t InitQHYCCD(qhyccd_handle *) { return QHYCCD_ERROR; }
inline uint32_t SetQHYCCDBitsMode(qhyccd_handle *, uint32_t) {
  return QHYCCD_ERROR;
}
inline uint32_t SetQHYCCDResolution(qhyccd_handle *, uint32_t, uint32_t,
                                    uint32_t, uint32_t) {
  return QHYCCD_ERROR;
}
inline uint32_t SetQHYCCDParam(qhyccd_handle *, CONTROL_ID, double) {
  return QHYCCD_ERROR;
}
inline uint32_t BeginQHYCCDLive(qhyccd_handle *) { return QHYCCD_ERROR; }
inline uint32_t StopQHYCCDLive(qhyccd_handle *) { return QHYCCD_SUCCESS; }
inline uint32_t GetQHYCCDLiveFrame(qhyccd_handle *, uint32_t *, uint32_t *,
                                   uint32_t *, uint32_t *, uint8_t *) {
  return QHYCCD_ERROR;
}
