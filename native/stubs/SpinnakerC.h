// Stub of the FLIR Spinnaker C-API surface used by capture_daemon.cpp's
// --spinnaker seam.
//
// CI compiles the daemon against this header (-Istubs
// -DFDOCT_WITH_SPINNAKER); deployments point the include path at the
// vendor SDK and link -lSpinnaker_C.  Names/signatures mirror the public
// SpinnakerC API subset covering what the reference's C++ nodemap code does
// (hn-88/FDOCT BscanFFTspin.cpp:790-1100).  Every stub reports "no camera"
// so `capture_daemon --spinnaker` fails cleanly.
#pragma once

#include <cstdint>
#include <cstddef>

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
  *n = 0;  // stub: no camera attached
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraListGet(spinCameraList, size_t, spinCamera *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinCameraListClear(spinCameraList) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraListDestroy(spinCameraList) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraInit(spinCamera) { return SPINNAKER_ERR_ERROR; }
inline spinError spinCameraDeInit(spinCamera) { return SPINNAKER_ERR_SUCCESS; }
inline spinError spinCameraRelease(spinCamera) { return SPINNAKER_ERR_SUCCESS; }
inline spinError spinCameraGetNodeMap(spinCamera, spinNodeMapHandle *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinNodeMapGetNode(spinNodeMapHandle, const char *,
                                    spinNodeHandle *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinEnumerationGetEntryByName(spinNodeHandle, const char *,
                                               spinNodeHandle *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinEnumerationEntryGetIntValue(spinNodeHandle, int64_t *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinEnumerationSetIntValue(spinNodeHandle, int64_t) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinFloatSetValue(spinNodeHandle, double) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinCameraBeginAcquisition(spinCamera) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinCameraEndAcquisition(spinCamera) {
  return SPINNAKER_ERR_SUCCESS;
}
inline spinError spinCameraGetNextImageEx(spinCamera, uint64_t, spinImage *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinImageIsIncomplete(spinImage, bool8_t *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinImageGetData(spinImage, void **) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinImageGetBufferSize(spinImage, size_t *) {
  return SPINNAKER_ERR_ERROR;
}
inline spinError spinImageRelease(spinImage) { return SPINNAKER_ERR_SUCCESS; }
