// Single-core CPU baseline for the FD-OCT hot loop.
//
// A faithful, independently-written reimplementation of the reference
// pipeline's per-frame compute (hn-88/FDOCT BscanFFT.cpp:1123-1190
// semantics): background ratio, per-row DC removal, Bartlett-Hann window,
// precomputed nearest-lower-k linear interpolation to a uniform k grid, and
// a row-wise complex inverse FFT + magnitude.  Compiled -O3 single-thread;
// its A-scans/sec is the denominator of the framework's vs_baseline metric
// (BASELINE.md: target >= 10x C++ single-core throughput).
//
// Usage: cpu_baseline [rows] [cols] [nfft] [ndisp] [seconds]
// Prints one line: ascans_per_sec=<value>

#include <cmath>
#include <complex>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <vector>

using cplx = std::complex<double>;

// iterative radix-2 Cooley-Tukey (n must be a power of two)
static void fft_pow2(std::vector<cplx> &a, bool inverse) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * M_PI / (double)len * (inverse ? 1.0 : -1.0);
    const cplx wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cplx w(1.0, 0.0);
      for (size_t j = 0; j < len / 2; j++) {
        cplx u = a[i + j], v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  // note: like cv::dft(DFT_INVERSE) without DFT_SCALE, no 1/n here
}

int main(int argc, char **argv) {
  const int rows = argc > 1 ? atoi(argv[1]) : 512;
  const int cols = argc > 2 ? atoi(argv[2]) : 2048;
  const int nfft = argc > 3 ? atoi(argv[3]) : 2048;
  const int ndisp = argc > 4 ? atoi(argv[4]) : 512;
  const double seconds = argc > 5 ? atof(argv[5]) : 3.0;

  // calibration precompute (done once, outside the timed loop, exactly as
  // the reference precomputes before its acquisition loop)
  const double lmin = 816e-9, lmax = 884e-9;
  const double dl = (lmax - lmin) / cols;
  std::vector<double> lambdas(cols), k(cols), klin(nfft), diffk(cols),
      frac(nfft), win(cols);
  std::vector<int> nearest(nfft, 0);
  for (int i = 0; i < cols; i++) {
    lambdas[i] = lmin + i * dl;
    k[i] = 2.0 * M_PI / lambdas[i];
  }
  const double kmin = 2.0 * M_PI / (lmax - dl), kmax = 2.0 * M_PI / lmin;
  const double dk = (kmax - kmin) / nfft;
  for (int f = 0; f < nfft; f++) klin[f] = kmin + (f + 1) * dk;
  for (int i = 1; i < cols; i++) diffk[i] = k[i - 1] - k[i];
  diffk[0] = diffk[1];
  for (int f = 0; f < nfft; f++)
    for (int i = 0; i < cols; i++)
      if (k[i] < klin[f]) { nearest[f] = i; break; }
  for (int f = 0; f < nfft; f++)
    frac[f] = (klin[f] - k[nearest[f]]) / diffk[nearest[f]];
  for (int p = 0; p < cols; p++) {
    double x = (double)p / (cols - 1) - 0.5;
    win[p] = 0.62 - 0.48 * std::fabs(x) + 0.38 * std::cos(2.0 * M_PI * x);
  }

  // synthetic frame + background
  std::vector<double> frame(rows * cols), bg(rows * cols, 128.0);
  srand(12345);
  for (auto &v : frame) v = (double)(rand() % 256);

  std::vector<double> y(cols), slopes(cols), ylin(nfft, 0.0);
  std::vector<cplx> spec(nfft);
  double sink = 0.0;
  long done_rows = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (;;) {
    for (int r = 0; r < rows; r++) {
      const double *fr = &frame[r * cols];
      const double *bgr = &bg[r * cols];
      // ratio + mean
      double mean = 0.0;
      for (int c = 0; c < cols; c++) {
        y[c] = fr[c] / bgr[c];
        mean += y[c];
      }
      mean /= cols;
      for (int c = 0; c < cols; c++) y[c] = (y[c] - mean) * win[c];
      // slopes + k-linear interpolation
      for (int c = 1; c < cols; c++) slopes[c] = y[c] - y[c - 1];
      slopes[0] = slopes[1];
      for (int q = 1; q < nfft - 1; q++) {
        int i = nearest[q];
        ylin[q] = y[i] + frac[i < nfft ? i : nfft - 1] * slopes[i];
      }
      // inverse FFT + magnitude of the displayed depths
      for (int q = 0; q < nfft; q++) spec[q] = cplx(ylin[q], 0.0);
      fft_pow2(spec, true);
      for (int d = 0; d < ndisp; d++) sink += std::abs(spec[d]);
      done_rows++;
    }
    auto dt = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
    if (dt >= seconds) {
      printf("ascans_per_sec=%.1f\n", done_rows / dt);
      fprintf(stderr, "sink=%g rows=%ld dt=%.2f\n", sink, done_rows, dt);
      return 0;
    }
  }
}
