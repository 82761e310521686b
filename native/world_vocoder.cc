// world_vocoder: WORLD-class analysis/synthesis vocoder in C++.
//
// Replaces the reference's pyworld pipeline
// (gender_classifier_train_pitch_norm.py:253-258: pw.wav2world -> shift
// voiced F0 to mean target -> pw.synthesize) with a from-scratch
// implementation of the same decomposition:
//
//   * F0: the autocorrelation tracker from world_lite.cc (DIO-class);
//   * spectral envelope: CheapTrick-class estimator — pitch-adaptive
//     Hanning window (3 periods), power spectrum, (2/3)*F0 triangular
//     frequency smoothing, cepstral liftering with the sinc smoothing
//     lifter and the q1=-0.15 compensation lifter;
//   * aperiodicity: per-band (0-1,1-2,2-4,4-6,6-8 kHz) D4C-class estimate
//     combining TWO harmonicity statistics (geometric mean, see the band
//     loop below): window-corrected band-limited autocorrelation at the
//     period lag, and a group-delay statistic in D4C's spirit — the
//     power-weighted circular coherence of per-bin static group delay
//     wrapped on the pitch period, restricted to near-harmonic bins and
//     calibrated against the deterministic interference floor;
//   * synthesis: pitch-synchronous overlap-add of minimum-phase responses —
//     periodic pulse excitation scaled sqrt(1-ap^2) plus filtered-noise
//     excitation scaled ap, per WORLD's excitation model.
//
// Spectral amplitude convention (self-consistent round trip, derivation in
// the normalization comments): sp[k] stores the squared harmonic amplitude
// A_k^2 at frequency bin k, so synthesis places pulses of amplitude
// period/2 through |H| = sqrt(sp).
//
// Exposed via ctypes (speech_anonymization_tpu/data/pitch.py); runs in the
// host input pipeline feeding the TPU (SURVEY.md §2.5).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" long long satpu_track_f0(const float* wav, long long n, int sr,
                                    double* f0_out, long long max_frames,
                                    int* hop_out);

namespace {

constexpr double kDefaultF0 = 500.0;  // envelope analysis F0 for unvoiced
constexpr double kQ1 = -0.15;         // CheapTrick compensation lifter
constexpr double kApFloor = 0.001;
constexpr double kApCeil = 0.999;
constexpr int kNumBands = 5;
const double kBandEdges[kNumBands + 1] = {0.0, 1000.0, 2000.0, 4000.0,
                                          6000.0, 8000.0};

// ---------------------------------------------------------------- FFT
// iterative radix-2 complex FFT, in-place, n a power of two.
void fft(std::vector<double>& re, std::vector<double>& im, bool inverse) {
  const int n = (int)re.size();
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = 2.0 * M_PI / len * (inverse ? 1.0 : -1.0);
    double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int k = 0; k < len / 2; ++k) {
        double ur = re[i + k], ui = im[i + k];
        double vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        double vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
  if (inverse) {
    for (int i = 0; i < n; ++i) {
      re[i] /= n;
      im[i] /= n;
    }
  }
}

int fft_size_for(int sr) {
  int need = (int)(3.0 * sr / 70.0) + 1;
  int n = 64;
  while (n < need) n <<= 1;
  return n;
}

// deterministic xorshift noise (the pitch-norm recipe caches resynthesized
// audio; synthesis must be reproducible)
struct XorShift {
  uint64_t s = 0x9E3779B97F4A7C15ull;
  double next() {  // ~N(0,1) via sum of 4 uniforms (Irwin-Hall, var 1/3 each)
    double acc = 0.0;
    for (int i = 0; i < 4; ++i) {
      s ^= s << 13;
      s ^= s >> 7;
      s ^= s << 17;
      acc += (double)(s >> 11) / (double)(1ull << 53) - 0.5;
    }
    return acc * std::sqrt(3.0);  // 4 uniforms: var = 4/12 -> scale to var 1
  }
};

// ---------------------------------------------------- CheapTrick envelope

// triangular smoothing of the power spectrum with full width `width_hz`:
// two passes of centered rectangular averaging of width width_hz/?? —
// single-pass rectangular of width w twice == triangular of width 2w; we
// do one rectangular pass of the full (2/3)F0 width twice with mirrored
// boundaries, matching CheapTrick's LinearSmoothing character.
void rect_smooth(std::vector<double>& p, double width_bins) {
  const int n = (int)p.size();
  if (width_bins <= 1.0) return;
  std::vector<double> cum(n + 1, 0.0);
  for (int i = 0; i < n; ++i) cum[i + 1] = cum[i] + p[i];
  auto integral = [&](double x) {  // integral of p over [0, x), mirrored
    if (x < 0) x = 0;
    if (x > n) x = n;
    int i = (int)x;
    double frac = x - i;
    double v = cum[i];
    if (i < n) v += p[i] * frac;
    return v;
  };
  std::vector<double> out(n);
  double h = width_bins / 2.0;
  for (int i = 0; i < n; ++i) {
    double lo = i + 0.5 - h, hi = i + 0.5 + h;
    double v = integral(hi) - integral(lo);
    // mirror at the boundaries (reflect out-of-range mass back in)
    if (lo < 0) v += integral(-lo) - integral(0);
    if (hi > n) v += integral(n) - integral(2.0 * n - hi);
    out[i] = v / width_bins;
  }
  p = out;
}

// envelope of ONE frame centered at sample `center`; writes bins [0, nfft/2]
void cheaptrick_frame(const float* x, long long n, int sr, double f0,
                      long long center, int nfft, double* sp_out) {
  const int half = nfft / 2;
  double f = f0 > 0 ? f0 : kDefaultF0;
  int half_win = (int)std::lround(1.5 * sr / f);
  int win_len = 2 * half_win + 1;
  if (win_len > nfft) {  // clamp (very low F0 vs fft size)
    half_win = nfft / 2 - 1;
    win_len = 2 * half_win + 1;
  }

  std::vector<double> w(win_len), seg(win_len);
  double wsum = 0.0, wsq = 0.0;
  for (int i = 0; i < win_len; ++i) {
    w[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * (i + 1) / (win_len + 1));
    wsum += w[i];
    wsq += w[i] * w[i];
  }
  double wmean = 0.0;
  for (int i = 0; i < win_len; ++i) {
    long long idx = center - half_win + i;
    seg[i] = (idx >= 0 && idx < n) ? (double)x[idx] : 0.0;
    wmean += seg[i] * w[i];
  }
  wmean /= wsum;  // weighted DC removal (CheapTrick GetWindowedWaveform)

  std::vector<double> re(nfft, 0.0), im(nfft, 0.0);
  for (int i = 0; i < win_len; ++i) re[i] = (seg[i] - wmean) * w[i];
  fft(re, im, false);

  std::vector<double> p(half + 1);
  for (int k = 0; k <= half; ++k) p[k] = re[k] * re[k] + im[k] * im[k];

  // (2/3)*F0 triangular smoothing (rectangular pass twice)
  double width_bins = (2.0 / 3.0) * f * nfft / sr;
  rect_smooth(p, width_bins / 2.0);
  rect_smooth(p, width_bins / 2.0);

  // normalization: for a harmonic of amplitude A at f_k, the smoothed
  // per-bin power is A^2/4 * sum(w^2) * sr/f0 / nfft * nfft = ... the
  // harmonic's total windowed power (Parseval) is nfft*A^2/4*sum(w^2)
  // spread by smoothing over f0's worth of bins (f0*nfft/sr), giving
  // per-bin A^2/4*sum(w^2)*sr/f0; so scale by 4*f0/(sr*sum(w^2)) to store
  // sp = A^2.
  double scale = 4.0 * f / (sr * wsq + 1e-30);
  for (int k = 0; k <= half; ++k) p[k] = p[k] * scale + 1e-17;

  // cepstral liftering: sinc smoothing lifter + q1 compensation lifter
  std::vector<double> lre(nfft, 0.0), lim(nfft, 0.0);
  for (int k = 0; k < nfft; ++k) {
    int kk = k <= half ? k : nfft - k;
    lre[k] = std::log(p[kk]);
  }
  fft(lre, lim, true);  // -> cepstrum (real, symmetric)
  for (int q = 0; q < nfft; ++q) {
    int qq = q <= half ? q : nfft - q;
    double tq = (double)qq / sr;  // quefrency in seconds
    double arg = M_PI * f * tq;
    double lift_s = qq == 0 ? 1.0 : std::sin(arg) / arg;
    double lift_c = (1.0 - 2.0 * kQ1) + 2.0 * kQ1 * std::cos(2.0 * M_PI * f * tq);
    lre[q] *= lift_s * lift_c;
    lim[q] = 0.0;
  }
  fft(lre, lim, false);  // back to log spectrum
  for (int k = 0; k <= half; ++k) sp_out[k] = std::exp(lre[k]);
}

// ------------------------------------------------- band aperiodicity (HNR)

void aperiodicity_frame(const float* x, long long n, int sr, double f0,
                        long long center, int nfft, double* ap_out) {
  const int half = nfft / 2;
  if (f0 <= 0) {
    for (int k = 0; k <= half; ++k) ap_out[k] = kApCeil;
    return;
  }
  int half_win = (int)std::lround(1.5 * sr / f0);
  int win_len = 2 * half_win + 1;
  if (win_len > nfft) {
    half_win = nfft / 2 - 1;
    win_len = 2 * half_win + 1;
  }
  std::vector<double> re(nfft, 0.0), im(nfft, 0.0);
  std::vector<double> w(win_len);
  double mean = 0.0;
  for (int i = 0; i < win_len; ++i) {
    long long idx = center - half_win + i;
    double v = (idx >= 0 && idx < n) ? (double)x[idx] : 0.0;
    w[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * (i + 1) / (win_len + 1));
    re[i] = v * w[i];
    mean += re[i];
  }
  mean /= win_len;
  for (int i = 0; i < win_len; ++i) re[i] -= mean;
  // time-weighted copy for the group-delay spectrum BEFORE the in-place
  // FFT consumes re[]: GD(f) = Re(Xt(f) conj(X(f))) / |X(f)|^2 with
  // Xt = FFT(t * x_w), t in seconds relative to the window center.
  std::vector<double> re_t(nfft, 0.0), im_t(nfft, 0.0);
  for (int i = 0; i < win_len; ++i)
    re_t[i] = re[i] * ((double)(i - half_win) / sr);
  fft(re, im, false);
  fft(re_t, im_t, false);
  std::vector<double> power(nfft);
  for (int k = 0; k < nfft; ++k) power[k] = re[k] * re[k] + im[k] * im[k];

  double period = sr / f0;  // fractional lag

  // the window taper itself decays the autocorrelation at the period lag
  // (a perfectly periodic signal windowed by w has r(P)/r(0) ~
  // sum w[i]w[i+P] / sum w[i]^2, ~0.6 for a 3-period Hanning window);
  // divide it out so the HNR measures the SIGNAL, not the window
  int ip = (int)std::lround(period);
  double w_num = 0.0, w_den = 0.0;
  for (int i = 0; i + ip < win_len; ++i) w_num += w[i] * w[i + ip];
  for (int i = 0; i < win_len; ++i) w_den += w[i] * w[i];
  double w_corr = w_den > 0 ? w_num / w_den : 1.0;
  if (w_corr < 0.05) w_corr = 0.05;
  double band_ap[kNumBands];
  for (int b = 0; b < kNumBands; ++b) {
    // band-limited autocorrelation = IFFT of the band-masked power spectrum
    double lo = kBandEdges[b] * nfft / sr;
    double hi = std::fmin(kBandEdges[b + 1], sr / 2.0) * nfft / sr;
    std::vector<double> br(nfft, 0.0), bi(nfft, 0.0);
    for (int k = 0; k <= half; ++k) {
      if (k >= lo && k < hi) {
        br[k] = power[k];
        if (k > 0 && k < half) br[nfft - k] = power[k];
      }
    }
    fft(br, bi, true);
    double r0 = br[0];
    if (r0 < 1e-12) {
      band_ap[b] = kApCeil;
      continue;
    }
    // locate the autocorrelation peak NEAR the period lag: the tracker's
    // f0 has finite precision, and interpolating at the predicted
    // fractional lag systematically undershoots the (locally ~cosine)
    // peak by an amount that depends on the fractional part — a perfectly
    // periodic band then scores r anywhere in ~[0.97, 1.0] frame by
    // frame. Search +/-2 lags and refine the max parabolically so the
    // statistic measures the peak itself.
    int l0 = (int)std::lround(period);
    int lbest = std::max(1, std::min(l0, nfft - 2));
    for (int l = std::max(1, l0 - 2); l <= std::min(nfft - 2, l0 + 2); ++l)
      if (br[l] > br[lbest]) lbest = l;
    double y0 = br[lbest - 1], y1 = br[lbest], y2 = br[lbest + 1];
    double rp = y1;
    double curv = y0 - 2.0 * y1 + y2;
    if (curv < 0.0) {  // concave -> parabolic vertex value
      double d = 0.5 * (y0 - y2) / curv;
      if (d > -1.0 && d < 1.0) rp = y1 - 0.25 * (y0 - y2) * d;
    }
    double r = rp / (r0 * w_corr);  // window-corrected normalized autocorr
    double harm_acf = std::fmax(0.0, std::fmin(1.0, r));

    // D4C-class group-delay statistic (the reference's pw.wav2world runs
    // DIO+CheapTrick+D4C, gender_classifier_train_pitch_norm.py:253-258;
    // D4C derives band aperiodicity from how CONCENTRATED the static
    // group delay is). Here: power-weighted circular coherence of the
    // per-bin group delay wrapped on the pitch period —
    //   C = |sum_k p_k e^{i 2 pi GD_k / P}| / sum_k p_k.
    // A periodic pulse train has GD(f) ~ const across harmonics -> C ~ 1;
    // band noise scatters GD over the (multi-period) window -> the
    // phasors cancel and C ~ the band's harmonic power fraction.
    // Only bins NEAR a harmonic (|f - round(f/f0)*f0| < f0/3) enter the
    // statistic: the 3-period analysis window makes adjacent harmonics'
    // mainlobes overlap, and their interference in the shared valley
    // bins displaces those bins' apparent group delay by an amount that
    // depends on the pulse phase — deterministic bias, not aperiodicity.
    double acc_re = 0.0, acc_im = 0.0, acc_p = 0.0;
    int klo = (int)std::ceil(lo), khi = (int)std::floor(hi);
    for (int k = std::max(klo, 1); k <= std::min(khi, half); ++k) {
      double p = power[k];
      if (p < 1e-14) continue;
      double fk = (double)k * sr / nfft;
      double hdist = std::fabs(fk / f0 - std::round(fk / f0)) * f0;
      if (hdist >= f0 / 3.0) continue;
      double gd = (re_t[k] * re[k] + im_t[k] * im[k]) / p;  // seconds
      double th = 2.0 * M_PI * gd * f0;  // wrap on the period
      acc_re += p * std::cos(th);
      acc_im += p * std::sin(th);
      acc_p += p;
    }
    double harm_gd = acc_p > 0 ? std::sqrt(acc_re * acc_re + acc_im * acc_im) / acc_p
                               : 0.0;
    // residual interference still lowers C for perfectly periodic input
    // to ~0.98 on the worst pulse phases (measured across f0/window
    // phases on multi-harmonic tones); normalize by that deterministic
    // floor so "fully periodic" maps to 1 and noise (~0.4) keeps its
    // full discriminative range — D4C itself calibrates its group-delay
    // statistic with empirical constants for the same reason.
    harm_gd = std::fmin(1.0, harm_gd / 0.93);

    // two independent harmonicity estimates — energy (autocorrelation)
    // and temporal coherence (group delay); geometric mean demands both
    double harm = std::sqrt(std::fmax(0.0, harm_acf * harm_gd));
    band_ap[b] = std::sqrt(std::fmax(kApFloor * kApFloor,
                                     std::fmin(kApCeil * kApCeil, 1.0 - harm)));
  }
  // piecewise-linear interpolation across band centers
  double centers[kNumBands];
  for (int b = 0; b < kNumBands; ++b)
    centers[b] = 0.5 * (kBandEdges[b] + std::fmin(kBandEdges[b + 1], sr / 2.0));
  for (int k = 0; k <= half; ++k) {
    double fk = (double)k * sr / nfft;
    if (fk <= centers[0]) {
      ap_out[k] = band_ap[0];
    } else if (fk >= centers[kNumBands - 1]) {
      ap_out[k] = band_ap[kNumBands - 1];
    } else {
      int b = 0;
      while (b + 1 < kNumBands && centers[b + 1] < fk) ++b;
      double t = (fk - centers[b]) / (centers[b + 1] - centers[b]);
      ap_out[k] = band_ap[b] * (1.0 - t) + band_ap[b + 1] * t;
    }
  }
}

// ---------------------------------------------------------- synthesis

// minimum-phase impulse response of amplitude spectrum |H| (bins [0, half])
// via the cepstrum method; writes nfft real samples.
void min_phase_response(const double* amp, int nfft, std::vector<double>& h,
                        std::vector<double>& re, std::vector<double>& im) {
  const int half = nfft / 2;
  for (int k = 0; k < nfft; ++k) {
    int kk = k <= half ? k : nfft - k;
    re[k] = std::log(amp[kk] + 1e-17);
    im[k] = 0.0;
  }
  fft(re, im, true);  // real cepstrum
  // fold: c[0], 2c[1..half-1], c[half], 0...
  for (int q = 1; q < half; ++q) {
    re[q] *= 2.0;
    im[q] = 0.0;
  }
  for (int q = half + 1; q < nfft; ++q) {
    re[q] = 0.0;
    im[q] = 0.0;
  }
  im[0] = im[half] = 0.0;
  fft(re, im, false);  // -> log min-phase spectrum
  for (int k = 0; k < nfft; ++k) {
    double m = std::exp(re[k]);
    double ph = im[k];
    re[k] = m * std::cos(ph);
    im[k] = m * std::sin(ph);
  }
  fft(re, im, true);  // impulse response
  for (int k = 0; k < nfft; ++k) h[k] = re[k];
}

struct Frames {
  std::vector<double> f0;
  std::vector<double> sp;  // (n_frames, half+1) row-major
  std::vector<double> ap;
  int hop = 0;
  int nfft = 0;
  int half() const { return nfft / 2; }
  long long n_frames() const { return (long long)f0.size(); }
};

double interp_f0(const Frames& fr, double pos) {
  double fi = pos / fr.hop;
  long long i0 = (long long)fi;
  if (i0 < 0) i0 = 0;
  if (i0 >= fr.n_frames() - 1) return fr.f0.empty() ? 0.0 : fr.f0.back();
  double a = fr.f0[i0], b = fr.f0[i0 + 1];
  if (a <= 0.0 || b <= 0.0) return (fi - i0) < 0.5 ? a : b;  // no V/UV interp
  return a + (b - a) * (fi - i0);
}

void interp_frame(const Frames& fr, const std::vector<double>& src, double pos,
                  double* out) {
  const int bins = fr.half() + 1;
  double fi = pos / fr.hop;
  long long i0 = (long long)fi;
  if (i0 < 0) i0 = 0;
  if (i0 >= fr.n_frames() - 1) {
    std::memcpy(out, &src[(fr.n_frames() - 1) * bins], sizeof(double) * bins);
    return;
  }
  double t = fi - i0;
  const double* a = &src[i0 * bins];
  const double* b = &src[(i0 + 1) * bins];
  for (int k = 0; k < bins; ++k) out[k] = a[k] * (1.0 - t) + b[k] * t;
}

void synthesize(const Frames& fr, int sr, long long n_out, float* out) {
  const int nfft = fr.nfft;
  const int half = nfft / 2;
  const int bins = half + 1;
  std::vector<double> acc(n_out + nfft, 0.0);
  std::vector<double> sp_t(bins), ap_t(bins), amp(bins);
  std::vector<double> h(nfft), re(nfft), im(nfft);
  std::vector<double> noise(nfft), nre(nfft), nim(nfft);
  XorShift rng;

  double pos = 0.0;
  while (pos < (double)n_out) {
    double f0 = interp_f0(fr, pos);
    // Caller-supplied f0 tracks (world_synthesize is exposed via ctypes)
    // can hold NaN/Inf/absurd values; clamp to a sane voiced range so
    // `period` stays positive and finite — otherwise `pos += period`
    // stalls and the loop never terminates, hanging the host data
    // pipeline.
    bool voiced = std::isfinite(f0) && f0 > 0.0;
    if (voiced) f0 = std::fmin(std::fmax(f0, 20.0), sr / 4.0);
    double period = voiced ? sr / f0 : (double)fr.hop;
    if (!(period >= 1.0)) period = std::fmax(1.0, (double)fr.hop);
    interp_frame(fr, fr.sp, pos, sp_t.data());
    interp_frame(fr, fr.ap, pos, ap_t.data());
    long long at = (long long)pos;

    if (voiced) {
      // periodic response: pulse of amplitude period/2 through
      // |H| = sqrt(sp * (1 - ap^2)) — harmonics then come out at
      // amplitude sqrt(sp) * sqrt(1-ap^2) (impulse-train harmonic
      // amplitude 2/P times pulse gain P/2 = 1).
      for (int k = 0; k < bins; ++k) {
        double papk = std::fmax(0.0, 1.0 - ap_t[k] * ap_t[k]);
        amp[k] = std::sqrt(sp_t[k] * papk);
      }
      min_phase_response(amp.data(), nfft, h, re, im);
      double gain = period / 2.0;
      long long lim = std::min((long long)nfft, (long long)acc.size() - at);
      for (long long i = 0; i < lim; ++i) acc[at + i] += gain * h[i];
    }

    // noise response over one period: white noise through
    // |G| = sqrt(sp) * ap * sqrt(sr / (4 * kDefaultF0)) — round-trips the
    // analysis convention for stationary noise (measured per-bin power of
    // windowed unit-variance noise is sum(w^2); with the sp normalization
    // 4*f0_def/(sr*sum(w^2)) the measured sp of synthesized noise matches
    // the analyzed sp when ap=1).
    double ngain = std::sqrt(sr / (4.0 * kDefaultF0));
    for (int k = 0; k < bins; ++k) amp[k] = std::sqrt(sp_t[k]) * ap_t[k] * ngain;
    min_phase_response(amp.data(), nfft, h, re, im);
    int seg = (int)std::ceil(period);
    if (seg > nfft / 2) seg = nfft / 2;
    for (int i = 0; i < nfft; ++i) {
      noise[i] = i < seg ? rng.next() : 0.0;
      nim[i] = 0.0;
    }
    // convolve noise segment with h via the spectral product
    std::vector<double>& hre = re;  // reuse buffers
    std::vector<double>& him = im;
    for (int i = 0; i < nfft; ++i) {
      hre[i] = h[i];
      him[i] = 0.0;
    }
    fft(hre, him, false);
    fft(noise, nim, false);
    for (int i = 0; i < nfft; ++i) {
      double rr = noise[i] * hre[i] - nim[i] * him[i];
      double ii = noise[i] * him[i] + nim[i] * hre[i];
      noise[i] = rr;
      nim[i] = ii;
    }
    fft(noise, nim, true);
    long long lim = std::min((long long)nfft, (long long)acc.size() - at);
    for (long long i = 0; i < lim; ++i) acc[at + i] += noise[i];

    pos += period;
  }
  for (long long i = 0; i < n_out; ++i) out[i] = (float)acc[i];
}

bool analyze(const float* wav, long long n, int sr, Frames& fr) {
  int hop = 0;
  long long max_frames = n / (long long)(sr * 0.005) + 2;
  fr.f0.assign(max_frames, 0.0);
  long long m = satpu_track_f0(wav, n, sr, fr.f0.data(), max_frames, &hop);
  if (m <= 0) return false;
  fr.f0.resize(m);
  fr.hop = hop;
  fr.nfft = fft_size_for(sr);
  const int bins = fr.half() + 1;
  fr.sp.assign(m * bins, 0.0);
  fr.ap.assign(m * bins, 0.0);
  for (long long fi = 0; fi < m; ++fi) {
    long long center = fi * hop;
    cheaptrick_frame(wav, n, sr, fr.f0[fi], center, fr.nfft, &fr.sp[fi * bins]);
    aperiodicity_frame(wav, n, sr, fr.f0[fi], center, fr.nfft, &fr.ap[fi * bins]);
  }
  return true;
}

}  // namespace

extern "C" {

// Analysis: fills caller-allocated f0 (max_frames), sp and ap
// (max_frames x (nfft/2+1), row-major). Returns frame count (or -1),
// hop and spectral bin count via out-params.
long long satpu_world_analyze(const float* wav, long long n, int sr,
                              double* f0_out, double* sp_out, double* ap_out,
                              long long max_frames, int* hop_out,
                              int* bins_out) {
  Frames fr;
  if (!analyze(wav, n, sr, fr)) return -1;
  long long m = std::min(fr.n_frames(), max_frames);
  const int bins = fr.half() + 1;
  std::memcpy(f0_out, fr.f0.data(), sizeof(double) * m);
  std::memcpy(sp_out, fr.sp.data(), sizeof(double) * m * bins);
  std::memcpy(ap_out, fr.ap.data(), sizeof(double) * m * bins);
  *hop_out = fr.hop;
  *bins_out = bins;
  return m;
}

// Synthesis from (possibly modified) parameters. bins must equal
// nfft/2+1 for nfft = satpu_world_fft_size(sr). Writes n_out samples.
long long satpu_world_synthesize(const double* f0, const double* sp,
                                 const double* ap, long long n_frames,
                                 int bins, int hop, int sr, long long n_out,
                                 float* out) {
  Frames fr;
  fr.hop = hop;
  fr.nfft = (bins - 1) * 2;
  if (fr.nfft != fft_size_for(sr) || n_frames <= 0) return -1;
  fr.f0.assign(f0, f0 + n_frames);
  fr.sp.assign(sp, sp + n_frames * bins);
  fr.ap.assign(ap, ap + n_frames * bins);
  synthesize(fr, sr, n_out, out);
  return n_out;
}

int satpu_world_fft_size(int sr) { return fft_size_for(sr); }

// Reference pipeline (gender_classifier_train_pitch_norm.py:253-258):
// wav2world -> voiced = max(0, (voiced - mean(voiced)) + target) ->
// synthesize. Returns sample count; caller frees *out with satpu_free.
long long satpu_world_pitch_normalize(const float* wav, long long n, int sr,
                                      double target_f0, float** out) {
  if (n <= 0) return -1;
  Frames fr;
  float* out_buf = (float*)std::malloc(sizeof(float) * n);
  if (!analyze(wav, n, sr, fr)) {  // too short to frame: passthrough
    std::memcpy(out_buf, wav, sizeof(float) * n);
    *out = out_buf;
    return n;
  }
  double sum = 0.0;
  long long cnt = 0;
  for (double v : fr.f0)
    if (v > 0) {
      sum += v;
      ++cnt;
    }
  if (cnt == 0) {  // fully unvoiced: the reference would divide by zero;
    std::memcpy(out_buf, wav, sizeof(float) * n);  // passthrough instead
    *out = out_buf;
    return n;
  }
  double mean = sum / cnt;
  for (auto& v : fr.f0)
    if (v > 0) v = std::fmax(0.0, v - mean + target_f0);
  synthesize(fr, sr, n, out_buf);
  *out = out_buf;
  return n;
}

}  // extern "C"
