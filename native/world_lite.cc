// world_lite: host-side pitch analysis + pitch-shift resynthesis in C++.
//
// TPU-native replacement for the reference's pyworld (WORLD vocoder)
// preprocessing (gender_classifier_train_pitch_norm.py:253-258:
// pw.wav2world -> shift voiced F0 to mean target -> pw.synthesize). The
// pipeline here is:
//   1. F0 track: normalized autocorrelation per 5 ms frame (70..400 Hz
//      search band, parabolic refinement, voicing threshold) — a DIO-class
//      estimator;
//   2. epoch (pitch-mark) placement from the F0 track;
//   3. TD-PSOLA resynthesis: two-period Hann grains re-spaced at the
//      target F0 contour — shifts pitch while preserving the spectral
//      envelope (what WORLD's CheapTrick+D4C+synthesize achieve for this
//      use case);
// Unvoiced regions pass through unchanged.
//
// Exposed via ctypes (speech_anonymization_tpu/data/pitch.py); runs in the
// host input pipeline feeding the TPU (SURVEY.md §2.5).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr double kF0Min = 70.0;
constexpr double kF0Max = 400.0;
constexpr double kFrameMs = 5.0;
constexpr double kVoicingThreshold = 0.45;

// normalized autocorrelation F0 per frame; 0 = unvoiced
std::vector<double> track_f0(const float* x, long n, int sr, int* hop_out) {
  int hop = (int)(sr * kFrameMs / 1000.0);
  int win = (int)(sr * 0.040);  // 40 ms analysis window
  int lag_min = (int)(sr / kF0Max);
  int lag_max = (int)(sr / kF0Min);
  int n_frames = n > win ? (int)((n - win) / hop) + 1 : 0;
  std::vector<double> f0(n_frames, 0.0);
  std::vector<double> frame(win);

  for (int fi = 0; fi < n_frames; ++fi) {
    const float* seg = x + (long)fi * hop;
    double mean = 0.0;
    for (int i = 0; i < win; ++i) mean += seg[i];
    mean /= win;
    double energy = 0.0;
    for (int i = 0; i < win; ++i) {
      frame[i] = seg[i] - mean;
      energy += frame[i] * frame[i];
    }
    if (energy < 1e-8) continue;

    // correlation over the full lag range first, then pick the SMALLEST
    // lag within 90% of the max — a periodic signal correlates equally at
    // every period multiple, and taking the global argmax causes octave
    // (sub-harmonic) errors.
    std::vector<double> corr(lag_max + 1, 0.0);
    double best = 0.0;
    for (int lag = lag_min; lag <= lag_max && lag < win; ++lag) {
      double num = 0.0, den1 = 0.0, den2 = 0.0;
      int m = win - lag;
      for (int i = 0; i < m; ++i) {
        num += frame[i] * frame[i + lag];
        den1 += frame[i] * frame[i];
        den2 += frame[i + lag] * frame[i + lag];
      }
      corr[lag] = num / (std::sqrt(den1 * den2) + 1e-12);
      if (corr[lag] > best) best = corr[lag];
    }
    int best_lag = 0;
    for (int lag = lag_min; lag <= lag_max && lag < win; ++lag) {
      if (corr[lag] >= 0.9 * best) {
        best_lag = lag;
        break;
      }
    }
    if (best > kVoicingThreshold && best_lag > 0) {
      // parabolic refinement around best_lag
      double refined = best_lag;
      if (best_lag > lag_min && best_lag < lag_max) {
        double ym = corr[best_lag - 1], y0 = corr[best_lag], yp = corr[best_lag + 1];
        double denom = ym - 2 * y0 + yp;
        if (std::fabs(denom) > 1e-12) refined += 0.5 * (ym - yp) / denom;
      }
      f0[fi] = sr / refined;
    }
  }

  // median-3 smoothing to kill octave glitches
  std::vector<double> sm = f0;
  for (int i = 1; i + 1 < n_frames; ++i) {
    double a = f0[i - 1], b = f0[i], c = f0[i + 1];
    double lo = std::fmin(a, std::fmin(b, c));
    double hi = std::fmax(a, std::fmax(b, c));
    sm[i] = a + b + c - lo - hi;
  }
  *hop_out = hop;
  return sm;
}

double f0_at(const std::vector<double>& f0, int hop, double pos) {
  double fi = pos / hop;
  int i0 = (int)fi;
  if (i0 < 0) return f0.empty() ? 0.0 : f0.front();
  if (i0 + 1 >= (int)f0.size()) return f0.empty() ? 0.0 : f0.back();
  double a = f0[i0], b = f0[i0 + 1];
  if (a <= 0.0 || b <= 0.0) return (fi - i0) < 0.5 ? a : b;
  return a + (b - a) * (fi - i0);
}

}  // namespace

extern "C" {

// F0 analysis only: fills caller-allocated f0_out (n_frames from
// satpu_f0_frames). Returns frame count, hop in *hop_out.
long long satpu_track_f0(const float* wav, long long n, int sr, double* f0_out,
                         long long max_frames, int* hop_out) {
  int hop;
  std::vector<double> f0 = track_f0(wav, (long)n, sr, &hop);
  long long m = (long long)f0.size();
  if (m > max_frames) m = max_frames;
  std::memcpy(f0_out, f0.data(), sizeof(double) * m);
  *hop_out = hop;
  return m;
}

// Pitch-normalize: shift voiced F0 so its mean becomes target_f0 (the
// reference's `(voiced - mean) + 500` rule) and resynthesize via TD-PSOLA.
// Returns sample count; caller frees *out with satpu_free.
long long satpu_pitch_normalize(const float* wav, long long n, int sr,
                                double target_f0, float** out) {
  if (n <= 0) return -1;
  int hop;
  std::vector<double> f0 = track_f0(wav, (long)n, sr, &hop);

  // voiced mean
  double sum = 0.0;
  long cnt = 0;
  for (double v : f0)
    if (v > 0) {
      sum += v;
      ++cnt;
    }
  float* out_buf = (float*)std::malloc(sizeof(float) * n);
  if (cnt == 0) {  // fully unvoiced: passthrough
    std::memcpy(out_buf, wav, sizeof(float) * n);
    *out = out_buf;
    return n;
  }
  double mean = sum / cnt;
  double shift = target_f0 - mean;  // additive shift of the contour

  // analysis epochs: walk at 1/f0 (voiced) or 5 ms (unvoiced)
  std::vector<double> epochs;
  std::vector<double> target_f0_at_epoch;
  double pos = 0.0;
  while (pos < (double)n) {
    double cur = f0_at(f0, hop, pos);
    double period = cur > 0 ? sr / cur : sr * kFrameMs / 1000.0;
    epochs.push_back(pos);
    double tgt = cur > 0 ? std::fmax(1.0, cur + shift) : 0.0;
    target_f0_at_epoch.push_back(tgt);
    pos += period;
  }

  std::memset(out_buf, 0, sizeof(float) * n);
  std::vector<float> norm(n, 0.0f);

  // synthesis: place grains at target-period spacing, sourcing the nearest
  // analysis epoch
  double syn_pos = 0.0;
  size_t src_idx = 0;
  while (syn_pos < (double)n) {
    // advance source index to track synthesis position
    while (src_idx + 1 < epochs.size() && epochs[src_idx + 1] <= syn_pos)
      ++src_idx;
    double src_f0 = f0_at(f0, hop, epochs[src_idx]);
    bool voiced = src_f0 > 0;
    double src_period = voiced ? sr / src_f0 : sr * kFrameMs / 1000.0;
    double tgt = target_f0_at_epoch[src_idx];
    double syn_period = voiced && tgt > 0 ? sr / tgt : src_period;

    int grain = (int)(2.0 * src_period);
    long center = (long)epochs[src_idx];
    for (int i = 0; i < grain; ++i) {
      long src = center - grain / 2 + i;
      long dst = (long)syn_pos - grain / 2 + i;
      if (src < 0 || src >= n || dst < 0 || dst >= n) continue;
      float w = 0.5f - 0.5f * std::cos(2.0 * M_PI * i / (grain - 1));
      out_buf[dst] += wav[src] * w;
      norm[dst] += w;
    }
    syn_pos += syn_period;
  }
  for (long long i = 0; i < n; ++i)
    if (norm[i] > 1e-3f) out_buf[i] /= norm[i];
  *out = out_buf;
  return n;
}

}  // extern "C"
