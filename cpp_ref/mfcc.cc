// Native C++ golden pipeline (SURVEY.md §2 C10) + native WAV decoder (C1).
//
// The OpenCL reference validates its GPU kernels against a serial C/C++
// implementation ("max abs error vs CPU ref", BASELINE.json:metric). This
// module preserves that native-golden role for the TPU rebuild: a
// double-precision, stage-by-stage MFCC pipeline — pre-emphasis, overlapped
// framing, Hamming window, iterative radix-2 FFT, power spectrum, HTK mel
// filterbank, natural log, orthonormal DCT-II — exported with a C ABI and
// loaded from Python via ctypes (tpufeat/cpp_golden.py). It is written from
// first principles; tests cross-check it against the independent NumPy
// float64 golden and against the TPU path.
//
// Build: `make` (g++ -O2 -shared -fPIC) -> libtpufeat_ref.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---- iterative radix-2 DIT FFT: bit-reversal + log2(n) butterfly passes ----
void fft_radix2(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  // bit-reversal permutation
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  // butterfly passes
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / static_cast<double>(len);
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const size_t a = i + k, b = i + k + len / 2;
        const double tr = re[b] * cr - im[b] * ci;
        const double ti = re[b] * ci + im[b] * cr;
        re[b] = re[a] - tr;
        im[b] = im[a] - ti;
        re[a] += tr;
        im[a] += ti;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

double hz_to_mel(double f) { return 2595.0 * std::log10(1.0 + f / 700.0); }
double mel_to_hz(double m) { return 700.0 * (std::pow(10.0, m / 2595.0) - 1.0); }

// Kaldi-convention piecewise-linear VTLN warp of a corner frequency
// (independent twin of tpufeat/matrices.py vtln_warp_freq; vtln_high
// here is already resolved to an absolute frequency).
double vtln_warp_freq(double low, double high, double vl, double vh,
                      double warp, double f) {
  if (f < low || f > high) return f;
  const double l = vl * (warp > 1.0 ? warp : 1.0);
  const double h = vh * (warp < 1.0 ? warp : 1.0);
  const double scale = 1.0 / warp;
  const double scale_left = (scale * l - low) / (l - low);
  const double scale_right = (high - scale * h) / (high - h);
  if (f < l) return low + scale_left * (f - low);
  if (f < h) return scale * f;
  return high + scale_right * (f - high);
}

}  // namespace

extern "C" {

// Frame count for snip-edges framing; <=0 when the signal is too short.
long tpufeat_num_frames(long n, int frame_len, int hop) {
  if (n < frame_len) return 0;
  return 1 + (n - frame_len) / hop;
}

// Full MFCC pipeline (classic config-1 semantics: signal-level pre-emphasis
// with x[-1]:=0, Hamming window, zero-pad to n_fft, HTK integer-bin mel
// triangles, natural log with floor, ortho DCT-II, optional lifter).
// `out` must hold num_frames * n_mfcc doubles. Returns the frame count.
long tpufeat_mfcc_f64(const double* signal, long n, int sample_rate,
                      int frame_len, int hop, int n_fft, double preemph,
                      int n_mels, int n_mfcc, double fmin, double fmax,
                      double log_floor, int lifter, double vtln_warp,
                      double vtln_low, double vtln_high, double* out) {
  const long n_frames = tpufeat_num_frames(n, frame_len, hop);
  if (n_frames <= 0) return 0;
  const int n_bins = n_fft / 2 + 1;

  // pre-emphasis over the whole signal
  std::vector<double> y(n);
  y[0] = signal[0];
  for (long t = 1; t < n; ++t) y[t] = signal[t] - preemph * signal[t - 1];

  // Hamming window
  std::vector<double> win(frame_len);
  for (int i = 0; i < frame_len; ++i)
    win[i] = 0.54 - 0.46 * std::cos(2.0 * kPi * i / (frame_len - 1));

  // HTK mel filterbank, integer-bin triangles: bin = floor((n_fft+1)*f/sr)
  std::vector<double> fb(static_cast<size_t>(n_bins) * n_mels, 0.0);
  {
    const double mlo = hz_to_mel(fmin), mhi = hz_to_mel(fmax);
    const double vh = vtln_high > 0.0 ? vtln_high : fmax + vtln_high;
    std::vector<long> bins(n_mels + 2);
    for (int m = 0; m < n_mels + 2; ++m) {
      double f = mel_to_hz(mlo + (mhi - mlo) * m / (n_mels + 1));
      if (vtln_warp != 1.0)
        f = vtln_warp_freq(fmin, fmax, vtln_low, vh, vtln_warp, f);
      bins[m] = static_cast<long>(std::floor((n_fft + 1) * f / sample_rate));
    }
    for (int m = 0; m < n_mels; ++m) {
      for (long k = bins[m]; k < bins[m + 1]; ++k)
        if (bins[m + 1] > bins[m])
          fb[k * n_mels + m] =
              static_cast<double>(k - bins[m]) / (bins[m + 1] - bins[m]);
      for (long k = bins[m + 1]; k < bins[m + 2]; ++k)
        if (bins[m + 2] > bins[m + 1])
          fb[k * n_mels + m] =
              static_cast<double>(bins[m + 2] - k) / (bins[m + 2] - bins[m + 1]);
    }
  }

  // orthonormal DCT-II matrix [n_mels x n_mfcc]
  std::vector<double> dct(static_cast<size_t>(n_mels) * n_mfcc);
  for (int j = 0; j < n_mels; ++j)
    for (int i = 0; i < n_mfcc; ++i) {
      double v = std::cos(kPi * i * (2.0 * j + 1.0) / (2.0 * n_mels)) *
                 std::sqrt(2.0 / n_mels);
      if (i == 0) v *= 1.0 / std::sqrt(2.0);
      dct[static_cast<size_t>(j) * n_mfcc + i] = v;
    }

  std::vector<double> lift(n_mfcc, 1.0);
  if (lifter > 0)
    for (int i = 0; i < n_mfcc; ++i)
      lift[i] = 1.0 + (lifter / 2.0) * std::sin(kPi * i / lifter);

  std::vector<double> re(n_fft), im(n_fft), power(n_bins), mel(n_mels);
  for (long f = 0; f < n_frames; ++f) {
    const double* frame = y.data() + f * hop;
    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    for (int i = 0; i < frame_len; ++i) re[i] = frame[i] * win[i];
    fft_radix2(re, im);
    for (int k = 0; k < n_bins; ++k) power[k] = re[k] * re[k] + im[k] * im[k];
    for (int m = 0; m < n_mels; ++m) {
      double acc = 0.0;
      for (int k = 0; k < n_bins; ++k) acc += power[k] * fb[k * n_mels + m];
      mel[m] = std::log(acc > log_floor ? acc : log_floor);
    }
    for (int i = 0; i < n_mfcc; ++i) {
      double acc = 0.0;
      for (int m = 0; m < n_mels; ++m)
        acc += mel[m] * dct[static_cast<size_t>(m) * n_mfcc + i];
      out[f * n_mfcc + i] = acc * lift[i];
    }
  }
  return n_frames;
}

// Log-mel filterbank features (classic config semantics, same conventions
// as tpufeat_mfcc_f64 minus the cepstrum stage). use_energy != 0 PREPENDS
// the conditioned-frame log energy as an extra first column (Kaldi
// compute-fbank-feats --use-energy: output dim n_mels+1). `out` must hold
// num_frames * (n_mels + (use_energy != 0)) doubles. Returns frame count.
long tpufeat_fbank_f64(const double* signal, long n, int sample_rate,
                       int frame_len, int hop, int n_fft, double preemph,
                       int n_mels, double fmin, double fmax,
                       double log_floor, int use_energy, double vtln_warp,
                       double vtln_low, double vtln_high, double* out) {
  const long n_frames = tpufeat_num_frames(n, frame_len, hop);
  if (n_frames <= 0) return 0;
  const int n_bins = n_fft / 2 + 1;
  const int dim = n_mels + (use_energy ? 1 : 0);

  std::vector<double> y(n);
  y[0] = signal[0];
  for (long t = 1; t < n; ++t) y[t] = signal[t] - preemph * signal[t - 1];

  std::vector<double> win(frame_len);
  for (int i = 0; i < frame_len; ++i)
    win[i] = 0.54 - 0.46 * std::cos(2.0 * kPi * i / (frame_len - 1));

  // HTK mel filterbank, integer-bin triangles (same construction as
  // tpufeat_mfcc_f64)
  std::vector<double> fb(static_cast<size_t>(n_bins) * n_mels, 0.0);
  {
    const double mlo = hz_to_mel(fmin), mhi = hz_to_mel(fmax);
    const double vh = vtln_high > 0.0 ? vtln_high : fmax + vtln_high;
    std::vector<long> bins(n_mels + 2);
    for (int m = 0; m < n_mels + 2; ++m) {
      double f = mel_to_hz(mlo + (mhi - mlo) * m / (n_mels + 1));
      if (vtln_warp != 1.0)
        f = vtln_warp_freq(fmin, fmax, vtln_low, vh, vtln_warp, f);
      bins[m] = static_cast<long>(std::floor((n_fft + 1) * f / sample_rate));
    }
    for (int m = 0; m < n_mels; ++m) {
      for (long k = bins[m]; k < bins[m + 1]; ++k)
        if (bins[m + 1] > bins[m])
          fb[k * n_mels + m] =
              static_cast<double>(k - bins[m]) / (bins[m + 1] - bins[m]);
      for (long k = bins[m + 1]; k < bins[m + 2]; ++k)
        if (bins[m + 2] > bins[m + 1])
          fb[k * n_mels + m] =
              static_cast<double>(bins[m + 2] - k) / (bins[m + 2] - bins[m + 1]);
    }
  }

  std::vector<double> re(n_fft), im(n_fft), power(n_bins);
  for (long f = 0; f < n_frames; ++f) {
    const double* frame = y.data() + f * hop;
    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    for (int i = 0; i < frame_len; ++i) re[i] = frame[i] * win[i];
    fft_radix2(re, im);
    for (int k = 0; k < n_bins; ++k) power[k] = re[k] * re[k] + im[k] * im[k];
    double* row = out + f * dim;
    if (use_energy) {
      double e = 0.0;
      for (int i = 0; i < frame_len; ++i) e += frame[i] * frame[i];
      row[0] = std::log(e > log_floor ? e : log_floor);
    }
    for (int m = 0; m < n_mels; ++m) {
      double acc = 0.0;
      for (int k = 0; k < n_bins; ++k) acc += power[k] * fb[k * n_mels + m];
      row[(use_energy ? 1 : 0) + m] =
          std::log(acc > log_floor ? acc : log_floor);
    }
  }
  return n_frames;
}

// Spectrogram features (Kaldi compute-spectrogram-feats analogue, classic
// config semantics: signal-level pre-emphasis with x[-1]:=0, Hamming
// window, zero-pad to n_fft, natural log of the power spectrum with floor;
// use_energy != 0 substitutes the conditioned-frame log energy into
// element 0, the same substitution as MFCC c0). `out` must hold
// num_frames * (n_fft/2 + 1) doubles. Returns the frame count.
long tpufeat_spec_f64(const double* signal, long n, int frame_len, int hop,
                      int n_fft, double preemph, double log_floor,
                      int use_energy, double* out) {
  const long n_frames = tpufeat_num_frames(n, frame_len, hop);
  if (n_frames <= 0) return 0;
  const int n_bins = n_fft / 2 + 1;

  std::vector<double> y(n);
  y[0] = signal[0];
  for (long t = 1; t < n; ++t) y[t] = signal[t] - preemph * signal[t - 1];

  std::vector<double> win(frame_len);
  for (int i = 0; i < frame_len; ++i)
    win[i] = 0.54 - 0.46 * std::cos(2.0 * kPi * i / (frame_len - 1));

  std::vector<double> re(n_fft), im(n_fft);
  for (long f = 0; f < n_frames; ++f) {
    const double* frame = y.data() + f * hop;
    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    for (int i = 0; i < frame_len; ++i) re[i] = frame[i] * win[i];
    fft_radix2(re, im);
    double* row = out + f * n_bins;
    for (int k = 0; k < n_bins; ++k) {
      double p = re[k] * re[k] + im[k] * im[k];
      row[k] = std::log(p > log_floor ? p : log_floor);
    }
    if (use_energy) {
      double e = 0.0;
      for (int i = 0; i < frame_len; ++i) e += frame[i] * frame[i];
      row[0] = std::log(e > log_floor ? e : log_floor);
    }
  }
  return n_frames;
}

// Full PLP pipeline (beyond-reference family; conventions documented in
// tpufeat/plp.py): signal-level pre-emphasis, Hamming window, HTK
// integer-bin mel filterbank energies, equal-loudness weighting at band
// centers, (.)^compress power law, even-symmetric IDFT autocorrelation,
// Levinson-Durbin, LPC-to-cepstrum; c0 = ln(residual energy); optional
// sinusoidal lifter over all order+1 outputs. `out` must hold
// num_frames * (order+1) doubles. Returns the frame count.
long tpufeat_plp_f64(const double* signal, long n, int sample_rate,
                     int frame_len, int hop, int n_fft, double preemph,
                     int n_mels, int order, double fmin, double fmax,
                     double log_floor, double compress, int lifter,
                     double* out) {
  const long n_frames = tpufeat_num_frames(n, frame_len, hop);
  if (n_frames <= 0) return 0;
  const int n_bins = n_fft / 2 + 1;
  const int dim = order + 1;

  std::vector<double> y(n);
  y[0] = signal[0];
  for (long t = 1; t < n; ++t) y[t] = signal[t] - preemph * signal[t - 1];

  std::vector<double> win(frame_len);
  for (int i = 0; i < frame_len; ++i)
    win[i] = 0.54 - 0.46 * std::cos(2.0 * kPi * i / (frame_len - 1));

  // HTK mel filterbank (integer-bin triangles) + band-center equal loudness
  std::vector<double> fb(static_cast<size_t>(n_bins) * n_mels, 0.0);
  std::vector<double> eql(n_mels);
  {
    const double mlo = hz_to_mel(fmin), mhi = hz_to_mel(fmax);
    std::vector<long> bins(n_mels + 2);
    for (int m = 0; m < n_mels + 2; ++m) {
      const double f = mel_to_hz(mlo + (mhi - mlo) * m / (n_mels + 1));
      bins[m] = static_cast<long>(std::floor((n_fft + 1) * f / sample_rate));
      if (m >= 1 && m <= n_mels) {
        const double f2 = f * f;
        const double t1 = f2 / (f2 + 1.6e5);
        eql[m - 1] = t1 * t1 * (f2 + 1.44e6) / (f2 + 9.61e6);
      }
    }
    for (int m = 0; m < n_mels; ++m) {
      for (long k = bins[m]; k < bins[m + 1]; ++k)
        if (bins[m + 1] > bins[m])
          fb[k * n_mels + m] =
              static_cast<double>(k - bins[m]) / (bins[m + 1] - bins[m]);
      for (long k = bins[m + 1]; k < bins[m + 2]; ++k)
        if (bins[m + 2] > bins[m + 1])
          fb[k * n_mels + m] =
              static_cast<double>(bins[m + 2] - k) / (bins[m + 2] - bins[m + 1]);
    }
  }

  // IDFT-to-autocorrelation matrix [n_mels+2 x order+1] (even-symmetric
  // extension of period 2*(n_mels+1); same closed form as
  // matrices.plp_idft_matrix)
  const int m2 = n_mels + 2;
  const double m1 = n_mels + 1.0;
  std::vector<double> idft(static_cast<size_t>(m2) * dim);
  for (int j = 0; j < m2; ++j)
    for (int k = 0; k < dim; ++k) {
      double v = 2.0 * std::cos(kPi * k * j / m1);
      if (j == 0) v = 1.0;
      if (j == m2 - 1) v = (k % 2 == 0) ? 1.0 : -1.0;
      idft[static_cast<size_t>(j) * dim + k] = v / (2.0 * m1);
    }

  std::vector<double> lift(dim, 1.0);
  if (lifter > 0)
    for (int i = 0; i < dim; ++i)
      lift[i] = 1.0 + (lifter / 2.0) * std::sin(kPi * i / lifter);

  std::vector<double> re(n_fft), im(n_fft), power(n_bins), band(m2),
      r(dim), a(order, 0.0), anew(order), c(order);
  for (long f = 0; f < n_frames; ++f) {
    const double* frame = y.data() + f * hop;
    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    for (int i = 0; i < frame_len; ++i) re[i] = frame[i] * win[i];
    fft_radix2(re, im);
    for (int k = 0; k < n_bins; ++k) power[k] = re[k] * re[k] + im[k] * im[k];
    for (int m = 0; m < n_mels; ++m) {
      double acc = 0.0;
      for (int k = 0; k < n_bins; ++k) acc += power[k] * fb[k * n_mels + m];
      acc *= eql[m];
      band[m + 1] = std::pow(acc > log_floor ? acc : log_floor, compress);
    }
    band[0] = band[1];
    band[m2 - 1] = band[m2 - 2];
    for (int k = 0; k < dim; ++k) {
      double acc = 0.0;
      for (int j = 0; j < m2; ++j)
        acc += band[j] * idft[static_cast<size_t>(j) * dim + k];
      r[k] = acc;
    }
    // Levinson-Durbin with the same per-step error floor as the
    // accelerated path (silence degrades to zero reflections, not NaN)
    double e = r[0] > log_floor ? r[0] : log_floor;
    std::fill(a.begin(), a.end(), 0.0);
    for (int m = 1; m <= order; ++m) {
      double acc = r[m];
      for (int i = 1; i < m; ++i) acc -= a[i - 1] * r[m - i];
      const double k = acc / e;
      for (int i = 1; i < m; ++i) anew[i - 1] = a[i - 1] - k * a[m - i - 1];
      anew[m - 1] = k;
      std::copy(anew.begin(), anew.begin() + m, a.begin());
      e *= (1.0 - k * k);
      if (e < log_floor) e = log_floor;
    }
    // LPC -> cepstra (minimum-phase model; see tpufeat/plp.py)
    for (int nn = 1; nn <= order; ++nn) {
      double acc = a[nn - 1];
      for (int k = 1; k < nn; ++k)
        acc += (static_cast<double>(k) / nn) * c[k - 1] * a[nn - k - 1];
      c[nn - 1] = acc;
    }
    out[f * dim] = std::log(e > log_floor ? e : log_floor) * lift[0];
    for (int i = 1; i < dim; ++i) out[f * dim + i] = c[i - 1] * lift[i];
  }
  return n_frames;
}

// Polyphase resampler golden (scipy.signal.resample_poly twin), double
// precision: the same default filter scipy designs — windowed sinc,
// half length 10*max(p,q), Kaiser(beta=5), unity DC gain, scaled by p —
// evaluated as a direct upfirdn sum y[m] = sum_t x[t] h[m*q + D - t*p]
// (D = group delay), zeros outside the signal. The third independent
// implementation beside tpufeat/resampling.py (MXU block matmul) and
// scipy itself (which reference/cpu.py's pitch golden calls). Output
// length ceil(n*p/q); `out` must hold that many doubles.
namespace {
double bessel_i0(double x) {
  // I0(x) power series: sum_k ((x/2)^k / k!)^2 — monotone terms,
  // plenty of precision for the Kaiser-5 window's x in [0, 5]
  double sum = 1.0, term = 1.0;
  const double hx = 0.5 * x;
  for (int k = 1; k < 64; ++k) {
    term *= hx / k;
    const double t2 = term * term;
    sum += t2;
    if (t2 < sum * 1e-18) break;
  }
  return sum;
}
}  // namespace

long tpufeat_resample_len(long n, int p, int q) {
  return (n * p + q - 1) / q;
}

long tpufeat_resample_poly_f64(const double* x, long n, int p, int q,
                               double* out) {
  const int max_rate = p > q ? p : q;
  const long half = 10L * max_rate;
  const long lh = 2 * half + 1;
  const double fc = 1.0 / max_rate;  // cutoff in Nyquist units (fs = 2)
  const double beta = 5.0;
  const double i0b = bessel_i0(beta);
  std::vector<double> h(lh);
  double s = 0.0;
  for (long i = 0; i < lh; ++i) {
    const double m = static_cast<double>(i - half);
    const double a = kPi * fc * m;
    const double sinc = (m == 0.0) ? 1.0 : std::sin(a) / a;
    const double r = 2.0 * static_cast<double>(i) / (lh - 1) - 1.0;
    const double w =
        bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[i] = fc * sinc * w;
    s += h[i];
  }
  const double g = static_cast<double>(p) / s;  // unity DC gain, x p
  for (long i = 0; i < lh; ++i) h[i] *= g;

  const long n_out = (n * p + q - 1) / q;
  for (long m = 0; m < n_out; ++m) {
    const long k0 = m * static_cast<long>(q) + half;
    // x[t] contributes iff 0 <= k0 - t*p < lh (and t inside the signal)
    const long a = k0 - lh + 1;
    long t_lo = (a >= 0) ? (a + p - 1) / p : a / p;  // ceil(a/p): C++
    if (t_lo < 0) t_lo = 0;   // division truncates toward zero, which
    long t_hi = k0 / p;       // IS ceil for negative numerators
    if (t_hi > n - 1) t_hi = n - 1;
    double acc = 0.0;
    for (long t = t_lo; t <= t_hi; ++t) acc += x[t] * h[k0 - t * p];
    out[m] = acc;
  }
  return n_out;
}

// Pitch tracker golden (NCCF + Viterbi), double precision: direct per-lag
// correlation loops and an explicit O(F*L^2) Viterbi — the third
// independent implementation beside tpufeat/pitch.py (JAX f32, NCCF as
// MXU GEMMs) and tpufeat/reference/cpu.py (NumPy f64). Semantics:
// nccf(t,l) = <a, b_l> / sqrt(E0*E_l + ballast), ballast from the PRE-pad
// signal RMS; Viterbi maximizes sum(nccf - lag_bias*ln(lag/lag_min))
// minus penalty*ln(lag_t/lag_{t-1})^2 jumps, ties to the FIRST (shortest)
// lag. center != 0 zero-pads wext/2 each side so the extended window is
// centered on t*hop. out_hz/out_pov must each hold the frame count
// (tpufeat_pitch_num_frames) doubles; returns that count.
long tpufeat_pitch_num_frames(long n, int frame_len, int hop, int lag_max,
                              int center) {
  const long wext = frame_len + lag_max;
  if (center) n += 2 * (wext / 2);
  if (n < wext) return 0;
  return 1 + (n - wext) / hop;
}

long tpufeat_pitch_f64(const double* signal, long n, int sample_rate,
                       int frame_len, int hop, int lag_min, int lag_max,
                       double penalty, double ballast_w, double lag_bias,
                       int center, int refine, double* out_hz,
                       double* out_pov) {
  const int W = frame_len;
  const long wext = W + lag_max;
  const int L = lag_max - lag_min + 1;

  double rms2 = 0.0;
  if (n > 0) {
    for (long t = 0; t < n; ++t) rms2 += signal[t] * signal[t];
    rms2 /= static_cast<double>(n);
  }
  const double ballast = ballast_w * (W * rms2) * (W * rms2);

  const long pad = center ? wext / 2 : 0;
  std::vector<double> x(n + 2 * pad, 0.0);
  for (long t = 0; t < n; ++t) x[pad + t] = signal[t];
  const long F = tpufeat_pitch_num_frames(n, frame_len, hop, lag_max,
                                          center);
  if (F <= 0) return 0;

  std::vector<double> scores(static_cast<size_t>(F) * L);
  for (long t = 0; t < F; ++t) {
    const double* b = &x[t * hop];
    double e0 = 0.0;
    for (int i = 0; i < W; ++i) e0 += b[i] * b[i];
    for (int j = 0; j < L; ++j) {
      const int lag = lag_min + j;
      double num = 0.0, el = 0.0;
      for (int i = 0; i < W; ++i) {
        num += b[i] * b[i + lag];
        el += b[i + lag] * b[i + lag];
      }
      scores[static_cast<size_t>(t) * L + j] =
          num / std::sqrt(e0 * el + ballast + 1e-20);
    }
  }

  std::vector<double> ll(L), tilt(L);
  for (int j = 0; j < L; ++j) {
    ll[j] = std::log(static_cast<double>(lag_min + j));
    tilt[j] = lag_bias * std::log(static_cast<double>(lag_min + j)
                                  / lag_min);
  }
  std::vector<double> v(L), v2(L);
  std::vector<int> ptrs(static_cast<size_t>(F > 1 ? F - 1 : 0) * L);
  for (int j = 0; j < L; ++j) v[j] = scores[j] - tilt[j];
  for (long t = 1; t < F; ++t) {
    for (int j = 0; j < L; ++j) {
      int best = 0;
      double d0 = ll[0] - ll[j];
      double bv = v[0] - penalty * d0 * d0;
      for (int i = 1; i < L; ++i) {
        const double d = ll[i] - ll[j];
        const double c = v[i] - penalty * d * d;
        if (c > bv) {  // strict: first occurrence wins, like np.argmax
          bv = c;
          best = i;
        }
      }
      ptrs[static_cast<size_t>(t - 1) * L + j] = best;
      v2[j] = scores[static_cast<size_t>(t) * L + j] - tilt[j] + bv;
    }
    std::swap(v, v2);
  }

  int cur = 0;
  for (int j = 1; j < L; ++j)
    if (v[j] > v[cur]) cur = j;
  std::vector<int> path(F);
  path[F - 1] = cur;
  for (long t = F - 2; t >= 0; --t) {
    cur = ptrs[static_cast<size_t>(t) * L + cur];
    path[t] = cur;
  }
  for (long t = 0; t < F; ++t) {
    const int j = path[t];
    double delta = 0.0;
    if (refine && j > 0 && j < L - 1) {
      // parabolic sub-lag refinement on the raw NCCF (tpufeat.pitch.
      // refine_lag twin): vertex through the decided lag and its
      // neighbors, gated on real curvature, clipped to half a step
      const double ym = scores[static_cast<size_t>(t) * L + j - 1];
      const double y0 = scores[static_cast<size_t>(t) * L + j];
      const double yp = scores[static_cast<size_t>(t) * L + j + 1];
      const double den = ym - 2.0 * y0 + yp;
      if (den < -1e-2) {
        delta = 0.5 * (ym - yp) / den;
        if (delta > 0.5) delta = 0.5;
        if (delta < -0.5) delta = -0.5;
      }
    }
    out_hz[t] = static_cast<double>(sample_rate) / (lag_min + j + delta);
    out_pov[t] = scores[static_cast<size_t>(t) * L + j];
  }
  return F;
}

// ---- native WAV (RIFF) decoder: chunk-walking parser ----
// Formats: PCM 8/16/24/32-bit and IEEE float 32/64-bit, including
// WAVE_FORMAT_EXTENSIBLE headers (the real tag is read from the SubFormat
// GUID). Pass out=nullptr to query (returns mono sample count, sets *rate).
// Otherwise fills `out` (capacity `cap` floats) with mono samples in
// [-1, 1) (multi-channel averaged) and returns the count; -1 on I/O or
// structural error, -2 on an unsupported format tag / bit depth (so callers
// can reject loudly instead of decoding garbage).
namespace {
// one mono sample (channel-averaged) from an interleaved byte frame
double decode_frame(const unsigned char* p, int fmt, int bits, int channels) {
  double acc = 0.0;
  const int block = bits / 8;
  for (int c = 0; c < channels; ++c) {
    const unsigned char* s = p + c * block;
    double v = 0.0;
    if (fmt == 1) {  // PCM
      if (bits == 16) {
        v = static_cast<int16_t>(s[0] | (s[1] << 8)) / 32768.0;
      } else if (bits == 8) {  // unsigned by spec
        v = (static_cast<int>(s[0]) - 128) / 128.0;
      } else if (bits == 24) {
        int32_t raw = s[0] | (s[1] << 8) | (s[2] << 16);
        if (raw >= (1 << 23)) raw -= (1 << 24);
        v = raw / 8388608.0;
      } else {  // 32
        const int32_t raw = s[0] | (s[1] << 8) | (s[2] << 16) |
                            (static_cast<uint32_t>(s[3]) << 24);
        v = raw / 2147483648.0;
      }
    } else {  // IEEE float
      if (bits == 32) {
        uint32_t u = s[0] | (s[1] << 8) | (s[2] << 16) |
                     (static_cast<uint32_t>(s[3]) << 24);
        float f;
        std::memcpy(&f, &u, 4);
        v = f;
      } else {  // 64
        uint64_t u = 0;
        for (int b = 7; b >= 0; --b) u = (u << 8) | s[b];
        double d;
        std::memcpy(&d, &u, 8);
        v = d;
      }
    }
    acc += v;
  }
  return acc / channels;
}
}  // namespace

long tpufeat_read_wav(const char* path, float* out, long cap, int* rate) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  unsigned char hdr[12];
  if (std::fread(hdr, 1, 12, fp) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(fp);
    return -1;
  }
  int channels = 0, bits = 0, format = 0;
  long n_out = -1;
  while (true) {
    unsigned char ch[8];
    if (std::fread(ch, 1, 8, fp) != 8) break;
    const uint32_t size = ch[4] | (ch[5] << 8) | (ch[6] << 16) |
                          (static_cast<uint32_t>(ch[7]) << 24);
    if (!std::memcmp(ch, "fmt ", 4)) {
      unsigned char fmt[40];
      const size_t want = size < sizeof(fmt) ? size : sizeof(fmt);
      if (size < 16 || std::fread(fmt, 1, want, fp) != want) break;
      format = fmt[0] | (fmt[1] << 8);
      channels = fmt[2] | (fmt[3] << 8);
      *rate = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) | (fmt[7] << 24);
      bits = fmt[14] | (fmt[15] << 8);
      if (format == 0xFFFE) {  // extensible: real tag in SubFormat GUID
        if (size < 40) break;
        format = fmt[24] | (fmt[25] << 8);
      }
      if (size > want) std::fseek(fp, size - want, SEEK_CUR);
    } else if (!std::memcmp(ch, "data", 4)) {
      if (channels <= 0 || bits <= 0 || *rate <= 0) break;
      const bool supported =
          (format == 1 && (bits == 8 || bits == 16 || bits == 24 ||
                           bits == 32)) ||
          (format == 3 && (bits == 32 || bits == 64));
      if (!supported) {
        n_out = -2;
        break;
      }
      const int block = bits / 8 * channels;
      // A corrupt/hostile size field must not drive the allocation (or
      // the caller's, via the two-pass size probe): clamp the chunk to
      // the bytes actually present in the file, like the Python decoder
      // truncates its data slice. Whole trailing frames only.
      const long pos = std::ftell(fp);
      if (pos < 0 || std::fseek(fp, 0, SEEK_END) != 0) break;
      const long remain = std::ftell(fp) - pos;
      if (remain < 0 || std::fseek(fp, pos, SEEK_SET) != 0) break;
      const uint64_t avail =
          size < static_cast<uint64_t>(remain)
              ? size : static_cast<uint64_t>(remain);
      const long n_samp = static_cast<long>(avail / block);
      if (!out) {
        n_out = n_samp;
        break;
      }
      if (n_samp > cap) break;
      std::vector<unsigned char> buf(static_cast<size_t>(n_samp) * block);
      if (std::fread(buf.data(), 1, buf.size(), fp) != buf.size()) break;
      for (long i = 0; i < n_samp; ++i)
        out[i] = static_cast<float>(
            decode_frame(buf.data() + i * block, format, bits, channels));
      n_out = n_samp;
      break;
    } else {
      std::fseek(fp, (size + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
    }
  }
  std::fclose(fp);
  return n_out;
}

// Sliding-window CMVN (Kaldi apply-cmvn-sliding window clamping; the
// C16 online-normalization sibling). Third independent implementation
// next to tpufeat/reference/cpu.py::sliding_cmvn and the JAX op —
// direct per-frame double loops, no cumsum. feat/out: [n_frames x dim]
// row-major.
void tpufeat_sliding_cmvn_f64(const double* feat, long n_frames, int dim,
                              int window, int min_window, int center,
                              int norm_vars, double* out) {
  for (long t = 0; t < n_frames; ++t) {
    long ws, we;
    if (center) {
      ws = t - window / 2;
      we = ws + window;
    } else {
      ws = t - window;
      we = t + 1;
    }
    if (ws < 0) {
      we -= ws;
      ws = 0;
    }
    if (!center && we > t + 1) we = std::max(t + 1, (long)min_window);
    if (we > n_frames) {
      ws = std::max(ws - (we - n_frames), 0L);
      we = n_frames;
    }
    const long cnt = std::max(we - ws, 1L);
    for (int d = 0; d < dim; ++d) {
      double s = 0.0, s2 = 0.0;
      for (long u = ws; u < we; ++u) {
        const double v = feat[u * dim + d];
        s += v;
        s2 += v * v;
      }
      const double mean = s / cnt;
      double o = feat[t * dim + d] - mean;
      if (norm_vars) {
        double var = s2 / cnt - mean * mean;
        if (var < 1e-10) var = 1e-10;
        o /= std::sqrt(var);
      }
      out[t * dim + d] = o;
    }
  }
}

// Kaldi online2 OnlineCmvn (C16 online-normalization family; SURVEY §2.1
// config 3): per frame t the statistics are the trailing min(t+1, window)
// frames, smoothed — while the window is short — with up to speaker_frames
// worth of the speaker prior then up to global_frames of the global prior
// (the SmoothOnlineCmvnStats rule), total never exceeding `window`. Third
// independent implementation next to tpufeat/reference/cpu.py::online_cmvn
// and the JAX op — direct per-frame double loops, no cumsum. Priors are
// raw (count, sum[dim], sumsq[dim]); pass count=0 / nullptr for "none".
void tpufeat_online_cmvn_f64(const double* feat, long n_frames, int dim,
                             int window,
                             double spk_count, const double* spk_sum,
                             const double* spk_sumsq,
                             double glob_count, const double* glob_sum,
                             const double* glob_sumsq,
                             int speaker_frames, int global_frames,
                             int norm_vars, double* out) {
  for (long t = 0; t < n_frames; ++t) {
    const long ws = std::max(0L, t + 1 - window);
    const double c = static_cast<double>(t + 1 - ws);
    double ks = std::min(std::max(window - c, 0.0),
                         static_cast<double>(speaker_frames));
    ks = std::min(ks, spk_count);
    double kg = std::min(std::max(window - c - ks, 0.0),
                         static_cast<double>(global_frames));
    kg = std::min(kg, glob_count);
    const double n = c + ks + kg;
    for (int d = 0; d < dim; ++d) {
      double s = 0.0, s2 = 0.0;
      for (long u = ws; u <= t; ++u) {
        const double v = feat[u * dim + d];
        s += v;
        s2 += v * v;
      }
      if (ks > 0.0) {
        s += (ks / spk_count) * spk_sum[d];
        s2 += (ks / spk_count) * spk_sumsq[d];
      }
      if (kg > 0.0) {
        s += (kg / glob_count) * glob_sum[d];
        s2 += (kg / glob_count) * glob_sumsq[d];
      }
      const double mean = s / n;
      double o = feat[t * dim + d] - mean;
      if (norm_vars) {
        double var = s2 / n - mean * mean;
        if (var < 1e-10) var = 1e-10;
        o /= std::sqrt(var);
      }
      out[t * dim + d] = o;
    }
  }
}


// Gammatone/ERB filterbank (GFCC stage math; third independent
// implementation next to tpufeat.matrices.mel_filterbank's gammatone
// branch and its float64 use in reference/cpu.py): 4th-order |H|^2
// power-response weights at ERB-rate-spaced centers (Glasberg & Moore:
// E(f) = 21.4 log10(1 + 0.00437 f); b = 1.019 * 24.7 (4.37 fc/1000+1)).
// `out` must hold (n_fft/2 + 1) * n_out doubles, row-major [bin, band].
void tpufeat_gammatone_fb_f64(int sample_rate, int n_fft, int n_out,
                              double fmin, double fmax, double* out) {
  const int n_bins = n_fft / 2 + 1;
  const double elo = 21.4 * std::log10(1.0 + 0.00437 * fmin);
  const double ehi = 21.4 * std::log10(1.0 + 0.00437 * fmax);
  for (int m = 0; m < n_out; ++m) {
    const double e = elo + (ehi - elo) * (m + 1) / (n_out + 1);
    const double fc = (std::pow(10.0, e / 21.4) - 1.0) / 0.00437;
    const double b = 1.019 * 24.7 * (4.37 * fc / 1000.0 + 1.0);
    for (int k = 0; k < n_bins; ++k) {
      const double f = static_cast<double>(k) * sample_rate / n_fft;
      const double x = (f - fc) / b;
      const double h = 1.0 + x * x;          // |H|^2 = (1+x^2)^-4
      out[static_cast<size_t>(k) * n_out + m] = 1.0 / (h * h * h * h);
    }
  }
}

}  // extern "C"

// ---- multithreaded batch WAV loader (native data-loading path) ----
// Decodes `count` WAV files concurrently into a caller-provided arena of
// `cap` floats per row (shorter files zero-padded, longer ones rejected).
// lengths[i] receives the decoded sample count, or -1 on error. Returns the
// number of successfully decoded files. The reference's loader is serial C;
// feeding a >10,000x real-time accelerator needs the host side parallel.
#include <atomic>
#include <thread>

extern "C" long tpufeat_read_wav_batch(const char* const* paths, long count,
                                       float* arena, long cap,
                                       long* lengths, int* rates,
                                       int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  std::atomic<long> next(0), ok(0);
  auto worker = [&]() {
    while (true) {
      const long i = next.fetch_add(1);
      if (i >= count) return;
      float* row = arena + i * cap;
      int rate = 0;
      long n = tpufeat_read_wav(paths[i], row, cap, &rate);
      if (n >= 0) {
        for (long j = n; j < cap; ++j) row[j] = 0.0f;
        ok.fetch_add(1);
      }
      lengths[i] = n;
      rates[i] = rate;
    }
  };
  std::vector<std::thread> pool;
  const int n_pool = static_cast<int>(
      count < n_threads ? count : n_threads);
  pool.reserve(n_pool);
  for (int t = 0; t < n_pool; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}
