// qpg_native: host-side native runtime for qpgesture_tpu.
//
// Native equivalents of the reference's performance-relevant C dependencies
// (SURVEY §2.9):
//   * python-Levenshtein  -> batched fixed-length edit distance (the host
//     oracle / fallback for the device wavefront kernel);
//   * LMDB + pyarrow      -> a memory-mapped append-only record store with
//     a trailing index (the training-sample cache);
//   * BVH motion parsing  -> bulk ASCII float parsing (strtod loop), the
//     hot path of BVH ingestion.
//
// Exposed as a plain C ABI consumed via ctypes (utils/native.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// Batched Levenshtein over fixed-length int32 code strings.
// a: (Q, L), b: (N, L), out: (Q, N) int32.
// ---------------------------------------------------------------------------
void qpg_levenshtein_matrix(const int32_t* a, int64_t q, const int32_t* b,
                            int64_t n, int64_t len, int32_t* out) {
    std::vector<int32_t> prev(len + 1), cur(len + 1);
    for (int64_t qi = 0; qi < q; ++qi) {
        const int32_t* sa = a + qi * len;
        for (int64_t ni = 0; ni < n; ++ni) {
            const int32_t* sb = b + ni * len;
            for (int64_t j = 0; j <= len; ++j) prev[j] = (int32_t)j;
            for (int64_t i = 1; i <= len; ++i) {
                cur[0] = (int32_t)i;
                const int32_t ca = sa[i - 1];
                for (int64_t j = 1; j <= len; ++j) {
                    int32_t cost = (ca == sb[j - 1]) ? 0 : 1;
                    int32_t v = prev[j] + 1;
                    int32_t w = cur[j - 1] + 1;
                    if (w < v) v = w;
                    int32_t d = prev[j - 1] + cost;
                    if (d < v) v = d;
                    cur[j] = v;
                }
                std::swap(prev, cur);
            }
            out[qi * n + ni] = prev[len];
        }
    }
}

// Variable-length pair variant (general oracle).
int32_t qpg_levenshtein(const int32_t* a, int64_t la, const int32_t* b,
                        int64_t lb) {
    std::vector<int32_t> prev(lb + 1), cur(lb + 1);
    for (int64_t j = 0; j <= lb; ++j) prev[j] = (int32_t)j;
    for (int64_t i = 1; i <= la; ++i) {
        cur[0] = (int32_t)i;
        for (int64_t j = 1; j <= lb; ++j) {
            int32_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
            int32_t v = prev[j] + 1;
            if (cur[j - 1] + 1 < v) v = cur[j - 1] + 1;
            if (prev[j - 1] + cost < v) v = prev[j - 1] + cost;
            cur[j] = v;
        }
        std::swap(prev, cur);
    }
    return prev[lb];
}

// ---------------------------------------------------------------------------
// Bulk ASCII float parsing: whitespace-separated doubles from a text buffer.
// Returns the number parsed (up to max_out).
// ---------------------------------------------------------------------------
int64_t qpg_parse_floats(const char* text, int64_t text_len, double* out,
                         int64_t max_out) {
    const char* p = text;
    const char* end = text + text_len;
    int64_t count = 0;
    while (p < end && count < max_out) {
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) {  // not a number: skip one char
            ++p;
            continue;
        }
        out[count++] = v;
        p = next;
    }
    return count;
}

// ---------------------------------------------------------------------------
// Record store: append-only records + trailing index, mmap'd reads.
// Layout: [magic u64][records...][index: u64 offsets, u64 lengths]
//         [n_records u64][index_offset u64]
// ---------------------------------------------------------------------------
struct QpgWriter {
    FILE* f;
    std::vector<uint64_t> offsets;
    std::vector<uint64_t> lengths;
    uint64_t pos;
};

static const uint64_t QPG_MAGIC = 0x51504753544f5245ULL;  // "QPGSTORE"

void* qpg_store_create(const char* path) {
    FILE* f = fopen(path, "wb");
    if (!f) return nullptr;
    QpgWriter* w = new QpgWriter{f, {}, {}, 0};
    fwrite(&QPG_MAGIC, 8, 1, f);
    w->pos = 8;
    return w;
}

int64_t qpg_store_append(void* handle, const void* data, int64_t len) {
    QpgWriter* w = (QpgWriter*)handle;
    w->offsets.push_back(w->pos);
    w->lengths.push_back((uint64_t)len);
    if (fwrite(data, 1, (size_t)len, w->f) != (size_t)len) return -1;
    w->pos += (uint64_t)len;
    return (int64_t)w->offsets.size() - 1;
}

int64_t qpg_store_finalize(void* handle) {
    QpgWriter* w = (QpgWriter*)handle;
    uint64_t index_off = w->pos;
    uint64_t n = w->offsets.size();
    fwrite(w->offsets.data(), 8, n, w->f);
    fwrite(w->lengths.data(), 8, n, w->f);
    fwrite(&n, 8, 1, w->f);
    fwrite(&index_off, 8, 1, w->f);
    fclose(w->f);
    delete w;
    return (int64_t)n;
}

struct QpgReader {
    int fd;
    uint8_t* base;
    uint64_t size;
    uint64_t n;
    const uint64_t* offsets;
    const uint64_t* lengths;
};

void* qpg_store_open(const char* path) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size < 24) { close(fd); return nullptr; }
    uint64_t size = (uint64_t)st.st_size;
    uint8_t* base = (uint8_t*)mmap(nullptr, size, PROT_READ, MAP_SHARED, fd,
                                   0);
    if (base == MAP_FAILED) { close(fd); return nullptr; }
    uint64_t magic;
    memcpy(&magic, base, 8);
    if (magic != QPG_MAGIC) { munmap(base, size); close(fd); return nullptr; }
    uint64_t n, index_off;
    memcpy(&n, base + size - 16, 8);
    memcpy(&index_off, base + size - 8, 8);
    // Validate the tail-of-file index against the mapped size before
    // dereferencing: a truncated or corrupt store must fail to open, not
    // read out of bounds. Layout: [data][offsets 8n][lengths 8n][n][off].
    if (index_off < 8 || index_off > size ||
        n > (size - index_off) / 16 ||
        index_off + 16 * n + 16 != size) {
        munmap(base, size); close(fd); return nullptr;
    }
    const uint64_t* offsets = (const uint64_t*)(base + index_off);
    const uint64_t* lengths = (const uint64_t*)(base + index_off + 8 * n);
    for (uint64_t i = 0; i < n; ++i) {
        if (offsets[i] > index_off || lengths[i] > index_off - offsets[i]) {
            munmap(base, size); close(fd); return nullptr;
        }
    }
    QpgReader* r = new QpgReader{fd, base, size, n, offsets, lengths};
    return r;
}

int64_t qpg_store_count(void* handle) {
    return (int64_t)((QpgReader*)handle)->n;
}

int64_t qpg_store_record_len(void* handle, int64_t i) {
    QpgReader* r = (QpgReader*)handle;
    if (i < 0 || (uint64_t)i >= r->n) return -1;
    return (int64_t)r->lengths[i];
}

int64_t qpg_store_read(void* handle, int64_t i, void* out, int64_t cap) {
    QpgReader* r = (QpgReader*)handle;
    if (i < 0 || (uint64_t)i >= r->n) return -1;
    uint64_t len = r->lengths[i];
    if ((int64_t)len > cap) return -1;
    memcpy(out, r->base + r->offsets[i], len);
    return (int64_t)len;
}

// Zero-copy pointer access (valid while the store stays open).
const void* qpg_store_record_ptr(void* handle, int64_t i) {
    QpgReader* r = (QpgReader*)handle;
    if (i < 0 || (uint64_t)i >= r->n) return nullptr;
    return r->base + r->offsets[i];
}

void qpg_store_close(void* handle) {
    QpgReader* r = (QpgReader*)handle;
    munmap(r->base, r->size);
    close(r->fd);
    delete r;
}


// ---------------------------------------------------------------------------
// WORLD DIO + StoneMask pitch tracking.
//
// C++ transcription of pipelines/pitch_world.py (itself a from-scratch
// transcription of M. Morise's WORLD dio.cc / stonemask.cc — the algorithm
// the reference calls through pyworld at process/speech_feat.py:26-33).
// The two implementations are cross-verified in tests/test_native.py:
// identical voiced/unvoiced masks and f0 agreement to <1e-6 Hz relative on
// speech-shaped signals. NumPy semantics preserved deliberately:
// np.convolve('same') window alignment, np.interp edge clamping, and
// banker's rounding (nearbyint) where python round()/np.round are used.
// ---------------------------------------------------------------------------

namespace qpg_pitch {

constexpr double kEps = 1e-12;
const double kBigScore = 4.4942328371557893e+307;  // float64 max / 4

static std::vector<double> nuttall(int n) {
  std::vector<double> w(n);
  for (int i = 0; i < n; ++i) {
    double t = i * (2.0 * M_PI / (n - 1));
    w[i] = 0.355768 - 0.487396 * std::cos(t) + 0.144232 * std::cos(2 * t) -
           0.012604 * std::cos(3 * t);
  }
  return w;
}

// np.convolve(y, w, mode="same"): full conv, middle n kept (offset (m-1)/2).
static std::vector<double> convolve_same(const std::vector<double>& y,
                                         std::vector<double> w) {
  double s = 0.0;
  for (double v : w) s += v;
  for (double& v : w) v /= s;
  long n = (long)y.size(), m = (long)w.size();
  std::vector<double> out(n, 0.0);
  long off = (m - 1) / 2;
  for (long i = 0; i < n; ++i) {
    long k = i + off;  // index into the full convolution
    double acc = 0.0;
    long j0 = k - m + 1 > 0 ? k - m + 1 : 0;
    long j1 = k < n - 1 ? k : n - 1;
    for (long j = j0; j <= j1; ++j) acc += y[j] * w[k - j];
    out[i] = acc;
  }
  return out;
}

struct Track {
  std::vector<double> loc, f0;
};

// Falling-edge zero crossings (dio.cc ZeroCrossingEngine).
static Track zero_crossings(const std::vector<double>& sig, int fs) {
  Track t;
  long n = (long)sig.size();
  std::vector<double> fine;
  for (long i = 0; i + 1 < n; ++i) {
    if (sig[i] > 0 && sig[i + 1] <= 0) {
      double denom = sig[i + 1] - sig[i];
      if (std::fabs(denom) < kEps) denom = kEps;
      fine.push_back(i + sig[i] / -denom);
    }
  }
  if ((long)fine.size() < 3) return t;
  for (size_t i = 0; i + 1 < fine.size(); ++i) {
    double interval = fine[i + 1] - fine[i];
    if (interval < kEps) interval = kEps;
    t.f0.push_back(fs / interval);
    t.loc.push_back((fine[i] + fine[i + 1]) / 2.0 / fs);
  }
  return t;
}

// np.interp: clamped linear interpolation.
static void interp_track(const Track& t, const std::vector<double>& pos,
                         std::vector<double>& out) {
  long n = (long)pos.size(), m = (long)t.loc.size();
  out.assign(n, 0.0);
  if (m < 2) return;
  long j = 0;
  for (long i = 0; i < n; ++i) {
    double p = pos[i];
    if (p <= t.loc[0]) { out[i] = t.f0[0]; continue; }
    if (p >= t.loc[m - 1]) { out[i] = t.f0[m - 1]; continue; }
    while (j + 1 < m && t.loc[j + 1] < p) ++j;
    // re-scan from start if positions ever went backwards (they don't)
    double x0 = t.loc[j], x1 = t.loc[j + 1];
    out[i] = t.f0[j] + (t.f0[j + 1] - t.f0[j]) * (p - x0) / (x1 - x0);
  }
}

static void band_candidates(const std::vector<double>& filtered, int fs,
                            double boundary_f0, double f0_floor,
                            double f0_ceil, const std::vector<double>& pos,
                            double* cand, double* score) {
  long nf = (long)pos.size();
  std::vector<double> d(filtered.size() ? filtered.size() - 1 : 0);
  for (size_t i = 0; i + 1 < filtered.size(); ++i)
    d[i] = filtered[i + 1] - filtered[i];
  std::vector<double> neg(filtered.size()), negd(d.size());
  for (size_t i = 0; i < filtered.size(); ++i) neg[i] = -filtered[i];
  for (size_t i = 0; i < d.size(); ++i) negd[i] = -d[i];
  Track tracks[4] = {zero_crossings(filtered, fs), zero_crossings(neg, fs),
                     zero_crossings(d, fs), zero_crossings(negd, fs)};
  for (int k = 0; k < 4; ++k) {
    if ((long)tracks[k].loc.size() < 2) {
      for (long i = 0; i < nf; ++i) { cand[i] = 0.0; score[i] = kBigScore; }
      return;
    }
  }
  std::vector<double> interp[4];
  for (int k = 0; k < 4; ++k) interp_track(tracks[k], pos, interp[k]);
  for (long i = 0; i < nf; ++i) {
    double mean = (interp[0][i] + interp[1][i] + interp[2][i] +
                   interp[3][i]) / 4.0;
    double ss = 0.0;
    for (int k = 0; k < 4; ++k) {
      double dd = interp[k][i] - mean;
      ss += dd * dd;
    }
    double dev = std::sqrt(ss / 3.0);
    double sc = dev / (mean + kEps);
    bool bad = mean > boundary_f0 || mean < boundary_f0 / 2.0 ||
               mean > f0_ceil || mean < f0_floor;
    cand[i] = bad ? 0.0 : mean;
    score[i] = bad ? kBigScore : sc;
  }
}

static void fix_step1(std::vector<double>& f0, long vrm,
                      double allowed_range) {
  long n = (long)f0.size();
  for (long i = 0; i < vrm && i < n; ++i) f0[i] = 0.0;
  for (long i = n - vrm < 0 ? 0 : n - vrm; i < n; ++i) f0[i] = 0.0;
  std::vector<double> prev(n, 0.0);
  for (long i = 1; i < n; ++i) prev[i] = f0[i - 1];
  for (long i = 0; i < n; ++i)
    if (std::fabs(f0[i] - prev[i]) / (f0[i] + kEps) > allowed_range)
      f0[i] = 0.0;
}

static void fix_step2(std::vector<double>& f0, long vrm) {
  long center = (vrm - 1) / 2;
  if (center == 0) return;
  long n = (long)f0.size();
  std::vector<char> zero(n), bad(n, 0);
  for (long i = 0; i < n; ++i) zero[i] = f0[i] == 0.0;
  for (long off = -center; off <= center; ++off) {
    for (long i = 0; i < n; ++i) {
      long j = i + off;  // np.roll(zero, -off)[i] == zero[i + off]
      bad[i] |= (j < 0 || j >= n) ? 1 : zero[j];
    }
  }
  for (long i = 0; i < n; ++i)
    if (bad[i]) f0[i] = 0.0;
  for (long i = 0; i < center && i < n; ++i) f0[i] = 0.0;
  for (long i = n - center < 0 ? 0 : n - center; i < n; ++i) f0[i] = 0.0;
}

// cands: (n_bands, n_frames) row-major.
static double select_best_f0(double ref, const double* cands, long n_bands,
                             long stride, long col, double allowed_range) {
  double best_err = INFINITY;
  double best = 0.0;
  for (long b = 0; b < n_bands; ++b) {
    double c = cands[b * stride + col];
    double err = c > 0 ? std::fabs(c - ref) / (ref + kEps) : INFINITY;
    if (err < best_err) { best_err = err; best = c; }
  }
  if (best_err > allowed_range) return 0.0;
  return best;
}

static void fix_step3(std::vector<double>& f0, const double* cands,
                      long n_bands, long stride, double allowed_range,
                      bool reversed) {
  long n = (long)f0.size();
  auto col = [&](long i) { return reversed ? n - 1 - i : i; };
  auto val = [&](long i) -> double& { return f0[reversed ? n - 1 - i : i]; };
  for (long i = 1; i < n; ++i) {
    if (val(i) != 0.0 || val(i - 1) == 0.0) continue;
    double prev2 = (i >= 2 && val(i - 2) > 0) ? val(i - 2) : val(i - 1);
    double ref = val(i - 1) * 2.0 - prev2;
    long j = i;
    while (j < n && val(j) == 0.0) {
      double best = select_best_f0(ref, cands, n_bands, stride, col(j),
                                   allowed_range);
      if (best == 0.0) break;
      double prev = val(j - 1) > 0 ? val(j - 1) : best;
      val(j) = best;
      ref = best * 2.0 - prev;
      ++j;
    }
  }
}

// In-place iterative radix-2 complex FFT (sizes are powers of two here).
static void fft_inplace(std::vector<double>& re, std::vector<double>& im) {
  long n = (long)re.size();
  for (long i = 1, j = 0; i < n; ++i) {
    long bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
  }
  for (long len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * M_PI / len;
    double wr = std::cos(ang), wi = std::sin(ang);
    for (long i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (long k = 0; k < len / 2; ++k) {
        double ur = re[i + k], ui = im[i + k];
        double vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        double vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr; im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr; im[i + k + len / 2] = ui - vi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

static double refine_frame(const double* x, long nx, int fs, double position,
                           double f0) {
  if (f0 <= 0.0) return 0.0;
  long half = (long)std::ceil(3.0 * fs / f0 / 2.0);
  long seg_len = 2 * half + 1;
  double window_len_t = (double)seg_len / fs;
  long fft_size = 1L << (long)(std::ceil(std::log2((double)seg_len)) + 1);

  std::vector<double> seg(seg_len), main_w(seg_len), diff_w(seg_len);
  for (long i = 0; i < seg_len; ++i) {
    double bt = (double)(i - half) / fs;
    long idx = (long)std::nearbyint((position + bt) * fs);
    if (idx < 0) idx = 0;
    if (idx > nx - 1) idx = nx - 1;
    seg[i] = x[idx];
    double phase = 2.0 * M_PI * bt / window_len_t;
    main_w[i] = 0.42 + 0.5 * std::cos(phase) + 0.08 * std::cos(2 * phase);
  }
  for (long i = 1; i + 1 < seg_len; ++i)
    diff_w[i] = -(main_w[i + 1] - main_w[i - 1]) / 2.0;
  diff_w[0] = -main_w[1] / 2.0;
  diff_w[seg_len - 1] = main_w[seg_len - 2] / 2.0;

  std::vector<double> re_m(fft_size, 0.0), im_m(fft_size, 0.0);
  std::vector<double> re_d(fft_size, 0.0), im_d(fft_size, 0.0);
  for (long i = 0; i < seg_len; ++i) {
    re_m[i] = seg[i] * main_w[i];
    re_d[i] = seg[i] * diff_w[i];
  }
  fft_inplace(re_m, im_m);
  fft_inplace(re_d, im_d);

  long n_bins = fft_size / 2 + 1;
  long n_harm = (long)(fs / 2.0 / f0);
  if (n_harm > 6) n_harm = 6;
  if (n_harm < 1) return f0;
  double num = 0.0, den = 0.0;
  for (long k = 1; k <= n_harm; ++k) {
    long j = (long)std::nearbyint(f0 * k * fft_size / fs);
    if (j <= 0 || j >= n_bins) continue;
    double power = re_m[j] * re_m[j] + im_m[j] * im_m[j];
    double numerator = re_m[j] * im_d[j] - im_m[j] * re_d[j];
    double p = power > kEps ? power : kEps;
    double inst = (double)j * fs / fft_size +
                  numerator / p * fs / (2.0 * M_PI);
    double amp = std::sqrt(power);
    num += amp * inst;
    den += amp * k;
  }
  if (den <= kEps) return f0;
  double refined = num / den;
  if (std::fabs(refined - f0) / f0 > 0.2) return f0;
  return refined;
}

}  // namespace qpg_pitch

// DIO + StoneMask: x (n float64 samples), frame_period in ms. Writes up to
// cap f0 values into f0_out; returns the frame count (or -1 if cap is too
// small). Unvoiced frames are 0, matching pyworld.
long qpg_pitch_world(const double* x, long n, int fs, double frame_period,
                     double f0_floor, double f0_ceil,
                     double channels_in_octave, double allowed_range,
                     double* f0_out, long cap) {
  using namespace qpg_pitch;
  long n_frames = (long)(1000.0 * n / fs / frame_period) + 1;
  if (n_frames > cap || n <= 0) return -1;
  std::vector<double> pos(n_frames);
  for (long i = 0; i < n_frames; ++i) pos[i] = i * frame_period / 1000.0;

  double mean = 0.0;
  for (long i = 0; i < n; ++i) mean += x[i];
  mean /= n;
  std::vector<double> xm(n);
  for (long i = 0; i < n; ++i) xm[i] = x[i] - mean;
  // low-cut: delta minus a normalized-Nuttall low-pass
  long lc = (long)std::nearbyint((double)fs / 50.0) * 2 + 1;
  std::vector<double> low = convolve_same(xm, nuttall((int)lc));
  std::vector<double> y(n);
  for (long i = 0; i < n; ++i) y[i] = xm[i] - low[i];

  long n_bands =
      1 + (long)(std::log2(f0_ceil / f0_floor) * channels_in_octave);
  std::vector<double> cands(n_bands * n_frames, 0.0);
  std::vector<double> scores(n_bands * n_frames, kBigScore);
  for (long b = 0; b < n_bands; ++b) {
    double bf0 = f0_floor * std::pow(2.0, (b + 1) / channels_in_octave);
    long halfw = (long)std::nearbyint(fs / bf0 / 2.0);
    std::vector<double> filtered = convolve_same(y, nuttall((int)(halfw * 4)));
    band_candidates(filtered, fs, bf0, f0_floor, f0_ceil, pos,
                    &cands[b * n_frames], &scores[b * n_frames]);
  }

  std::vector<double> best(n_frames);
  for (long i = 0; i < n_frames; ++i) {
    long bb = 0;
    for (long b = 1; b < n_bands; ++b)
      if (scores[b * n_frames + i] < scores[bb * n_frames + i]) bb = b;
    best[i] = cands[bb * n_frames + i];
  }

  long vrm = (long)(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1;
  long vrm_cap = n_frames / 2 > 1 ? n_frames / 2 : 1;
  if (vrm > vrm_cap) vrm = vrm_cap;
  fix_step1(best, vrm, allowed_range);
  fix_step2(best, vrm);
  fix_step3(best, cands.data(), n_bands, n_frames, allowed_range, false);
  fix_step3(best, cands.data(), n_bands, n_frames, allowed_range, true);

  for (long i = 0; i < n_frames; ++i)
    f0_out[i] = refine_frame(x, n, fs, pos[i], best[i]);
  return n_frames;
}

}  // extern "C"
