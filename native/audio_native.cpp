// Native host-side audio data path for generative_audio_tpu.
//
// The reference's data layer gets its speed from third-party native wheels
// (soundfile/libsndfile decode, librosa/scipy resampling — SURVEY.md §2.7);
// this library provides the same functionality as a first-party C++ runtime
// component, exposed to Python via ctypes (generative_audio_tpu/data/native.py):
//
//   * WAV decode (PCM16 / PCM24 / PCM32 / IEEE float32, mono-mix)
//   * polyphase windowed-sinc resampler (Kaiser-windowed, matching
//     scipy.signal.resample_poly quality class)
//   * SNR mixing with dBFS normalization + clip rescue (the DNS trainer's
//     snr_mix, dataset_train.py:129-182)
//   * a std::thread pool batch decoder (decode+resample+fixed-length crop)
//
// Everything is plain C ABI; no Python headers required.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------
// Parses RIFF/WAVE from a memory buffer. Returns 0 on success.
// On success: *out_samples is malloc'd float32 mono (caller frees via
// gat_free), *out_n sample count, *out_sr sample rate.
static uint32_t rd_u32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
    return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

int gat_decode_wav(const uint8_t* buf, int64_t len, float** out_samples,
                   int64_t* out_n, int32_t* out_sr) {
    if (len < 44 || memcmp(buf, "RIFF", 4) != 0 ||
        memcmp(buf + 8, "WAVE", 4) != 0)
        return 1;
    int64_t pos = 12;
    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t sr = 0;
    const uint8_t* data = nullptr;
    int64_t data_len = 0;
    while (pos + 8 <= len) {
        const uint8_t* ck = buf + pos;
        uint32_t ck_len = rd_u32(ck + 4);
        if (memcmp(ck, "fmt ", 4) == 0 && ck_len >= 16) {
            fmt = rd_u16(ck + 8);
            channels = rd_u16(ck + 10);
            sr = rd_u32(ck + 12);
            bits = rd_u16(ck + 22);
        } else if (memcmp(ck, "data", 4) == 0) {
            data = ck + 8;
            data_len = std::min<int64_t>(ck_len, len - pos - 8);
        }
        pos += 8 + ck_len + (ck_len & 1);
    }
    if (!data || channels == 0 || sr == 0) return 2;
    if (fmt == 0xFFFE) fmt = 1;  // extensible: assume PCM layout
    int64_t bytes_per = bits / 8;
    if (bytes_per == 0) return 3;
    int64_t n_frames = data_len / (bytes_per * channels);
    float* out = (float*)malloc(sizeof(float) * (size_t)n_frames);
    if (!out) return 4;
    const double inv_ch = 1.0 / channels;
    for (int64_t i = 0; i < n_frames; i++) {
        double acc = 0.0;
        for (int c = 0; c < channels; c++) {
            const uint8_t* p = data + (i * channels + c) * bytes_per;
            double v = 0.0;
            if (fmt == 3 && bits == 32) {           // IEEE float
                float f;
                memcpy(&f, p, 4);
                v = f;
            } else if (bits == 16) {
                int16_t s = (int16_t)rd_u16(p);
                v = s / 32768.0;
            } else if (bits == 24) {
                int32_t s = (int32_t)((uint32_t)p[0] << 8 |
                                      (uint32_t)p[1] << 16 |
                                      (uint32_t)p[2] << 24) >> 8;
                v = s / 8388608.0;
            } else if (bits == 32) {
                int32_t s = (int32_t)rd_u32(p);
                v = s / 2147483648.0;
            } else {
                free(out);
                return 5;
            }
            acc += v;
        }
        out[i] = (float)(acc * inv_ch);
    }
    *out_samples = out;
    *out_n = n_frames;
    *out_sr = (int32_t)sr;
    return 0;
}

void gat_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampler
// ---------------------------------------------------------------------------
static double bessel_i0(double x) {
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 32; k++) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k));
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

static int64_t gcd64(int64_t a, int64_t b) {
    while (b) { int64_t t = a % b; a = b; b = t; }
    return a;
}

// Resample n samples from sr_in to sr_out. Returns number of output samples;
// *out is malloc'd (caller frees). half_taps per phase ~ 16, beta 8.555.
int64_t gat_resample(const float* in, int64_t n, int32_t sr_in,
                     int32_t sr_out, float** out) {
    if (sr_in == sr_out) {
        *out = (float*)malloc(sizeof(float) * (size_t)n);
        memcpy(*out, in, sizeof(float) * (size_t)n);
        return n;
    }
    int64_t g = gcd64(sr_in, sr_out);
    int64_t up = sr_out / g, down = sr_in / g;
    const int half = 16;  // taps per phase on each side
    int64_t taps = 2 * half * std::max<int64_t>(1, down) + 1;
    // prototype lowpass at cutoff = min(1/up, 1/down) of Nyquist*up
    double cutoff = 0.5 / (double)std::max(up, down);
    double beta = 8.555;
    double i0b = bessel_i0(beta);
    int64_t filt_len = taps * up;
    int64_t half_support = (filt_len - 1) / 2;
    std::vector<double> filt((size_t)filt_len);
    double center = (double)half_support;
    for (int64_t i = 0; i < filt_len; i++) {
        double t = (double)i - center;
        double x = 2.0 * t / (double)filt_len;  // [-1, 1]
        double win = bessel_i0(beta * sqrt(std::max(0.0, 1.0 - x * x))) / i0b;
        double arg = 2.0 * M_PI * cutoff * t;
        double sinc = (t == 0.0) ? 1.0 : sin(arg) / arg;
        filt[(size_t)i] = 2.0 * cutoff * (double)up * sinc * win;
    }
    int64_t n_out = (n * up) / down;
    float* o = (float*)malloc(sizeof(float) * (size_t)std::max<int64_t>(n_out, 1));
    for (int64_t m = 0; m < n_out; m++) {
        // output m sits at upsampled index m*down; input k contributes via
        // filter tap fi = up_idx - k*up + half_support.
        int64_t up_idx = m * down;
        int64_t k_min = std::max<int64_t>(0, (up_idx - half_support) / up - 1);
        int64_t k_max = std::min<int64_t>(n - 1, (up_idx + half_support) / up + 1);
        double acc = 0.0;
        for (int64_t k = k_min; k <= k_max; k++) {
            int64_t fi = up_idx - k * up + half_support;
            if (fi >= 0 && fi < filt_len) acc += filt[(size_t)fi] * in[k];
        }
        o[m] = (float)acc;
    }
    *out = o;
    return n_out;
}

// ---------------------------------------------------------------------------
// SNR mixing (DNS trainer semantics, dataset_train.py:129-182)
// ---------------------------------------------------------------------------
static void norm_amplitude(float* y, int64_t n) {
    float mx = 1e-6f;
    for (int64_t i = 0; i < n; i++) mx = std::max(mx, fabsf(y[i]));
    for (int64_t i = 0; i < n; i++) y[i] /= mx;
}
static float tailor_db_fs(float* y, int64_t n, float target_db) {
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) acc += (double)y[i] * y[i];
    float rms = (float)sqrt(acc / (double)n);
    float scalar = powf(10.f, target_db / 20.f) / (rms + 1e-6f);
    for (int64_t i = 0; i < n; i++) y[i] *= scalar;
    return scalar;
}

// clean/noise modified in place; noisy written to out (all length n).
void gat_snr_mix(float* clean, float* noise, float* out, int64_t n,
                 float snr, float target_db_fs, float noisy_target_db_fs) {
    norm_amplitude(clean, n);
    tailor_db_fs(clean, n, target_db_fs);
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) acc += (double)clean[i] * clean[i];
    float clean_rms = (float)sqrt(acc / (double)n);

    norm_amplitude(noise, n);
    tailor_db_fs(noise, n, target_db_fs);
    acc = 0.0;
    for (int64_t i = 0; i < n; i++) acc += (double)noise[i] * noise[i];
    float noise_rms = (float)sqrt(acc / (double)n);

    float snr_scalar = clean_rms / powf(10.f, snr / 20.f) / (noise_rms + 1e-6f);
    for (int64_t i = 0; i < n; i++) out[i] = clean[i] + noise[i] * snr_scalar;

    float noisy_scalar = tailor_db_fs(out, n, noisy_target_db_fs);
    for (int64_t i = 0; i < n; i++) clean[i] *= noisy_scalar;

    float mx = 0.f;
    for (int64_t i = 0; i < n; i++) mx = std::max(mx, fabsf(out[i]));
    if (mx > 0.999f) {
        float s = mx / (0.99f - 1e-6f);
        for (int64_t i = 0; i < n; i++) { out[i] /= s; clean[i] /= s; }
    }
}

// ---------------------------------------------------------------------------
// Threaded batch decode: decode + resample + fixed-length crop/pad
// ---------------------------------------------------------------------------
// paths: concatenated NUL-separated utf-8 file paths (n_files of them).
// out: [n_files, target_len] float32 (caller-allocated).
// offsets: per-file start sample AFTER resampling (for random subsampling;
// negative -> start at 0). Returns number of failures.
int gat_decode_batch(const char* paths, int32_t n_files, int32_t target_sr,
                     int64_t target_len, const int64_t* offsets, float* out,
                     int32_t n_threads) {
    std::vector<const char*> files((size_t)n_files);
    const char* p = paths;
    for (int i = 0; i < n_files; i++) {
        files[(size_t)i] = p;
        p += strlen(p) + 1;
    }
    std::atomic<int> next(0), failures(0);
    auto work = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n_files) return;
            float* dst = out + (int64_t)i * target_len;
            memset(dst, 0, sizeof(float) * (size_t)target_len);
            FILE* f = fopen(files[(size_t)i], "rb");
            if (!f) { failures++; continue; }
            fseek(f, 0, SEEK_END);
            long sz = ftell(f);
            fseek(f, 0, SEEK_SET);
            std::vector<uint8_t> buf((size_t)sz);
            size_t rd = fread(buf.data(), 1, (size_t)sz, f);
            fclose(f);
            if (rd != (size_t)sz) { failures++; continue; }
            float* samples = nullptr;
            int64_t n = 0;
            int32_t sr = 0;
            if (gat_decode_wav(buf.data(), sz, &samples, &n, &sr) != 0) {
                failures++;
                continue;
            }
            float* res = samples;
            int64_t rn = n;
            if (sr != target_sr) {
                float* r2 = nullptr;
                rn = gat_resample(samples, n, sr, target_sr, &r2);
                free(samples);
                res = r2;
            }
            int64_t off = offsets ? offsets[i] : 0;
            if (off < 0 || off >= rn) off = 0;
            int64_t take = std::min<int64_t>(target_len, rn - off);
            memcpy(dst, res + off, sizeof(float) * (size_t)take);
            free(res);
        }
    };
    int nt = std::max(1, (int)n_threads);
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; t++) threads.emplace_back(work);
    for (auto& t : threads) t.join();
    return failures.load();
}

}  // extern "C"
