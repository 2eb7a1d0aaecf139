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

// ---------------------------------------------------------------------------
// FLAC decoder (subset sufficient for libFLAC-encoded corpora: 8/16/24-bit,
// 1-2 channels, constant/verbatim/fixed/LPC subframes, Rice & Rice2
// residuals, all stereo decorrelation modes). CRCs are not verified.
// ---------------------------------------------------------------------------
namespace flac {

struct BitReader {
    const uint8_t* buf;
    int64_t len;
    int64_t byte = 0;
    int bit = 0;  // bits consumed in current byte (0..7)
    bool error = false;

    bool eof() const { return byte >= len; }

    uint32_t read_bit() {
        if (byte >= len) { error = true; return 0; }
        uint32_t v = (buf[byte] >> (7 - bit)) & 1u;
        if (++bit == 8) { bit = 0; byte++; }
        return v;
    }

    uint64_t read_bits(int n) {
        uint64_t v = 0;
        for (int i = 0; i < n; i++) v = (v << 1) | read_bit();
        return v;
    }

    int64_t read_signed(int n) {
        if (n == 0) return 0;
        uint64_t v = read_bits(n);
        // sign extend
        if (v & (1ull << (n - 1))) v |= ~((1ull << n) - 1);
        return (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        while (!error && read_bit() == 0) q++;
        return q;
    }

    void align() { if (bit) { bit = 0; byte++; } }
};

static int64_t rice_decode(BitReader& br, int param) {
    uint32_t q = br.read_unary();
    uint64_t r = br.read_bits(param);
    uint64_t u = ((uint64_t)q << param) | r;
    // zigzag
    return (u & 1) ? -((int64_t)(u >> 1)) - 1 : (int64_t)(u >> 1);
}

// UTF-8-style coded number in frame header (frame or sample index).
static uint64_t read_utf8(BitReader& br) {
    uint64_t b0 = br.read_bits(8);
    int extra = 0;
    uint64_t v;
    if ((b0 & 0x80) == 0) return b0;
    else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
    else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
    else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
    else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
    else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
    else if (b0 == 0xFE) { extra = 6; v = 0; }
    else { br.error = true; return 0; }
    for (int i = 0; i < extra; i++) v = (v << 6) | (br.read_bits(8) & 0x3F);
    return v;
}

static bool decode_residual(BitReader& br, int order, int block_size,
                            std::vector<int64_t>& out) {
    int method = (int)br.read_bits(2);
    if (method > 1) return false;
    int param_bits = method == 0 ? 4 : 5;
    int escape = method == 0 ? 15 : 31;
    int part_order = (int)br.read_bits(4);
    int n_parts = 1 << part_order;
    int part_samples = block_size >> part_order;
    if (part_samples == 0 || part_samples * n_parts != block_size)
        return false;
    int idx = order;
    for (int p = 0; p < n_parts; p++) {
        int count = part_samples - (p == 0 ? order : 0);
        if (count < 0) return false;
        int param = (int)br.read_bits(param_bits);
        if (param == escape) {
            int raw_bits = (int)br.read_bits(5);
            for (int i = 0; i < count; i++)
                out[(size_t)idx++] = br.read_signed(raw_bits);
        } else {
            for (int i = 0; i < count; i++)
                out[(size_t)idx++] = rice_decode(br, param);
        }
        if (br.error) return false;
    }
    return true;
}

static const int kFixedOrders[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

static bool decode_subframe(BitReader& br, int block_size, int bps,
                            std::vector<int64_t>& out) {
    if (br.read_bit() != 0) return false;  // padding bit
    int type = (int)br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = 1 + (int)br.read_unary();
    bps -= wasted;
    out.assign((size_t)block_size, 0);

    if (type == 0) {                       // CONSTANT
        int64_t v = br.read_signed(bps);
        for (auto& o : out) o = v;
    } else if (type == 1) {                // VERBATIM
        for (auto& o : out) o = br.read_signed(bps);
    } else if (type >= 8 && type <= 12) {  // FIXED order 0-4
        int order = type - 8;
        for (int i = 0; i < order; i++) out[(size_t)i] = br.read_signed(bps);
        if (!decode_residual(br, order, block_size, out)) return false;
        for (int i = order; i < block_size; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++)
                pred += (int64_t)kFixedOrders[order][j] * out[(size_t)(i - 1 - j)];
            out[(size_t)i] += pred;
        }
    } else if (type >= 32) {               // LPC, order = (type & 31) + 1
        int order = (type & 31) + 1;
        for (int i = 0; i < order; i++) out[(size_t)i] = br.read_signed(bps);
        int precision = (int)br.read_bits(4) + 1;
        if (precision == 16) return false;  // 0b1111 is invalid
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        std::vector<int64_t> coef((size_t)order);
        for (int i = 0; i < order; i++) coef[(size_t)i] = br.read_signed(precision);
        if (!decode_residual(br, order, block_size, out)) return false;
        for (int i = order; i < block_size; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++)
                pred += coef[(size_t)j] * out[(size_t)(i - 1 - j)];
            out[(size_t)i] += pred >> shift;
        }
    } else {
        return false;
    }
    if (wasted)
        for (auto& o : out) o <<= wasted;
    return !br.error;
}

}  // namespace flac

// Decode FLAC from memory -> malloc'd float32 mono. Returns 0 on success.
extern "C" int gat_decode_flac(const uint8_t* buf, int64_t len,
                               float** out_samples, int64_t* out_n,
                               int32_t* out_sr) {
    using namespace flac;
    if (len < 8 || memcmp(buf, "fLaC", 4) != 0) return 1;
    BitReader br{buf, len};
    br.byte = 4;

    uint32_t sample_rate = 0;
    int channels = 0, bps = 0;
    uint64_t total_samples = 0;
    // metadata blocks
    for (;;) {
        uint32_t last = br.read_bit();
        uint32_t type = (uint32_t)br.read_bits(7);
        uint32_t blen = (uint32_t)br.read_bits(24);
        if (br.error) return 2;
        if (type == 0) {  // STREAMINFO
            br.read_bits(16); br.read_bits(16);        // block sizes
            br.read_bits(24); br.read_bits(24);        // frame sizes
            sample_rate = (uint32_t)br.read_bits(20);
            channels = (int)br.read_bits(3) + 1;
            bps = (int)br.read_bits(5) + 1;
            total_samples = br.read_bits(36);
            for (int i = 0; i < 16; i++) br.read_bits(8);  // md5
        } else {
            for (uint32_t i = 0; i < blen; i++) br.read_bits(8);
        }
        if (last) break;
    }
    if (sample_rate == 0 || channels < 1 || channels > 8 || bps < 4)
        return 3;

    std::vector<float> pcm;
    if (total_samples) pcm.reserve((size_t)total_samples);
    std::vector<std::vector<int64_t>> ch((size_t)channels);
    const double scale = 1.0 / (double)(1ll << (bps - 1));

    while (!br.eof()) {
        br.align();
        if (br.byte >= len) break;
        // frame sync 11111111 111110xx
        uint64_t sync = br.read_bits(14);
        if (br.error || br.eof()) break;
        if (sync != 0x3FFE) return 4;
        br.read_bit();                       // reserved
        br.read_bit();                       // blocking strategy
        int bs_code = (int)br.read_bits(4);
        int sr_code = (int)br.read_bits(4);
        int ch_code = (int)br.read_bits(4);
        int ss_code = (int)br.read_bits(3);
        br.read_bit();                       // reserved
        read_utf8(br);                       // frame/sample number
        int block_size;
        switch (bs_code) {
            case 1: block_size = 192; break;
            case 2: case 3: case 4: case 5:
                block_size = 576 << (bs_code - 2); break;
            case 6: block_size = (int)br.read_bits(8) + 1; break;
            case 7: block_size = (int)br.read_bits(16) + 1; break;
            default:
                if (bs_code >= 8) block_size = 256 << (bs_code - 8);
                else return 5;
        }
        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
        int frame_bps = bps;
        switch (ss_code) {
            case 0: break;
            case 1: frame_bps = 8; break;
            case 2: frame_bps = 12; break;
            case 4: frame_bps = 16; break;
            case 5: frame_bps = 20; break;
            case 6: frame_bps = 24; break;
            case 7: frame_bps = 32; break;
            default: return 6;
        }
        br.read_bits(8);                     // CRC-8 (unverified)

        int n_ch = channels;
        int assign = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
        if (ch_code <= 7) {
            n_ch = ch_code + 1;
        } else if (ch_code == 8) { n_ch = 2; assign = 1; }
        else if (ch_code == 9) { n_ch = 2; assign = 2; }
        else if (ch_code == 10) { n_ch = 2; assign = 3; }
        else return 7;

        for (int c = 0; c < n_ch; c++) {
            int sub_bps = frame_bps;
            // the side channel carries one extra bit
            if ((assign == 1 && c == 1) || (assign == 2 && c == 0) ||
                (assign == 3 && c == 1))
                sub_bps += 1;
            if (!decode_subframe(br, block_size, sub_bps, ch[(size_t)c]))
                return 8;
        }
        br.align();
        br.read_bits(16);                    // CRC-16 (unverified)
        if (br.error) return 9;

        // stereo decorrelation + mono mix
        for (int i = 0; i < block_size; i++) {
            double acc = 0.0;
            if (assign == 0) {
                for (int c = 0; c < n_ch; c++)
                    acc += (double)ch[(size_t)c][(size_t)i];
                acc /= n_ch;
            } else if (assign == 1) {        // left/side
                int64_t l = ch[0][(size_t)i], s = ch[1][(size_t)i];
                acc = ((double)l + (double)(l - s)) / 2.0;
            } else if (assign == 2) {        // right/side: L = S + R
                int64_t s = ch[0][(size_t)i], r = ch[1][(size_t)i];
                acc = ((double)(s + r) + (double)r) / 2.0;
            } else {                         // mid/side
                int64_t m = ch[0][(size_t)i], s = ch[1][(size_t)i];
                int64_t mm = (m << 1) | (s & 1);
                acc = ((double)((mm + s) >> 1) + (double)((mm - s) >> 1)) / 2.0;
            }
            pcm.push_back((float)(acc * scale));
        }
        if (total_samples && pcm.size() >= total_samples) break;
    }
    if (total_samples && pcm.size() > total_samples)
        pcm.resize((size_t)total_samples);
    float* o = (float*)malloc(sizeof(float) * pcm.size());
    if (!o) return 10;
    memcpy(o, pcm.data(), sizeof(float) * pcm.size());
    *out_samples = o;
    *out_n = (int64_t)pcm.size();
    *out_sr = (int32_t)sample_rate;
    return 0;
}
