// ws_audio: native audio ingest for WhisperSeg-TPU.
//
// TPU-native counterpart of the C libraries the reference leans on for audio
// I/O (libsndfile via soundfile, soxr via librosa — reference datautils.py:116,
// audio_utils.py:19-30). Provides:
//   * RIFF/WAV decoding (PCM 8/16/24/32-bit and IEEE float 32/64)
//   * float32 conversion with librosa-compatible scaling
//   * polyphase windowed-sinc (Kaiser) resampling, scipy.resample_poly-class
//     quality
// Exposed as a C ABI consumed from Python via ctypes
// (whisperseg_tpu/audio/native.py). The Python numpy implementation remains as
// the reference fallback; both are covered by the same tests.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <vector>

namespace {

struct WavData {
    std::vector<float> samples;  // interleaved
    int n_frames = 0;
    int n_channels = 0;
    int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

bool parse_wav(const uint8_t* buf, size_t len, WavData& out) {
    if (len < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
        return false;
    size_t pos = 12;
    uint16_t fmt_tag = 0, n_channels = 0, bits = 0;
    uint32_t sr = 0;
    const uint8_t* data = nullptr;
    size_t data_len = 0;
    while (pos + 8 <= len) {
        const uint8_t* chunk = buf + pos;
        uint32_t size = rd_u32(chunk + 4);
        if (pos + 8 + size > len) size = (uint32_t)(len - pos - 8);
        if (memcmp(chunk, "fmt ", 4) == 0 && size >= 16) {
            fmt_tag = rd_u16(chunk + 8);
            n_channels = rd_u16(chunk + 10);
            sr = rd_u32(chunk + 12);
            bits = rd_u16(chunk + 22);
            if (fmt_tag == 0xFFFE && size >= 40)  // WAVE_FORMAT_EXTENSIBLE
                fmt_tag = rd_u16(chunk + 32);
        } else if (memcmp(chunk, "data", 4) == 0) {
            data = chunk + 8;
            data_len = size;
        }
        pos += 8 + size + (size & 1);
    }
    if (!data || n_channels == 0 || sr == 0 || bits == 0) return false;

    size_t bytes_per_sample = bits / 8;
    size_t n_samples = data_len / bytes_per_sample;
    out.n_channels = n_channels;
    out.sample_rate = (int)sr;
    out.n_frames = (int)(n_samples / n_channels);
    n_samples = (size_t)out.n_frames * n_channels;
    out.samples.resize(n_samples);

    if (fmt_tag == 1) {  // integer PCM
        switch (bits) {
            case 8:
                for (size_t i = 0; i < n_samples; i++)
                    out.samples[i] = ((float)data[i] - 128.0f) / 128.0f;
                break;
            case 16:
                for (size_t i = 0; i < n_samples; i++) {
                    int16_t v = (int16_t)rd_u16(data + 2 * i);
                    out.samples[i] = (float)v / 32768.0f;
                }
                break;
            case 24:
                for (size_t i = 0; i < n_samples; i++) {
                    const uint8_t* p = data + 3 * i;
                    int32_t v = (int32_t)p[0] | ((int32_t)p[1] << 8) |
                                ((int32_t)p[2] << 16);
                    if (v & 0x800000) v -= 0x1000000;
                    out.samples[i] = (float)v / 8388608.0f;
                }
                break;
            case 32:
                for (size_t i = 0; i < n_samples; i++) {
                    int32_t v = (int32_t)rd_u32(data + 4 * i);
                    out.samples[i] = (float)v / 2147483648.0f;
                }
                break;
            default:
                return false;
        }
    } else if (fmt_tag == 3) {  // IEEE float
        if (bits == 32) {
            for (size_t i = 0; i < n_samples; i++) {
                float v;
                memcpy(&v, data + 4 * i, 4);
                out.samples[i] = v;
            }
        } else if (bits == 64) {
            for (size_t i = 0; i < n_samples; i++) {
                double v;
                memcpy(&v, data + 8 * i, 8);
                out.samples[i] = (float)v;
            }
        } else {
            return false;
        }
    } else {
        return false;
    }
    return true;
}

// ------------------------------------------------------------- Kaiser resample

double bessel_i0(double x) {
    // series expansion, converges quickly for the beta range used here
    double sum = 1.0, term = 1.0;
    double half_x = x / 2.0;
    for (int k = 1; k < 64; k++) {
        term *= (half_x / k) * (half_x / k);
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

uint64_t gcd_u64(uint64_t a, uint64_t b) {
    while (b) { uint64_t t = a % b; a = b; b = t; }
    return a;
}

// Polyphase resampling of one channel, scipy.signal.resample_poly semantics
// (kaiser beta 5.0 window, 10*max(up,down) half-length, output length
// ceil(n*up/down)).
void resample_mono(const float* x, int64_t n_in, int up, int down,
                   std::vector<float>& y) {
    if (up == down) {
        y.assign(x, x + n_in);
        return;
    }
    const int max_rate = up > down ? up : down;
    const int half_len = 10 * max_rate;
    const int64_t n_taps = 2 * (int64_t)half_len + 1;
    const double beta = 5.0;
    const double fc = 1.0 / max_rate;  // normalized cutoff (Nyquist = 1)

    std::vector<double> h((size_t)n_taps);
    const double i0b = bessel_i0(beta);
    double dc = 0.0;
    for (int64_t i = 0; i < n_taps; i++) {
        const double m = (double)(i - half_len);
        double sinc = (m == 0.0) ? fc : sin(M_PI * fc * m) / (M_PI * m);
        const double r = m / (double)half_len;
        const double w = bessel_i0(beta * sqrt(1.0 - r * r > 0 ? 1.0 - r * r : 0.0)) / i0b;
        h[(size_t)i] = sinc * w;
        dc += h[(size_t)i];
    }
    // normalize DC gain to exactly 1 (scipy firwin scale=True), then apply the
    // up-sampling gain
    for (int64_t i = 0; i < n_taps; i++) h[(size_t)i] *= (double)up / dc;

    const int64_t n_out = (n_in * up + down - 1) / down;
    y.assign((size_t)n_out, 0.0f);

    // y[t] = sum_m x[m] * h[t*down - m*up + half_len]
    for (int64_t t = 0; t < n_out; t++) {
        const int64_t center = t * (int64_t)down;
        int64_t m_lo = (center - half_len + up - 1) / up;  // ceil
        int64_t m_hi = (center + half_len) / up;           // floor
        if (m_lo < 0) m_lo = 0;
        if (m_hi >= n_in) m_hi = n_in - 1;
        double acc = 0.0;
        for (int64_t m = m_lo; m <= m_hi; m++) {
            acc += (double)x[m] * h[(size_t)(center - m * up + half_len)];
        }
        y[(size_t)t] = (float)acc;
    }
}

}  // namespace

extern "C" {

// Decode a WAV file from memory. Returns 0 on success. Caller frees *out with
// ws_free. Samples are interleaved float32 in [-1, 1).
int ws_decode_wav(const uint8_t* buf, int64_t len, float** out,
                  int32_t* n_frames, int32_t* n_channels, int32_t* sample_rate) {
    WavData wav;
    if (!parse_wav(buf, (size_t)len, wav)) return -1;
    float* p = (float*)malloc(wav.samples.size() * sizeof(float));
    if (!p) return -2;
    memcpy(p, wav.samples.data(), wav.samples.size() * sizeof(float));
    *out = p;
    *n_frames = wav.n_frames;
    *n_channels = wav.n_channels;
    *sample_rate = wav.sample_rate;
    return 0;
}

// Read + decode a WAV file from disk.
int ws_read_wav(const char* path, float** out, int32_t* n_frames,
                int32_t* n_channels, int32_t* sample_rate) {
    FILE* f = fopen(path, "rb");
    if (!f) return -3;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)size);
    size_t got = fread(buf.data(), 1, (size_t)size, f);
    fclose(f);
    if ((long)got != size) return -4;
    return ws_decode_wav(buf.data(), size, out, n_frames, n_channels, sample_rate);
}

// Polyphase resample (mono float32). Returns number of output samples, or < 0
// on error. Caller frees *out with ws_free.
int64_t ws_resample(const float* in, int64_t n_in, int32_t sr_in, int32_t sr_out,
                    float** out) {
    if (sr_in <= 0 || sr_out <= 0 || n_in < 0) return -1;
    uint64_t g = gcd_u64((uint64_t)sr_in, (uint64_t)sr_out);
    int up = (int)(sr_out / g), down = (int)(sr_in / g);
    std::vector<float> y;
    resample_mono(in, n_in, up, down, y);
    float* p = (float*)malloc(y.size() * sizeof(float));
    if (!p) return -2;
    memcpy(p, y.data(), y.size() * sizeof(float));
    *out = p;
    return (int64_t)y.size();
}

void ws_free(float* p) { free(p); }

}  // extern "C"
