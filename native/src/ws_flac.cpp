// ws_flac: native FLAC decoder for WhisperSeg-TPU.
//
// The pure-Python decoder (whisperseg_tpu/audio/flac.py) is the reference
// implementation (~0.2 Msamples/s); this C++ port decodes at >100x that rate,
// which matters for long high-rate bioacoustic recordings (a 10-minute
// 300 kHz mouse session is 180 M samples). Same subset of the spec as the
// Python decoder: STREAMINFO, fixed + LPC predictors, Rice/Rice2 residuals
// with partitioning and escapes, all four channel assignments, wasted bits.
// Bit-exact agreement between the two decoders is asserted in
// tests/test_audio_formats.py.
//
// C ABI mirrors ws_audio.cpp: caller frees the returned buffer via ws_free.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t len;        // bytes
    size_t pos = 0;    // bits
    bool fail = false;

    BitReader(const uint8_t* d, size_t l, size_t start_byte)
        : data(d), len(l), pos(start_byte * 8) {}

    bool eof(size_t need_bits = 1) const { return pos + need_bits > len * 8; }

    uint64_t read_uint(int n) {
        if (eof(n)) { fail = true; return 0; }
        uint64_t v = 0;
        int got = 0;
        while (got < n) {
            size_t byte = pos >> 3;
            int bit_off = pos & 7;
            int avail = 8 - bit_off;
            int take = n - got < avail ? n - got : avail;
            uint32_t cur = (data[byte] >> (avail - take)) & ((1u << take) - 1);
            v = (v << take) | cur;
            pos += take;
            got += take;
        }
        return v;
    }

    int64_t read_sint(int n) {
        uint64_t v = read_uint(n);
        if (n < 64 && (v & (1ull << (n - 1)))) return (int64_t)v - (1ll << n);
        return (int64_t)v;
    }

    int read_unary() {
        int q = 0;
        while (true) {
            if (eof()) { fail = true; return 0; }
            size_t byte = pos >> 3;
            int bit_off = pos & 7;
            uint8_t rest = (uint8_t)(data[byte] << bit_off);
            if (rest == 0) {                  // rest of byte is zeros
                q += 8 - bit_off;
                pos += 8 - bit_off;
                continue;
            }
            int lead = __builtin_clz((uint32_t)rest << 24);
            q += lead;
            pos += lead + 1;                  // consume zeros + the one
            return q;
        }
    }

    int64_t read_rice(int k) {
        int q = read_unary();
        uint64_t r = k ? read_uint(k) : 0;
        uint64_t v = ((uint64_t)q << k) | r;
        return (int64_t)(v >> 1) ^ -(int64_t)(v & 1);  // zigzag
    }

    void align_byte() { pos = (pos + 7) & ~(size_t)7; }
};

uint32_t rd_be24(const uint8_t* p) {
    return ((uint32_t)p[0] << 16) | ((uint32_t)p[1] << 8) | p[2];
}

struct StreamInfo {
    int sr = 0, channels = 0, bps = 0;
    uint64_t total_samples = 0;
    size_t frames_offset = 0;
};

bool parse_streaminfo(const uint8_t* d, size_t len, StreamInfo& out) {
    if (len < 8 || memcmp(d, "fLaC", 4) != 0) return false;
    size_t pos = 4;
    bool have = false;
    while (pos + 4 <= len) {
        uint8_t header = d[pos];
        bool last = header & 0x80;
        int type = header & 0x7F;
        uint32_t size = rd_be24(d + pos + 1);
        if (pos + 4 + size > len) return false;
        if (type == 0 && size >= 34) {
            const uint8_t* b = d + pos + 4;
            out.sr = ((uint32_t)b[10] << 12) | ((uint32_t)b[11] << 4) |
                     (b[12] >> 4);
            out.channels = ((b[12] >> 1) & 0x7) + 1;
            out.bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
            out.total_samples = (((uint64_t)(b[13] & 0xF)) << 32) |
                                ((uint64_t)b[14] << 24) |
                                ((uint64_t)b[15] << 16) |
                                ((uint64_t)b[16] << 8) | b[17];
            have = true;
        }
        pos += 4 + size;
        if (last) break;
    }
    out.frames_offset = pos;
    return have;
}

const int kBlockSizeTable[16] = {0,   192,  576,  1152, 2304, 4608, -8, -16,
                                 256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int kBpsTable[8] = {0, 8, 12, 0, 16, 20, 24, 32};

void read_utf8_number(BitReader& br) {
    uint32_t first = (uint32_t)br.read_uint(8);
    if (first < 0x80) return;
    int n = 0;
    while (first & (0x80u >> n)) n++;
    for (int i = 0; i < n - 1; i++) br.read_uint(8);
}

bool decode_residual(BitReader& br, int blocksize, int order,
                     std::vector<int64_t>& res) {
    int method = (int)br.read_uint(2);
    if (method > 1) return false;
    int kbits = method == 0 ? 4 : 5;
    int escape = (1 << kbits) - 1;
    int part_order = (int)br.read_uint(4);
    int nparts = 1 << part_order;
    res.clear();
    res.reserve(blocksize - order);
    for (int p = 0; p < nparts; p++) {
        int n = (blocksize >> part_order) - (p == 0 ? order : 0);
        if (n < 0) return false;
        int k = (int)br.read_uint(kbits);
        if (k == escape) {
            int raw = (int)br.read_uint(5);
            for (int i = 0; i < n; i++)
                res.push_back(raw ? br.read_sint(raw) : 0);
        } else {
            for (int i = 0; i < n; i++) res.push_back(br.read_rice(k));
        }
        if (br.fail) return false;
    }
    return true;
}

const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
    if (br.read_uint(1) != 0) return false;
    int type = (int)br.read_uint(6);
    int wasted = 0;
    if (br.read_uint(1)) wasted = br.read_unary() + 1;
    bps -= wasted;
    out.clear();
    out.reserve(blocksize);

    if (type == 0) {
        int64_t v = br.read_sint(bps);
        out.assign(blocksize, v);
    } else if (type == 1) {
        for (int i = 0; i < blocksize; i++) out.push_back(br.read_sint(bps));
    } else if (type >= 8 && type <= 12) {
        int order = type - 8;
        for (int i = 0; i < order; i++) out.push_back(br.read_sint(bps));
        std::vector<int64_t> res;
        if (!decode_residual(br, blocksize, order, res)) return false;
        const int* c = kFixedCoefs[order];
        for (size_t i = 0; i < res.size(); i++) {
            int64_t acc = 0;
            size_t m = out.size();
            for (int j = 0; j < order; j++) acc += c[j] * out[m - 1 - j];
            out.push_back(res[i] + acc);
        }
    } else if (type >= 32) {
        int order = type - 31;
        for (int i = 0; i < order; i++) out.push_back(br.read_sint(bps));
        int precision = (int)br.read_uint(4) + 1;
        if (precision == 16) return false;  // invalid per spec
        int shift = (int)br.read_sint(5);
        if (shift < 0) return false;
        std::vector<int64_t> coefs(order);
        for (int i = 0; i < order; i++) coefs[i] = br.read_sint(precision);
        std::vector<int64_t> res;
        if (!decode_residual(br, blocksize, order, res)) return false;
        for (size_t i = 0; i < res.size(); i++) {
            int64_t acc = 0;
            size_t m = out.size();
            for (int j = 0; j < order; j++) acc += coefs[j] * out[m - 1 - j];
            out.push_back(res[i] + (acc >> shift));
        }
    } else {
        return false;  // reserved
    }
    if (br.fail) return false;
    if (wasted)
        for (auto& v : out) v <<= wasted;
    return true;
}

// returns blocksize, or -1 on error / EOF
int decode_frame(BitReader& br, const StreamInfo& info,
                 std::vector<std::vector<int64_t>>& chans) {
    if (br.read_uint(14) != 0x3FFE) return -1;
    br.read_uint(2);  // reserved + blocking strategy
    int bs_code = (int)br.read_uint(4);
    int sr_code = (int)br.read_uint(4);
    int ch_code = (int)br.read_uint(4);
    int bps_code = (int)br.read_uint(3);
    br.read_uint(1);
    read_utf8_number(br);

    int blocksize;
    if (bs_code == 6) blocksize = (int)br.read_uint(8) + 1;
    else if (bs_code == 7) blocksize = (int)br.read_uint(16) + 1;
    else if (kBlockSizeTable[bs_code] > 0) blocksize = kBlockSizeTable[bs_code];
    else return -1;

    if (sr_code == 12) br.read_uint(8);
    else if (sr_code == 13 || sr_code == 14) br.read_uint(16);

    int bps = bps_code == 0 ? info.bps : kBpsTable[bps_code];
    if (bps == 0) return -1;
    br.read_uint(8);  // header crc8
    if (br.fail) return -1;

    if (ch_code <= 7) {
        int nch = ch_code + 1;
        chans.resize(nch);
        for (int c = 0; c < nch; c++)
            if (!decode_subframe(br, blocksize, bps, chans[c])) return -1;
    } else if (ch_code == 8) {  // left/side
        chans.resize(2);
        if (!decode_subframe(br, blocksize, bps, chans[0])) return -1;
        if (!decode_subframe(br, blocksize, bps + 1, chans[1])) return -1;
        for (int i = 0; i < blocksize; i++)
            chans[1][i] = chans[0][i] - chans[1][i];
    } else if (ch_code == 9) {  // right/side
        chans.resize(2);
        std::vector<int64_t> side;
        if (!decode_subframe(br, blocksize, bps + 1, side)) return -1;
        if (!decode_subframe(br, blocksize, bps, chans[1])) return -1;
        chans[0].resize(blocksize);
        for (int i = 0; i < blocksize; i++)
            chans[0][i] = chans[1][i] + side[i];
    } else if (ch_code == 10) {  // mid/side
        chans.resize(2);
        std::vector<int64_t> mid, side;
        if (!decode_subframe(br, blocksize, bps, mid)) return -1;
        if (!decode_subframe(br, blocksize, bps + 1, side)) return -1;
        chans[0].resize(blocksize);
        chans[1].resize(blocksize);
        for (int i = 0; i < blocksize; i++) {
            int64_t m2 = mid[i] * 2 + (side[i] & 1);
            // floor division to match the Python reference decoder exactly
            int64_t l = m2 + side[i], r = m2 - side[i];
            chans[0][i] = l >= 0 ? l / 2 : -((-l + 1) / 2);
            chans[1][i] = r >= 0 ? r / 2 : -((-r + 1) / 2);
        }
    } else {
        return -1;
    }
    br.align_byte();
    br.read_uint(16);  // frame crc16
    if (br.fail) return -1;
    return blocksize;
}

}  // namespace

extern "C" {

void ws_free(float* p);  // defined in ws_audio.cpp

// FLAC bytes -> interleaved float32 in [-1, 1). Returns 0 on success.
int ws_decode_flac(const char* data, int64_t len, float** out_samples,
                   int32_t* out_frames, int32_t* out_channels,
                   int32_t* out_sr) {
    const uint8_t* d = (const uint8_t*)data;
    StreamInfo info;
    if (!parse_streaminfo(d, (size_t)len, info)) return -1;
    if (info.channels < 1 || info.channels > 8 || info.sr <= 0) return -1;

    BitReader br(d, (size_t)len, info.frames_offset);
    std::vector<std::vector<int64_t>> chans;
    std::vector<float> pcm;
    if (info.total_samples)
        pcm.reserve((size_t)info.total_samples * info.channels);
    double scale = 1.0 / (double)(1ll << (info.bps - 1));
    uint64_t total = 0;

    while (true) {
        if (info.total_samples && total >= info.total_samples) break;
        if (br.eof(80)) break;  // not enough bits for another frame
        int bs = decode_frame(br, info, chans);
        if (bs < 0) {
            if (total > 0) break;  // trailing garbage after valid audio
            return -2;
        }
        if ((int)chans.size() != info.channels) return -3;
        for (int i = 0; i < bs; i++)
            for (int c = 0; c < info.channels; c++)
                pcm.push_back((float)(chans[c][i] * scale));
        total += bs;
    }
    if (pcm.empty()) return -4;
    if (info.total_samples && total > info.total_samples)
        pcm.resize((size_t)info.total_samples * info.channels);

    float* buf = (float*)malloc(pcm.size() * sizeof(float));
    if (!buf) return -5;
    memcpy(buf, pcm.data(), pcm.size() * sizeof(float));
    *out_samples = buf;
    *out_frames = (int32_t)(pcm.size() / info.channels);
    *out_channels = info.channels;
    *out_sr = info.sr;
    return 0;
}

}  // extern "C"
