// Native host-side components (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's native pieces (SURVEY.md §3):
//  - edit_distance_batch: the reference's edit distance is a TF C++ kernel
//    (tf.edit_distance); here a threaded batch Levenshtein over token-id
//    sequences — metrics only, off the training path.
//  - wav_decode_pcm16: the reference decodes audio through libsndfile (C);
//    here a dependency-free RIFF/WAVE PCM16 parser.
//  - flac_decode: LibriSpeech's actual codec (the reference reads .flac via
//    libsndfile, SURVEY.md §3 audio-codec row / §4.1); here a
//    dependency-free FLAC decoder covering the subset LibriSpeech uses
//    (16-bit, constant/verbatim/fixed/LPC subframes, Rice residuals,
//    mono/stereo incl. all decorrelation modes).  CRC-8 (header) and
//    CRC-16 (frame) are verified, so bitstream desyncs fail loudly.
//
// Build: make -C native   (produces libasrnative.so; the Python wrapper in
// neuralasr_tpu/native/__init__.py builds it on demand and falls back to
// numpy implementations when no toolchain is present).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Levenshtein distance for one pair of int32 token sequences.
static int64_t lev(const int32_t* a, int64_t la, const int32_t* b, int64_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const int32_t ai = a[i - 1];
    for (int64_t j = 1; j <= lb; ++j) {
      const int64_t sub = prev[j - 1] + (ai != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// Batched edit distance. Sequences are flattened int32 arrays with
// exclusive-prefix offsets (off[i]..off[i+1]). Threaded over pairs.
void edit_distance_batch(const int32_t* ref, const int64_t* ref_off,
                         const int32_t* hyp, const int64_t* hyp_off,
                         int64_t n, int64_t* out) {
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const unsigned workers = static_cast<unsigned>(
      std::min<int64_t>(hw, std::max<int64_t>(1, n)));
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      out[i] = lev(ref + ref_off[i], ref_off[i + 1] - ref_off[i],
                   hyp + hyp_off[i], hyp_off[i + 1] - hyp_off[i]);
    }
  };
  std::vector<std::thread> pool;
  for (unsigned w = 1; w < workers; ++w) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
}

// Minimal RIFF/WAVE PCM16 mono/stereo decoder.
// Returns number of float samples written (first channel only), or -1 on
// parse error. sample_rate receives the file's rate.
int64_t wav_decode_pcm16(const uint8_t* data, int64_t nbytes, float* out,
                         int64_t max_out, int32_t* sample_rate) {
  if (nbytes < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  int16_t channels = 1;
  int16_t bits = 0;
  int32_t rate = 0;
  const uint8_t* pcm = nullptr;
  int64_t pcm_bytes = 0;
  while (pos + 8 <= nbytes) {
    const uint8_t* hdr = data + pos;
    uint32_t size;
    std::memcpy(&size, hdr + 4, 4);
    const uint8_t* body = hdr + 8;
    if (std::memcmp(hdr, "fmt ", 4) == 0 && size >= 16) {
      uint16_t fmt;
      std::memcpy(&fmt, body, 2);
      std::memcpy(&channels, body + 2, 2);
      std::memcpy(&rate, body + 4, 4);
      std::memcpy(&bits, body + 14, 2);
      if (fmt != 1 || bits != 16) return -1;  // PCM16 only
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      pcm = body;
      pcm_bytes = std::min<int64_t>(size, nbytes - (pos + 8));
    }
    pos += 8 + size + (size & 1);
  }
  if (!pcm || channels < 1) return -1;
  *sample_rate = rate;
  const int64_t frames =
      std::min<int64_t>(pcm_bytes / (2 * channels), max_out);
  for (int64_t i = 0; i < frames; ++i) {
    int16_t s;
    std::memcpy(&s, pcm + 2 * channels * i, 2);
    out[i] = static_cast<float>(s);
  }
  return frames;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// FLAC decode (subset: everything LibriSpeech-era libFLAC emits).

namespace {

struct BitReader {
  const uint8_t* d;
  int64_t n;
  int64_t pos = 0;
  int bit = 0;
  bool err = false;

  uint32_t bits(int k) {
    uint32_t v = 0;
    while (k > 0) {
      if (pos >= n) {
        err = true;
        return 0;
      }
      const int avail = 8 - bit;
      const int take = avail < k ? avail : k;
      const int shift = avail - take;
      v = (v << take) | ((d[pos] >> shift) & ((1u << take) - 1u));
      bit += take;
      k -= take;
      if (bit == 8) {
        bit = 0;
        ++pos;
      }
    }
    return v;
  }

  int64_t sbits(int k) {  // two's-complement signed read, k in [1,32]
    const uint32_t v = bits(k);
    if (k < 32 && ((v >> (k - 1)) & 1u))
      return static_cast<int64_t>(v) - (int64_t(1) << k);
    if (k == 32) return static_cast<int32_t>(v);
    return v;
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (!err && bits(1) == 0) {
      if (++q > (1u << 24)) {  // insane quotient: corrupt stream
        err = true;
        break;
      }
    }
    return q;
  }

  void align() {
    if (bit) {
      bit = 0;
      ++pos;
    }
  }
};

uint8_t crc8(const uint8_t* d, int64_t n) {  // poly x^8+x^2+x+1 (0x07)
  uint8_t c = 0;
  for (int64_t i = 0; i < n; ++i) {
    c ^= d[i];
    for (int k = 0; k < 8; ++k) c = (c & 0x80) ? (c << 1) ^ 0x07 : (c << 1);
  }
  return c;
}

uint16_t crc16(const uint8_t* d, int64_t n) {  // poly x^16+x^15+x^2+1 (0x8005)
  uint16_t c = 0;
  for (int64_t i = 0; i < n; ++i) {
    c ^= static_cast<uint16_t>(d[i]) << 8;
    for (int k = 0; k < 8; ++k)
      c = (c & 0x8000) ? (c << 1) ^ 0x8005 : (c << 1);
  }
  return c;
}

// Decode one subframe of `bs` samples at `bps` effective bits into out[].
bool decode_subframe(BitReader& br, int64_t bs, int bps,
                     std::vector<int64_t>& out) {
  if (br.bits(1) != 0) return false;  // mandatory zero pad bit
  const uint32_t type = br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = static_cast<int>(br.unary()) + 1;
  const int eff = bps - wasted;
  if (eff <= 0 || eff > 32 || br.err) return false;

  int order = 0;
  bool fixed = false, lpc = false;
  if (type == 0) {  // CONSTANT
    const int64_t v = br.sbits(eff);
    for (int64_t i = 0; i < bs; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int64_t i = 0; i < bs; ++i) out[i] = br.sbits(eff);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED 001xxx
    fixed = true;
    order = type & 0x07;
  } else if (type & 0x20) {  // LPC 1xxxxx
    lpc = true;
    order = static_cast<int>(type & 0x1F) + 1;
  } else {
    return false;  // reserved subframe type
  }

  if (fixed || lpc) {
    if (order > bs) return false;
    for (int i = 0; i < order; ++i) out[i] = br.sbits(eff);  // warmup

    int prec = 0, shift = 0;
    std::vector<int64_t> coef;
    if (lpc) {
      prec = static_cast<int>(br.bits(4)) + 1;
      if (prec == 16) return false;  // 0b1111 is invalid
      shift = static_cast<int>(br.sbits(5));
      if (shift < 0) return false;
      coef.resize(order);
      for (int i = 0; i < order; ++i) coef[i] = br.sbits(prec);
    }

    // Rice-coded residual partitions.
    const uint32_t method = br.bits(2);
    if (method > 1) return false;
    const int pbits = method ? 5 : 4;
    const uint32_t escape = method ? 0x1F : 0x0F;
    const uint32_t porder = br.bits(4);
    const int64_t nparts = int64_t(1) << porder;
    if ((bs >> porder) << porder != bs) return false;
    int64_t idx = order;
    for (int64_t p = 0; p < nparts; ++p) {
      int64_t cnt = bs >> porder;
      if (p == 0) cnt -= order;
      if (cnt < 0) return false;
      const uint32_t param = br.bits(pbits);
      if (param == escape) {
        const int raw = static_cast<int>(br.bits(5));
        for (int64_t i = 0; i < cnt; ++i)
          out[idx++] = raw ? br.sbits(raw) : 0;
      } else {
        for (int64_t i = 0; i < cnt; ++i) {
          const uint32_t q = br.unary();
          const uint32_t r = param ? br.bits(param) : 0;
          const uint64_t z = (static_cast<uint64_t>(q) << param) | r;
          out[idx++] =
              static_cast<int64_t>(z >> 1) ^ -static_cast<int64_t>(z & 1);
        }
      }
      if (br.err) return false;
    }

    // Reconstruct: residual -> samples.
    if (fixed) {
      for (int64_t i = order; i < bs; ++i) {
        switch (order) {
          case 0: break;
          case 1: out[i] += out[i - 1]; break;
          case 2: out[i] += 2 * out[i - 1] - out[i - 2]; break;
          case 3:
            out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
            break;
          default:
            out[i] +=
                4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
        }
      }
    } else {
      for (int64_t i = order; i < bs; ++i) {
        int64_t acc = 0;
        for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
        out[i] += acc >> shift;
      }
    }
  }
  if (wasted)
    for (int64_t i = 0; i < bs; ++i) out[i] <<= wasted;
  return !br.err;
}

}  // namespace

extern "C" {

// FLAC bytes -> float samples of channel 0 (raw integer amplitude, matching
// wav_decode_pcm16's convention).  Returns sample count, or a negative error:
// -1 bad magic/streaminfo, -2 bitstream parse error, -3 CRC mismatch,
// -4 out buffer too small.
int64_t flac_decode(const uint8_t* data, int64_t nbytes, float* out,
                    int64_t max_out, int32_t* sample_rate) {
  if (nbytes < 42 || std::memcmp(data, "fLaC", 4) != 0) return -1;
  int64_t pos = 4;
  uint32_t si_rate = 0;
  int si_channels = 0, si_bps = 0;
  bool have_si = false;
  for (bool last = false; !last;) {  // metadata blocks
    if (pos + 4 > nbytes) return -1;
    last = data[pos] & 0x80;
    const uint32_t type = data[pos] & 0x7F;
    const uint32_t len = (uint32_t(data[pos + 1]) << 16) |
                         (uint32_t(data[pos + 2]) << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > nbytes) return -1;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* b = data + pos;
      si_rate = (uint32_t(b[10]) << 12) | (uint32_t(b[11]) << 4) | (b[12] >> 4);
      si_channels = ((b[12] >> 1) & 0x07) + 1;
      si_bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
      have_si = true;
    }
    pos += len;
  }
  if (!have_si || si_rate == 0 || si_channels < 1 || si_channels > 8)
    return -1;
  *sample_rate = static_cast<int32_t>(si_rate);

  std::vector<std::vector<int64_t>> ch(si_channels);
  int64_t n_out = 0;
  while (pos + 2 <= nbytes && data[pos] == 0xFF &&
         (data[pos + 1] & 0xFC) == 0xF8) {
    const int64_t frame_start = pos;
    BitReader br{data, nbytes, pos, 0, false};
    br.bits(14);                      // sync (already checked)
    br.bits(1);                       // reserved
    br.bits(1);                       // blocking strategy
    const uint32_t bs_code = br.bits(4);
    const uint32_t sr_code = br.bits(4);
    const uint32_t chan_code = br.bits(4);
    const uint32_t ss_code = br.bits(3);
    br.bits(1);  // reserved
    {            // UTF-8-coded frame/sample number: skip
      const uint32_t first = br.bits(8);
      int follow = 0;
      for (uint32_t m = 0x80; first & m; m >>= 1) ++follow;
      if (follow == 1 || follow > 6) return -2;
      for (int i = 1; i < follow; ++i)
        if ((br.bits(8) & 0xC0) != 0x80) return -2;
    }
    int64_t bs;
    switch (bs_code) {
      case 0: return -2;  // reserved
      case 1: bs = 192; break;
      case 6: bs = static_cast<int64_t>(br.bits(8)) + 1; break;
      case 7: bs = static_cast<int64_t>(br.bits(16)) + 1; break;
      default:
        bs = (bs_code <= 5) ? (576ll << (bs_code - 2))
                            : (256ll << (bs_code - 8));
    }
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    else if (sr_code == 15) return -2;
    const uint8_t hdr_crc = static_cast<uint8_t>(br.bits(8));
    if (br.err) return -2;
    if (crc8(data + frame_start, (br.pos - frame_start) - 1) != hdr_crc)
      return -3;

    int nch;
    if (chan_code <= 7) nch = static_cast<int>(chan_code) + 1;
    else if (chan_code <= 10) nch = 2;
    else return -2;
    if (nch != si_channels) return -2;
    int bps;
    switch (ss_code) {
      case 0: bps = si_bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -2;
    }

    for (int c = 0; c < nch; ++c) {
      const bool side = (chan_code == 8 && c == 1) ||
                        (chan_code == 9 && c == 0) ||
                        (chan_code == 10 && c == 1);
      if (ch[c].size() < static_cast<size_t>(bs)) ch[c].resize(bs);
      if (!decode_subframe(br, bs, bps + (side ? 1 : 0), ch[c])) return -2;
    }
    br.align();
    const uint16_t frame_crc = static_cast<uint16_t>(br.bits(16));
    if (br.err) return -2;
    if (crc16(data + frame_start, (br.pos - frame_start) - 2) != frame_crc)
      return -3;
    pos = br.pos;

    // Inter-channel decorrelation -> channel 0 (left).
    if (chan_code == 9)  // right/side: ch0 = side, ch1 = right
      for (int64_t i = 0; i < bs; ++i) ch[0][i] += ch[1][i];
    else if (chan_code == 10)  // mid/side
      for (int64_t i = 0; i < bs; ++i) {
        const int64_t mid2 = (ch[0][i] << 1) | (ch[1][i] & 1);
        ch[0][i] = (mid2 + ch[1][i]) >> 1;
      }
    // left/side (8) and independent: channel 0 is already left.

    if (n_out + bs > max_out) return -4;
    for (int64_t i = 0; i < bs; ++i)
      out[n_out + i] = static_cast<float>(ch[0][i]);
    n_out += bs;
  }
  return n_out;
}

}  // extern "C"
