// Native host-side components (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's native pieces (SURVEY.md §3):
//  - edit_distance_batch: the reference's edit distance is a TF C++ kernel
//    (tf.edit_distance); here a threaded batch Levenshtein over token-id
//    sequences — metrics only, off the training path.
//  - wav_decode_pcm16: the reference decodes audio through libsndfile (C);
//    here a dependency-free RIFF/WAVE PCM16 parser.
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
