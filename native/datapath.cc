// music_tpu native data-path kernels.
//
// Host-side hot loops of the data pipeline, C++ for throughput:
//   - mu-law companding encode (float PCM -> uint8/int32 codes)
//   - strided window gather (corpus -> [B, W] training windows)
//   - 16-bit PCM <-> float conversion for WAV I/O
//
// The reference has no native code at all (SURVEY.md §2: pure PyTorch with
// 8 DataLoader worker processes doing per-item one-hot in Python); here the
// equivalent host work is a few vectorized C++ loops behind ctypes, with a
// numpy fallback when no toolchain is available (music_tpu/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC datapath.cc -o libdatapath.so

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// mu-law encode: audio[n] in [-1,1] -> codes[n] in [0, q-1].
// Formula of wavenet/audio_func.py:5-22 in float32 arithmetic.
void mulaw_encode(const float* audio, int32_t* codes, int64_t n, int32_t q) {
  const float mu = static_cast<float>(q - 1);
  const float inv_log1p_mu = 1.0f / std::log1p(mu);
  for (int64_t i = 0; i < n; ++i) {
    float a = audio[i];
    float clipped = a < -1.0f ? -1.0f : (a > 1.0f ? 1.0f : a);
    float mag = std::log1p(mu * std::fabs(clipped)) * inv_log1p_mu;
    float sig = (a > 0.0f ? 1.0f : (a < 0.0f ? -1.0f : 0.0f)) * mag;
    codes[i] = static_cast<int32_t>((sig + 1.0f) * 0.5f * mu + 0.5f);
  }
}

// gather windows: out[b, :] = data[starts[b] : starts[b] + width]
void gather_windows(const int32_t* data, const int64_t* starts,
                    int32_t* out, int64_t batch, int64_t width) {
  for (int64_t b = 0; b < batch; ++b) {
    std::memcpy(out + b * width, data + starts[b],
                width * sizeof(int32_t));
  }
}

// float [-1,1] -> int16 PCM
void float_to_pcm16(const float* audio, int16_t* pcm, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float a = audio[i];
    a = a < -1.0f ? -1.0f : (a > 1.0f ? 1.0f : a);
    pcm[i] = static_cast<int16_t>(a * 32767.0f);
  }
}

// int16 PCM -> float [-1,1]
void pcm16_to_float(const int16_t* pcm, float* audio, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    audio[i] = static_cast<float>(pcm[i]) / 32768.0f;
  }
}

int32_t datapath_abi_version() { return 1; }

}  // extern "C"
