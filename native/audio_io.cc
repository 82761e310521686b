// Host-side audio IO: WAV (PCM16/24/32, float32) decoding without external
// libraries. Replaces the reference's soundfile/libsndfile dependency
// (gender_classifier_train_pitch_norm.py:28). Exposed via ctypes
// (speech_anonymization_tpu/data/audio.py).
//
// FLAC decoding (LibriSpeech's on-disk format) is handled in flac_decode.cc
// when present; satpu_read_audio dispatches on the file magic.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

long long satpu_read_flac(const char* path, float** out, int* sr, int* channels);

void satpu_free(float* p) { std::free(p); }

static long long read_wav(FILE* f, float** out, int* sr, int* channels) {
  char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12) return -1;
  if (std::memcmp(hdr, "RIFF", 4) != 0 || std::memcmp(hdr + 8, "WAVE", 4) != 0)
    return -1;
  uint16_t audio_fmt = 0, n_ch = 0, bits = 0;
  uint32_t rate = 0;
  unsigned char* data = nullptr;
  uint32_t data_size = 0;
  char cid[4];
  uint32_t csize;
  while (std::fread(cid, 1, 4, f) == 4 && std::fread(&csize, 4, 1, f) == 1) {
    if (std::memcmp(cid, "fmt ", 4) == 0) {
      unsigned char buf[16];
      if (csize < 16 || std::fread(buf, 1, 16, f) != 16) return -1;
      audio_fmt = buf[0] | (buf[1] << 8);
      n_ch = buf[2] | (buf[3] << 8);
      rate = buf[4] | (buf[5] << 8) | (buf[6] << 16) | ((uint32_t)buf[7] << 24);
      bits = buf[14] | (buf[15] << 8);
      if (csize > 16) std::fseek(f, csize - 16 + (csize & 1), SEEK_CUR);
    } else if (std::memcmp(cid, "data", 4) == 0) {
      data = (unsigned char*)std::malloc(csize);
      if (!data || std::fread(data, 1, csize, f) != csize) {
        std::free(data);
        return -1;
      }
      data_size = csize;
      break;
    } else {
      std::fseek(f, csize + (csize & 1), SEEK_CUR);
    }
  }
  if (!data || n_ch == 0) {
    std::free(data);
    return -1;
  }
  long long n_frames = 0;
  float* pcm = nullptr;
  if (audio_fmt == 1 && bits == 16) {
    n_frames = data_size / (2 * n_ch);
    pcm = (float*)std::malloc(sizeof(float) * n_frames * n_ch);
    const int16_t* s = (const int16_t*)data;
    for (long long i = 0; i < n_frames * n_ch; ++i) pcm[i] = s[i] / 32768.0f;
  } else if (audio_fmt == 1 && bits == 32) {
    n_frames = data_size / (4 * n_ch);
    pcm = (float*)std::malloc(sizeof(float) * n_frames * n_ch);
    const int32_t* s = (const int32_t*)data;
    for (long long i = 0; i < n_frames * n_ch; ++i)
      pcm[i] = (float)(s[i] / 2147483648.0);
  } else if (audio_fmt == 1 && bits == 24) {
    n_frames = data_size / (3 * n_ch);
    pcm = (float*)std::malloc(sizeof(float) * n_frames * n_ch);
    for (long long i = 0; i < n_frames * n_ch; ++i) {
      int32_t v = data[3 * i] | (data[3 * i + 1] << 8) | (data[3 * i + 2] << 16);
      if (v & 0x800000) v -= 0x1000000;
      pcm[i] = v / 8388608.0f;
    }
  } else if (audio_fmt == 3 && bits == 32) {
    n_frames = data_size / (4 * n_ch);
    pcm = (float*)std::malloc(sizeof(float) * n_frames * n_ch);
    std::memcpy(pcm, data, sizeof(float) * n_frames * n_ch);
  } else {
    std::free(data);
    return -1;
  }
  std::free(data);
  *out = pcm;
  *sr = (int)rate;
  *channels = (int)n_ch;
  return n_frames * n_ch;
}

// Returns total float count (frames*channels); negative on failure.
long long satpu_read_audio(const char* path, float** out, int* sr, int* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4] = {0};
  if (std::fread(magic, 1, 4, f) != 4) {
    std::fclose(f);
    return -1;
  }
  std::rewind(f);
  long long n = -1;
  if (std::memcmp(magic, "RIFF", 4) == 0) {
    n = read_wav(f, out, sr, channels);
    std::fclose(f);
    return n;
  }
  std::fclose(f);
  if (std::memcmp(magic, "fLaC", 4) == 0) {
    return satpu_read_flac(path, out, sr, channels);
  }
  return -1;
}

}  // extern "C"
