// gas_runtime — native runtime services for the TPU audio spatializer.
//
// The TPU compute path is JAX/XLA/Pallas; this library provides the
// realtime shell around it (the role the reference's C++ engine glue plays
// around its mix kernels):
//   * a lock-free single-producer/single-consumer frame ring buffer for
//     staging rendered blocks toward an audio output callback,
//   * a block pacer that tracks the mix-rate deadline and counts
//     underruns (the AudioServer driver-callback cadence),
//   * WAV file IO (16/24/32-bit PCM and float32),
//   * peak/RMS metering over interleaved float frames.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- ring

struct GasRing {
  float* data;          // capacity * channels floats
  uint64_t capacity;    // frames (power of two)
  uint32_t channels;
  std::atomic<uint64_t> head;  // write position (frames)
  std::atomic<uint64_t> tail;  // read position (frames)
};

GasRing* gas_ring_create(uint64_t capacity_frames, uint32_t channels) {
  // round capacity to power of two for cheap masking
  uint64_t cap = 1;
  while (cap < capacity_frames) cap <<= 1;
  GasRing* r = new GasRing();
  r->data = new float[cap * channels]();
  r->capacity = cap;
  r->channels = channels;
  r->head.store(0);
  r->tail.store(0);
  return r;
}

void gas_ring_destroy(GasRing* r) {
  if (!r) return;
  delete[] r->data;
  delete r;
}

uint64_t gas_ring_readable(const GasRing* r) {
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

uint64_t gas_ring_writable(const GasRing* r) {
  return r->capacity - gas_ring_readable(r);
}

// returns frames actually written (0 if full)
uint64_t gas_ring_write(GasRing* r, const float* frames, uint64_t n) {
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  uint64_t free_frames = r->capacity - (head - tail);
  if (n > free_frames) n = free_frames;
  uint64_t mask = r->capacity - 1;
  uint32_t ch = r->channels;
  for (uint64_t i = 0; i < n; i++) {
    uint64_t slot = (head + i) & mask;
    std::memcpy(&r->data[slot * ch], &frames[i * ch], ch * sizeof(float));
  }
  r->head.store(head + n, std::memory_order_release);
  return n;
}

// returns frames actually read; missing frames are zero-filled when
// fill_silence != 0 (underrun behavior of an audio callback)
uint64_t gas_ring_read(GasRing* r, float* out, uint64_t n, int fill_silence) {
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t avail = head - tail;
  uint64_t take = n < avail ? n : avail;
  uint64_t mask = r->capacity - 1;
  uint32_t ch = r->channels;
  for (uint64_t i = 0; i < take; i++) {
    uint64_t slot = (tail + i) & mask;
    std::memcpy(&out[i * ch], &r->data[slot * ch], ch * sizeof(float));
  }
  if (fill_silence && take < n) {
    std::memset(&out[take * ch], 0, (n - take) * ch * sizeof(float));
  }
  r->tail.store(tail + take, std::memory_order_release);
  return take;
}

// ---------------------------------------------------------------- pacer

struct GasPacer {
  double block_seconds;
  std::chrono::steady_clock::time_point next;
  uint64_t blocks;
  uint64_t late;
  double max_lateness_ms;
};

GasPacer* gas_pacer_create(double mix_rate, uint64_t block_frames) {
  GasPacer* p = new GasPacer();
  p->block_seconds = block_frames / mix_rate;
  p->next = std::chrono::steady_clock::now();
  p->blocks = 0;
  p->late = 0;
  p->max_lateness_ms = 0.0;
  return p;
}

void gas_pacer_destroy(GasPacer* p) { delete p; }

// sleep until the next block deadline; returns lateness in ms (>0 = the
// caller missed the deadline — a realtime underrun signal)
double gas_pacer_wait(GasPacer* p) {
  using namespace std::chrono;
  p->next += duration_cast<steady_clock::duration>(
      duration<double>(p->block_seconds));
  auto now = steady_clock::now();
  double late_ms = duration<double, std::milli>(now - p->next).count();
  if (late_ms > 0.0) {
    p->late++;
    if (late_ms > p->max_lateness_ms) p->max_lateness_ms = late_ms;
    p->next = now;  // resync after an underrun
  } else {
    std::this_thread::sleep_until(p->next);
  }
  p->blocks++;
  return late_ms;
}

uint64_t gas_pacer_blocks(const GasPacer* p) { return p->blocks; }
uint64_t gas_pacer_late(const GasPacer* p) { return p->late; }
double gas_pacer_max_lateness_ms(const GasPacer* p) { return p->max_lateness_ms; }

// ---------------------------------------------------------------- meter

// peaks/rms per channel over interleaved frames
void gas_meter(const float* frames, uint64_t n, uint32_t channels,
               float* peaks_out, float* rms_out) {
  for (uint32_t c = 0; c < channels; c++) {
    peaks_out[c] = 0.f;
    rms_out[c] = 0.f;
  }
  for (uint64_t i = 0; i < n; i++) {
    for (uint32_t c = 0; c < channels; c++) {
      float v = frames[i * channels + c];
      float a = v < 0 ? -v : v;
      if (a > peaks_out[c]) peaks_out[c] = a;
      rms_out[c] += v * v;
    }
  }
  if (n) {
    for (uint32_t c = 0; c < channels; c++) {
      rms_out[c] = std::sqrt(rms_out[c] / (double)n);
    }
  }
}

// ---------------------------------------------------------------- wav io

#pragma pack(push, 1)
struct WavHeader {
  char riff[4];
  uint32_t riff_size;
  char wave[4];
};
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
struct FmtChunk {
  uint16_t format;  // 1 = PCM, 3 = float
  uint16_t channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits;
};
#pragma pack(pop)

// Scan RIFF chunks for fmt + data.  Handles the RIFF pad byte after
// odd-sized chunks (a DAW metadata chunk with odd length would otherwise
// misalign every later read) and resolves WAVE_FORMAT_EXTENSIBLE
// (0xFFFE) to the real format tag carried in the SubFormat GUID.
// Leaves the file positioned at the start of the data payload.
static int scan_wav(FILE* f, FmtChunk* fmt, uint32_t* data_size) {
  ChunkHeader ch;
  while (std::fread(&ch, sizeof(ch), 1, f) == 1) {
    uint32_t advance = ch.size + (ch.size & 1);  // odd chunks carry a pad
    if (!std::memcmp(ch.id, "fmt ", 4)) {
      uint32_t take = sizeof(FmtChunk) < ch.size ? (uint32_t)sizeof(FmtChunk)
                                                 : ch.size;
      if (std::fread(fmt, take, 1, f) != 1) return -2;
      if (fmt->format == 0xFFFE && ch.size >= sizeof(FmtChunk) + 24) {
        // extensible header: cbSize(2) + valid_bits(2) + channel_mask(4)
        // then the 16-byte SubFormat GUID whose first uint16 is the
        // actual format tag (1 = PCM, 3 = IEEE float)
        uint8_t ext[10];
        if (std::fread(ext, sizeof(ext), 1, f) == 1) {
          fmt->format = (uint16_t)(ext[8] | (ext[9] << 8));
          take += (uint32_t)sizeof(ext);
        }
      }
      if (advance > take) std::fseek(f, (long)(advance - take), SEEK_CUR);
    } else if (!std::memcmp(ch.id, "data", 4)) {
      *data_size = ch.size;
      return 0;
    } else {
      std::fseek(f, (long)advance, SEEK_CUR);
    }
  }
  return -3;
}

// Probe a wav file: returns 0 on success and fills frames/channels/rate.
int gas_wav_info(const char* path, uint64_t* frames, uint32_t* channels,
                 uint32_t* rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavHeader h;
  if (std::fread(&h, sizeof(h), 1, f) != 1 || std::memcmp(h.riff, "RIFF", 4) ||
      std::memcmp(h.wave, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }
  FmtChunk fmt{};
  uint32_t data_size = 0;
  scan_wav(f, &fmt, &data_size);
  std::fclose(f);
  if (!fmt.channels || !fmt.bits || !data_size) return -3;
  *frames = data_size / (fmt.channels * (fmt.bits / 8));
  *channels = fmt.channels;
  *rate = fmt.sample_rate;
  return 0;
}

// Read a wav file into float32 interleaved [-1, 1].  out must hold
// frames*channels floats (query via gas_wav_info).  Returns 0 on success.
int gas_wav_read(const char* path, float* out, uint64_t max_frames) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavHeader h;
  if (std::fread(&h, sizeof(h), 1, f) != 1 || std::memcmp(h.riff, "RIFF", 4) ||
      std::memcmp(h.wave, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }
  FmtChunk fmt{};
  uint32_t data_size = 0;
  scan_wav(f, &fmt, &data_size);
  // validate like gas_wav_info — a data chunk with no/zeroed fmt chunk
  // must fail, not divide by zero below
  if (!fmt.channels || !fmt.bits || !data_size) {
    std::fclose(f);
    return -3;
  }
  uint32_t bytes_per = fmt.bits / 8;
  uint64_t frames = data_size / (fmt.channels * bytes_per);
  if (frames > max_frames) frames = max_frames;
  uint64_t samples = frames * fmt.channels;
  std::vector<uint8_t> raw(samples * bytes_per);
  std::fread(raw.data(), 1, raw.size(), f);
  std::fclose(f);

  if (fmt.format == 3 && fmt.bits == 32) {
    std::memcpy(out, raw.data(), samples * 4);
  } else if (fmt.bits == 16) {
    const int16_t* p = reinterpret_cast<const int16_t*>(raw.data());
    for (uint64_t i = 0; i < samples; i++) out[i] = p[i] / 32768.0f;
  } else if (fmt.bits == 24) {
    for (uint64_t i = 0; i < samples; i++) {
      int32_t v = raw[i * 3] | (raw[i * 3 + 1] << 8) | (raw[i * 3 + 2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      out[i] = v / 8388608.0f;
    }
  } else if (fmt.bits == 32) {
    const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
    for (uint64_t i = 0; i < samples; i++) out[i] = p[i] / 2147483648.0f;
  } else {
    return -4;
  }
  return 0;
}

// Write float32 interleaved frames as 16-bit PCM.  Returns 0 on success.
int gas_wav_write(const char* path, const float* frames, uint64_t n,
                  uint32_t channels, uint32_t rate) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint64_t samples = n * channels;
  uint32_t data_size = (uint32_t)(samples * 2);
  WavHeader h{{'R', 'I', 'F', 'F'},
              (uint32_t)(4 + 8 + sizeof(FmtChunk) + 8 + data_size),
              {'W', 'A', 'V', 'E'}};
  std::fwrite(&h, sizeof(h), 1, f);
  ChunkHeader fmt_h{{'f', 'm', 't', ' '}, sizeof(FmtChunk)};
  std::fwrite(&fmt_h, sizeof(fmt_h), 1, f);
  FmtChunk fmt{1, (uint16_t)channels, rate, rate * channels * 2,
               (uint16_t)(channels * 2), 16};
  std::fwrite(&fmt, sizeof(fmt), 1, f);
  ChunkHeader data_h{{'d', 'a', 't', 'a'}, data_size};
  std::fwrite(&data_h, sizeof(data_h), 1, f);
  std::vector<int16_t> pcm(samples);
  for (uint64_t i = 0; i < samples; i++) {
    float v = frames[i];
    if (v > 1.f) v = 1.f;
    if (v < -1.f) v = -1.f;
    pcm[i] = (int16_t)(v * 32767.0f);
  }
  std::fwrite(pcm.data(), 2, samples, f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
