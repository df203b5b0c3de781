// avsi native data loader: TFRecord + SequenceExample parsing in C++.
//
// The reference delegates record parsing to TensorFlow's C++ kernels via
// tf.data (dataset_reader.py:24-31); this is the framework's own native
// equivalent: TFRecord framing (optionally crc32c-verified), a minimal
// protobuf wire parser for the fixed-mode sample schema
// (tfrecord_utils.py:19-41 + the embedding variant), and a thread-pooled
// batch assembler that parses one file per worker and writes straight into
// caller-provided batch buffers (zero copies beyond file -> buffer).
//
// Exposed as a plain C API consumed through ctypes
// (avsi/data/native_loader.py).  Build: see native/build.sh / the lazy
// build in native_loader.py (g++ -O3 -shared -fPIC).

#include <atomic>
#include <cstdint>
#include <mutex>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// crc32c (Castagnoli), table-driven
// ---------------------------------------------------------------------------

uint32_t g_crc_table[256];
std::once_flag g_crc_once;  // callers run concurrently from Python threads
                            // (ctypes releases the GIL) — plain bool+write
                            // would be a data race

void init_crc_table() {
  std::call_once(g_crc_once, [] {
    const uint32_t poly = 0x82f63b78u;
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t crc = i;
      for (int j = 0; j < 8; ++j) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
      g_crc_table[i] = crc;
    }
  });
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = 0xffffffffu;
  for (size_t i = 0; i < n; ++i)
    crc = g_crc_table[(crc ^ data[i]) & 0xff] ^ (crc >> 8);
  return crc ^ 0xffffffffu;
}

uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ---------------------------------------------------------------------------
// protobuf wire primitives
// ---------------------------------------------------------------------------

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t result = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      result |= uint64_t(b & 0x7f) << shift;
      if (!(b & 0x80)) return result;
      shift += 7;
      if (shift > 63) break;
    }
    ok = false;
    return 0;
  }

  // returns field number, sets wire type; on length-delimited fields the
  // payload is exposed via sub()
  bool next(uint32_t* field, uint32_t* wire) {
    if (p >= end || !ok) return false;
    uint64_t key = varint();
    if (!ok) return false;
    *field = uint32_t(key >> 3);
    *wire = uint32_t(key & 7);
    return true;
  }

  Cursor sub() {
    uint64_t len = varint();
    if (!ok || len > uint64_t(end - p)) {  // overflow-safe bound check
      ok = false;
      return Cursor{p, p};
    }
    Cursor c{p, p + len};
    p += len;
    return c;
  }

  void skip(uint32_t wire) {
    switch (wire) {
      case 0: varint(); break;
      case 1: p += 8; break;
      case 2: {
        uint64_t len = varint();
        if (len > uint64_t(end - p)) { ok = false; return; }
        p += len;
        break;
      }
      case 5: p += 4; break;
      default: ok = false;
    }
    if (p > end) ok = false;
  }
};

// Feature { bytes_list=1 { value=1 } float_list=2 { value=1 }
//           int64_list=3 { value=1 } }
// Copies up to `cap` floats into out; returns the TRUE element count (which
// may exceed `cap` — the caller's `!= expected` check must see over-long
// features, not a silently capped count). Handles packed and unpacked
// encodings.
int64_t parse_feature_floats(Cursor f, float* out, int64_t cap) {
  int64_t n = 0;
  uint32_t field, wire;
  while (f.next(&field, &wire)) {
    if (field == 2 && wire == 2) {  // float_list
      Cursor fl = f.sub();
      uint32_t f2, w2;
      while (fl.next(&f2, &w2)) {
        if (f2 == 1 && w2 == 2) {  // packed
          Cursor vals = fl.sub();
          int64_t cnt = (vals.end - vals.p) / 4;
          int64_t writable = cap > n ? (cnt < cap - n ? cnt : cap - n) : 0;
          for (int64_t i = 0; i < writable; ++i)
            memcpy(out + n + i, vals.p + 4 * i, 4);
          n += cnt;  // true count, not the capped write count
        } else if (f2 == 1 && w2 == 5) {  // unpacked
          if (fl.end - fl.p < 4) { fl.ok = false; break; }
          if (n < cap) memcpy(out + n, fl.p, 4);
          fl.p += 4;
          ++n;
        } else {
          fl.skip(w2);
        }
      }
    } else {
      f.skip(wire);
    }
  }
  return n;
}

int64_t parse_feature_int64(Cursor f) {
  uint32_t field, wire;
  while (f.next(&field, &wire)) {
    if (field == 3 && wire == 2) {  // int64_list
      Cursor il = f.sub();
      uint32_t f2, w2;
      while (il.next(&f2, &w2)) {
        if (f2 == 1 && w2 == 0) return int64_t(il.varint());
        if (f2 == 1 && w2 == 2) {
          Cursor vals = il.sub();
          return int64_t(vals.varint());
        }
        il.skip(w2);
      }
    } else {
      f.skip(wire);
    }
  }
  return 0;
}

int64_t parse_feature_bytes(Cursor f, char* out, int64_t cap) {
  uint32_t field, wire;
  while (f.next(&field, &wire)) {
    if (field == 1 && wire == 2) {  // bytes_list
      Cursor bl = f.sub();
      uint32_t f2, w2;
      while (bl.next(&f2, &w2)) {
        if (f2 == 1 && w2 == 2) {
          Cursor v = bl.sub();
          int64_t n = v.end - v.p;
          if (n > cap - 1) n = cap - 1;
          memcpy(out, v.p, n);
          out[n] = 0;
          return n;
        }
        bl.skip(w2);
      }
    } else {
      f.skip(wire);
    }
  }
  return 0;
}

struct SampleDims {
  int64_t num_audio_samples;
  int64_t t_frames;
  int64_t audio_dim;
  int64_t video_dim;
  int64_t num_labels;
  int64_t emb_dim;  // 0 = no embedding
};

struct SampleOut {
  int32_t* seq_len;
  int32_t* lab_len;
  float* wav;
  float* video;
  float* mask;
  float* labels;
  float* embedding;
  char* sample_path;  // cap 256
};

bool key_is(Cursor key, const char* name) {
  size_t n = strlen(name);
  return size_t(key.end - key.p) == n && memcmp(key.p, name, n) == 0;
}

// SequenceExample { context=1 Features; feature_lists=2 FeatureLists }
// Validates every element count against the expected dims: short or
// malformed records return -5 rather than leaving buffer regions
// uninitialized (the batch buffers are allocated with np.empty).
int parse_sequence_example(const uint8_t* data, size_t len,
                           const SampleDims& d, const SampleOut& o) {
  Cursor c{data, data + len};
  uint32_t field, wire;
  bool got_wav = false, got_mask = false, got_video = false, got_labels = false;
  bool got_emb = false, got_seq = false, got_lab = false;
  while (c.next(&field, &wire)) {
    if (field == 1 && wire == 2) {  // context Features
      Cursor feats = c.sub();
      uint32_t f1, w1;
      while (feats.next(&f1, &w1)) {
        if (f1 != 1 || w1 != 2) { feats.skip(w1); continue; }
        Cursor entry = feats.sub();
        Cursor key{nullptr, nullptr}, val{nullptr, nullptr};
        uint32_t fe, we;
        while (entry.next(&fe, &we)) {
          if (fe == 1 && we == 2) key = entry.sub();
          else if (fe == 2 && we == 2) val = entry.sub();
          else entry.skip(we);
        }
        if (key_is(key, "sequence_length")) {
          *o.seq_len = int32_t(parse_feature_int64(val));
          got_seq = true;
        } else if (key_is(key, "labels_length")) {
          *o.lab_len = int32_t(parse_feature_int64(val));
          got_lab = true;
        } else if (key_is(key, "target_audio_wav")) {
          if (parse_feature_floats(val, o.wav, d.num_audio_samples) !=
              d.num_audio_samples)
            return -5;
          got_wav = true;
        } else if (key_is(key, "sample_path")) {
          parse_feature_bytes(val, o.sample_path, 256);
        } else if (d.emb_dim > 0 && key_is(key, "embedding")) {
          if (parse_feature_floats(val, o.embedding, d.emb_dim) != d.emb_dim)
            return -5;
          got_emb = true;
        }
      }
    } else if (field == 2 && wire == 2) {  // FeatureLists
      Cursor fls = c.sub();
      uint32_t f1, w1;
      while (fls.next(&f1, &w1)) {
        if (f1 != 1 || w1 != 2) { fls.skip(w1); continue; }
        Cursor entry = fls.sub();
        Cursor key{nullptr, nullptr}, fl{nullptr, nullptr};
        uint32_t fe, we;
        while (entry.next(&fe, &we)) {
          if (fe == 1 && we == 2) key = entry.sub();
          else if (fe == 2 && we == 2) fl = entry.sub();
          else entry.skip(we);
        }
        float* dst = nullptr;
        int64_t row = 0, rows = 0;
        bool* flag = nullptr;
        if (key_is(key, "mask")) {
          dst = o.mask; row = d.audio_dim; rows = d.t_frames; flag = &got_mask;
        } else if (key_is(key, "video_features")) {
          dst = o.video; row = d.video_dim; rows = d.t_frames; flag = &got_video;
        } else if (key_is(key, "labels")) {
          dst = o.labels; row = 1; rows = d.num_labels; flag = &got_labels;
        }
        if (!dst) continue;
        int64_t r = 0;
        uint32_t ff, wf;
        while (fl.next(&ff, &wf)) {
          if (ff == 1 && wf == 2) {
            if (r >= rows) return -5;  // more rows than expected
            if (parse_feature_floats(fl.sub(), dst + r * row, row) != row)
              return -5;
            ++r;
          } else {
            fl.skip(wf);
          }
        }
        if (r != rows) return -5;
        *flag = true;
      }
    } else {
      c.skip(wire);
    }
  }
  if (!c.ok) return -2;
  if (!got_wav || !got_mask || !got_video || !got_labels) return -5;
  if (!got_seq || !got_lab) return -5;
  if (d.emb_dim > 0 && !got_emb) return -5;
  return 0;
}

// Parse the first record of a TFRecord file into the sample buffers.
int parse_file(const char* path, int verify_crc, const SampleDims& d,
               const SampleOut& o) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(fsize));
  if (fsize > 0 && fread(buf.data(), 1, size_t(fsize), f) != size_t(fsize)) {
    fclose(f);
    return -1;
  }
  fclose(f);
  if (fsize < 16) return -3;
  uint64_t len;
  memcpy(&len, buf.data(), 8);
  if (len > uint64_t(fsize) || 16 + len > uint64_t(fsize)) return -3;
  // single-record contract: a file with MORE records (or trailing bytes)
  // must error, not silently drop everything after record 0 — the reader
  // routes whole corpora here from a one-file probe
  if (16 + len != uint64_t(fsize)) return -6;
  if (verify_crc) {
    uint32_t c1, c2;
    memcpy(&c1, buf.data() + 8, 4);
    memcpy(&c2, buf.data() + 12 + len, 4);
    if (c1 != masked_crc(buf.data(), 8)) return -4;
    if (c2 != masked_crc(buf.data() + 12, len)) return -4;
  }
  return parse_sequence_example(buf.data() + 12, size_t(len), d, o);
}

}  // namespace

extern "C" {

// Parse n single-sample TFRecord files into contiguous batch buffers using
// `threads` workers. Buffers must be preallocated:
//   wav:    n * num_audio_samples floats   video: n * t * video_dim
//   mask:   n * t * audio_dim              labels: n * num_labels
//   emb:    n * emb_dim (or null)          paths: n * 256 chars
// Returns 0 on success or the first non-zero worker error code.
int avsi_load_batch(const char** paths, int64_t n, int threads,
                    int64_t num_audio_samples, int64_t t_frames,
                    int64_t audio_dim, int64_t video_dim, int64_t num_labels,
                    int64_t emb_dim, int verify_crc, float* wav, float* video,
                    float* mask, float* labels, float* emb, int32_t* seq_lens,
                    int32_t* lab_lens, char* sample_paths) {
  init_crc_table();
  SampleDims d{num_audio_samples, t_frames, audio_dim, video_dim, num_labels,
               emb_dim};
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  if (threads < 1) threads = 1;
  if (threads > n) threads = int(n);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      SampleOut o;
      o.seq_len = seq_lens + i;
      o.lab_len = lab_lens + i;
      o.wav = wav + i * num_audio_samples;
      o.video = video + i * t_frames * video_dim;
      o.mask = mask + i * t_frames * audio_dim;
      o.labels = labels + i * num_labels;
      o.embedding = emb ? emb + i * emb_dim : nullptr;
      o.sample_path = sample_paths + i * 256;
      int rc = parse_file(paths[i], verify_crc, d, o);
      if (rc != 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

// Parse up to max_samples records from ONE (possibly grouped) TFRecord
// file into consecutive batch slots starting at slot `base`. Returns the
// number of samples parsed, or a negative error code.
int avsi_parse_file_multi(const char* path, int verify_crc,
                          int64_t num_audio_samples, int64_t t_frames,
                          int64_t audio_dim, int64_t video_dim,
                          int64_t num_labels, int64_t emb_dim,
                          int64_t base, int64_t max_samples, float* wav,
                          float* video, float* mask, float* labels,
                          float* emb, int32_t* seq_lens, int32_t* lab_lens,
                          char* sample_paths) {
  init_crc_table();
  SampleDims d{num_audio_samples, t_frames, audio_dim, video_dim, num_labels,
               emb_dim};
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(fsize));
  if (fsize > 0 && fread(buf.data(), 1, size_t(fsize), f) != size_t(fsize)) {
    fclose(f);
    return -1;
  }
  fclose(f);
  int64_t n = 0;
  long pos = 0;
  while (pos + 16 <= fsize && n < max_samples) {
    uint64_t len;
    memcpy(&len, buf.data() + pos, 8);
    if (len > uint64_t(fsize) || uint64_t(pos) + 16 + len > uint64_t(fsize))
      return -3;
    if (verify_crc) {
      uint32_t c1, c2;
      memcpy(&c1, buf.data() + pos + 8, 4);
      memcpy(&c2, buf.data() + pos + 12 + len, 4);
      if (c1 != masked_crc(buf.data() + pos, 8)) return -4;
      if (c2 != masked_crc(buf.data() + pos + 12, len)) return -4;
    }
    int64_t i = base + n;
    SampleOut o;
    o.seq_len = seq_lens + i;
    o.lab_len = lab_lens + i;
    o.wav = wav + i * num_audio_samples;
    o.video = video + i * t_frames * video_dim;
    o.mask = mask + i * t_frames * audio_dim;
    o.labels = labels + i * num_labels;
    o.embedding = emb ? emb + i * emb_dim : nullptr;
    o.sample_path = sample_paths + i * 256;
    int rc = parse_sequence_example(buf.data() + pos + 12, size_t(len), d, o);
    if (rc != 0) return rc;
    ++n;
    pos += 16 + long(len);
  }
  // trailing bytes that are not a full record header = truncated/corrupt
  // file (the Python codec raises on this; the native path must not
  // silently succeed on a partial file). Bytes left because max_samples
  // filled up are the caller's documented overflow signal instead.
  if (n < max_samples && pos != fsize) return -3;
  return int(n);
}

// Single-file variant (diagnostics / tests).
int avsi_parse_file(const char* path, int verify_crc,
                    int64_t num_audio_samples, int64_t t_frames,
                    int64_t audio_dim, int64_t video_dim, int64_t num_labels,
                    int64_t emb_dim, float* wav, float* video, float* mask,
                    float* labels, float* emb, int32_t* seq_len,
                    int32_t* lab_len, char* sample_path) {
  init_crc_table();
  SampleDims d{num_audio_samples, t_frames, audio_dim, video_dim, num_labels,
               emb_dim};
  SampleOut o{seq_len, lab_len, wav, video, mask, labels, emb, sample_path};
  return parse_file(path, verify_crc, d, o);
}

}  // extern "C"
