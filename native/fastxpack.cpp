// Native FASTX parser + 2-bit base encoder.
//
// TPU-native counterpart of the reference's host-side C++ (the
// kmer_searcher's producer thread, kmer_searcher.cpp:153-201, and the
// pigz/seqkit decompression/conversion subprocesses, fastx_io.py:186-227):
// all k-mer math happens on the TPU, so the only native work left is
// feeding bases to the device as fast as the disk allows. This library
// parses FASTA/FASTQ (plain or gzip via zlib), encodes A/C/G/T -> 0..3
// (case-insensitive, anything else -> 4, matching
// fedrann_tpu/io/packing.py), and returns contiguous buffers that numpy
// wraps zero-copy through ctypes.
//
// C ABI only — no pybind11 in this toolchain.

#include <zlib.h>

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Buffers {
  std::vector<uint8_t> codes;       // concatenated base codes
  std::vector<uint64_t> offsets;    // n_reads + 1 offsets into codes
  std::vector<char> names;          // concatenated NUL-terminated names
  std::vector<uint64_t> name_offsets;  // n_reads offsets into names
};

uint8_t g_lut[256];

void init_lut() {
  static bool done = false;
  if (done) return;
  memset(g_lut, 4, sizeof(g_lut));
  g_lut[(unsigned)'A'] = g_lut[(unsigned)'a'] = 0;
  g_lut[(unsigned)'C'] = g_lut[(unsigned)'c'] = 1;
  g_lut[(unsigned)'G'] = g_lut[(unsigned)'g'] = 2;
  g_lut[(unsigned)'T'] = g_lut[(unsigned)'t'] = 3;
  done = true;
}

// Line-oriented reader over gzFile (zlib transparently handles plain files).
class LineReader {
 public:
  explicit LineReader(const char* path) : f_(gzopen(path, "rb")) {
    if (f_) gzbuffer(f_, 1 << 20);
  }
  ~LineReader() {
    if (f_) gzclose(f_);
  }
  bool ok() const { return f_ != nullptr; }

  // Returns false at EOF. Strips trailing \r\n.
  bool next_line(std::string* out) {
    out->clear();
    char buf[1 << 16];
    for (;;) {
      if (gzgets(f_, buf, sizeof(buf)) == nullptr) return !out->empty();
      size_t n = strlen(buf);
      out->append(buf, n);
      if (n > 0 && buf[n - 1] == '\n') break;  // got full line
    }
    while (!out->empty() && (out->back() == '\n' || out->back() == '\r'))
      out->pop_back();
    return true;
  }

 private:
  gzFile f_;
};

void append_name(Buffers* b, const std::string& header) {
  // name = first whitespace-separated token after the marker char
  size_t start = 1, end = start;
  while (end < header.size() && header[end] != ' ' && header[end] != '\t')
    ++end;
  b->name_offsets.push_back(b->names.size());
  b->names.insert(b->names.end(), header.begin() + start, header.begin() + end);
  b->names.push_back('\0');
}

void append_seq(Buffers* b, const std::string& seq) {
  size_t base = b->codes.size();
  b->codes.resize(base + seq.size());
  const unsigned char* src = (const unsigned char*)seq.data();
  uint8_t* dst = b->codes.data() + base;
  for (size_t i = 0; i < seq.size(); ++i) dst[i] = g_lut[src[i]];
}

// returns 0 ok, negative error
int parse(const char* path, Buffers* b) {
  init_lut();
  LineReader reader(path);
  if (!reader.ok()) return -1;

  std::string line;
  // skip leading blank lines, sniff format from first marker char
  do {
    if (!reader.next_line(&line)) return -2;  // empty input
  } while (line.empty());

  b->offsets.push_back(0);
  if (line[0] == '>') {  // FASTA (multi-line sequences)
    std::string header = line;
    std::string seq;
    for (;;) {
      append_name(b, header);
      seq.clear();
      bool eof = false;
      for (;;) {
        if (!reader.next_line(&line)) {
          eof = true;
          break;
        }
        if (line.empty()) continue;
        if (line[0] == '>') break;
        seq += line;
      }
      append_seq(b, seq);
      b->offsets.push_back(b->codes.size());
      if (eof) break;
      header = line;
    }
  } else if (line[0] == '@') {  // FASTQ (4-line records)
    for (;;) {
      if (line.empty()) {
        if (!reader.next_line(&line)) break;
        continue;
      }
      if (line[0] != '@') return -3;
      append_name(b, line);
      std::string seq;
      if (!reader.next_line(&seq)) return -4;      // sequence
      if (!reader.next_line(&line)) return -4;     // '+'
      if (!reader.next_line(&line)) return -4;     // quality
      append_seq(b, seq);
      b->offsets.push_back(b->codes.size());
      if (!reader.next_line(&line)) break;         // next header
    }
  } else {
    return -3;  // unknown format
  }
  return 0;
}

// ---- multi-threaded plain-FASTA parsing --------------------------------
//
// The whole file is read into one buffer, split at '>' record starts into
// near-equal segments, and each segment parses into its own Buffers in a
// worker thread; results concatenate in file order. Gzip and FASTQ inputs
// stay on the single-threaded streaming path (gzip cannot be split;
// FASTQ '@' is ambiguous with quality lines).

bool looks_plain_fasta(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[2] = {0, 0};
  size_t n = fread(magic, 1, 2, f);
  fclose(f);
  return n == 2 && magic[0] == '>' && !(magic[0] == 0x1f && magic[1] == 0x8b);
}

void parse_fasta_span(const char* data, size_t begin, size_t end, Buffers* b) {
  init_lut();
  size_t i = begin;
  while (i < end) {
    // at a '>' header
    size_t line_end = i;
    while (line_end < end && data[line_end] != '\n') ++line_end;
    // name = first token after '>'
    size_t ns = i + 1, ne = ns;
    while (ne < line_end && data[ne] != ' ' && data[ne] != '\t' &&
           data[ne] != '\r')
      ++ne;
    b->name_offsets.push_back(b->names.size());
    b->names.insert(b->names.end(), data + ns, data + ne);
    b->names.push_back('\0');
    // sequence lines until next '>' or end
    size_t base = b->codes.size();
    i = (line_end < end) ? line_end + 1 : end;
    while (i < end && data[i] != '>') {
      size_t le = i;
      while (le < end && data[le] != '\n') ++le;
      size_t stop = le;
      while (stop > i && (data[stop - 1] == '\r')) --stop;
      size_t cur = b->codes.size();
      b->codes.resize(cur + (stop - i));
      uint8_t* dst = b->codes.data() + cur;
      for (size_t j = i; j < stop; ++j) dst[j - i] = g_lut[(unsigned char)data[j]];
      i = (le < end) ? le + 1 : end;
    }
    (void)base;
    b->offsets.push_back(b->codes.size());
  }
}

int parse_mt(const char* path, int threads, Buffers* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> data((size_t)sz);
  if (fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -5;
  }
  fclose(f);
  if (sz == 0) return -2;

  // segment boundaries at '\n>' (record starts)
  std::vector<size_t> starts;
  starts.push_back(0);
  size_t target = (size_t)sz / (size_t)threads;
  for (int t = 1; t < threads; ++t) {
    size_t pos = (size_t)t * target;
    while (pos + 1 < (size_t)sz &&
           !(data[pos] == '\n' && data[pos + 1] == '>'))
      ++pos;
    if (pos + 1 < (size_t)sz) starts.push_back(pos + 1);
  }
  starts.push_back((size_t)sz);

  size_t n_seg = starts.size() - 1;
  std::vector<Buffers> parts(n_seg);
  std::vector<std::thread> pool;
  for (size_t s = 0; s < n_seg; ++s) {
    pool.emplace_back([&, s]() {
      // skip leading whitespace/newlines in segment 0
      size_t begin = starts[s];
      while (begin < starts[s + 1] && data[begin] != '>') ++begin;
      parts[s].offsets.clear();  // span parser appends per-record ends only
      parse_fasta_span(data.data(), begin, starts[s + 1], &parts[s]);
    });
  }
  for (auto& th : pool) th.join();

  // concatenate in order, rebasing offsets
  out->offsets.push_back(0);
  for (auto& p : parts) {
    uint64_t code_base = out->codes.size();
    uint64_t name_base = out->names.size();
    out->codes.insert(out->codes.end(), p.codes.begin(), p.codes.end());
    out->names.insert(out->names.end(), p.names.begin(), p.names.end());
    for (uint64_t off : p.offsets) out->offsets.push_back(code_base + off);
    for (uint64_t off : p.name_offsets)
      out->name_offsets.push_back(name_base + off);
  }
  return 0;
}

}  // namespace

extern "C" {

struct FastxParsed {
  uint8_t* codes;
  uint64_t* offsets;       // n_reads + 1
  char* names;             // concatenated, NUL-separated
  uint64_t* name_offsets;  // n_reads
  uint64_t n_reads;
  uint64_t total_bases;
  uint64_t names_bytes;
};

// Returns 0 on success; fills *out. Free with fastx_free.
// threads > 1 uses the segmented parallel parser for plain FASTA inputs
// (gzip/FASTQ fall back to the streaming parser).
int fastx_parse_threads(const char* path, int threads, FastxParsed* out) {
  Buffers b;
  int rc;
  if (threads > 1 && looks_plain_fasta(path)) {
    rc = parse_mt(path, threads, &b);
  } else {
    rc = parse(path, &b);
  }
  if (rc != 0) return rc;
  out->n_reads = b.offsets.size() - 1;
  out->total_bases = b.codes.size();
  out->names_bytes = b.names.size();

  out->codes = (uint8_t*)malloc(b.codes.size() ? b.codes.size() : 1);
  memcpy(out->codes, b.codes.data(), b.codes.size());
  out->offsets = (uint64_t*)malloc(b.offsets.size() * sizeof(uint64_t));
  memcpy(out->offsets, b.offsets.data(), b.offsets.size() * sizeof(uint64_t));
  out->names = (char*)malloc(b.names.size() ? b.names.size() : 1);
  memcpy(out->names, b.names.data(), b.names.size());
  out->name_offsets =
      (uint64_t*)malloc((out->n_reads ? out->n_reads : 1) * sizeof(uint64_t));
  memcpy(out->name_offsets, b.name_offsets.data(),
         out->n_reads * sizeof(uint64_t));
  return 0;
}

int fastx_parse(const char* path, FastxParsed* out) {
  return fastx_parse_threads(path, 1, out);
}

// Fill a padded bucket matrix: out[i, :len_i] = codes[offsets[rows[i]] ...],
// rest untouched (caller pre-fills with the INVALID code). Plain memcpy per
// read — the host VMs this runs on have poor vectorized-numpy throughput.
void fastx_fill_bucket(const uint8_t* codes, const uint64_t* offsets,
                       const int32_t* rows, uint64_t n_rows,
                       uint64_t bucket_len, uint8_t* out) {
  for (uint64_t i = 0; i < n_rows; ++i) {
    uint64_t r = (uint64_t)rows[i];
    uint64_t len = offsets[r + 1] - offsets[r];
    if (len > bucket_len) len = bucket_len;
    memcpy(out + i * bucket_len, codes + offsets[r], len);
  }
}

// Fill a 2-bit-packed bucket: out_packed[i] holds ceil(bucket_len/4) bytes
// (4 bases each, little-endian within the byte: base j in bits 2*(j%4)),
// out_valid holds ceil(bucket_len/8) validity bits (bit j%8 of byte j/8).
// Padding/invalid bases pack as A with a cleared validity bit. Shrinks the
// host->device upload 4x (plus 1/8 for the mask) — the upload is a
// first-order cost on tunneled TPU hosts.
void fastx_fill_bucket_packed(const uint8_t* codes, const uint64_t* offsets,
                              const int32_t* rows, uint64_t n_rows,
                              uint64_t bucket_len, uint8_t* out_packed,
                              uint8_t* out_valid) {
  uint64_t packed_stride = (bucket_len + 3) / 4;
  uint64_t valid_stride = (bucket_len + 7) / 8;
  for (uint64_t i = 0; i < n_rows; ++i) {
    uint64_t r = (uint64_t)rows[i];
    uint64_t len = offsets[r + 1] - offsets[r];
    if (len > bucket_len) len = bucket_len;
    const uint8_t* src = codes + offsets[r];
    uint8_t* pk = out_packed + i * packed_stride;
    uint8_t* vd = out_valid + i * valid_stride;
    for (uint64_t j = 0; j < len; ++j) {
      uint8_t c = src[j];
      if (c < 4) {
        pk[j >> 2] |= (uint8_t)(c << ((j & 3) * 2));
        vd[j >> 3] |= (uint8_t)(1u << (j & 7));
      }
      // invalid: leave 0 bits (A) with validity 0
    }
  }
}

// One formatted row into dst (caller guarantees capacity); returns bytes.
// snprintf("%.9g") matches the python oracle's f"{x:.9g}" byte-for-byte
// (test_native_io); names/ranks are appended with memcpy + manual itoa —
// fprintf's per-call overhead (locale, vfprintf parse, stream lock) was
// the output stage's dominant cost at ~0.4 us/row.
inline size_t format_row(char* dst, const char* qname, size_t qlen, char qo,
                         const char* tname, size_t tlen, char to,
                         uint64_t rank, double d) {
  char* p = dst;
  memcpy(p, qname, qlen);
  p += qlen;
  *p++ = '\t';
  *p++ = qo;
  *p++ = '\t';
  memcpy(p, tname, tlen);
  p += tlen;
  *p++ = '\t';
  *p++ = to;
  *p++ = '\t';
  char tmp[24];
  int n = 0;
  do {
    tmp[n++] = (char)('0' + rank % 10);
    rank /= 10;
  } while (rank);
  while (n) *p++ = tmp[--n];
  *p++ = '\t';
  // to_chars(general, 9) == printf %.9g by [charconv.to.chars] (and
  // byte-checked against the python oracle's f"{x:.9g}" in tests) at a
  // fraction of snprintf's cost
  auto res = std::to_chars(p, p + 32, d, std::chars_format::general, 9);
  p = res.ptr;
  *p++ = '\n';
  return (size_t)(p - dst);
}

// Overlap writer over the raw neighbor matrices: skips self rows
// (t == 2R-row index) and negative/unset targets internally, so the host
// does zero numpy row filtering. Rows are formatted into per-thread
// memory buffers and fwritten in order.
int64_t fastx_write_overlaps_matrix(const char* path, const char* names,
                                    const uint64_t* name_offsets,
                                    uint64_t n_names, const int32_t* idx,
                                    const float* dist, uint64_t n_rows,
                                    uint64_t k) {
  // name lengths once (strlen per row would rescan)
  std::vector<uint32_t> nlen(n_names);
  size_t max_name = 1;
  for (uint64_t i = 0; i < n_names; ++i) {
    nlen[i] = (uint32_t)strlen(names + name_offsets[i]);
    if (nlen[i] > max_name) max_name = nlen[i];
  }
  for (uint64_t q = 0; q < n_rows; ++q) {
    if ((q >> 1) >= n_names) return -2;
    for (uint64_t r = 0; r < k; ++r) {
      int32_t t = idx[q * k + r];
      if (t >= 0 && (uint64_t)(t >> 1) >= n_names) return -2;
    }
  }
  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 8) n_threads = 8;
  uint64_t per = (n_rows + n_threads - 1) / n_threads;
  std::vector<std::string> bufs(n_threads);
  std::vector<int64_t> counts(n_threads, 0);
  std::vector<std::thread> workers;
  for (unsigned w = 0; w < n_threads; ++w) {
    workers.emplace_back([&, w]() {
      uint64_t lo = w * per, hi = lo + per;
      if (hi > n_rows) hi = n_rows;
      if (lo >= hi) return;
      std::string& out = bufs[w];
      out.reserve((hi - lo) * k * (2 * max_name + 40) / 2);
      size_t row_cap = 2 * max_name + 64;
      std::vector<char> row(row_cap);
      int64_t written = 0;
      for (uint64_t q = lo; q < hi; ++q) {
        const char* qname = names + name_offsets[q >> 1];
        size_t qlen = nlen[q >> 1];
        char qo = (q & 1) ? '-' : '+';
        for (uint64_t r = 0; r < k; ++r) {
          int32_t t = idx[q * k + r];
          if (t < 0 || (uint64_t)t == q) continue;
          size_t n = format_row(
              row.data(), qname, qlen, qo, names + name_offsets[t >> 1],
              nlen[t >> 1], (t & 1) ? '-' : '+', r,
              (double)dist[q * k + r]);
          out.append(row.data(), n);
          ++written;
        }
      }
      counts[w] = written;
    });
  }
  for (auto& t : workers) t.join();
  FILE* f = fopen(path, "ab");
  if (!f) return -1;
  int64_t total = 0;
  for (unsigned w = 0; w < n_threads; ++w) {
    if (!bufs[w].empty() &&
        fwrite(bufs[w].data(), 1, bufs[w].size(), f) != bufs[w].size()) {
      fclose(f);
      return -3;
    }
    total += counts[w];
  }
  fclose(f);
  return total;
}

// Append overlap rows to an opened-for-write FILE (path), reference TSV
// contract (6 columns; orientation = row parity). Returns rows written or
// negative errno-style code. Python-level writers on the throttled host
// VMs cost 3-25 s per million rows; this loop is I/O-bound.
int64_t fastx_write_overlaps(const char* path, const char* names,
                             const uint64_t* name_offsets, uint64_t n_names,
                             const int32_t* q_rows, const int32_t* t_rows,
                             const int32_t* ranks, const float* dists,
                             uint64_t n_rows) {
  FILE* f = fopen(path, "ab");
  if (!f) return -1;
  static char buf[1 << 20];
  setvbuf(f, buf, _IOFBF, sizeof(buf));
  for (uint64_t i = 0; i < n_rows; ++i) {
    uint32_t q = (uint32_t)q_rows[i], t = (uint32_t)t_rows[i];
    uint64_t qn = q >> 1, tn = t >> 1;
    if (qn >= n_names || tn >= n_names) {
      fclose(f);
      return -2;
    }
    fprintf(f, "%s\t%c\t%s\t%c\t%d\t%.9g\n", names + name_offsets[qn],
            (q & 1) ? '-' : '+', names + name_offsets[tn],
            (t & 1) ? '-' : '+', ranks[i], (double)dists[i]);
  }
  fclose(f);
  return (int64_t)n_rows;
}

void fastx_free(FastxParsed* p) {
  free(p->codes);
  free(p->offsets);
  free(p->names);
  free(p->name_offsets);
  p->codes = nullptr;
  p->offsets = nullptr;
  p->names = nullptr;
  p->name_offsets = nullptr;
}

}  // extern "C"
