// Native host-side k-mer count-table query.
//
// One C call replaces the Python repair-path query chain
// (jasper_tpu.polish.semantics.effective_canonical_words +
//  jasper_tpu.table.host_table.HostKmerTable.lookup_one), which is the
// host-side analog of the reference's per-k-mer SWIG crossing into
// jellyfish binary_query_base (reference src/jasper.py:70-71 ->
// jellyfish binary_dumper.hpp:148-189). Semantics are exact:
//
//  * effective key of a query string s: the first run of ACGT/acgt chars of
//    s[:k], padded with 'A' (code 0) to k bases — matching MerDNA's
//    from-string behavior (jellyfish mer_dna.hpp:38-55; zero bits read 'A').
//  * canonical = min(key, revcomp(key)) under MSB-first word comparison.
//  * probe: murmur3-32 home bucket, bucket-linear without wraparound,
//    definitive miss at the first bucket containing an empty slot, bounded
//    by the table's pad region (layout in jasper_tpu.table.kmer_table).
//
// Table memory layout (must match jasper_tpu/table/kmer_table.py):
//   tab: uint32 [n_buckets + pad_buckets][64]
//   each 64-u32 row = (64/sw) slots of sw u32: key words 0..W-1 (word 0
//   least significant), slot word sw-1 = count (0 == empty).

#include <cstdint>
#include <cstring>

namespace {

constexpr int ROW_U32 = 64;
// W <= 63 covers the full k <= 1008 range of table.kmer_table.slot_words_for
// (wide mers use one 64-u32 slot per bucket; probing degenerates to plain
// linear probing bounded by the pad region, same as the Python table).
constexpr int MAX_W = 63;

// ASCII -> 2-bit code; 0xFF = not ACGT (run terminator).
struct CodeTab {
  uint8_t t[256];
  CodeTab() {
    memset(t, 0xFF, sizeof(t));
    t['A'] = t['a'] = 0;
    t['C'] = t['c'] = 1;
    t['G'] = t['g'] = 2;
    t['T'] = t['t'] = 3;
  }
};
const CodeTab kCode;

inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

// murmur3-32 body+fmix over W u32 words, seed "jspr" — identical to
// jasper_tpu.ops.hashing.mix32.
inline uint32_t mix32(const uint32_t* w, int W) {
  uint32_t h = 0x6A737072u;
  for (int j = 0; j < W; ++j) {
    uint32_t k = w[j] * 0xCC9E2D51u;
    k = rotl32(k, 15);
    k *= 0x1B873593u;
    h ^= k;
    h = rotl32(h, 13);
    h = h * 5u + 0xE6546B64u;
  }
  h ^= (uint32_t)(4 * W);
  h ^= h >> 16;
  h *= 0x85EBCA6Bu;
  h ^= h >> 13;
  h *= 0xC2B2AE35u;
  h ^= h >> 16;
  return h;
}

// Pack the effective canonical key of s[0:slen] (k bases, 'A'-padded past the
// first non-ACGT char / end of string) into key[0..W-1].
inline void effective_canonical_key(const char* s, int64_t slen, int k, int W,
                                    uint32_t* key) {
  uint8_t codes[16 * MAX_W + 16];  // k <= 1008 < 1024
  int64_t n = slen < k ? slen : k;
  int stop = 0;
  for (; stop < n; ++stop) {
    uint8_t c = kCode.t[(uint8_t)s[stop]];
    if (c == 0xFF) break;
    codes[stop] = c;
  }
  for (int p = stop; p < k; ++p) codes[p] = 0;  // 'A' padding

  uint32_t fwd[MAX_W] = {0}, rc[MAX_W] = {0};
  for (int p = 0; p < k; ++p) {
    int bit = 2 * (k - 1 - p);
    fwd[bit >> 5] |= (uint32_t)codes[p] << (bit & 31);
    int bitr = 2 * p;  // rc base q = 3 - codes[k-1-q]; q = k-1-p
    rc[bitr >> 5] |= (uint32_t)(3 - codes[p]) << (bitr & 31);
  }
  bool fwd_le = true;
  for (int j = W - 1; j >= 0; --j) {
    if (fwd[j] != rc[j]) { fwd_le = fwd[j] < rc[j]; break; }
  }
  const uint32_t* sel = fwd_le ? fwd : rc;
  for (int j = 0; j < W; ++j) key[j] = sel[j];
}

// Home bucket = hash range-mapped onto [0, n_buckets) with a fixed-point
// multiply-high (jasper_tpu.ops.hashing home_of with owner_bits=0 — host
// tables are single-shard). Monotone in h; n_buckets need not be pow2.
inline uint64_t home_of(uint32_t h, uint64_t n_buckets) {
  if (n_buckets <= 1) return 0;
  return ((uint64_t)h * n_buckets) >> 32;
}

// Probe one packed key. Layout args as documented above.
inline uint32_t probe(const uint32_t* tab, uint64_t n_buckets, int pad_buckets,
                      int W, int sw, const uint32_t* key) {
  uint64_t b = home_of(mix32(key, W), n_buckets);
  uint64_t last = n_buckets + (uint64_t)pad_buckets - 1;
  int slots = ROW_U32 / sw;
  // word-major rows: slot s's word j at row[j*slots + s], count at
  // row[W*slots + s] (jasper_tpu/table/kmer_table.py layout)
  for (;;) {
    const uint32_t* row = tab + b * ROW_U32;
    bool has_empty = false;
    for (int sidx = 0; sidx < slots; ++sidx) {
      uint32_t cnt = row[W * slots + sidx];
      if (cnt == 0) { has_empty = true; continue; }
      bool eq = true;
      for (int j = 0; j < W; ++j)
        if (row[j * slots + sidx] != key[j]) { eq = false; break; }
      if (eq) return cnt;
    }
    if (has_empty || b >= last) return 0;
    ++b;
  }
}

}  // namespace

// Entry-point argument validation: fail closed (return 0 / zero-fill)
// rather than overflowing the key[MAX_W] stack arrays on a bad k/W/sw.
inline bool args_ok(int k, int W, int sw) {
  // sw need not divide 64 (tight packing leaves spare row-tail words);
  // slots = 64 / sw truncates past them.
  return k > 0 && W > 0 && W <= MAX_W && sw > 0 && sw <= ROW_U32 && W < sw &&
         2 * (int64_t)k <= 32 * (int64_t)W;
}

extern "C" {

// Count of the effective canonical k-mer of s[0:slen]. Exact equivalent of
// CountSource.count's uncached path. The caller materializes the slice, so
// Python negative-index slice quirks never reach this function.
uint32_t jt_query_str(const uint32_t* tab, uint64_t n_buckets, int pad_buckets,
                      int k, int W, int sw, const char* s, int64_t slen) {
  if (!args_ok(k, W, sw) || pad_buckets < 0) return 0;
  uint32_t key[MAX_W];
  effective_canonical_key(s, slen, k, W, key);
  return probe(tab, n_buckets, pad_buckets, W, sw, key);
}

// Batched substring queries over one string: out[i] = count of the effective
// canonical k-mer of s[starts[i] : starts[i]+k].
//
// Starts are clamped to [0, slen] — NOT Python negative-index slice
// semantics. Boundary walks whose indices can go negative
// (polish.engine._repair_region) must keep materializing the slice and call
// jt_query_str; this batch API serves the strided check_sequence /
// count_bad loops, whose starts are always >= 0 (reference
// src/jasper.py:585-612).
void jt_query_substr_batch(const uint32_t* tab, uint64_t n_buckets,
                           int pad_buckets, int k, int W, int sw,
                           const char* s, int64_t slen, const int64_t* starts,
                           int64_t n, uint32_t* out) {
  if (!args_ok(k, W, sw) || pad_buckets < 0) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0;
    return;
  }
  for (int64_t i = 0; i < n; ++i) {
    int64_t st = starts[i];
    if (st < 0) st = 0;
    if (st > slen) st = slen;
    uint32_t key[MAX_W];
    effective_canonical_key(s + st, slen - st, k, W, key);
    out[i] = probe(tab, n_buckets, pad_buckets, W, sw, key);
  }
}

// Expose the packed effective canonical key (test hook).
void jt_effective_key(int k, int W, const char* s, int64_t slen,
                      uint32_t* out) {
  if (W <= 0 || W > MAX_W) return;
  if (k <= 0 || 2 * (int64_t)k > 32 * (int64_t)W) {
    for (int j = 0; j < W; ++j) out[j] = 0;
    return;
  }
  effective_canonical_key(s, slen, k, W, out);
}

}  // extern "C"
