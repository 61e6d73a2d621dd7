// Native FASTA/FASTQ streaming parser + 2-bit encoder.
//
// Host-runtime equivalent of the reference's native sequence-input stack
// (reference jellyfish mer_overlap_sequence_parser.hpp:160-216,
// whole_sequence_parser.hpp, mer_qual_iterator.hpp:57-86): parses raw file
// bytes into base-code arrays (A=0 C=1 G=2 T=3, N=4, other=5) with one
// N separator between records, dropping headers / '+' lines / newlines, and
// optionally masking FASTQ bases below a quality threshold. The Python layer
// (jasper_tpu.io.native) feeds decompressed blocks and slices the emitted
// codes into device chunks.
//
// Incremental state machine: safe to feed arbitrary block boundaries
// (mid-line, mid-record). One parser per stream. Thread-safe across
// parsers (no globals besides the const code table).
//
// Build: make -C native  ->  libjtfastx.so (ctypes-loaded).

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr uint8_t CODE_N = 4;
constexpr uint8_t CODE_INVALID = 5;

struct CodeTable {
  uint8_t t[256];
  CodeTable() {
    memset(t, CODE_INVALID, sizeof(t));
    t[(unsigned)'A'] = t[(unsigned)'a'] = 0;
    t[(unsigned)'C'] = t[(unsigned)'c'] = 1;
    t[(unsigned)'G'] = t[(unsigned)'g'] = 2;
    t[(unsigned)'T'] = t[(unsigned)'t'] = 3;
    t[(unsigned)'N'] = t[(unsigned)'n'] = CODE_N;
  }
};
const CodeTable kCodes;

enum State : uint8_t {
  S_START,      // expecting '>' or '@' (format auto-detect)
  S_FA_HEADER,  // FASTA: inside a header line
  S_FA_SEQ,     // FASTA: sequence lines until next '>'
  S_FQ_HEADER,  // FASTQ: inside '@' header line
  S_FQ_SEQ,     // FASTQ: sequence line(s) until '+'
  S_FQ_PLUS,    // FASTQ: inside '+' line
  S_FQ_QUAL,    // FASTQ: quality bytes (counted against seq length)
  S_FQ_EOL,     // FASTQ: skip to end of quality line, then header follows
};

}  // namespace

extern "C" {

struct JtParser {
  State state;
  uint8_t min_qual;    // 0 = no quality masking
  int emitted_any;     // whether at least one base was emitted
  int need_sep;        // separator pending before next record's bases
  int64_t seq_len;     // FASTQ: bases in current record
  int64_t qual_seen;   // FASTQ: quality bytes consumed so far
  // FASTQ quality masking needs to rewrite bases already emitted for this
  // record; record where the current record's codes begin in the caller's
  // rolling output. Caller guarantees each record's codes stay within one
  // output buffer by flushing between feeds only at record boundaries —
  // instead we buffer the current FASTQ record's codes here.
  uint8_t* rec;        // pending record codes (FASTQ with masking)
  int64_t rec_len;
  int64_t rec_cap;
};

JtParser* jt_parser_new(uint8_t min_qual) {
  JtParser* p = (JtParser*)calloc(1, sizeof(JtParser));
  p->state = S_START;
  p->min_qual = min_qual;
  return p;
}

void jt_parser_free(JtParser* p) {
  if (p) {
    free(p->rec);
    free(p);
  }
}

static void rec_push(JtParser* p, uint8_t code) {
  if (p->rec_len == p->rec_cap) {
    p->rec_cap = p->rec_cap ? p->rec_cap * 2 : 4096;
    p->rec = (uint8_t*)realloc(p->rec, p->rec_cap);
  }
  p->rec[p->rec_len++] = code;
}

// Feed n input bytes; emit codes into out (capacity out_cap >= n + 1).
// Returns number of codes written, or -1 if out_cap is too small.
// Emits one CODE_N separator between records (not before the first or,
// until the stream continues, after the last).
int64_t jt_parser_feed(JtParser* p, const uint8_t* data, int64_t n,
                       uint8_t* out, int64_t out_cap) {
  if (out_cap < n + 1 + p->rec_len) return -1;
  int64_t w = 0;
  const int mask_qual = p->min_qual != 0;

  for (int64_t i = 0; i < n; ++i) {
    const uint8_t c = data[i];
    switch (p->state) {
      case S_START:
        if (c == '>') {
          p->state = S_FA_HEADER;
        } else if (c == '@') {
          p->state = S_FQ_HEADER;
        }  // ignore leading junk/blank lines
        break;

      case S_FA_HEADER:
        if (c == '\n') p->state = S_FA_SEQ;
        break;

      case S_FA_SEQ:
        if (c == '>') {
          p->state = S_FA_HEADER;
          p->need_sep = 1;
        } else if (c != '\n' && c != '\r') {
          if (p->need_sep && p->emitted_any) out[w++] = CODE_N;
          p->need_sep = 0;
          out[w++] = kCodes.t[c];
          p->emitted_any = 1;
        }
        break;

      case S_FQ_HEADER:
        if (c == '\n') {
          p->state = S_FQ_SEQ;
          p->seq_len = 0;
          p->qual_seen = 0;
          p->rec_len = 0;
        }
        break;

      case S_FQ_SEQ:
        if (c == '+' && p->seq_len > 0) {
          // '+' only starts the separator line at line start; we only get
          // here at line start because '\n' is skipped below and '+' inside
          // a sequence line is not a valid base anyway
          p->state = S_FQ_PLUS;
        } else if (c != '\n' && c != '\r') {
          rec_push(p, kCodes.t[c]);
          p->seq_len++;
        }
        break;

      case S_FQ_PLUS:
        if (c == '\n') p->state = S_FQ_QUAL;
        break;

      case S_FQ_QUAL:
        if (c != '\n' && c != '\r') {
          if (mask_qual && c < p->min_qual && p->qual_seen < p->rec_len)
            p->rec[p->qual_seen] = CODE_INVALID;
          p->qual_seen++;
          if (p->qual_seen == p->seq_len) {
            // record complete: flush buffered codes
            if (p->emitted_any) out[w++] = CODE_N;
            memcpy(out + w, p->rec, p->rec_len);
            w += p->rec_len;
            p->emitted_any = 1;
            p->rec_len = 0;
            p->state = S_FQ_EOL;
          }
        }
        break;

      case S_FQ_EOL:
        // consume the quality line's newline; the next line is a header
        if (c == '\n') p->state = S_FQ_HEADER;
        break;
    }
  }
  return w;
}

// Bytes currently buffered for an incomplete FASTQ record (the caller adds
// this to its output-capacity computation before the next feed).
int64_t jt_parser_pending(JtParser* p) { return p->rec_len; }

// Flush any complete-but-unreported state at end of stream. FASTA needs no
// flush (codes are emitted eagerly); a truncated FASTQ record (quality line
// shorter than sequence) is dropped, like a parse error in the reference.
int64_t jt_parser_finish(JtParser* p, uint8_t* out, int64_t out_cap) {
  (void)p;
  (void)out;
  (void)out_cap;
  return 0;
}

// Bulk ASCII -> code table encode (no parsing).
void jt_encode(const uint8_t* seq, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = kCodes.t[seq[i]];
}

}  // extern "C"
