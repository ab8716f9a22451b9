// edlib_tpu native runtime: host-side C++ components.
//
// The TPU compute path is JAX/Pallas (edlib_tpu/ops); this library covers
// the runtime around it the way the reference keeps its runtime in C++:
//   * FASTA IO      (counterpart of apps/aligner/aligner.cpp:290-328)
//   * CIGAR encode  (counterpart of edlib.cpp:303-350)
//   * single-pair Myers engines for the CLI latency path (counterpart of
//     edlib.cpp:550-928) and the traceback walker (edlib.cpp:942-1141)
//
// Design is NOT a port: the engine is an unbanded full sweep over 64-bit
// words whose target is virtually extended with W wildcard columns, so the
// bottom-row score stream covers every end position and the NW corner with
// no block readout; all location/k logic lives in Python.  The traceback
// decodes whole columns to integer cell values (vectorizable, branch-light)
// instead of chasing bits through banded blocks.  Banded variants (Ukkonen)
// sit alongside as pure-pruning accelerators.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <algorithm>
#include <thread>
#include <vector>

typedef uint64_t Word;
static const int WBITS = 64;

extern "C" {

// ---------------------------------------------------------------------------
// FASTA reading. Two-pass C ABI: stat sizes, then fill caller buffers.
// Tolerates headerless files; '>' header lines are skipped; '\r'/'\n'
// ignored inside sequences (same acceptance as the reference reader).
// ---------------------------------------------------------------------------

int etn_fasta_stat(const char* path, int64_t* n_seqs, int64_t* total_len) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    *n_seqs = 0;
    *total_len = 0;
    bool in_header = false, in_seq = false;
    std::vector<char> buf(1 << 20);
    size_t got;
    while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
        for (size_t i = 0; i < got; i++) {
            char c = buf[i];
            if (in_header) {
                if (c == '\n') in_header = false;
            } else if (c == '>') {
                in_header = true;
                in_seq = false;
            } else if (c != '\r' && c != '\n') {
                if (!in_seq) { in_seq = true; (*n_seqs)++; }
                (*total_len)++;
            }
        }
    }
    fclose(f);
    return 0;
}

int etn_fasta_read(const char* path, char* data, int64_t* offsets,
                   int64_t data_cap, int64_t seq_cap) {
    // data_cap/seq_cap are the capacities from etn_fasta_stat; if the file
    // grew between the two passes, stop at capacity instead of overrunning
    // the caller's buffers.
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    bool in_header = false, in_seq = false;
    int64_t pos = 0, seq = 0;
    std::vector<char> buf(1 << 20);
    size_t got;
    while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
        for (size_t i = 0; i < got; i++) {
            char c = buf[i];
            if (in_header) {
                if (c == '\n') in_header = false;
            } else if (c == '>') {
                in_header = true;
                in_seq = false;
            } else if (c != '\r' && c != '\n') {
                if (!in_seq) {
                    if (seq >= seq_cap) goto done;
                    in_seq = true;
                    offsets[seq++] = pos;
                }
                if (pos >= data_cap) goto done;
                data[pos++] = c;
            }
        }
    }
done:
    offsets[seq] = pos;
    fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// CIGAR run-length encoding. ops: 0 match, 1 insert, 2 delete, 3 mismatch.
// extended!=0 -> "=IDX", else "MIDM". Returns bytes written (excl. NUL),
// or -1 on an invalid op code. out must hold >= 12*n+1 bytes worst case.
// ---------------------------------------------------------------------------

int64_t etn_cigar_encode(const uint8_t* ops, int64_t n, int extended,
                         char* out) {
    static const char ext_chars[4] = {'=', 'I', 'D', 'X'};
    static const char std_chars[4] = {'M', 'I', 'D', 'M'};
    const char* chars = extended ? ext_chars : std_chars;
    int64_t w = 0;
    int64_t i = 0;
    while (i < n) {
        if (ops[i] > 3) return -1;
        char sym = chars[ops[i]];
        int64_t j = i + 1;
        while (j < n && ops[j] <= 3 && chars[ops[j]] == sym) j++;
        if (j < n && ops[j] > 3) return -1;
        w += snprintf(out + w, 24, "%lld%c", (long long)(j - i), sym);
        i = j;
    }
    out[w] = 0;
    return w;
}

// ---------------------------------------------------------------------------
// Single-pair Myers engine (64-bit words, unbanded).
//
// peq layout: (sigma+1) rows x n_words, row sigma = wildcard (all ones);
// built by the caller (Python) or by etn_build_peq below.
// ---------------------------------------------------------------------------

static inline int advance(Word& Pv, Word& Mv, Word Eq, int hin) {
    // Fully branchless: hout and the hin injections are data-dependent and
    // unpredictable pre-hit — branches here cost ~2x in the column loop.
    Word hin_neg = (Word)(hin < 0);
    Word Xv = Eq | Mv;
    Eq |= hin_neg;
    Word Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq;
    Word Ph = Mv | ~(Xh | Pv);
    Word Mh = Pv & Xh;
    int hout = (int)(Ph >> (WBITS - 1)) - (int)(Mh >> (WBITS - 1));
    Ph = (Ph << 1) | (Word)(hin > 0);
    Mh = (Mh << 1) | hin_neg;
    Pv = Mh | ~(Xv | Ph);
    Mv = Ph & Xv;
    return hout;
}

void etn_build_peq(const uint8_t* q_ids, int64_t qlen, const uint8_t* eq,
                   int sigma, Word* peq /* (sigma+1) * n_words */) {
    int64_t n_words = (qlen + WBITS - 1) / WBITS;
    if (n_words == 0) n_words = 1;
    // One pass over the query with per-symbol match lists (identity eq ->
    // a single OR per position) instead of an O(qlen * sigma) per-cell eq
    // probe: at Mbp scale the probe was the entire profile-build cost,
    // and this runs once per Hirschberg node.
    memset(peq, 0, (size_t)sigma * n_words * sizeof(Word));
    Word* wrow = peq + (size_t)sigma * n_words;  // wildcard row: all-ones
    for (int64_t w = 0; w < n_words; w++) wrow[w] = ~(Word)0;
    std::vector<int16_t> ml((size_t)sigma * sigma);
    std::vector<int> mn(sigma, 0);
    for (int c = 0; c < sigma; c++) {
        int n = 0;
        for (int s = 0; s < sigma; s++)
            if (eq[(int64_t)c * sigma + s])
                ml[(size_t)c * sigma + n++] = (int16_t)s;
        mn[c] = n;
    }
    for (int64_t r = 0; r < qlen; r++) {
        int c = q_ids[r];
        Word bit = (Word)1 << (r & (WBITS - 1));
        Word* col = peq + (r >> 6);
        const int16_t* l = &ml[(size_t)c * sigma];
        int n = mn[c];
        for (int i = 0; i < n; i++) col[(int64_t)l[i] * n_words] |= bit;
    }
    // Padding rows beyond qlen match everything (same as the wildcard
    // row), so bottom-word cells stay pinned during wildcard extension.
    if (qlen & (WBITS - 1)) {
        Word pad = ~(Word)0 << (qlen & (WBITS - 1));
        for (int s = 0; s < sigma; s++)
            peq[(size_t)s * n_words + n_words - 1] |= pad;
    }
}

// Full sweep emitting the padded-bottom score after every column of the
// wildcard-extended target (t_scan = tlen + W columns; caller passes the
// target followed by W wildcard symbols). scores_out: int32[t_scan].
void etn_sweep_scores(const Word* peq, int64_t n_words,
                      const uint8_t* target, int64_t t_scan,
                      int hin0, int32_t* scores_out) {
    std::vector<Word> Pv(n_words, ~(Word)0), Mv(n_words, 0);
    int32_t score = (int32_t)(n_words * WBITS);
    for (int64_t c = 0; c < t_scan; c++) {
        const Word* eq_c = peq + (int64_t)target[c] * n_words;
        int h = hin0;
        for (int64_t w = 0; w < n_words; w++) {
            h = advance(Pv[w], Mv[w], eq_c[w], h);
        }
        score += h;
        scores_out[c] = score;
    }
}

// ---------------------------------------------------------------------------
// Banded engines (Ukkonen pruning; Myers 1999 §4 block reduction).
// Pruning-only: every emitted score <= the k in force is exact; cells the
// band skips are provably > k.  Semantics therefore identical to the
// unbanded sweeps after host filtering (counterpart of the reference's
// banded engines, edlib.cpp:550-928, with our wildcard-extension output
// convention instead of block readouts).
// ---------------------------------------------------------------------------

static const int32_t SCORE_INF = 0x3FFFFFFF;

static inline bool all_cells_above_k(Word P, Word M, int64_t bottom,
                                     int64_t k) {
    // Walk cells bottom-up: cell(i-1) = cell(i) - P_i + M_i.
    int64_t v = bottom;
    Word bit = (Word)1 << (WBITS - 1);
    for (int i = 0; i < WBITS; i++) {
        if (v <= k) return false;
        v -= (int64_t)((P & bit) != 0);
        v += (int64_t)((M & bit) != 0);
        bit >>= 1;
    }
    return true;
}

// Semiglobal banded sweep over the wildcard-extended target.
// Emits bottom score per column where the band reaches the bottom block;
// gap columns inside [0, n_processed) are bulk-filled with SCORE_INF (one
// vectorised fill per gap run instead of a per-column store — the
// k-tightened steady state sits near the top for long stretches).
// Returns the number of columns processed; entries beyond it are NOT
// written (band-vanish early exit for SHW).
// Core loop, templated over the per-bottom-column emitter so the
// all-positions stream path and the inline (best, positions) path share
// one implementation at zero cost.  emit(c, score) fires for every column
// where the band reaches the bottom block.
// TChar: target symbol-id type.  uint8_t everywhere except the sigma=256
// case, where the wildcard id is 256 and needs uint16_t headroom.
extern "C++" {
template <class TChar, class Emit>
static int64_t sweep_banded_core(const Word* peq, int64_t n_words,
                                 const TChar* target, int64_t t_scan,
                                 int hin0, int64_t k, Emit&& emit) {
    const int64_t maxNB = n_words;
    std::vector<Word> Pv(maxNB, ~(Word)0), Mv(maxNB, 0);
    std::vector<int64_t> score(maxNB);
    for (int64_t b = 0; b < maxNB; b++) score[b] = (b + 1) * WBITS;
    int64_t first = 0;
    int64_t last = std::min((k + 1 + WBITS - 1) / WBITS, maxNB) - 1;
    if (last < 0) last = 0;
    const int64_t STRONG_EVERY = 2048;

    for (int64_t c = 0; c < t_scan; c++) {
        // Steady-state fast path: with k tightened the band often sits at
        // block 0 for long stretches (HW read mapping on Mbp targets) —
        // run a tight single-block loop until the band wants to grow.
        if (first == 0 && last == 0 && maxNB > 1) {
            Word P0 = Pv[0], M0 = Mv[0];
            int64_t s0 = score[0];
            bool grew = false;
            for (; c < t_scan; c++) {
                if ((c & (STRONG_EVERY - 1)) == 0 && hin0 != 0)
                    break;  // hand SHW top-edge reduction to the slow path
                const Word* eqf = peq + (int64_t)target[c] * n_words;
                int h2 = advance(P0, M0, eqf[0], hin0);
                s0 += h2;
                if (s0 - h2 <= k && ((eqf[1] & (Word)1) || h2 < 0)) {
                    // Grow to block 1 for THIS column (mirrors the general
                    // path's growth), then resume the general loop.
                    Pv[1] = ~(Word)0;
                    Mv[1] = 0;
                    int64_t s1 = s0 - h2 + WBITS;
                    int h3 = advance(Pv[1], Mv[1], eqf[1], h2);
                    s1 += h3;
                    score[1] = s1;
                    last = 1;
                    while (last >= first && score[last] >= k + WBITS) last--;
                    if (hin0 == 0 && last < first) last = first;
                    grew = true;
                    break;
                }
            }
            Pv[0] = P0;
            Mv[0] = M0;
            score[0] = s0;
            if (c >= t_scan) break;
            if (grew) {
                if (last == maxNB - 1) {
                    emit(c, score[last]);
                    if (score[last] < k) k = score[last];
                }
                continue;  // column c fully processed in the fast path
            }
            // else: strong-reduce column — fall through unprocessed.
        }
        const Word* eq = peq + (int64_t)target[c] * n_words;
        int h = hin0;
        for (int64_t b = first; b <= last; b++) {
            h = advance(Pv[b], Mv[b], eq[b], h);
            score[b] += h;
        }
        // Band bottom: grow by one when the next block may hold <=k cells,
        // else shrink while provably out of band.
        if (last < maxNB - 1 && score[last] - h <= k
            && ((eq[last + 1] & (Word)1) || h < 0)) {
            last++;
            Pv[last] = ~(Word)0;
            Mv[last] = 0;
            score[last] = score[last - 1] - h + WBITS;
            int h2 = advance(Pv[last], Mv[last], eq[last], h);
            score[last] += h2;
            h = h2;
        } else {
            while (last >= first && score[last] >= k + WBITS) last--;
        }
        if (c % STRONG_EVERY == 0) {
            while (last >= first
                   && all_cells_above_k(Pv[last], Mv[last], score[last], k))
                last--;
        }
        if (hin0 == 0) {
            // HW: block 0 stays alive forever (free restart at the top
            // boundary keeps every column a candidate).
            if (last < first) last = first;
        } else {
            while (first <= last && score[first] >= k + WBITS) first++;
            if (c % STRONG_EVERY == 0) {
                while (first <= last
                       && all_cells_above_k(Pv[first], Mv[first],
                                            score[first], k))
                    first++;
            }
            if (last < first) {  // band vanished: all later scores > k
                return c;
            }
        }
        if (last == maxNB - 1) {
            emit(c, score[last]);
            if (score[last] < k) k = score[last];  // equal-or-better search
        }
    }
    return t_scan;
}
}  // extern "C++"

// Stream variant: all bottom scores, INF-filled gaps (bulk fills per gap
// run; entries beyond the returned count are NOT written).
int64_t etn_sweep_scores_banded(const Word* peq, int64_t n_words,
                                const uint8_t* target, int64_t t_scan,
                                int hin0, int64_t k, int32_t* scores_out) {
    int64_t gap_start = 0;
    int64_t n = sweep_banded_core(
        peq, n_words, target, t_scan, hin0, k,
        [&](int64_t c, int64_t sc) {
            std::fill(scores_out + gap_start, scores_out + c, SCORE_INF);
            scores_out[c] = (int32_t)sc;
            gap_start = c + 1;
        });
    std::fill(scores_out + gap_start, scores_out + n, SCORE_INF);
    return n;
}

// NW banded distance: dynamic Ukkonen band (value- and position-adaptive
// edges, one-block growth, per-column k tightening from the band bottom
// plus a periodic near-diagonal probe).  Pruning-only: exact whenever the
// distance is <= k, else returns -1.
int32_t etn_nw_distance_banded(const Word* peq, int64_t n_words,
                               const uint8_t* target, int64_t tlen,
                               int64_t qlen, int64_t k) {
    if (k < 0) return -1;
    int64_t diff = qlen - tlen;
    if ((diff > 0 ? diff : -diff) > k) return -1;
    const int64_t maxNB = n_words;
    const int64_t W = maxNB * WBITS - qlen;
    std::vector<Word> Pv(maxNB, ~(Word)0), Mv(maxNB, 0);
    std::vector<int64_t> score(maxNB);
    for (int64_t b = 0; b < maxNB; b++) score[b] = (b + 1) * WBITS;
    int64_t first = 0;
    int64_t half = (k < (k + diff) / 2 ? k : (k + qlen - tlen) / 2);
    if (half < 0) half = 0;
    int64_t last = std::min((half + 1 + WBITS - 1) / WBITS, maxNB) - 1;
    if (last < 0) last = 0;

    for (int64_t c = 0; c < tlen; c++) {
        const Word* eq_c = peq + (int64_t)target[c] * n_words;
        int h = 1;
        for (int64_t b = first; b <= last; b++) {
            h = advance(Pv[b], Mv[b], eq_c[b], h);
            score[b] += h;
        }
        // k tightening from the band-bottom corner bound (+W when the
        // padded last block is in play).
        {
            int64_t rb = (last + 1) * WBITS - 1;
            int64_t row_rem = qlen - rb - 1;
            int64_t col_rem = tlen - c - 1;
            int64_t rem = (row_rem > col_rem ? row_rem : col_rem)
                + (last == maxNB - 1 ? W : 0);
            if (score[last] + rem < k) k = score[last] + rem;
        }
        // Periodic near-diagonal probe: a far tighter corner bound than the
        // band bottom once the path locks onto the diagonal.
        if ((c & 63) == 0) {
            int64_t rd = c + diff / 2;
            if (rd > qlen - 1) rd = qlen - 1;
            if (rd < 0) rd = 0;
            int64_t bd = rd / WBITS;
            if (bd >= first && bd <= last) {
                int64_t v = score[bd];
                for (int64_t r = (bd + 1) * WBITS - 1; r > rd; r--) {
                    Word bit = (Word)1 << (r % WBITS);
                    v -= (int64_t)((Pv[bd] & bit) != 0);
                    v += (int64_t)((Mv[bd] & bit) != 0);
                }
                int64_t rr = qlen - 1 - rd;
                int64_t cr = tlen - 1 - c;
                int64_t bound = v + (rr > cr ? rr : cr);
                if (bound < k) k = bound;
            }
        }
        if ((diff > 0 ? diff : -diff) > k) return -1;
        // Grow the bottom edge by one block when its cells may still be
        // feasible (value+position test on the would-be bottom row).
        if (last + 1 < maxNB
            && !((last + 2) * WBITS - 1
                 > k - score[last] + 2 * WBITS - 2 - tlen + c + qlen)) {
            last++;
            Pv[last] = ~(Word)0;
            Mv[last] = 0;
            score[last] = score[last - 1] - h + WBITS;
            int h2 = advance(Pv[last], Mv[last], eq_c[last], h);
            score[last] += h2;
            h = h2;
        }
        // Shrink the bottom edge: blocks whose best cell is provably > k or
        // positionally unable to reach the corner within k.
        while (last >= first
               && (score[last] >= k + WBITS
                   || ((last + 1) * WBITS - 1 >
                       k - score[last] + 2 * WBITS - 2 - tlen + c + qlen + 1))) {
            last--;
        }
        // Advance the top edge symmetrically.
        while (first <= last
               && (score[first] >= k + WBITS
                   || ((first + 1) * WBITS - 1 <
                       score[first] - k - tlen + qlen + c))) {
            first++;
        }
        if (first > last) return -1;
    }
    int64_t bq = (qlen - 1) / WBITS;
    if (bq < first || bq > last) return -1;
    int64_t v = score[bq];
    int64_t top_row = bq * WBITS;
    for (int64_t r = (bq + 1) * WBITS - 1; r > qlen - 1; r--) {
        Word bit = (Word)1 << (r - top_row);
        v -= (int64_t)((Pv[bq] & bit) != 0);
        v += (int64_t)((Mv[bq] & bit) != 0);
    }
    return v <= k ? (int32_t)v : -1;
}

// Sweep to a stop column and decode that column's cell values — the
// Hirschberg primitive (counterpart of targetStopPosition, edlib.cpp:896-908,
// but returning decoded int cells instead of bit state).
// cells_out: int32[qlen]; cells_out[r] = cell(r, stop).
void etn_nw_cells_at(const Word* peq, int64_t n_words, int64_t qlen,
                     const uint8_t* target, int64_t stop,
                     int32_t* cells_out) {
    std::vector<Word> Pv(n_words, ~(Word)0), Mv(n_words, 0);
    for (int64_t c = 0; c <= stop; c++) {
        const Word* eq_c = peq + (int64_t)target[c] * n_words;
        int h = 1;
        for (int64_t w = 0; w < n_words; w++)
            h = advance(Pv[w], Mv[w], eq_c[w], h);
    }
    int32_t v = (int32_t)(stop + 1);
    for (int64_t r = 0; r < qlen; r++) {
        Word bit = (Word)1 << (r % WBITS);
        v += (int32_t)((Pv[r / WBITS] & bit) != 0)
           - (int32_t)((Mv[r / WBITS] & bit) != 0);
        cells_out[r] = v;
    }
}

// Banded variant: bestScore-banded sweep to the stop column (like the
// reference's Hirschberg half-sweeps, which run NW with k = bestScore,
// edlib.cpp:1252-1260).  Uses the same dynamic value+position band as
// etn_nw_distance_banded.  Out-of-band cells are reported as SCORE_INF —
// they are provably > k and can never satisfy the crossing-row equation.
// tlen is the FULL window width (the positional tests need it; the sweep
// stops at `stop`).
void etn_nw_cells_at_banded(const Word* peq, int64_t n_words, int64_t qlen,
                            const uint8_t* target, int64_t tlen,
                            int64_t stop, int64_t k, int32_t* cells_out) {
    const int64_t maxNB = n_words;
    int64_t diff = qlen - tlen;
    std::vector<Word> Pv(maxNB, ~(Word)0), Mv(maxNB, 0);
    std::vector<int64_t> score(maxNB);
    for (int64_t b = 0; b < maxNB; b++) score[b] = (b + 1) * WBITS;
    int64_t first = 0;
    int64_t half = (k < (k + diff) / 2 ? k : (k + qlen - tlen) / 2);
    if (half < 0) half = 0;
    int64_t last = std::min((half + 1 + WBITS - 1) / WBITS, maxNB) - 1;
    if (last < 0) last = 0;
    for (int64_t c = 0; c <= stop; c++) {
        const Word* eq_c = peq + (int64_t)target[c] * n_words;
        int h = 1;
        for (int64_t b = first; b <= last; b++) {
            h = advance(Pv[b], Mv[b], eq_c[b], h);
            score[b] += h;
        }
        if (last + 1 < maxNB
            && !((last + 2) * WBITS - 1
                 > k - score[last] + 2 * WBITS - 2 - tlen + c + qlen)) {
            last++;
            Pv[last] = ~(Word)0;
            Mv[last] = 0;
            score[last] = score[last - 1] - h + WBITS;
            int h2 = advance(Pv[last], Mv[last], eq_c[last], h);
            score[last] += h2;
            h = h2;
        }
        while (last >= first
               && (score[last] >= k + WBITS
                   || ((last + 1) * WBITS - 1 >
                       k - score[last] + 2 * WBITS - 2 - tlen + c + qlen + 1))) {
            last--;
        }
        while (first <= last
               && (score[first] >= k + WBITS
                   || ((first + 1) * WBITS - 1 <
                       score[first] - k - tlen + qlen + c))) {
            first++;
        }
        if (first > last) break;  // everything beyond is > k
    }
    for (int64_t r = 0; r < qlen; r++) cells_out[r] = SCORE_INF;
    if (first > last) return;
    // Decode in-band cells: anchor at the bottom of the last band block.
    int64_t rb = (last + 1) * WBITS - 1;
    int64_t v = score[last];
    for (int64_t r = rb; r >= first * WBITS; r--) {
        if (r < qlen) cells_out[r] = (int32_t)v;
        Word bit = (Word)1 << (r % WBITS);
        int64_t b = r / WBITS;
        v -= (int64_t)((Pv[b] & bit) != 0);
        v += (int64_t)((Mv[b] & bit) != 0);
    }
}

// ---------------------------------------------------------------------------
// NW capture + traceback: run the sweep storing (Pv, Mv) per column, then
// walk back over decoded cell values with the up -> left -> diagonal
// preference.  ops_out must hold qlen + tlen bytes. Returns ops length,
// or -1 if the walk is inconsistent with best_score.
// ---------------------------------------------------------------------------

int64_t etn_nw_path(const uint8_t* q_ids, int64_t qlen,
                    const uint8_t* t_ids, int64_t tlen,
                    const uint8_t* eq, int sigma,
                    int32_t best_score, uint8_t* ops_out) {
    if (qlen == 0 || tlen == 0) {
        for (int64_t i = 0; i < qlen + tlen; i++)
            ops_out[i] = qlen == 0 ? 2 /*DELETE*/ : 1 /*INSERT*/;
        return qlen + tlen;
    }
    int64_t n_words = (qlen + WBITS - 1) / WBITS;
    std::vector<Word> peq((int64_t)(sigma + 1) * n_words);
    etn_build_peq(q_ids, qlen, eq, sigma, peq.data());

    // bestScore-banded sweep with column capture (the reference's PATH
    // capture is banded the same way, edlib.cpp:1194-1198; out-of-band
    // cells never lie on an optimal path, so the walk never needs them).
    // Dynamic value+position band edges, same as etn_nw_distance_banded.
    const int64_t k = best_score;
    const int64_t diff = qlen - tlen;
    // Uninitialized capture buffers (the reference's AlignmentData is
    // `new Word[]`-raw too, edlib.cpp:106-120): only words [first..last]
    // of each column are written, and get_col reads exactly that range —
    // value-initializing tlen*n_words words costs ~a memset of the whole
    // matrix per leaf and dominated Hirschberg leaves at Mbp scale.
    std::unique_ptr<Word[]> colP(new Word[(size_t)tlen * n_words]);
    std::unique_ptr<Word[]> colM(new Word[(size_t)tlen * n_words]);
    std::vector<int64_t> col_first(tlen), col_last(tlen), col_anchor(tlen);
    {
        std::vector<Word> Pv(n_words, ~(Word)0), Mv(n_words, 0);
        std::vector<int64_t> score(n_words);
        for (int64_t b = 0; b < n_words; b++) score[b] = (b + 1) * WBITS;
        int64_t first = 0;
        int64_t half = (k < (k + diff) / 2 ? k : (k + qlen - tlen) / 2);
        if (half < 0) half = 0;
        int64_t last = std::min((half + 1 + WBITS - 1) / WBITS, n_words) - 1;
        if (last < 0) last = 0;
        for (int64_t c = 0; c < tlen; c++) {
            const Word* eq_c = peq.data() + (int64_t)t_ids[c] * n_words;
            int h = 1;
            for (int64_t b = first; b <= last; b++) {
                h = advance(Pv[b], Mv[b], eq_c[b], h);
                score[b] += h;
            }
            if (last + 1 < n_words
                && !((last + 2) * WBITS - 1
                     > k - score[last] + 2 * WBITS - 2 - tlen + c + qlen)) {
                last++;
                Pv[last] = ~(Word)0;
                Mv[last] = 0;
                score[last] = score[last - 1] - h + WBITS;
                int h2 = advance(Pv[last], Mv[last], eq_c[last], h);
                score[last] += h2;
                h = h2;
            }
            while (last >= first
                   && (score[last] >= k + WBITS
                       || ((last + 1) * WBITS - 1 >
                           k - score[last] + 2 * WBITS - 2 - tlen + c + qlen
                           + 1))) {
                last--;
            }
            while (first <= last
                   && (score[first] >= k + WBITS
                       || ((first + 1) * WBITS - 1 <
                           score[first] - k - tlen + qlen + c))) {
                first++;
            }
            if (first > last) return -1;  // bestScore inconsistent
            memcpy(&colP[(size_t)c * n_words + first], &Pv[first],
                   (last - first + 1) * sizeof(Word));
            memcpy(&colM[(size_t)c * n_words + first], &Mv[first],
                   (last - first + 1) * sizeof(Word));
            col_first[c] = first;
            col_last[c] = last;
            col_anchor[c] = score[last];
        }
    }

    // Value-space walk (same move preference as the reference traceback:
    // up=INSERT, left=DELETE, then diagonal).  Out-of-band cells decode to
    // SCORE_INF and never satisfy a move equation.
    std::vector<int32_t> cur(qlen + 1), left(qlen + 1);
    auto get_col = [&](int64_t c, int32_t* dst) {
        if (c < 0) {
            for (int64_t r = 0; r <= qlen; r++) dst[r] = (int32_t)r;
            return;
        }
        const int64_t first = col_first[c], last = col_last[c];
        for (int64_t r = 0; r <= qlen; r++) dst[r] = SCORE_INF;
        if (first == 0) dst[0] = (int32_t)(c + 1);  // boundary row
        int64_t v = col_anchor[c];
        const Word* P = &colP[(size_t)c * n_words];
        const Word* M = &colM[(size_t)c * n_words];
        for (int64_t r = (last + 1) * WBITS - 1; r >= first * WBITS; r--) {
            if (r < qlen) dst[r + 1] = (int32_t)v;
            Word bit = (Word)1 << (r % WBITS);
            v -= (int64_t)((P[r / WBITS] & bit) != 0);
            v += (int64_t)((M[r / WBITS] & bit) != 0);
        }
    };
    int64_t r = qlen - 1, c = tlen - 1;
    int32_t v = best_score;
    int64_t n_ops = 0;
    get_col(c, cur.data());
    get_col(c - 1, left.data());
    while (true) {
        if (r == -1) {
            for (int64_t i = 0; i <= c; i++) ops_out[n_ops++] = 2;  // DELETE
            break;
        }
        if (c == -1) {
            for (int64_t i = 0; i <= r; i++) ops_out[n_ops++] = 1;  // INSERT
            break;
        }
        int32_t u = cur[r];        // cell(r-1, c)
        int32_t l = left[r + 1];   // cell(r,   c-1)
        int32_t ul = left[r];      // cell(r-1, c-1)
        if (u + 1 == v) {
            ops_out[n_ops++] = 1;  // INSERT (up)
            r--; v = u;
        } else if (l + 1 == v) {
            ops_out[n_ops++] = 2;  // DELETE (left)
            c--; v = l;
            std::swap(cur, left);
            get_col(c - 1, left.data());
        } else {
            ops_out[n_ops++] = (ul == v) ? 0 : 3;  // MATCH / MISMATCH
            r--; c--; v = ul;
            std::swap(cur, left);
            get_col(c - 1, left.data());
        }
        if (n_ops > qlen + tlen) return -1;  // inconsistent best_score
    }
    // Reverse into forward order.
    for (int64_t i = 0, j = n_ops - 1; i < j; i++, j--) {
        uint8_t t = ops_out[i]; ops_out[i] = ops_out[j]; ops_out[j] = t;
    }
    return n_ops;
}

// ---------------------------------------------------------------------------
// Full single-pair orchestration (the CLI/latency fast path): alphabet
// transform, equality matrix, profile build, banded sweep with dynamic-k
// doubling, and location filtering — one call, no Python in the loop.
// Counterpart of edlibAlign for DISTANCE/LOC (edlib.cpp:146-272); PATH
// reconstruction stays in the host layer.
//
// Returns 0 on success (any alphabet up to the full 256 byte values;
// sigma == 256 routes through uint16 target ids for the wildcard id).
// Outputs: end_locs (capacity tlen+1), start_locs (capacity tlen+1, filled
// when want_starts). edit_distance = -1 when above k.
// ---------------------------------------------------------------------------

extern "C++" {
template <class TChar>
static void semiglobal_best(const Word* peq, int64_t n_words,
                            const TChar* t_ext, int64_t t_scan,
                            int64_t w_pad, int64_t qlen, int64_t tlen,
                            int hin0, int64_t k, bool dynamic,
                            int32_t* best_out, int32_t* locs,
                            int64_t* n_locs) {
    // Inline (best, minimal positions) recording on the banded sweep — no
    // O(tlen) score stream is ever materialised or re-scanned (the stream
    // fill + filter dominated 1Mbp HW locations).  Position p maps to scan
    // column p + w_pad (wildcard-extension delay); warm-up columns
    // c < w_pad are ignored, matching the old stream-window filter.
    // Semiglobal best is always <= qlen, so the doubling loop caps there.
    int64_t kk = dynamic ? 64 : k;
    // NW upper-bound probe (pruning-only, output-identical): semiglobal
    // best <= NW(q, t) since HW/SHW minimise over substrings/prefixes and
    // the full target is one of them.  For near-square pairs the
    // near-diagonal banded NW distance is an order of magnitude cheaper
    // than the semiglobal doubling ladder (whose failing iterations sweep
    // ever-wider semiglobal bands), so one exact sweep at k = d_NW
    // replaces the whole ladder (for SHW the failing iterations
    // band-vanish-exit early, but skipping straight to one exact sweep
    // still measures faster at high similarity and neutral below).
    // Skipped when tlen >> qlen (read mapping: d_NW is dominated by
    // deletions and useless as a bound).
    if (dynamic && qlen >= 4096 && tlen <= qlen + qlen / 2) {
        // Hamming cap for the probe's own ladder: eq(q[i], t[i]) is bit i
        // of Peq[t[i]] (no query needed), so the substitution-only bound
        // d_NW <= hamming + |diff| costs one O(n) bit-probe pass.
        int64_t m = qlen < tlen ? qlen : tlen;
        int64_t hb = (qlen > tlen ? qlen - tlen : tlen - qlen);
        for (int64_t i = 0; i < m; i++) {
            hb += !((peq[(size_t)t_ext[i] * n_words + (i >> 6)]
                     >> (i & 63)) & 1);
        }
        int64_t bound = qlen > tlen ? qlen : tlen;
        if (hb < bound) bound = hb;
        if (bound < 1) bound = 1;
        int32_t d = -1;
        // The NW probe reads only real symbols (ids < 256); narrow to the
        // uint8 ABI of etn_nw_distance_banded when TChar is wider.
        const uint8_t* t_nw;
        std::unique_ptr<uint8_t[]> t_nw_b;
        if (sizeof(TChar) == 1) {
            t_nw = reinterpret_cast<const uint8_t*>(t_ext);
        } else {
            t_nw_b.reset(new uint8_t[tlen]);
            for (int64_t i = 0; i < tlen; i++)
                t_nw_b[i] = (uint8_t)t_ext[i];
            t_nw = t_nw_b.get();
        }
        for (int64_t kp = 64;; kp *= 2) {
            int64_t k_run = kp < bound ? kp : bound;
            d = etn_nw_distance_banded(peq, n_words, t_nw, tlen, qlen,
                                       k_run);
            if (d >= 0 || k_run >= bound) break;
        }
        if (d >= 0) kk = d;
    }
    for (;;) {
        int64_t k_run = kk < qlen ? kk : qlen;
        int64_t best = SCORE_INF;
        int64_t n = 0;
        sweep_banded_core(
            peq, n_words, t_ext, t_scan, hin0, k_run,
            [&](int64_t c, int64_t sc) {
                int64_t p = c - w_pad;
                if (p < 0 || p >= tlen || sc > best) return;
                if (sc < best) { best = sc; n = 0; }
                locs[n++] = (int32_t)p;
            });
        // Reference's 64-bit-padding -1 candidate (query entirely before
        // the target): exists iff qlen % 64 != 0, scores exactly qlen.
        if ((qlen % 64) != 0 && qlen <= best) {
            if (qlen < best) { best = qlen; n = 0; }
            memmove(locs + 1, locs, (size_t)n * sizeof(int32_t));
            locs[0] = -1;
            n++;
        }
        if (best > k_run || best >= SCORE_INF) {
            *best_out = -1;
            *n_locs = 0;
        } else {
            *best_out = (int32_t)best;
            *n_locs = n;
        }
        if (*best_out >= 0 || !dynamic || k_run >= qlen) return;
        kk *= 2;
    }
}

// HW/SHW tail of etn_align: the forward search plus (for HW) the
// reversed-SHW start-location re-runs (edlib.cpp:230-271).  TChar as in
// sweep_banded_core.
template <class TChar>
static void semiglobal_align_tail(const uint8_t* q_ids, uint8_t* t_ids,
                                  int64_t qlen, int64_t tlen, int sigma,
                                  const uint8_t* eq, const Word* peq,
                                  int64_t n_words, int mode, int want_starts,
                                  int64_t k, bool dynamic,
                                  int32_t* edit_distance_out,
                                  int32_t* end_locs_out, int64_t* n_locs_out,
                                  int32_t* start_locs_out) {
    // t_ids must have w_pad (< 64) slack bytes past tlen (etn_align
    // allocates them): the uint8 case extends IN PLACE instead of copying
    // the whole target — the 1MB t_ext copy was ~half the per-call
    // overhead vs the reference on small-query-vs-Mbp calls (round 3).
    int64_t w_pad = n_words * WBITS - qlen;
    std::unique_ptr<TChar[]> t_ext_b;
    TChar* t_ext;
    if (sizeof(TChar) == 1) {
        for (int64_t i = 0; i < w_pad; i++) t_ids[tlen + i] = (uint8_t)sigma;
        t_ext = reinterpret_cast<TChar*>(t_ids);
    } else {  // sigma == 256: wildcard id needs uint16 headroom
        t_ext_b.reset(new TChar[tlen + w_pad]);
        t_ext = t_ext_b.get();
        for (int64_t i = 0; i < tlen; i++) t_ext[i] = t_ids[i];
        for (int64_t i = 0; i < w_pad; i++) t_ext[tlen + i] = (TChar)sigma;
    }
    int hin0 = mode == 2 ? 0 : 1;
    int32_t best;
    int64_t n_locs;
    semiglobal_best(peq, n_words, t_ext, tlen + w_pad, w_pad,
                    qlen, tlen, hin0, k, dynamic, &best,
                    end_locs_out, &n_locs);
    if (best < 0) return;
    *edit_distance_out = best;
    *n_locs_out = n_locs;

    if (!want_starts) return;
    if (mode == 1) {  // SHW: starts are all 0 (edlib.cpp:267-271)
        for (int64_t i = 0; i < n_locs; i++) start_locs_out[i] = 0;
        return;
    }
    // HW: reversed-SHW per end location, take the LAST minimal position
    // (edlib.cpp:230-266).
    std::vector<uint8_t> rq_ids(q_ids, q_ids + qlen);
    std::reverse(rq_ids.begin(), rq_ids.end());
    std::vector<Word> rpeq((size_t)(sigma + 1) * n_words);
    etn_build_peq(rq_ids.data(), qlen, eq, sigma, rpeq.data());
    std::vector<TChar> rt_ext;
    std::vector<int32_t> sub_locs;
    for (int64_t i = 0; i < n_locs; i++) {
        int64_t e = end_locs_out[i];
        if (e == -1) {
            start_locs_out[i] = 0;  // open edge case (edlib.cpp:237-249)
            continue;
        }
        // Any reversed-SHW position p with a minimal value satisfies
        // p <= qlen-1+best (cell value >= p - (qlen-1)), so only the first
        // qlen+best reversed columns can matter: truncating bounds the
        // O(e) prefix copy per end location (the sweep itself already
        // band-vanish-exits, mirroring edlib.cpp:644-654).
        int64_t plen = e + 1;
        int64_t lim = qlen + *edit_distance_out;
        if (plen > lim) plen = lim;
        rt_ext.resize(plen + w_pad);
        for (int64_t j = 0; j < plen; j++) rt_ext[j] = t_ids[e - j];
        for (int64_t j = 0; j < w_pad; j++) rt_ext[plen + j] = (TChar)sigma;
        sub_locs.resize(plen + 1);
        int32_t sub_best;
        int64_t sub_n;
        semiglobal_best(rpeq.data(), n_words, rt_ext.data(), plen + w_pad,
                        w_pad, qlen, plen, 1, *edit_distance_out, false,
                        &sub_best, sub_locs.data(), &sub_n);
        start_locs_out[i] = (int32_t)(e - sub_locs[sub_n - 1]);
    }
}
}  // extern "C++"

// Exported inline (best, all minimal end positions) semiglobal search —
// the no-stream counterpart of etn_sweep_scores_banded for callers that
// only need locations (the Python PATH pipeline; edlib.cpp:199-217's
// doubling loop when k < 0).  locs_out capacity: tlen + 1.  Returns the
// number of locations; *best_out = -1 when above k.
int64_t etn_semiglobal_best(const Word* peq, int64_t n_words,
                            const uint8_t* t_ext, int64_t t_scan,
                            int64_t w_pad, int64_t qlen, int64_t tlen,
                            int hin0, int64_t k,
                            int32_t* best_out, int32_t* locs_out) {
    int64_t n_locs = 0;
    semiglobal_best(peq, n_words, t_ext, t_scan, w_pad, qlen, tlen, hin0,
                    k < 0 ? qlen : k, k < 0, best_out, locs_out, &n_locs);
    return n_locs;
}

// Alphabet transform (first-appearance order, query then target —
// transformSequences, edlib.cpp:1417-1462).  Branchless table passes
// (auto-vectorizable); the rare unseen symbol is detected via the sign
// bit and handled by a scalar redo from that point (alphabets saturate
// within the first few hundred chars in practice).  alphabet_out (cap
// 256) receives the original byte per ordinal.  Returns sigma, or -1 if
// more than max_sigma symbols appear.
int64_t etn_transform(const uint8_t* query, int64_t qlen,
                      const uint8_t* target, int64_t tlen,
                      int64_t max_sigma,
                      uint8_t* q_ids, uint8_t* t_ids,
                      uint8_t* alphabet_out) {
    int16_t letter_idx[256];
    for (int i = 0; i < 256; i++) letter_idx[i] = -1;
    int64_t sigma = 0;
    for (int64_t i = 0; i < qlen; i++) {
        if (letter_idx[query[i]] < 0) {
            if (sigma >= max_sigma) return -1;
            alphabet_out[sigma] = query[i];
            letter_idx[query[i]] = (int16_t)sigma++;
        }
        q_ids[i] = (uint8_t)letter_idx[query[i]];
    }
    int64_t i = 0;
    while (i < tlen) {
        int64_t bad = -1;
        for (; i < tlen; i++) {
            int16_t v = letter_idx[target[i]];
            t_ids[i] = (uint8_t)v;
            if (v < 0) { bad = i; break; }
        }
        if (bad < 0) break;
        // discover symbols scalar-style until the table stabilises
        int64_t stop = bad + 4096 < tlen ? bad + 4096 : tlen;
        for (i = bad; i < stop; i++) {
            if (letter_idx[target[i]] < 0) {
                if (sigma >= max_sigma) return -1;
                alphabet_out[sigma] = target[i];
                letter_idx[target[i]] = (int16_t)sigma++;
            }
            t_ids[i] = (uint8_t)letter_idx[target[i]];
        }
    }
    return sigma;
}

int etn_align(const uint8_t* query, int64_t qlen,
              const uint8_t* target, int64_t tlen,
              int mode /*0 NW,1 SHW,2 HW*/, int want_starts, int64_t k,
              const uint8_t* eq_first, const uint8_t* eq_second,
              int64_t n_eq,
              int32_t* edit_distance_out, int32_t* alphabet_len_out,
              int32_t* end_locs_out, int64_t* n_locs_out,
              int32_t* start_locs_out) {
    // Uninitialized buffers: value-init memsets cost ~1ms/Mbp per call.
    // t_ids carries 64 slack bytes: semiglobal_align_tail extends the
    // target with its wildcard pad IN PLACE (w_pad < 64) instead of
    // copying the whole target.
    std::unique_ptr<uint8_t[]> q_ids_b(new uint8_t[qlen ? qlen : 1]);
    std::unique_ptr<uint8_t[]> t_ids_b(new uint8_t[(tlen ? tlen : 1) + 64]);
    uint8_t* q_ids = q_ids_b.get();
    uint8_t* t_ids = t_ids_b.get();
    uint8_t alphabet[256];
    // Full 256-symbol alphabets supported (the sigma == 256 case routes
    // the semiglobal tail through uint16 target ids for the wildcard).
    int64_t sigma64 = etn_transform(query, qlen, target, tlen, 256,
                                    q_ids, t_ids, alphabet);
    if (sigma64 < 0) return 1;
    int sigma = (int)sigma64;
    // letter_idx rebuilt from the alphabet for the equality-pair lookup.
    int16_t letter_idx[256];
    for (int i = 0; i < 256; i++) letter_idx[i] = -1;
    for (int s = 0; s < sigma; s++) letter_idx[alphabet[s]] = (int16_t)s;
    *alphabet_len_out = sigma;

    // --- equality matrix ---
    std::vector<uint8_t> eq((size_t)sigma * sigma, 0);
    for (int s = 0; s < sigma; s++) eq[(size_t)s * sigma + s] = 1;
    if (eq_first != nullptr && eq_second != nullptr) {
        for (int64_t i = 0; i < n_eq; i++) {
            int a = letter_idx[eq_first[i]], b = letter_idx[eq_second[i]];
            if (a >= 0 && b >= 0) {
                eq[(size_t)a * sigma + b] = eq[(size_t)b * sigma + a] = 1;
            }
        }
    }

    // --- query profile (64-bit) ---
    int64_t n_words = (qlen + WBITS - 1) / WBITS;
    if (n_words == 0) n_words = 1;
    std::vector<Word> peq((size_t)(sigma + 1) * n_words);
    etn_build_peq(q_ids, qlen, eq.data(), sigma, peq.data());

    const bool dynamic = k < 0;
    *edit_distance_out = -1;
    *n_locs_out = 0;

    if (mode == 0) {  // NW
        // Substitution-only upper bound: d_NW <= hamming(prefixes) + |diff|
        // (one O(n) table pass).  It caps BOTH the doubling ladder (the
        // run at k = hb is guaranteed to succeed, killing the final
        // overshoot doubling — ~1/3 of ladder cost on similar pairs) and
        // a finite user k (a smaller exact band).  Pruning-only.
        int64_t m = qlen < tlen ? qlen : tlen;
        int64_t hb = (qlen > tlen ? qlen - tlen : tlen - qlen);
        for (int64_t i = 0; i < m; i++)
            hb += !eq[(size_t)q_ids[i] * sigma + t_ids[i]];
        int64_t bound = qlen > tlen ? qlen : tlen;
        if (hb < bound) bound = hb;
        if (bound < 1) bound = 1;  // banded engine needs k >= 1
        int32_t d = -1;
        if (dynamic) {
            for (int64_t kk = 64;; kk *= 2) {
                int64_t k_run = kk < bound ? kk : bound;
                    d = etn_nw_distance_banded(peq.data(), n_words, t_ids,
                                           tlen, qlen, k_run);
                if (d >= 0 || k_run >= bound) break;
            }
        } else {
            d = etn_nw_distance_banded(peq.data(), n_words, t_ids,
                                       tlen, qlen, k < bound ? k : bound);
        }
        if (d < 0) return 0;
        *edit_distance_out = d;
        end_locs_out[0] = (int32_t)(tlen - 1);
        *n_locs_out = 1;
        if (want_starts) start_locs_out[0] = 0;
        return 0;
    }

    // --- HW / SHW ---
    // uint8 ids in the common case; uint16 only for sigma == 256, where
    // the wildcard id (== sigma) needs headroom beyond a byte.
    if (sigma < 256) {
        semiglobal_align_tail<uint8_t>(
            q_ids, t_ids, qlen, tlen, sigma, eq.data(), peq.data(), n_words,
            mode, want_starts, k, dynamic, edit_distance_out, end_locs_out,
            n_locs_out, start_locs_out);
    } else {
        semiglobal_align_tail<uint16_t>(
            q_ids, t_ids, qlen, tlen, sigma, eq.data(), peq.data(), n_words,
            mode, want_starts, k, dynamic, edit_distance_out, end_locs_out,
            n_locs_out, start_locs_out);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Full alignment-path reconstruction: the traceback-vs-Hirschberg dispatch
// (same 1MB estimate as the reference, edlib.cpp:1186-1211) and the
// Hirschberg recursion (edlib.cpp:1231-1396: same halving, same
// crossing-row search order) entirely in C — the Python recursion spent
// most of its time rebuilding query profiles per node in numpy.
// ---------------------------------------------------------------------------

extern "C++" {
// Shared recursion state: the full forward/reversed sequences are
// materialised ONCE and every node takes subrange views (the reversed
// subrange [a, a+n) of q is grq[QL-a-n, QL-a)); the crossing-row and
// profile scratch buffers are allocated per parallel task and reused
// depth-first below it.  The old per-node rq/rt copies + value-
// initialised vectors were ~30% of the 94.5kbp PATH time.
struct PathCtx {
    const uint8_t* q0;
    const uint8_t* t0;
    const uint8_t* rq0;
    const uint8_t* rt0;
    int64_t QL, TL;
    const uint8_t* eq;
    int sigma;
    bool threads;    // parallel halves + children at shallow depths
};

struct PathScratch {
    std::unique_ptr<int32_t[]> left, rev;  // crossing-row cells, qlen each
    std::unique_ptr<Word[]> peq, rpeq;     // (sigma+1) * max_words
    explicit PathScratch(int64_t qlen, int sigma) {
        int64_t mw = (qlen + WBITS - 1) / WBITS;
        if (mw == 0) mw = 1;
        left.reset(new int32_t[qlen ? qlen : 1]);
        rev.reset(new int32_t[qlen ? qlen : 1]);
        peq.reset(new Word[(size_t)(sigma + 1) * mw]);
        rpeq.reset(new Word[(size_t)(sigma + 1) * mw]);
    }
};

static bool path_threads_enabled() {
    // The reference is single-threaded; the host runtime is not.  Opt out
    // with EDLIB_TPU_THREADS=0|1 (thread count is implicit: at most
    // 2^PAR_DEPTH tasks + one transient half-sweep thread per node).
    static const bool on = [] {
        const char* env = std::getenv("EDLIB_TPU_THREADS");
        if (env != nullptr && (env[0] == '0' || env[0] == '1') && !env[1])
            return false;
        return std::thread::hardware_concurrency() >= 2;
    }();
    return on;
}
}  // extern "C++"

// Parallelisation gates: children fork while depth < PAR_DEPTH; the two
// half-sweeps of a node run concurrently when the node is big enough to
// amortise a thread spawn (~50us vs ~ms-scale sweeps).
static const int PAR_DEPTH = 2;
static const int64_t PAR_HALVES_MIN_CELLS = 16 * 1000 * 1000;

static int64_t obtain_alignment_rec(const PathCtx& cx, PathScratch& sc,
                                    int64_t qo, int64_t qlen,
                                    int64_t to, int64_t tlen,
                                    int64_t best, uint8_t* ops_out,
                                    int depth) {
    const uint8_t* q = cx.q0 + qo;
    const uint8_t* t = cx.t0 + to;
    if (qlen == 0 || tlen == 0) {
        uint8_t op = qlen == 0 ? 2 /*DELETE*/ : 1 /*INSERT*/;
        for (int64_t i = 0; i < qlen + tlen; i++) ops_out[i] = op;
        return qlen + tlen;
    }
    int64_t max_blocks = (qlen + WBITS - 1) / WBITS;
    int64_t mem = (2 * 8 + 4) * max_blocks * tlen + 2 * 4 * tlen;
    if (mem < 1024 * 1024) {
        return etn_nw_path(q, qlen, t, tlen, cx.eq, cx.sigma, (int32_t)best,
                           ops_out);
    }
    // Hirschberg split.
    int64_t n_words = max_blocks;
    etn_build_peq(q, qlen, cx.eq, cx.sigma, sc.peq.get());
    const uint8_t* rq = cx.rq0 + (cx.QL - (qo + qlen));
    const uint8_t* rt = cx.rt0 + (cx.TL - (to + tlen));
    etn_build_peq(rq, qlen, cx.eq, cx.sigma, sc.rpeq.get());

    int64_t left_w = tlen / 2;
    int64_t right_w = tlen - left_w;
    int32_t* left = sc.left.get();
    int32_t* rev = sc.rev.get();
    if (cx.threads && qlen * tlen >= PAR_HALVES_MIN_CELLS) {
        std::thread fwd([&] {
            etn_nw_cells_at_banded(sc.peq.get(), n_words, qlen, t, tlen,
                                   left_w - 1, best, left);
        });
        etn_nw_cells_at_banded(sc.rpeq.get(), n_words, qlen, rt, tlen,
                               right_w - 1, best, rev);
        fwd.join();
    } else {
        etn_nw_cells_at_banded(sc.peq.get(), n_words, qlen, t, tlen,
                               left_w - 1, best, left);
        etn_nw_cells_at_banded(sc.rpeq.get(), n_words, qlen, rt, tlen,
                               right_w - 1, best, rev);
    }
    // right_suffix[i] = rev[qlen-1-i]; search rows 0..qlen-2 first, then
    // the -1 and qlen-1 boundary rows (the reference's tie order,
    // edlib.cpp:1327-1353).
    int64_t row = -2;
    int64_t l_score = 0, r_score = 0;
    for (int64_t r = 0; r <= qlen - 2; r++) {
        int64_t ls = left[r], rs = rev[qlen - 1 - (r + 1)];
        if (ls + rs == best) { row = r; l_score = ls; r_score = rs; break; }
    }
    if (row == -2 && left_w + (int64_t)rev[qlen - 1] == best) {
        row = -1; l_score = left_w; r_score = rev[qlen - 1];
    }
    if (row == -2 && (int64_t)left[qlen - 1] + right_w == best) {
        row = qlen - 1; l_score = left[qlen - 1]; r_score = right_w;
    }
    if (row == -2) return -1;  // bestScore inconsistent
    int64_t q1 = row + 1, q2 = qlen - row - 1;
    int64_t t1 = left_w, t2 = tlen - left_w;
    if (cx.threads && depth < PAR_DEPTH) {
        // Children are independent; the second child's ops offset depends
        // on the first's length, so it runs into a bounded temp buffer
        // (|ops| <= qlen + tlen) and is spliced after the join.
        int64_t n1 = -1;
        PathScratch sc1(q1, cx.sigma);
        std::thread child([&] {
            n1 = obtain_alignment_rec(cx, sc1, qo, q1, to, t1, l_score,
                                      ops_out, depth + 1);
        });
        std::unique_ptr<uint8_t[]> tmp(new uint8_t[(size_t)(q2 + t2)]);
        PathScratch sc2(q2, cx.sigma);
        int64_t n2 = obtain_alignment_rec(cx, sc2, qo + q1, q2, to + t1,
                                          t2, r_score, tmp.get(),
                                          depth + 1);
        child.join();
        if (n1 < 0 || n2 < 0) return -1;
        memcpy(ops_out + n1, tmp.get(), (size_t)n2);
        return n1 + n2;
    }
    int64_t n1 = obtain_alignment_rec(cx, sc, qo, q1, to, t1, l_score,
                                      ops_out, depth + 1);
    if (n1 < 0) return -1;
    int64_t n2 = obtain_alignment_rec(cx, sc, qo + q1, q2, to + t1, t2,
                                      r_score, ops_out + n1, depth + 1);
    if (n2 < 0) return -1;
    return n1 + n2;
}

// use_threads: 1 = fork half-sweeps/children (single-alignment latency),
// 0 = sequential (callers fanning MANY alignments across cores supply
// their own parallelism; nested forking thrashes), -1 = env default.
int64_t etn_obtain_alignment(const uint8_t* q_ids, int64_t qlen,
                             const uint8_t* t_ids, int64_t tlen,
                             const uint8_t* eq, int sigma,
                             int32_t best_score, uint8_t* ops_out,
                             int use_threads) {
    std::unique_ptr<uint8_t[]> rq(new uint8_t[qlen ? qlen : 1]);
    std::unique_ptr<uint8_t[]> rt(new uint8_t[tlen ? tlen : 1]);
    for (int64_t i = 0; i < qlen; i++) rq[i] = q_ids[qlen - 1 - i];
    for (int64_t i = 0; i < tlen; i++) rt[i] = t_ids[tlen - 1 - i];
    bool threads = use_threads < 0 ? path_threads_enabled()
                                   : (use_threads != 0
                                      && path_threads_enabled());
    PathCtx cx{q_ids, t_ids, rq.get(), rt.get(), qlen, tlen, eq, sigma,
               threads};
    PathScratch sc(qlen, sigma);
    return obtain_alignment_rec(cx, sc, 0, qlen, 0, tlen, best_score,
                                ops_out, 0);
}

}  // extern "C"
