// Drop-in implementation of the reference edlib C ABI over the edlib_tpu
// native runtime.  Mirrors the observable orchestration of edlibAlign
// (edlib.cpp:146-301) — empty-sequence shortcut, unknown-mode fallback to
// NW outside the empty case, end/start-location conventions, PATH for the
// first location pair only — while the actual computation runs through this
// project's engines (etn_align: banded NW with the Hamming/NW-probe caps,
// single-sweep semiglobal best+positions, threaded Hirschberg PATH).
//
// Compiled into libedlib_tpu_native.so together with edlib_tpu_native.cpp;
// the etn_* symbols below are that file's public C entry points.

#include "edlib_compat.h"

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <vector>

extern "C" {

// --- runtime entry points (edlib_tpu_native.cpp) ---
int64_t etn_transform(const uint8_t* query, int64_t qlen,
                      const uint8_t* target, int64_t tlen, int64_t max_sigma,
                      uint8_t* q_ids, uint8_t* t_ids, uint8_t* alphabet_out);
int etn_align(const uint8_t* query, int64_t qlen,
              const uint8_t* target, int64_t tlen,
              int mode, int want_starts, int64_t k,
              const uint8_t* eq_first, const uint8_t* eq_second, int64_t n_eq,
              int32_t* edit_distance_out, int32_t* alphabet_len_out,
              int32_t* end_locs_out, int64_t* n_locs_out,
              int32_t* start_locs_out);
int64_t etn_obtain_alignment(const uint8_t* q_ids, int64_t qlen,
                             const uint8_t* t_ids, int64_t tlen,
                             const uint8_t* eq, int sigma,
                             int32_t best_score, uint8_t* ops_out,
                             int use_threads);
int64_t etn_cigar_encode(const uint8_t* ops, int64_t n, int extended,
                         char* out);

// --- public compat ABI ---

EdlibAlignConfig edlibNewAlignConfig(
        int k, EdlibAlignMode mode, EdlibAlignTask task,
        const EdlibEqualityPair* additionalEqualities,
        int additionalEqualitiesLength) {
    EdlibAlignConfig c;
    c.k = k;
    c.mode = mode;
    c.task = task;
    c.additionalEqualities = additionalEqualities;
    c.additionalEqualitiesLength = additionalEqualitiesLength;
    return c;
}

EdlibAlignConfig edlibDefaultAlignConfig(void) {
    return edlibNewAlignConfig(-1, EDLIB_MODE_NW, EDLIB_TASK_DISTANCE,
                               NULL, 0);
}

void edlibFreeAlignResult(EdlibAlignResult result) {
    free(result.endLocations);
    free(result.startLocations);
    free(result.alignment);
}

char* edlibAlignmentToCigar(const unsigned char* alignment,
                            int alignmentLength,
                            EdlibCigarFormat cigarFormat) {
    if (cigarFormat != EDLIB_CIGAR_STANDARD
        && cigarFormat != EDLIB_CIGAR_EXTENDED) {
        return NULL;  // unknown format (edlib.cpp:305-307)
    }
    if (alignmentLength < 0) return NULL;
    // etn_cigar_encode's contract: out holds >= 12*n + 1 bytes.
    char* buf = static_cast<char*>(
        malloc(static_cast<size_t>(alignmentLength) * 12 + 1));
    if (buf == NULL) return NULL;
    int64_t w = etn_cigar_encode(alignment, alignmentLength,
                                 cigarFormat == EDLIB_CIGAR_EXTENDED, buf);
    if (w < 0) {  // invalid op code (edlib.cpp:334-336)
        free(buf);
        return NULL;
    }
    char* shrunk = static_cast<char*>(
        realloc(buf, static_cast<size_t>(w) + 1));
    return shrunk != NULL ? shrunk : buf;
}

EdlibAlignResult edlibAlign(const char* query, int queryLength,
                            const char* target, int targetLength,
                            EdlibAlignConfig config) {
    EdlibAlignResult r;
    r.status = EDLIB_STATUS_OK;
    r.editDistance = -1;
    r.endLocations = NULL;
    r.startLocations = NULL;
    r.numLocations = 0;
    r.alignment = NULL;
    r.alignmentLength = 0;
    r.alphabetLength = 0;

    const uint8_t* q = reinterpret_cast<const uint8_t*>(query);
    const uint8_t* t = reinterpret_cast<const uint8_t*>(target);
    const int64_t qlen = queryLength < 0 ? 0 : queryLength;
    const int64_t tlen = targetLength < 0 ? 0 : targetLength;

    // alphabetLength is reported on every return path, including the
    // empty-sequence shortcut (edlib.cpp:158-162).  The transform here is
    // LAZY: etn_align reports sigma itself, so non-PATH tasks (and the
    // non-empty fast path) never pay a second full-target transform —
    // the duplicate 1Mbp pass was ~0.4ms/call on read-vs-chromosome
    // workloads (round 3).  PATH materialises the ids below.
    std::unique_ptr<uint8_t[]> q_ids;
    std::unique_ptr<uint8_t[]> t_ids;
    uint8_t alphabet[256];
    int64_t sigma = -1;
    auto transform_ids = [&]() -> bool {
        if (sigma >= 0) return true;
        q_ids.reset(new uint8_t[qlen ? qlen : 1]);
        t_ids.reset(new uint8_t[tlen ? tlen : 1]);
        sigma = etn_transform(q, qlen, t, tlen, 256,
                              q_ids.get(), t_ids.get(), alphabet);
        return sigma >= 0;  // < 0 unreachable: 256 byte values cap it
    };

    // Empty-sequence shortcut: end locations only, k ignored, no starts or
    // alignment even for LOC/PATH; unknown modes error (edlib.cpp:166-184).
    if (qlen == 0 || tlen == 0) {
        if (!transform_ids()) {
            r.status = EDLIB_STATUS_ERROR;
            return r;
        }
        r.alphabetLength = static_cast<int>(sigma);
        if (config.mode == EDLIB_MODE_NW) {
            r.editDistance = static_cast<int>(qlen > tlen ? qlen : tlen);
            r.endLocations = static_cast<int*>(malloc(sizeof(int)));
            if (r.endLocations == NULL) { r.status = EDLIB_STATUS_ERROR; return r; }
            r.endLocations[0] = static_cast<int>(tlen) - 1;
            r.numLocations = 1;
        } else if (config.mode == EDLIB_MODE_SHW
                   || config.mode == EDLIB_MODE_HW) {
            r.editDistance = static_cast<int>(qlen);
            r.endLocations = static_cast<int*>(malloc(sizeof(int)));
            if (r.endLocations == NULL) { r.status = EDLIB_STATUS_ERROR; return r; }
            r.endLocations[0] = -1;
            r.numLocations = 1;
        } else {
            r.status = EDLIB_STATUS_ERROR;
        }
        return r;
    }

    // Outside the empty case the reference computes any non-SHW/HW mode
    // value as NW (the else branch of edlib.cpp:205-216) — but only mode
    // NW proper gets its end location filled in (edlib.cpp:221-225), so an
    // unknown mode yields a distance with zero locations.  (For task PATH
    // the reference then dereferences the NULL end-location array; we stop
    // at the location-free result instead of reproducing that crash.)
    const bool unknown_mode = config.mode != EDLIB_MODE_NW
                              && config.mode != EDLIB_MODE_SHW
                              && config.mode != EDLIB_MODE_HW;
    const int mode = config.mode == EDLIB_MODE_SHW ? 1
                     : config.mode == EDLIB_MODE_HW ? 2 : 0;
    const int want_starts = (config.task == EDLIB_TASK_LOC
                             || config.task == EDLIB_TASK_PATH) ? 1 : 0;

    // Equality pairs as parallel byte arrays.
    const int64_t n_eq =
        (config.additionalEqualities != NULL
         && config.additionalEqualitiesLength > 0)
            ? config.additionalEqualitiesLength : 0;
    std::vector<uint8_t> eq_first(n_eq ? n_eq : 1), eq_second(n_eq ? n_eq : 1);
    for (int64_t i = 0; i < n_eq; i++) {
        eq_first[i] = static_cast<uint8_t>(config.additionalEqualities[i].first);
        eq_second[i] = static_cast<uint8_t>(config.additionalEqualities[i].second);
    }

    // Distance + all minimal end locations (+ starts) in one runtime call.
    // At most tlen + 1 end locations exist (every column plus the -1
    // padding candidate).  UNinitialized buffers — std::vector's
    // value-init memset of 2 x 4MB dominated small-query calls against
    // Mbp targets (SHW PATH: 4.5ms vs the reference's 0.7ms, round 3).
    std::unique_ptr<int32_t[]> end_locs(new int32_t[tlen + 1]);
    std::unique_ptr<int32_t[]> start_locs(
        new int32_t[want_starts ? tlen + 1 : 1]);
    int32_t d = -1, alpha = 0;
    int64_t n_locs = 0;
    int st = etn_align(q, qlen, t, tlen, mode, want_starts, config.k,
                       n_eq ? eq_first.data() : NULL,
                       n_eq ? eq_second.data() : NULL, n_eq,
                       &d, &alpha, end_locs.get(), &n_locs,
                       start_locs.get());
    if (st != 0) {
        r.status = EDLIB_STATUS_ERROR;
        return r;
    }
    r.alphabetLength = alpha;
    r.editDistance = d;
    if (d < 0) return r;  // no solution within k: NULL location arrays
    if (unknown_mode) {
        // Distance only, no locations (see above) — but LOC/PATH still get
        // the reference's zero-length (non-NULL) startLocations malloc.
        if (want_starts)
            r.startLocations = static_cast<int*>(malloc(sizeof(int)));
        return r;
    }

    r.numLocations = static_cast<int>(n_locs);
    r.endLocations = static_cast<int*>(malloc(sizeof(int) * n_locs));
    if (r.endLocations == NULL) { r.status = EDLIB_STATUS_ERROR; return r; }
    for (int64_t i = 0; i < n_locs; i++) r.endLocations[i] = end_locs[i];
    if (want_starts) {
        r.startLocations = static_cast<int*>(malloc(sizeof(int) * n_locs));
        if (r.startLocations == NULL) { r.status = EDLIB_STATUS_ERROR; return r; }
        for (int64_t i = 0; i < n_locs; i++)
            r.startLocations[i] = start_locs[i];
    }

    // PATH: alignment for the first location pair only (edlib.cpp:274-289).
    if (config.task == EDLIB_TASK_PATH) {
        // Transform only the query + the ALIGNMENT WINDOW of the target
        // (wlen ~= qlen + d, not tlen): the equality matrix below is
        // built from THIS transform's letter_idx, so any internally
        // consistent id assignment yields the same ops — re-transforming
        // a 1Mbp target for a 120bp window was the remaining per-call
        // overhead vs the reference (round 3).
        const int64_t aln_start = r.startLocations[0];
        const int64_t aln_end = r.endLocations[0];
        const int64_t wlen = aln_end - aln_start + 1;  // 0 for end == -1
        std::unique_ptr<uint8_t[]> qw_ids(new uint8_t[qlen ? qlen : 1]);
        std::unique_ptr<uint8_t[]> tw_ids(new uint8_t[wlen ? wlen : 1]);
        int64_t sigw = etn_transform(q, qlen, t + aln_start, wlen, 256,
                                     qw_ids.get(), tw_ids.get(), alphabet);
        if (sigw < 0) {
            r.status = EDLIB_STATUS_ERROR;
            return r;
        }
        // Equality matrix on the window transform's ids (identity + user
        // pairs, symmetric; edlib.cpp:63-94).
        int16_t letter_idx[256];
        for (int i = 0; i < 256; i++) letter_idx[i] = -1;
        for (int64_t s = 0; s < sigw; s++)
            letter_idx[alphabet[s]] = static_cast<int16_t>(s);
        std::vector<uint8_t> eqm(static_cast<size_t>(sigw) * sigw, 0);
        for (int64_t s = 0; s < sigw; s++)
            eqm[static_cast<size_t>(s) * sigw + s] = 1;
        for (int64_t i = 0; i < n_eq; i++) {
            int a = letter_idx[eq_first[i]], b = letter_idx[eq_second[i]];
            if (a >= 0 && b >= 0) {
                eqm[static_cast<size_t>(a) * sigw + b] = 1;
                eqm[static_cast<size_t>(b) * sigw + a] = 1;
            }
        }
        std::vector<uint8_t> ops(static_cast<size_t>(qlen + wlen) + 1);
        int64_t n_ops = etn_obtain_alignment(
            qw_ids.get(), qlen, tw_ids.get(), wlen, eqm.data(),
            static_cast<int>(sigw), d, ops.data(), -1);
        if (n_ops < 0) {
            r.status = EDLIB_STATUS_ERROR;
            return r;
        }
        r.alignment = static_cast<unsigned char*>(malloc(n_ops ? n_ops : 1));
        if (r.alignment == NULL) { r.status = EDLIB_STATUS_ERROR; return r; }
        memcpy(r.alignment, ops.data(), n_ops);
        r.alignmentLength = static_cast<int>(n_ops);
    }
    return r;
}

}  // extern "C"
