// Memory-safety smoke harness for the native library (run under valgrind by
// `make check-memory`), covering FASTA, CIGAR, sweeps, path, and the full
// align orchestrator — the counterpart of the reference's
// check-memory-leaks target (Makefile:35-37).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unistd.h>
#include <vector>

#include "edlib_compat.h"

typedef uint64_t Word;

extern "C" {
int etn_fasta_stat(const char*, int64_t*, int64_t*);
int etn_fasta_read(const char*, char*, int64_t*, int64_t, int64_t);
int64_t etn_cigar_encode(const uint8_t*, int64_t, int, char*);
void etn_build_peq(const uint8_t*, int64_t, const uint8_t*, int, Word*);
void etn_sweep_scores(const Word*, int64_t, const uint8_t*, int64_t, int,
                      int32_t*);
void etn_sweep_scores_banded(const Word*, int64_t, const uint8_t*, int64_t,
                             int, int64_t, int32_t*);
int32_t etn_nw_distance_banded(const Word*, int64_t, const uint8_t*, int64_t,
                               int64_t, int64_t);
int64_t etn_nw_path(const uint8_t*, int64_t, const uint8_t*, int64_t,
                    const uint8_t*, int, int32_t, uint8_t*);
void etn_nw_cells_at(const Word*, int64_t, int64_t, const uint8_t*, int64_t,
                     int32_t*);
int etn_align(const uint8_t*, int64_t, const uint8_t*, int64_t, int, int,
              int64_t, const uint8_t*, const uint8_t*, int64_t, int32_t*,
              int32_t*, int32_t*, int64_t*, int32_t*);
}

static void check_fasta() {
    // FASTA two-pass reader: headerless-tolerant (aligner.cpp:290-328
    // contract), CRLF stripping, and the file-grew-between-passes
    // truncation branch (edlib_tpu_native.cpp etn_fasta_read caps) — all
    // bounds-checked here under the sanitizers.
    char path[] = "/tmp/etn_check_fasta_XXXXXX";
    int fd = mkstemp(path);
    assert(fd >= 0);
    const char* fasta =
        "ACGT\r\nAC\n>seq2 header\nTTTT\nGG\n>empty\n>seq3\nA\n";
    assert(write(fd, fasta, strlen(fasta)) == (ssize_t)strlen(fasta));
    close(fd);

    int64_t n_seqs = 0, total_len = 0;
    assert(etn_fasta_stat(path, &n_seqs, &total_len) == 0);
    assert(n_seqs == 3 && total_len == 13);  // ACGTAC, TTTTGG, A

    std::vector<char> data(total_len);
    std::vector<int64_t> offsets(n_seqs + 1);
    assert(etn_fasta_read(path, data.data(), offsets.data(), total_len,
                          n_seqs) == 0);
    assert(offsets[0] == 0 && offsets[1] == 6 && offsets[2] == 12 &&
           offsets[3] == 13);
    assert(memcmp(data.data(), "ACGTACTTTTGGA", 13) == 0);

    // Truncation: pretend the stat pass saw a smaller file (the read pass
    // must stop at the caller's capacities, not overrun).
    std::vector<char> small_data(5);
    std::vector<int64_t> small_off(2 + 1);
    assert(etn_fasta_read(path, small_data.data(), small_off.data(), 5,
                          2) == 0);
    assert(small_off[0] == 0 && memcmp(small_data.data(), "ACGTA", 5) == 0);
    std::vector<char> one_seq_data(13);
    std::vector<int64_t> one_off(1 + 1);
    assert(etn_fasta_read(path, one_seq_data.data(), one_off.data(), 13,
                          1) == 0);
    assert(one_off[0] == 0 && one_off[1] == 6);  // stopped before seq2

    assert(etn_fasta_stat("/nonexistent/etn", &n_seqs, &total_len) != 0);
    assert(etn_fasta_read("/nonexistent/etn", data.data(), offsets.data(),
                          1, 1) != 0);
    unlink(path);
}

int main() {
    check_fasta();

    // CIGAR
    uint8_t ops[] = {0, 0, 1, 2, 3, 3};
    char cig[128];
    assert(etn_cigar_encode(ops, 6, 1, cig) > 0);
    assert(strcmp(cig, "2=1I1D2X") == 0);

    // Sweeps + align
    const uint8_t q[] = {0, 1, 2, 3, 0, 1, 2};
    const uint8_t t[] = {1, 0, 1, 2, 3, 0, 1, 2, 2, 0};
    uint8_t eq[16];
    memset(eq, 0, 16);
    for (int i = 0; i < 4; i++) eq[i * 4 + i] = 1;
    std::vector<Word> peq(5);
    etn_build_peq(q, 7, eq, 4, peq.data());
    uint8_t t_ext[10 + 57];
    memcpy(t_ext, t, 10);
    memset(t_ext + 10, 4, 57);
    std::vector<int32_t> scores(67);
    etn_sweep_scores(peq.data(), 1, t_ext, 67, 0, scores.data());
    etn_sweep_scores_banded(peq.data(), 1, t_ext, 67, 0, 3, scores.data());
    int32_t d = etn_nw_distance_banded(peq.data(), 1, t, 10, 7, 10);
    assert(d >= 0);

    uint8_t path_ops[32];
    int64_t n = etn_nw_path(q, 7, t, 10, eq, 4, d, path_ops);
    assert(n > 0 && n <= 17);

    std::vector<int32_t> cells(7);
    etn_nw_cells_at(peq.data(), 1, 7, t, 4, cells.data());

    int32_t dist, alpha, ends[11], starts[11];
    int64_t nl;
    int rc = etn_align((const uint8_t*)"ACT", 3, (const uint8_t*)"CGACTGAC",
                       8, 2 /*HW*/, 1, -1, nullptr, nullptr, 0, &dist,
                       &alpha, ends, &nl, starts);
    assert(rc == 0 && dist == 0 && nl >= 1 && starts[0] == 2 && ends[0] == 4);

    // Drop-in C ABI (edlib_compat.cpp): result arrays are malloc'd and
    // released by edlibFreeAlignResult — exercised here so valgrind/ASan
    // see the whole alloc/free pairing, including the CIGAR string.
    EdlibAlignConfig ccfg = edlibNewAlignConfig(-1, EDLIB_MODE_HW,
                                                EDLIB_TASK_PATH, nullptr, 0);
    EdlibAlignResult cres = edlibAlign("ACT", 3, "CGACTGAC", 8, ccfg);
    assert(cres.status == EDLIB_STATUS_OK && cres.editDistance == 0);
    assert(cres.numLocations >= 1 && cres.endLocations[0] == 4
           && cres.startLocations[0] == 2 && cres.alignmentLength == 3);
    char* ccig = edlibAlignmentToCigar(cres.alignment, cres.alignmentLength,
                                       EDLIB_CIGAR_EXTENDED);
    assert(ccig != nullptr && strcmp(ccig, "3=") == 0);
    free(ccig);
    edlibFreeAlignResult(cres);
    EdlibAlignResult cempty = edlibAlign("", 0, "AC", 2,
                                         edlibDefaultAlignConfig());
    assert(cempty.editDistance == 2 && cempty.endLocations[0] == 1);
    edlibFreeAlignResult(cempty);

    // Randomized ASan/UBSan exerciser: every mode x task x k regime over
    // mixed alphabets and word-boundary lengths — in particular the
    // in-place wildcard extension (t_ids slack bytes), the lazy/window
    // transforms, and the uninitialized location buffers are bounds- and
    // lifetime-checked here under -fsanitize.  Invariants only (the
    // oracle-differential correctness suites live in tests/).
    srand(1234);
    const int sigmas[5] = {2, 4, 26, 200, 256};
    const int qlens[8] = {0, 1, 63, 64, 65, 120, 128, 300};
    const int tlens[5] = {0, 1, 64, 500, 4096};
    const int ks[4] = {-1, 0, 2, 1000};
    const EdlibAlignMode modes[3] = {EDLIB_MODE_NW, EDLIB_MODE_SHW,
                                     EDLIB_MODE_HW};
    const EdlibAlignTask tasks[3] = {EDLIB_TASK_DISTANCE, EDLIB_TASK_LOC,
                                     EDLIB_TASK_PATH};
    for (int trial = 0; trial < 300; trial++) {
        int sigma = sigmas[rand() % 5];
        int qlen = qlens[rand() % 8];
        int tlen = tlens[rand() % 5];
        std::vector<char> qb(qlen ? qlen : 1), tb(tlen ? tlen : 1);
        for (int i = 0; i < qlen; i++) qb[i] = (char)(rand() % sigma);
        for (int i = 0; i < tlen; i++) tb[i] = (char)(rand() % sigma);
        EdlibEqualityPair pairs[2] = {{(char)0, (char)1},
                                      {(char)(sigma - 1), (char)0}};
        EdlibAlignConfig cfg = edlibNewAlignConfig(
            ks[rand() % 4], modes[rand() % 3], tasks[rand() % 3],
            rand() % 2 ? pairs : nullptr, rand() % 2 ? 2 : 0);
        EdlibAlignResult rr = edlibAlign(qb.data(), qlen, tb.data(), tlen,
                                         cfg);
        assert(rr.status == EDLIB_STATUS_OK);
        if (rr.editDistance >= 0 && qlen && tlen)
            assert(rr.numLocations >= 1);
        edlibFreeAlignResult(rr);
    }

    printf("native memcheck harness OK\n");
    return 0;
}
