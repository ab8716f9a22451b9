// One-off profiling harness for the Hirschberg PATH pipeline: replicates
// obtain_alignment_rec with per-phase timers (half-sweeps vs leaves vs
// setup) to locate the 94.5kbp PATH gap vs the reference.  Not part of
// the shipped library; build with `make prof_path`.
#include "edlib_tpu_native.cpp"

#include <chrono>
#include <cstdio>
#include <random>

static double g_cells = 0, g_leaf = 0, g_setup = 0;
static int64_t g_cells_calls = 0, g_leaf_calls = 0, g_leaf_cells = 0;

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

static int64_t rec(const uint8_t* q, int64_t qlen, const uint8_t* t,
                   int64_t tlen, const uint8_t* eq, int sigma, int64_t best,
                   uint8_t* ops_out) {
    if (qlen == 0 || tlen == 0) {
        uint8_t op = qlen == 0 ? 2 : 1;
        for (int64_t i = 0; i < qlen + tlen; i++) ops_out[i] = op;
        return qlen + tlen;
    }
    int64_t max_blocks = (qlen + WBITS - 1) / WBITS;
    int64_t mem = (2 * 8 + 4) * max_blocks * tlen + 2 * 4 * tlen;
    if (mem < 1024 * 1024) {
        double t0 = now_s();
        int64_t n = etn_nw_path(q, qlen, t, tlen, eq, sigma, (int32_t)best,
                                ops_out);
        g_leaf += now_s() - t0;
        g_leaf_calls++;
        g_leaf_cells += qlen * tlen;
        return n;
    }
    double t0 = now_s();
    int64_t n_words = max_blocks;
    std::vector<Word> peq((size_t)(sigma + 1) * n_words);
    etn_build_peq(q, qlen, eq, sigma, peq.data());
    std::vector<uint8_t> rq(q, q + qlen), rt(t, t + tlen);
    std::reverse(rq.begin(), rq.end());
    std::reverse(rt.begin(), rt.end());
    std::vector<Word> rpeq((size_t)(sigma + 1) * n_words);
    etn_build_peq(rq.data(), qlen, eq, sigma, rpeq.data());
    g_setup += now_s() - t0;

    int64_t left_w = tlen / 2;
    int64_t right_w = tlen - left_w;
    std::vector<int32_t> left(qlen), rev(qlen);
    t0 = now_s();
    etn_nw_cells_at_banded(peq.data(), n_words, qlen, t, tlen, left_w - 1,
                           best, left.data());
    etn_nw_cells_at_banded(rpeq.data(), n_words, qlen, rt.data(), tlen,
                           right_w - 1, best, rev.data());
    g_cells += now_s() - t0;
    g_cells_calls += 2;

    int64_t row = -2, l_score = 0, r_score = 0;
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
    if (row == -2) return -1;
    int64_t n1 = rec(q, row + 1, t, left_w, eq, sigma, l_score, ops_out);
    if (n1 < 0) return -1;
    int64_t n2 = rec(q + row + 1, qlen - row - 1, t + left_w,
                     tlen - left_w, eq, sigma, r_score, ops_out + n1);
    if (n2 < 0) return -1;
    return n1 + n2;
}

int main() {
    const int64_t N = 94500;
    std::mt19937_64 rng(11);
    std::vector<uint8_t> t(N), q;
    for (auto& c : t) c = (uint8_t)(rng() % 4);
    q = t;
    for (auto& c : q)
        if (rng() % 100 < 3) c = (uint8_t)(rng() % 4);
    uint8_t eq[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};

    // distance first (banded, doubling) to get best
    int64_t n_words = (N + WBITS - 1) / WBITS;
    std::vector<Word> peq((size_t)5 * n_words);
    etn_build_peq(q.data(), N, eq, 4, peq.data());
    int32_t best = -1;
    for (int64_t k = 64; k <= N; k *= 2) {
        best = etn_nw_distance_banded(peq.data(), n_words, t.data(), N, N, k);
        if (best >= 0) break;
    }
    printf("best=%d\n", best);

    std::vector<uint8_t> ops(2 * N);
    for (int rep = 0; rep < 5; rep++) {
        g_cells = g_leaf = g_setup = 0;
        g_cells_calls = g_leaf_calls = g_leaf_cells = 0;
        double t0 = now_s();
        int64_t n = rec(q.data(), N, t.data(), N, eq, 4, best, ops.data());
        double tot = now_s() - t0;
        printf("total %6.1fms  cells %6.1fms (%lld calls)  leaf %6.1fms "
               "(%lld calls, %.1fM cells)  setup %5.1fms  ops=%lld\n",
               tot * 1e3, g_cells * 1e3, (long long)g_cells_calls,
               g_leaf * 1e3, (long long)g_leaf_calls,
               g_leaf_cells / 1e6, g_setup * 1e3, (long long)n);
    }
    return 0;
}
