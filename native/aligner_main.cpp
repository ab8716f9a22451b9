// edlib-tpu-aligner (native): compiled CLI with byte-identical output to
// the reference aligner (apps/aligner/aligner.cpp:28-377) — flags
// -m/-n/-k/-p/-l/-f/-s/-r, the adaptive best-N k-tightening max-heap
// (aligner.cpp:183-195), the NICE side-by-side printer (:331-377), and the
// score listing, all over the drop-in C ABI (edlib_compat.h).  Logic
// mirrors edlib_tpu/cli.py (the byte-parity-tested Python CLI); the
// Python CLI remains the entry point for the TPU device backend.
//
// Build: make -C native aligner   ->  native/edlib-tpu-aligner

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include "edlib_compat.h"

extern "C" {
int etn_fasta_stat(const char* path, int64_t* n_seqs, int64_t* total_len);
int etn_fasta_read(const char* path, char* data, int64_t* offsets,
                   int64_t data_cap, int64_t seq_cap);
}

struct Fasta {
    std::vector<char> data;
    std::vector<int64_t> offsets;  // n_seqs + 1 entries
    int64_t n_seqs = 0;

    const char* seq(int64_t i) const { return data.data() + offsets[i]; }
    int len(int64_t i) const { return (int)(offsets[i + 1] - offsets[i]); }
};

static bool read_fasta(const char* path, Fasta* out) {
    int64_t n_seqs = 0, total = 0;
    if (etn_fasta_stat(path, &n_seqs, &total) != 0) return false;
    out->data.resize(total ? total : 1);
    out->offsets.resize(n_seqs + 1);
    out->offsets[0] = 0;
    if (etn_fasta_read(path, out->data.data(), out->offsets.data(),
                       total, n_seqs) != 0) {
        return false;
    }
    out->n_seqs = n_seqs;
    return true;
}

// NICE printer: 50-op rows of T:/match/Q: lines with positions
// (reference aligner.cpp:331-377; mirrors cli.py print_alignment).
static void print_alignment(const char* query, const char* target,
                            const unsigned char* ops, int n, int position,
                            EdlibAlignMode mode) {
    int64_t t_idx = -1, q_idx = -1;
    if (mode == EDLIB_MODE_HW) {
        t_idx = position;
        for (int i = 0; i < n; i++)
            if (ops[i] != EDLIB_EDOP_INSERT) t_idx--;
    }
    for (int start = 0; start < n; start += 50) {
        int m = n - start < 50 ? n - start : 50;
        // target row
        printf("T: ");
        int64_t start_t_idx = -1;
        for (int j = 0; j < m; j++) {
            unsigned char op = ops[start + j];
            if (op == EDLIB_EDOP_INSERT) {
                putchar('-');
            } else {
                t_idx++;
                putchar(target[t_idx]);
            }
            if (j == 0) start_t_idx = t_idx;
        }
        printf(" (%lld - %lld)\n",
               (long long)(start_t_idx > 0 ? start_t_idx : 0),
               (long long)t_idx);
        // match row
        printf("   ");
        for (int j = 0; j < m; j++)
            putchar(ops[start + j] == EDLIB_EDOP_MATCH ? '|' : ' ');
        putchar('\n');
        // query row
        printf("Q: ");
        int64_t start_q_idx = q_idx;
        for (int j = 0; j < m; j++) {
            unsigned char op = ops[start + j];
            if (op == EDLIB_EDOP_DELETE) {
                putchar('-');
            } else {
                q_idx++;
                putchar(query[q_idx]);
            }
            if (j == 0) start_q_idx = q_idx;
        }
        printf(" (%lld - %lld)\n\n",
               (long long)(start_q_idx > 0 ? start_q_idx : 0),
               (long long)q_idx);
    }
}

static void usage(const char* prog) {
    fprintf(stderr,
            "Usage: %s [-m NW|HW|SHW] [-n N] [-k K] [-p] [-l] "
            "[-f NICE|CIG_STD|CIG_EXT] [-s] [-r N] "
            "<queries.fasta> <target.fasta>\n", prog);
}

int main(int argc, char** argv) {
    EdlibAlignMode mode = EDLIB_MODE_NW;
    int num_best = 0;
    int user_k = -1;
    bool find_alignment = false, find_starts = false, silent = false;
    EdlibCigarFormat cigar_fmt = EDLIB_CIGAR_EXTENDED;
    bool nice_fmt = true;
    int num_repeats = 1;

    int argi = 1;
    for (; argi < argc && argv[argi][0] == '-'; argi++) {
        const char* a = argv[argi];
        auto next = [&]() -> const char* {
            if (argi + 1 >= argc) { usage(argv[0]); exit(1); }
            return argv[++argi];
        };
        if (!strcmp(a, "-m")) {
            const char* v = next();
            if (!strcmp(v, "NW")) mode = EDLIB_MODE_NW;
            else if (!strcmp(v, "HW")) mode = EDLIB_MODE_HW;
            else if (!strcmp(v, "SHW")) mode = EDLIB_MODE_SHW;
            else { usage(argv[0]); return 1; }
        } else if (!strcmp(a, "-n")) {
            num_best = atoi(next());
        } else if (!strcmp(a, "-k")) {
            user_k = atoi(next());
        } else if (!strcmp(a, "-p")) {
            find_alignment = true;
        } else if (!strcmp(a, "-l")) {
            find_starts = true;
        } else if (!strcmp(a, "-f")) {
            const char* v = next();
            if (!strcmp(v, "NICE")) { nice_fmt = true; }
            else if (!strcmp(v, "CIG_STD")) {
                nice_fmt = false; cigar_fmt = EDLIB_CIGAR_STANDARD;
            } else if (!strcmp(v, "CIG_EXT")) {
                nice_fmt = false; cigar_fmt = EDLIB_CIGAR_EXTENDED;
            } else { usage(argv[0]); return 1; }
        } else if (!strcmp(a, "-s")) {
            silent = true;
        } else if (!strcmp(a, "-r")) {
            num_repeats = atoi(next());
        } else {
            usage(argv[0]);
            return 1;
        }
    }
    if (argc - argi != 2) { usage(argv[0]); return 1; }
    const char* queries_path = argv[argi];
    const char* target_path = argv[argi + 1];

    EdlibAlignTask task = EDLIB_TASK_DISTANCE;
    if (find_starts) task = EDLIB_TASK_LOC;
    if (find_alignment) task = EDLIB_TASK_PATH;

    printf("Using %s alignment mode.\n",
           mode == EDLIB_MODE_NW ? "NW"
           : mode == EDLIB_MODE_HW ? "HW" : "SHW");

    printf("Reading queries...\n");
    Fasta queries;
    if (!read_fasta(queries_path, &queries)) {
        printf("Error: There is no file with name %s\n", queries_path);
        return 1;
    }
    int64_t total_residues = queries.offsets[queries.n_seqs];
    printf("Read %lld queries, %lld residues total.\n",
           (long long)queries.n_seqs, (long long)total_residues);

    printf("Reading target fasta file...\n");
    Fasta target;
    if (!read_fasta(target_path, &target) || target.n_seqs < 1) {
        printf("Error: There is no file with name %s\n", target_path);
        return 1;
    }
    const char* t = target.seq(0);
    int tlen = target.len(0);
    printf("Read target, %d residues.\n", tlen);

    printf("\nComparing queries to target...\n");
    clock_t start_time = clock();

    std::vector<EdlibAlignResult> results((size_t)queries.n_seqs);
    bool progress = !find_alignment || silent;
    if (progress) {
        printf("0/%lld", (long long)queries.n_seqs);
        fflush(stdout);
    }
    std::priority_queue<int> best_heap;  // N best scores, max on top
    int k = user_k;
    const char* thr_env = getenv("EDLIB_TPU_THREADS");
    bool pool_ok =
        num_best == 0 && num_repeats == 1 && queries.n_seqs > 1 &&
        !(thr_env && (!strcmp(thr_env, "0") || !strcmp(thr_env, "1")));
    if (pool_ok) {
        // No adaptive-k (-n) means every read is independent: fan the
        // align loop across cores.  The reference CLI is strictly serial
        // (aligner.cpp:162-225); output stays byte-identical because
        // results are stored by index and progress integers are emitted
        // in ascending order under a lock.  Per-pair internal threading
        // (threaded Hirschberg) is ALWAYS disabled while pooling — the
        // pool supplies all the parallelism, nested forking thrashes
        // (batch.py:730-738) — so EDLIB_TPU_THREADS > 1 sizes the POOL
        // instead of enabling per-pair threads.
        unsigned n_workers = 0;
        if (thr_env) n_workers = (unsigned)atoi(thr_env);
        if (n_workers < 1) n_workers = std::thread::hardware_concurrency();
        if (n_workers < 1) n_workers = 1;
        if ((int64_t)n_workers > queries.n_seqs)
            n_workers = (unsigned)queries.n_seqs;
        std::string saved_thr = thr_env ? thr_env : "";
        bool had_thr = thr_env != nullptr;
        if (task == EDLIB_TASK_PATH)
            setenv("EDLIB_TPU_THREADS", "0", 1);
        std::atomic<int64_t> next(0), done(0);
        std::mutex print_mu;
        int64_t printed = 0;
        auto worker = [&]() {
            EdlibAlignConfig cfg =
                edlibNewAlignConfig(k, mode, task, NULL, 0);
            for (;;) {
                int64_t i = next.fetch_add(1);
                if (i >= queries.n_seqs) break;
                results[i] = edlibAlign(queries.seq(i), queries.len(i),
                                        t, tlen, cfg);
                done.fetch_add(1);
                if (progress) {
                    std::lock_guard<std::mutex> g(print_mu);
                    int64_t target_v = done.load();
                    while (printed < target_v) {
                        ++printed;
                        printf("\r%lld/%lld", (long long)printed,
                               (long long)queries.n_seqs);
                    }
                    fflush(stdout);
                }
            }
        };
        std::vector<std::thread> ts;
        for (unsigned w = 0; w < n_workers; w++) ts.emplace_back(worker);
        for (auto& th : ts) th.join();
        // The no-internal-threads override is pool-scoped: restore the
        // user's value so reusing this file as a library entry point (or
        // any later in-process align call) sees the environment it set.
        if (task == EDLIB_TASK_PATH) {
            if (had_thr) setenv("EDLIB_TPU_THREADS", saved_thr.c_str(), 1);
            else unsetenv("EDLIB_TPU_THREADS");
        }
    } else {
    for (int64_t i = 0; i < queries.n_seqs; i++) {
        EdlibAlignConfig cfg = edlibNewAlignConfig(k, mode, task, NULL, 0);
        for (int rep = 0; rep < num_repeats; rep++) {
            if (rep > 0) edlibFreeAlignResult(results[i]);
            results[i] = edlibAlign(queries.seq(i), queries.len(i),
                                    t, tlen, cfg);
        }
        // Adaptive k from the N best scores so far (aligner.cpp:183-195).
        if (num_best > 0 && results[i].editDistance >= 0) {
            best_heap.push(results[i].editDistance);
            if ((int)best_heap.size() > num_best) best_heap.pop();
            if ((int)best_heap.size() == num_best) {
                k = best_heap.top() - 1;
                if (user_k >= 0 && user_k < k) k = user_k;
            }
        }
        if (progress) {
            printf("\r%lld/%lld", (long long)(i + 1),
                   (long long)queries.n_seqs);
            fflush(stdout);
        }
    }
    }

    int score_limit = -1;
    if (num_best > 0 && !best_heap.empty()) score_limit = best_heap.top();

    if (find_alignment && !silent) {
        for (int64_t i = 0; i < queries.n_seqs; i++) {
            const EdlibAlignResult& r = results[i];
            if (r.alignment == NULL) continue;
            printf("\nQuery #%lld (%d residues): score = %d\n",
                   (long long)i, queries.len(i), r.editDistance);
            if (nice_fmt) {
                print_alignment(queries.seq(i), t, r.alignment,
                                r.alignmentLength, r.endLocations[0], mode);
            } else {
                char* cig = edlibAlignmentToCigar(r.alignment,
                                                  r.alignmentLength,
                                                  cigar_fmt);
                printf("Cigar:\n%s\n", cig ? cig : "");
                free(cig);
            }
        }
    } else if (!silent) {
        printf("\n");
        if (score_limit >= 0) {
            printf("%d best scores:\n", (int)best_heap.size());
        } else {
            printf("Scores:\n");
        }
        printf("<query number>: <score>, <num_locations>, "
               "[(<start_location_in_target>, <end_location_in_target>)]\n");
        for (int64_t i = 0; i < queries.n_seqs; i++) {
            const EdlibAlignResult& r = results[i];
            if (r.editDistance > -1
                && (score_limit == -1 || r.editDistance <= score_limit)) {
                printf("#%lld: %d  %d", (long long)i, r.editDistance,
                       r.numLocations);
                if (r.numLocations > 0) {
                    printf("  [ ");
                    for (int j = 0; j < r.numLocations; j++) {
                        if (r.startLocations) {
                            printf("(%d, %d) ", r.startLocations[j],
                                   r.endLocations[j]);
                        } else {
                            printf("(?, %d) ", r.endLocations[j]);
                        }
                    }
                    printf("]");
                }
                printf("\n");
            }
        }
    }

    double cpu_time = (double)(clock() - start_time) / CLOCKS_PER_SEC;
    printf("\nCpu time of searching: %lf\n", cpu_time);

    for (auto& r : results) edlibFreeAlignResult(r);
    return 0;
}
