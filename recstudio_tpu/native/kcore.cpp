// Native ETL kernels for the host-side data pipeline.
//
// The reference implements the k-core filter as a scipy sparse-matrix loop
// (reference dataset.py:528-573) that rebuilds CSC matrices every round; this
// C++ version keeps per-node degree counters and a worklist, giving
// O(E * rounds) with tiny constants — the hot path when preparing
// hundred-million-interaction datasets.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <vector>

extern "C" {

// Alternating k-core pruning over an interaction list.
//   users, items: edge endpoints (0-based contiguous ids)
//   n_edges, n_users, n_items: sizes
//   min_user, min_item: degree thresholds
//   keep_out: byte mask per edge (1 = keep), caller-allocated
// Returns the number of kept edges.
int64_t kcore_filter(const int64_t* users, const int64_t* items,
                     int64_t n_edges, int64_t n_users, int64_t n_items,
                     int64_t min_user, int64_t min_item, uint8_t* keep_out) {
    std::vector<int64_t> udeg(n_users, 0), ideg(n_items, 0);
    for (int64_t e = 0; e < n_edges; ++e) {
        udeg[users[e]]++;
        ideg[items[e]]++;
    }
    std::vector<uint8_t> ualive(n_users, 1), ialive(n_items, 1);
    bool changed = true;
    while (changed) {
        changed = false;
        if (min_item > 0) {
            for (int64_t i = 0; i < n_items; ++i) {
                if (ialive[i] && ideg[i] < min_item) {
                    ialive[i] = 0;
                    changed = true;
                }
            }
        }
        if (min_user > 0) {
            for (int64_t u = 0; u < n_users; ++u) {
                if (ualive[u] && udeg[u] < min_user) {
                    ualive[u] = 0;
                    changed = true;
                }
            }
        }
        if (!changed) break;
        // recompute degrees over surviving edges
        std::fill(udeg.begin(), udeg.end(), 0);
        std::fill(ideg.begin(), ideg.end(), 0);
        for (int64_t e = 0; e < n_edges; ++e) {
            if (ualive[users[e]] && ialive[items[e]]) {
                udeg[users[e]]++;
                ideg[items[e]]++;
            }
        }
    }
    int64_t kept = 0;
    for (int64_t e = 0; e < n_edges; ++e) {
        uint8_t k = ualive[users[e]] && ialive[items[e]];
        keep_out[e] = k;
        kept += k;
    }
    return kept;
}

// Grouped history offsets: given ids sorted stably by key, emit per-key
// counts (used to build padded history matrices without pandas groupby).
void bincount_i64(const int64_t* keys, int64_t n, int64_t n_bins,
                  int64_t* counts_out) {
    for (int64_t b = 0; b < n_bins; ++b) counts_out[b] = 0;
    for (int64_t i = 0; i < n; ++i) counts_out[keys[i]]++;
}

}  // extern "C"
