// Native (reverse) Cuthill-McKee: host-side bandwidth reduction.
//
// The banded MXU fast path (ops/banded.py) requires an RCM node ordering;
// the numpy implementation (mesh/reorder.py) costs ~70 s at 250k hex
// elements on the single-core host (np.unique over E*n^2 pairs + a
// per-vertex Python BFS loop), which dominates model setup at the
// 10M-dof scale.  This is the same algorithm (cf. reference
// src/mesh/reorder.rs:171/236) with a radix-sorted CSR adjacency and a
// flat BFS: ~1 s at the same size.  Semantics match mesh/reorder.py
// bit-for-bit: components seeded from the min-(degree, index) unvisited
// vertex, frontier children ordered by (degree, index).
//
// Interface: plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// LSD radix sort of 64-bit keys (no payload); 8-bit digits.
void radix_sort_keys(std::vector<uint64_t>& keys) {
    const size_t n = keys.size();
    std::vector<uint64_t> buf(n);
    uint64_t max_key = 0;
    for (size_t i = 0; i < n; ++i)
        if (keys[i] > max_key) max_key = keys[i];
    int passes = 1;
    while (passes < 8 && (max_key >> (8 * passes)) != 0) ++passes;

    size_t count[256];
    for (int pass = 0; pass < passes; ++pass) {
        const int shift = 8 * pass;
        std::memset(count, 0, sizeof(count));
        for (size_t i = 0; i < n; ++i) ++count[(keys[i] >> shift) & 0xff];
        size_t sum = 0;
        for (int b = 0; b < 256; ++b) {
            size_t c = count[b];
            count[b] = sum;
            sum += c;
        }
        for (size_t i = 0; i < n; ++i) buf[count[(keys[i] >> shift) & 0xff]++] = keys[i];
        keys.swap(buf);
    }
}

}  // namespace

extern "C" {

// perm_out[new_index] = old_index (Cuthill-McKee order; caller reverses
// for RCM).  Returns 0 on success.
int fenris_cuthill_mckee(const int32_t* cells, int64_t E, int32_t n,
                         int64_t nv, int64_t* perm_out) {
    if (nv <= 0) return 0;
    // adjacency pairs (a, b), a != b, as keys a * nv + b
    std::vector<uint64_t> keys;
    keys.reserve(static_cast<size_t>(E) * n * (n - 1));
    for (int64_t e = 0; e < E; ++e) {
        const int32_t* c = cells + e * n;
        for (int32_t i = 0; i < n; ++i)
            for (int32_t j = 0; j < n; ++j)
                if (c[i] != c[j])
                    keys.push_back(static_cast<uint64_t>(c[i]) * nv + c[j]);
    }
    radix_sort_keys(keys);

    // dedup + CSR rows (cols ascending within each row)
    std::vector<int64_t> offsets(nv + 1, 0);
    std::vector<int32_t> neighbors;
    neighbors.reserve(keys.size());
    uint64_t prev = ~0ull;
    for (size_t i = 0; i < keys.size(); ++i) {
        if (keys[i] == prev) continue;
        prev = keys[i];
        const int64_t row = static_cast<int64_t>(keys[i] / nv);
        offsets[row + 1]++;
        neighbors.push_back(static_cast<int32_t>(keys[i] % nv));
    }
    for (int64_t v = 0; v < nv; ++v) offsets[v + 1] += offsets[v];
    keys.clear();
    keys.shrink_to_fit();

    // stable order by (degree, index): counting sort over degrees
    std::vector<int64_t> degree(nv);
    int64_t max_deg = 0;
    for (int64_t v = 0; v < nv; ++v) {
        degree[v] = offsets[v + 1] - offsets[v];
        if (degree[v] > max_deg) max_deg = degree[v];
    }
    std::vector<int64_t> dcount(max_deg + 2, 0);
    for (int64_t v = 0; v < nv; ++v) ++dcount[degree[v] + 1];
    for (int64_t d = 0; d < max_deg + 1; ++d) dcount[d + 1] += dcount[d];
    std::vector<int64_t> by_degree(nv);
    for (int64_t v = 0; v < nv; ++v) by_degree[dcount[degree[v]]++] = v;

    // BFS over components
    std::vector<uint8_t> visited(nv, 0);
    std::vector<int64_t> scratch;  // frontier children of one vertex
    int64_t pos = 0, seed_ptr = 0;
    while (pos < nv) {
        while (seed_ptr < nv && visited[by_degree[seed_ptr]]) ++seed_ptr;
        const int64_t seed = by_degree[seed_ptr];
        visited[seed] = 1;
        perm_out[pos] = seed;
        int64_t head = pos++;
        while (head < pos) {
            const int64_t u = perm_out[head++];
            scratch.clear();
            for (int64_t k = offsets[u]; k < offsets[u + 1]; ++k) {
                const int32_t w = neighbors[k];
                if (!visited[w]) {
                    visited[w] = 1;
                    scratch.push_back(w);
                }
            }
            // children by (degree, index); rows are index-sorted already,
            // so a stable sort by degree preserves the index tiebreak
            std::stable_sort(scratch.begin(), scratch.end(),
                             [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
            for (int64_t w : scratch) perm_out[pos++] = w;
        }
    }
    return 0;
}

}  // extern "C"
