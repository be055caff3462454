// Native symbolic assembly: CSR pattern + scatter-map construction.
//
// The host-side symbolic phase (sort + unique of all (row, col) dof pairs
// of all elements, cf. fenris's two-phase CsrAssembler, assembly/global.rs
// :65/:206) is the one genuinely CPU-bound step of the TPU pipeline for
// large meshes.  This implementation replaces numpy's comparison sort with
// an LSD radix sort over 64-bit keys and builds, in one pass over the
// sorted stream: unique column indices, row pointers, per-entry scatter
// indices (the segment-sum map used by the device numeric phase), and
// diagonal positions.
//
// Build: g++ -O3 -march=native -shared -fPIC pattern.cpp -o libfenris_native.so
// Interface: plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

namespace {

// LSD radix sort of (key, payload) pairs by key; 8 passes x 8 bits.
void radix_sort_pairs(std::vector<uint64_t>& keys, std::vector<int64_t>& payload) {
    const size_t n = keys.size();
    std::vector<uint64_t> kbuf(n);
    std::vector<int64_t> pbuf(n);
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
        for (size_t i = 0; i < n; ++i) {
            const size_t dst = count[(keys[i] >> shift) & 0xff]++;
            kbuf[dst] = keys[i];
            pbuf[dst] = payload[i];
        }
        keys.swap(kbuf);
        payload.swap(pbuf);
    }
}

}  // namespace

extern "C" {

struct PatternResult {
    int64_t nnz;
    int64_t num_rows;
    int64_t* row_ptr;        // [num_rows + 1]
    int32_t* col_indices;    // [nnz]
    int32_t* rows_of_nnz;    // [nnz]
    int32_t* scatter;        // [E * nd * nd]
    int64_t* diag_positions; // [num_rows]
};

// Build the dof-level CSR pattern for a homogeneous element block.
//   cells: [E, n] int32 node indices
//   solution_dim: dofs per node (dof = s * node + comp, node-major)
// Returns 0 on success.  Free with fenris_free_pattern.
int fenris_build_pattern(const int32_t* cells, int64_t E, int32_t n,
                         int64_t num_nodes, int32_t s, PatternResult* out) {
    const int64_t nd = (int64_t)n * s;
    const int64_t N = num_nodes * s;
    const int64_t total = E * nd * nd;

    std::vector<uint64_t> keys;
    std::vector<int64_t> payload;
    try {
        keys.resize(total);
        payload.resize(total);
    } catch (const std::bad_alloc&) {
        return 1;
    }

    // dof indices per element entry: dofs[a] = s * cells[e, a / s] + a % s
    std::vector<int64_t> dofs(nd);
    int64_t pos = 0;
    for (int64_t e = 0; e < E; ++e) {
        const int32_t* cell = cells + e * n;
        for (int64_t a = 0; a < nd; ++a)
            dofs[a] = (int64_t)s * cell[a / s] + (a % s);
        for (int64_t a = 0; a < nd; ++a) {
            const uint64_t row_term = (uint64_t)dofs[a] * (uint64_t)N;
            for (int64_t b = 0; b < nd; ++b) {
                keys[pos] = row_term + (uint64_t)dofs[b];
                payload[pos] = pos;
                ++pos;
            }
        }
    }

    radix_sort_pairs(keys, payload);

    // Count unique keys
    int64_t nnz = total > 0 ? 1 : 0;
    for (int64_t i = 1; i < total; ++i) nnz += (keys[i] != keys[i - 1]);

    auto* col_indices = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * nnz));
    auto* rows_of_nnz = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * nnz));
    auto* scatter = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * total));
    auto* row_ptr = static_cast<int64_t*>(std::malloc(sizeof(int64_t) * (N + 1)));
    auto* diag = static_cast<int64_t*>(std::malloc(sizeof(int64_t) * N));
    if (!col_indices || !rows_of_nnz || !scatter || !row_ptr || !diag) {
        std::free(col_indices); std::free(rows_of_nnz); std::free(scatter);
        std::free(row_ptr); std::free(diag);
        return 1;
    }

    for (int64_t r = 0; r < N; ++r) diag[r] = -1;
    for (int64_t r = 0; r <= N; ++r) row_ptr[r] = 0;

    int64_t uid = -1;
    uint64_t prev = ~uint64_t(0);
    for (int64_t i = 0; i < total; ++i) {
        if (i == 0 || keys[i] != prev) {
            ++uid;
            prev = keys[i];
            const int64_t row = (int64_t)(keys[i] / (uint64_t)N);
            const int64_t col = (int64_t)(keys[i] % (uint64_t)N);
            col_indices[uid] = (int32_t)col;
            rows_of_nnz[uid] = (int32_t)row;
            ++row_ptr[row + 1];
            if (row == col) diag[row] = uid;
        }
        scatter[payload[i]] = (int32_t)uid;
    }
    for (int64_t r = 0; r < N; ++r) row_ptr[r + 1] += row_ptr[r];

    out->nnz = nnz;
    out->num_rows = N;
    out->row_ptr = row_ptr;
    out->col_indices = col_indices;
    out->rows_of_nnz = rows_of_nnz;
    out->scatter = scatter;
    out->diag_positions = diag;
    return 0;
}

void fenris_free_pattern(PatternResult* res) {
    std::free(res->row_ptr);
    std::free(res->col_indices);
    std::free(res->rows_of_nnz);
    std::free(res->scatter);
    std::free(res->diag_positions);
}

}  // extern "C"
