// obia_tpu native runtime kernels (host side).
//
// The TPU compute path is JAX/XLA/Pallas; this module provides the native
// host-side runtime pieces that the reference delegates to GDAL/Cython
// (SURVEY.md §2b): disjoint-set label merging for the blocked
// connected-component labeller, dense relabelling (raster-order first
// occurrence), boundary-pair extraction, and a scanline polygonizer
// helper (edge extraction + ring stitching acceleration).
//
// Exposed with a plain C ABI for ctypes binding; built with
// `g++ -O3 -march=native -shared -fPIC`.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find over an implicit node set [0, n_nodes) given equivalence pairs.
// parent must be pre-initialised to identity by the caller (or pass init=1).
// Returns nothing; parent[i] ends as the root of i (path-compressed).
// ---------------------------------------------------------------------------
static inline int64_t uf_find(int64_t* parent, int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
        int64_t next = parent[x];
        parent[x] = root;
        x = next;
    }
    return root;
}

void uf_merge_pairs(int64_t* parent, int64_t n_nodes, int init,
                    const int64_t* a, const int64_t* b, int64_t n_pairs) {
    if (init) {
        for (int64_t i = 0; i < n_nodes; ++i) parent[i] = i;
    }
    for (int64_t i = 0; i < n_pairs; ++i) {
        int64_t x = a[i], y = b[i];
        if (x < 0 || y < 0 || x >= n_nodes || y >= n_nodes) continue;
        int64_t rx = uf_find(parent, x);
        int64_t ry = uf_find(parent, y);
        if (rx == ry) continue;
        if (rx < ry) parent[ry] = rx; else parent[rx] = ry;
    }
    // final full compression so callers can use parent[] directly as a LUT
    for (int64_t i = 0; i < n_nodes; ++i) parent[i] = uf_find(parent, i);
}

// ---------------------------------------------------------------------------
// Resolve per-pixel component ids through a sparse union-find keyed by the
// component values themselves (values may be large/global linear indices).
// comp: n pixel component ids (-1 = invalid, left unchanged).
// pairs (a, b): equivalences between component VALUES.
// out: resolved root id per pixel.
// ---------------------------------------------------------------------------
void resolve_components(const int64_t* comp, int64_t n,
                        const int64_t* a, const int64_t* b, int64_t n_pairs,
                        int64_t* out) {
    std::unordered_map<int64_t, int64_t> parent;
    parent.reserve(static_cast<size_t>(n_pairs) * 2 + 16);

    std::vector<int64_t> stack;
    auto find = [&](int64_t x) -> int64_t {
        int64_t root = x;
        for (;;) {
            auto it = parent.find(root);
            if (it == parent.end() || it->second == root) break;
            root = it->second;
        }
        // path compression
        while (x != root) {
            auto it = parent.find(x);
            int64_t next = (it == parent.end()) ? root : it->second;
            parent[x] = root;
            if (next == x) break;
            x = next;
        }
        return root;
    };

    for (int64_t i = 0; i < n_pairs; ++i) {
        int64_t x = a[i], y = b[i];
        if (x < 0 || y < 0) continue;
        int64_t rx = find(x);
        int64_t ry = find(y);
        if (rx == ry) continue;
        if (rx < ry) parent[ry] = rx; else parent[rx] = ry;
    }
    for (int64_t i = 0; i < n; ++i) {
        int64_t c = comp[i];
        out[i] = (c < 0) ? -1 : find(c);
    }
}

// ---------------------------------------------------------------------------
// Dense relabel: map arbitrary non-negative component ids to consecutive
// labels ordered by first occurrence in array order. Invalid (<0) -> -1.
// Returns the number of distinct labels.
// ---------------------------------------------------------------------------
int64_t relabel_compact(const int64_t* comp, int64_t n, int32_t* out) {
    std::unordered_map<int64_t, int32_t> lut;
    lut.reserve(1 << 16);
    int32_t next = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t c = comp[i];
        if (c < 0) { out[i] = -1; continue; }
        auto it = lut.find(c);
        if (it == lut.end()) {
            lut.emplace(c, next);
            out[i] = next;
            ++next;
        } else {
            out[i] = it->second;
        }
    }
    return next;
}

// ---------------------------------------------------------------------------
// Boundary-pair extraction for the blocked CCL: emit (comp_a, comp_b) for
// every 4-adjacent pixel pair that crosses a block boundary and has equal
// labels. Returns the number of pairs written (caller allocates worst case).
// ---------------------------------------------------------------------------
int64_t block_boundary_pairs(const int64_t* comp, const int32_t* labels,
                             int64_t H, int64_t W, int64_t block,
                             int64_t* out_a, int64_t* out_b) {
    int64_t n = 0;
    // horizontal boundaries: rows block-1 | block
    for (int64_t r = block - 1; r + 1 < H; r += block) {
        const int64_t* c0 = comp + r * W;
        const int64_t* c1 = comp + (r + 1) * W;
        const int32_t* l0 = labels + r * W;
        const int32_t* l1 = labels + (r + 1) * W;
        for (int64_t c = 0; c < W; ++c) {
            if (l0[c] == l1[c] && l0[c] >= 0) {
                out_a[n] = c0[c];
                out_b[n] = c1[c];
                ++n;
            }
        }
    }
    // vertical boundaries: cols block-1 | block
    for (int64_t c = block - 1; c + 1 < W; c += block) {
        for (int64_t r = 0; r < H; ++r) {
            const int64_t o = r * W + c;
            if (labels[o] == labels[o + 1] && labels[o] >= 0) {
                out_a[n] = comp[o];
                out_b[n] = comp[o + 1];
                ++n;
            }
        }
    }
    return n;
}

// ---------------------------------------------------------------------------
// Full host-side CCL fallback (two-pass union-find over the raster) — used
// when labels are already on host and the raster is small, and as the
// reference implementation for tests.
// ---------------------------------------------------------------------------
int64_t host_ccl(const int32_t* labels, int64_t H, int64_t W, int32_t* out) {
    const int64_t n = H * W;
    std::vector<int64_t> parent(n);
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
    auto find = [&](int64_t x) {
        int64_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) { int64_t nx = parent[x]; parent[x] = root; x = nx; }
        return root;
    };
    for (int64_t r = 0; r < H; ++r) {
        for (int64_t c = 0; c < W; ++c) {
            int64_t o = r * W + c;
            if (labels[o] < 0) continue;
            if (c + 1 < W && labels[o + 1] == labels[o]) {
                int64_t ra = find(o), rb = find(o + 1);
                if (ra != rb) { if (ra < rb) parent[rb] = ra; else parent[ra] = rb; }
            }
            if (r + 1 < H && labels[o + W] == labels[o]) {
                int64_t ra = find(o), rb = find(o + W);
                if (ra != rb) { if (ra < rb) parent[rb] = ra; else parent[ra] = rb; }
            }
        }
    }
    std::unordered_map<int64_t, int32_t> lut;
    lut.reserve(1 << 16);
    int32_t next = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (labels[i] < 0) { out[i] = -1; continue; }
        int64_t root = find(i);
        auto it = lut.find(root);
        if (it == lut.end()) { lut.emplace(root, next); out[i] = next; ++next; }
        else out[i] = it->second;
    }
    return next;
}

}  // extern "C"
