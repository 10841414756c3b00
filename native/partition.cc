// Native ghost-closure for the offline partitioner (mesh/partition.py).
//
// The NumPy construction does `npart × ghost_layers` boolean passes over ALL
// faces plus an O(npart² · N) send-set scan — minutes and O(N·P) memory at
// 10M points × 64 parts (reference scale, BASELINE config 5).  This is the
// same computation as sparse per-partition results via one CSR adjacency +
// stamped BFS: O(Σ_p (|own_p| + |halo_p|) · deg) total work.
//
// Handle protocol: cfd_ghosts_run does everything in one pass (one CSR
// build + one BFS sweep) and returns a handle with total sizes;
// cfd_ghosts_take copies the results into caller buffers and frees it.
// Results are parity-tested against the NumPy path (tests/test_partition.py):
//   ghosts are emitted in BFS visit order (Python lex-sorts them), kept
//   faces ascending (matching np.flatnonzero order).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Csr {
    std::vector<int64_t> off;    // (N+1)
    std::vector<int32_t> nbr;    // (2F) neighbor point
    std::vector<int32_t> fid;    // (2F) incident face id
};

Csr build_csr(const int32_t* faces, int64_t F, int64_t N) {
    Csr c;
    c.off.assign(N + 1, 0);
    for (int64_t f = 0; f < F; ++f) {
        ++c.off[faces[2 * f] + 1];
        ++c.off[faces[2 * f + 1] + 1];
    }
    for (int64_t i = 0; i < N; ++i) c.off[i + 1] += c.off[i];
    c.nbr.resize(2 * F);
    c.fid.resize(2 * F);
    std::vector<int64_t> cur(c.off.begin(), c.off.end() - 1);
    for (int64_t f = 0; f < F; ++f) {
        const int32_t a = faces[2 * f], b = faces[2 * f + 1];
        c.nbr[cur[a]] = b; c.fid[cur[a]++] = (int32_t)f;
        c.nbr[cur[b]] = a; c.fid[cur[b]++] = (int32_t)f;
    }
    return c;
}

// Walks one partition; calls emit_ghost(gid, depth) for BFS-visited ghosts
// and emit_face(fid) for kept faces (deduped, unsorted).
template <class G, class Fc>
void walk_part(const Csr& c, const int32_t* owner, int64_t N, int32_t p,
               const std::vector<int32_t>& own, int32_t K,
               std::vector<int32_t>& stamp, std::vector<int8_t>& depth,
               std::vector<int32_t>& fstamp, G&& emit_ghost, Fc&& emit_face) {
    std::vector<int32_t> frontier(own), next;
    for (const int32_t u : own) { stamp[u] = p; depth[u] = 0; }
    for (int32_t d = 1; d <= K; ++d) {
        next.clear();
        for (const int32_t u : frontier) {
            for (int64_t e = c.off[u]; e < c.off[u + 1]; ++e) {
                const int32_t v = c.nbr[e];
                if (stamp[v] != p) {
                    stamp[v] = p;
                    depth[v] = (int8_t)d;
                    emit_ghost(v, d);
                    next.push_back(v);
                }
            }
        }
        frontier.swap(next);
    }
    // kept faces incident to OWNED points (depth 0 < K always); the caller
    // handles faces incident to shallow (<K) ghosts from its ghost list
    for (const int32_t u : own) {
        for (int64_t e = c.off[u]; e < c.off[u + 1]; ++e) {
            const int32_t f = c.fid[e];
            if (fstamp[f] != p) { fstamp[f] = p; emit_face(f); }
        }
    }
    (void)owner;
    (void)N;
}

}  // namespace

namespace {

// Recursive coordinate bisection on an index range.  Membership matches the
// NumPy path (mesh/partition.py::rcb_assign) whenever the cut value is
// unique: left = the k smallest along the widest axis.  Ties at the cut are
// broken by (value, global id) — deterministic; tie-ful meshes may differ
// from the NumPy stable-sort fallback (both are valid RCBs).
void rcb_rec(const double* coords, int32_t* owner, std::vector<int64_t>& ids,
             int64_t s, int64_t e, int32_t lo, int32_t hi) {
    const int32_t nparts = hi - lo;
    if (nparts == 1) {
        for (int64_t i = s; i < e; ++i) owner[ids[i]] = lo;
        return;
    }
    const int32_t n1 = nparts / 2;
    double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = s; i < e; ++i) {
        const double* c = coords + 3 * ids[i];
        for (int d = 0; d < 3; ++d) {
            if (c[d] < mn[d]) mn[d] = c[d];
            if (c[d] > mx[d]) mx[d] = c[d];
        }
    }
    int axis = 0;
    for (int d = 1; d < 3; ++d)
        if (mx[d] - mn[d] > mx[axis] - mn[axis]) axis = d;
    const int64_t k = ((e - s) * n1) / nparts;
    auto key = [&](int64_t id) { return coords[3 * id + axis]; };
    if (k > 0 && k < e - s) {
        std::nth_element(ids.begin() + s, ids.begin() + s + k,
                         ids.begin() + e,
                         [&](int64_t a, int64_t b) { return key(a) < key(b); });
        // tie at the cut → deterministic (value, id) ordering
        double cut = key(ids[s + k]);
        double below = key(*std::max_element(
            ids.begin() + s, ids.begin() + s + k,
            [&](int64_t a, int64_t b) { return key(a) < key(b); }));
        if (below == cut) {
            std::sort(ids.begin() + s, ids.begin() + e,
                      [&](int64_t a, int64_t b) {
                          const double ka = key(a), kb = key(b);
                          return ka < kb || (ka == kb && a < b);
                      });
        }
    }
    rcb_rec(coords, owner, ids, s, s + k, lo, lo + n1);
    rcb_rec(coords, owner, ids, s + k, e, lo + n1, hi);
}

}  // namespace

namespace {

struct GhostResult {
    std::vector<int64_t> goff, foff;
    std::vector<int32_t> ghost_gid, face_ids;
    std::vector<int8_t> ghost_depth;
};

}  // namespace

extern "C" {

// One-pass protocol: run computes everything (single CSR build + BFS),
// returns a handle + total sizes; take copies out and frees the handle.
void* cfd_ghosts_run(const int32_t* faces, int64_t F, const int32_t* owner,
                     int64_t N, int32_t npart, int32_t K,
                     int64_t* nghost_total, int64_t* nface_total) {
    if (N <= 0 || F < 0 || npart <= 0 || K < 1) return nullptr;
    for (int64_t f = 0; f < 2 * F; ++f) {
        // a corrupt mesh must fail cleanly (NumPy fallback raises), not
        // corrupt the CSR offsets heap
        if (faces[f] < 0 || faces[f] >= N) return nullptr;
    }
    const Csr c = build_csr(faces, F, N);
    std::vector<std::vector<int32_t>> own(npart);
    for (int64_t i = 0; i < N; ++i) {
        const int32_t p = owner[i];
        if (p < 0 || p >= npart) return nullptr;
        own[p].push_back((int32_t)i);
    }
    auto* r = new GhostResult;
    r->goff.assign(1, 0);
    r->foff.assign(1, 0);
    std::vector<int32_t> stamp(N, -1), fstamp(F, -1);
    std::vector<int8_t> depth(N, 0);
    for (int32_t p = 0; p < npart; ++p) {
        const int64_t g0 = (int64_t)r->ghost_gid.size();
        const int64_t f0 = (int64_t)r->face_ids.size();
        walk_part(c, owner, N, p, own[p], K, stamp, depth, fstamp,
                  [&](int32_t gid, int32_t d) {
                      r->ghost_gid.push_back(gid);
                      r->ghost_depth.push_back((int8_t)d);
                  },
                  [&](int32_t fid) { r->face_ids.push_back(fid); });
        for (int64_t i = g0; i < (int64_t)r->ghost_gid.size(); ++i) {
            const int32_t u = r->ghost_gid[i];
            if (depth[u] >= K) continue;
            for (int64_t e = c.off[u]; e < c.off[u + 1]; ++e) {
                const int32_t fi = c.fid[e];
                if (fstamp[fi] != p) {
                    fstamp[fi] = p;
                    r->face_ids.push_back(fi);
                }
            }
        }
        std::sort(r->face_ids.begin() + f0, r->face_ids.end());
        r->goff.push_back((int64_t)r->ghost_gid.size());
        r->foff.push_back((int64_t)r->face_ids.size());
    }
    *nghost_total = (int64_t)r->ghost_gid.size();
    *nface_total = (int64_t)r->face_ids.size();
    return r;
}

int cfd_ghosts_take(void* handle, int64_t* goff, int64_t* foff,
                    int32_t* ghost_gid, int8_t* ghost_depth,
                    int32_t* face_ids) {
    auto* r = static_cast<GhostResult*>(handle);
    if (!r) return 1;
    std::copy(r->goff.begin(), r->goff.end(), goff);
    std::copy(r->foff.begin(), r->foff.end(), foff);
    std::copy(r->ghost_gid.begin(), r->ghost_gid.end(), ghost_gid);
    std::copy(r->ghost_depth.begin(), r->ghost_depth.end(), ghost_depth);
    std::copy(r->face_ids.begin(), r->face_ids.end(), face_ids);
    delete r;
    return 0;
}

int cfd_rcb_assign(const double* coords, int64_t N, int32_t npart,
                   int32_t* owner) {
    if (N <= 0 || npart <= 0) return 1;
    std::vector<int64_t> ids(N);
    for (int64_t i = 0; i < N; ++i) ids[i] = i;
    rcb_rec(coords, owner, ids, 0, N, 0, npart);
    return 0;
}

}  // extern "C"
