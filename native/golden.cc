// Golden-semantics Green-Gauss sweep in C — the honest CPU denominator.
//
// The reference (`gradients.c`, SURVEY.md §4.3) is a C face loop; the
// benchmark's ≥10× north star is faces/sec vs a 2-socket CPU node running
// that loop.  The NumPy golden (ops/golden.py) defines the semantics but
// `np.add.at` is ~5-10× slower than compiled C, which flattens the
// denominator.  This file is the same sequential loop in C:
//
//     for f: for v: avg = 0.5*(var[p0][v]+var[p1][v]);
//             for d: grad[p0][v][d] += avg*n[f][d]; grad[p1][v][d] -= ...
//
// Compiled with -ffp-contract=off (see native/Makefile) so the mul+add are
// NOT fused: nthreads==1 output is bit-identical to ops/golden.py
// (np.add.at applies the update blocks in the same incidence order and
// NumPy never emits FMA).
//
// Threaded mode (nthreads > 1): each thread accumulates its face range into
// a private grad array, then partials are reduced in thread order — the
// multi-core "2-socket node" stand-in.  NOT bit-identical to sequential
// (partials are pre-summed); it is a PERFORMANCE denominator only, accuracy
// is still f64-roundoff-level.

#include <cstdint>
#include <cstring>
#include <thread>
#include <utility>
#include <vector>

extern "C" {

// grad (npoint, nvar, 3) must be zero-initialised by the caller.
// CALLER CONTRACT: face endpoints must already be validated in
// [0, npoint) — the Python wrapper (native/__init__.py::golden_gg_c) does a
// vectorised check OUTSIDE this call.  An in-function serial O(nface) scan
// would sit inside the timed region of the CPU-baseline denominator and
// flatter vs_baseline (advisor finding, round 2); the reference's own C face
// loop carries no such scan either.
int cfd_golden_gg(const double* var, int64_t npoint, int32_t nvar,
                  const int32_t* faces, int64_t nface, const double* normals,
                  double* grad, int32_t nthreads) {
    if (npoint <= 0 || nvar <= 0 || nface < 0) return 1;
    const int64_t stride = (int64_t)nvar * 3;

    auto run = [&](int64_t f0, int64_t f1, double* g) {
        for (int64_t f = f0; f < f1; ++f) {
            const int64_t p0 = faces[2 * f];
            const int64_t p1 = faces[2 * f + 1];
            const double nx = normals[3 * f];
            const double ny = normals[3 * f + 1];
            const double nz = normals[3 * f + 2];
            double* g0 = g + p0 * stride;
            double* g1 = g + p1 * stride;
            const double* v0 = var + p0 * nvar;
            const double* v1 = var + p1 * nvar;
            for (int32_t v = 0; v < nvar; ++v) {
                const double avg = 0.5 * (v0[v] + v1[v]);
                g0[3 * v + 0] += avg * nx;
                g0[3 * v + 1] += avg * ny;
                g0[3 * v + 2] += avg * nz;
                g1[3 * v + 0] -= avg * nx;
                g1[3 * v + 1] -= avg * ny;
                g1[3 * v + 2] -= avg * nz;
            }
        }
    };

    if (nthreads <= 1 || nface < nthreads * 4) {
        run(0, nface, grad);
        return 0;
    }

    // private accumulators + thread-ordered reduction.  NOT bit-identical
    // to the sequential loop (per-thread partials are pre-summed before the
    // reduction, regrouping any point whose faces span thread ranges) —
    // this mode is a PERFORMANCE denominator only; the bit-match gate runs
    // at nthreads==1 (see file header).
    const int T = nthreads;
    const int64_t chunk = (nface + T - 1) / T;
    std::vector<std::pair<int64_t, int64_t>> ranges;
    for (int t = 1; t < T; ++t) {
        const int64_t f0 = t * chunk;
        const int64_t f1 = std::min<int64_t>(nface, (t + 1) * chunk);
        if (f0 < f1) ranges.emplace_back(f0, f1);
    }
    // allocate only for threads that actually run; a failed multi-GB
    // allocation must surface as an error code, not a bad_alloc unwinding
    // through the C ABI into ctypes (which aborts the process)
    std::vector<std::vector<double>> priv;
    try {
        priv.reserve(ranges.size());
        for (size_t i = 0; i < ranges.size(); ++i)
            priv.emplace_back(npoint * stride, 0.0);
    } catch (const std::bad_alloc&) {
        return 3;
    }
    std::vector<std::thread> ts;
    for (size_t i = 0; i < ranges.size(); ++i) {
        const int64_t f0 = ranges[i].first, f1 = ranges[i].second;
        ts.emplace_back([&, i, f0, f1] { run(f0, f1, priv[i].data()); });
    }
    run(0, std::min<int64_t>(nface, chunk), grad);  // thread 0 in place
    for (auto& th : ts) th.join();
    for (auto& p : priv)
        for (int64_t i = 0; i < npoint * stride; ++i) grad[i] += p[i];
    return 0;
}

}  // extern "C"
