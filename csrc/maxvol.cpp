// Native maxvol / rect_maxvol pivot selection.
//
// The pivot search is an inherently sequential argmax + rank-1-update loop
// on a small host matrix — the one part of cross-approximation that does not
// belong on the TPU (the reference also runs it on host, via scipy
// LAPACK/BLAS handles: /root/reference/tntorch/maxvol.py:88-167). This is a
// self-contained C++ implementation (own partially pivoted LU + triangular
// solves + fused rank-1 updates), exposed over a C ABI for ctypes.
//
// Algorithms:
//   maxvol: Goreinov et al., "How to find a good submatrix" (2010)
//   rect_maxvol: Mikhalev & Oseledets, "Rectangular maximum-volume
//   submatrices and their applications" (2018)

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Partially pivoted LU of tall A (n x r, row-major), returning the r pivot
// row indices (the rows a square maxvol iteration starts from).
void lu_pivot_rows(const double* A, long n, long r, long* index) {
    std::vector<double> B(A, A + n * r);
    std::vector<long> perm(n);
    for (long i = 0; i < n; ++i) perm[i] = i;

    for (long k = 0; k < r; ++k) {
        long piv = k;
        double best = std::fabs(B[k * r + k]);
        for (long i = k + 1; i < n; ++i) {
            double v = std::fabs(B[i * r + k]);
            if (v > best) { best = v; piv = i; }
        }
        if (piv != k) {
            for (long j = 0; j < r; ++j) std::swap(B[k * r + j], B[piv * r + j]);
            std::swap(perm[k], perm[piv]);
        }
        double d = B[k * r + k];
        if (d == 0.0) d = 1e-300;
        for (long i = k + 1; i < n; ++i) {
            double l = B[i * r + k] / d;
            B[i * r + k] = l;
            for (long j = k + 1; j < r; ++j) B[i * r + j] -= l * B[k * r + j];
        }
    }
    for (long k = 0; k < r; ++k) index[k] = perm[k];
}

// Solve C = A * inv(S) where S = A[rows] (r x r): LU-factor S, then for each
// row a of A solve x S = a  (i.e. S^T x^T = a^T).
int coefficients(const double* A, long n, long r, const long* rows, double* C) {
    std::vector<double> S(r * r);
    for (long i = 0; i < r; ++i)
        std::memcpy(&S[i * r], &A[rows[i] * r], r * sizeof(double));

    // LU with partial pivoting of S^T (so row solves become two triangular solves)
    std::vector<double> T(r * r);
    for (long i = 0; i < r; ++i)
        for (long j = 0; j < r; ++j) T[i * r + j] = S[j * r + i];
    std::vector<long> piv(r);
    for (long k = 0; k < r; ++k) {
        long p = k;
        double best = std::fabs(T[k * r + k]);
        for (long i = k + 1; i < r; ++i) {
            double v = std::fabs(T[i * r + k]);
            if (v > best) { best = v; p = i; }
        }
        piv[k] = p;
        if (p != k)
            for (long j = 0; j < r; ++j) std::swap(T[k * r + j], T[p * r + j]);
        double d = T[k * r + k];
        if (d == 0.0) return 1;
        for (long i = k + 1; i < r; ++i) {
            double l = T[i * r + k] / d;
            T[i * r + k] = l;
            for (long j = k + 1; j < r; ++j) T[i * r + j] -= l * T[k * r + j];
        }
    }

    std::vector<double> y(r);
    for (long row = 0; row < n; ++row) {
        for (long j = 0; j < r; ++j) y[j] = A[row * r + j];
        for (long k = 0; k < r; ++k)
            if (piv[k] != k) std::swap(y[k], y[piv[k]]);
        for (long k = 0; k < r; ++k)  // forward (unit lower)
            for (long i = 0; i < k; ++i) y[k] -= T[k * r + i] * y[i];
        for (long k = r - 1; k >= 0; --k) {  // backward (upper)
            for (long i = k + 1; i < r; ++i) y[k] -= T[k * r + i] * y[i];
            y[k] /= T[k * r + k];
        }
        std::memcpy(&C[row * r], y.data(), r * sizeof(double));
    }
    return 0;
}

}  // namespace

extern "C" {

// maxvol: select r rows of A (n x r, row-major, n > r) with quasi-maximal
// volume. Outputs: index (r longs), C (n x r doubles, = A @ inv(A[rows])).
int tnt_maxvol(const double* A, long n, long r, double tol, long max_iters,
               long* index, double* C) {
    if (n <= r) {
        for (long i = 0; i < n; ++i) index[i] = i;
        std::memset(C, 0, n * n * sizeof(double));
        for (long i = 0; i < n; ++i) C[i * n + i] = 1.0;
        return 0;
    }
    if (tol < 1.0) tol = 1.0;

    std::vector<long> full_index(n);
    lu_pivot_rows(A, n, r, full_index.data());
    std::vector<long> idx(full_index.begin(), full_index.begin() + r);
    if (coefficients(A, n, r, idx.data(), C) != 0) return 1;

    for (long it = 0; it < max_iters; ++it) {
        long bi = 0, bj = 0;
        double best = 0.0;
        for (long i = 0; i < n; ++i)
            for (long j = 0; j < r; ++j) {
                double v = std::fabs(C[i * r + j]);
                if (v > best) { best = v; bi = i; bj = j; }
            }
        if (best <= tol) break;
        // Swap global row bi into pivot slot bj; rank-1 update of C
        idx[bj] = bi;
        std::vector<double> col(n), row(r);
        for (long i = 0; i < n; ++i) col[i] = C[i * r + bj];
        for (long j = 0; j < r; ++j) row[j] = C[bi * r + j];
        row[bj] -= 1.0;
        double inv = 1.0 / C[bi * r + bj];
        for (long i = 0; i < n; ++i) {
            double ci = col[i] * inv;
            if (ci == 0.0) continue;
            double* Ci = &C[i * r];
            for (long j = 0; j < r; ++j) Ci[j] -= ci * row[j];
        }
    }
    std::memcpy(index, idx.data(), r * sizeof(long));
    return 0;
}

// rect_maxvol: greedily grow the maxvol row set while the largest
// coefficient row norm exceeds tol (K in [minK, maxK]). C is (n x maxK)
// workspace; K_out receives the selected count. C's live region after the
// call is n x K (row-major with stride maxK).
int tnt_rect_maxvol(const double* A, long n, long r, double tol, long maxK,
                    long minK, long start_maxvol_iters, long identity_submatrix,
                    long* index, double* C, long* K_out) {
    if (n <= r) {
        for (long i = 0; i < n; ++i) index[i] = i;
        std::memset(C, 0, n * maxK * sizeof(double));
        for (long i = 0; i < n; ++i) C[i * maxK + i] = 1.0;
        *K_out = n;
        return 0;
    }
    if (maxK > n) maxK = n;
    if (maxK < r) maxK = r;
    if (minK < r) minK = r;
    if (minK > n) minK = n;
    if (minK > maxK) minK = maxK;

    double tol2 = tol * tol;
    std::vector<double> Csq(n * r);
    std::vector<long> idx0(r);
    if (tnt_maxvol(A, n, r, 1.05, start_maxvol_iters, idx0.data(), Csq.data()) != 0)
        return 1;

    // Copy into the wide workspace
    std::memset(C, 0, n * maxK * sizeof(double));
    for (long i = 0; i < n; ++i)
        std::memcpy(&C[i * maxK], &Csq[i * r], r * sizeof(double));

    std::vector<double> chosen(n, 1.0);
    for (long j = 0; j < r; ++j) { index[j] = idx0[j]; chosen[idx0[j]] = 0.0; }

    std::vector<double> rns(n);
    for (long i = 0; i < n; ++i) {
        double s = 0.0;
        for (long j = 0; j < r; ++j) s += C[i * maxK + j] * C[i * maxK + j];
        rns[i] = s * chosen[i];
    }
    long K = r;
    long bi = 0;
    double best = -1.0;
    for (long i = 0; i < n; ++i) if (rns[i] > best) { best = rns[i]; bi = i; }

    std::vector<double> v(n), c(maxK);
    while ((rns[bi] > tol2 && K < maxK) || K < minK) {
        index[K] = bi;
        chosen[bi] = 0.0;
        std::memcpy(c.data(), &C[bi * maxK], K * sizeof(double));
        for (long i = 0; i < n; ++i) {
            double s = 0.0;
            const double* Ci = &C[i * maxK];
            for (long j = 0; j < K; ++j) s += Ci[j] * c[j];
            v[i] = s;
        }
        double l = 1.0 / (1.0 + v[bi]);
        for (long i = 0; i < n; ++i) {
            double* Ci = &C[i * maxK];
            double lv = l * v[i];
            for (long j = 0; j < K; ++j) Ci[j] -= lv * c[j];
            Ci[K] = lv;  // appended column
        }
        for (long i = 0; i < n; ++i)
            rns[i] = (rns[i] - l * v[i] * v[i]) * chosen[i];
        best = -1.0; bi = 0;
        for (long i = 0; i < n; ++i) if (rns[i] > best) { best = rns[i]; bi = i; }
        ++K;
    }

    if (identity_submatrix) {
        for (long k = 0; k < K; ++k) {
            double* Ci = &C[index[k] * maxK];
            std::memset(Ci, 0, K * sizeof(double));
            Ci[k] = 1.0;
        }
    }
    *K_out = K;
    return 0;
}

}  // extern "C"
