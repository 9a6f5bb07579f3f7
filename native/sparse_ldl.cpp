// sparse_ldl.cpp -- host-side sparse symmetric factorization kernels.
//
// Native counterpart of the reference's sparse factorization layer for the
// general-NLP path: reverse Cuthill-McKee ordering (role of hqp/sprcm.C
// sp_rcm_scan/sp_rcm_order) and a sparse LDL' factorization with diagonal
// regularization (role of meschach/meschext_hl.C spCHOLfac/spMODCHOLfac,
// the kernels behind the reference's Schur-complement KKT path
// Hqp_IpSpSC).  Pivot-free by design: the interior-point reduced KKT is
// quasidefinite after dual regularization, for which LDL' with a fixed
// ordering is backward stable (Vanderbei); iterative refinement upstream
// recovers full accuracy, exactly like the reference layers refinement
// over its factorizations (hqp/Hqp_IpMatrix.C).
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
//
// Algorithm: up-looking LDL' using the elimination tree (the classic
// sparse-LDL scheme as described in T. Davis, "Direct Methods for Sparse
// Linear Systems", ch. 4) -- implemented from the textbook description.

#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <queue>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee ordering on the adjacency of a symmetric pattern.
// rowptr/colind: CSR of the full (both triangles) pattern, diagonal ignored.
// perm_out[k] = original index of the k-th reordered node.
// ---------------------------------------------------------------------------
void hqp_rcm_order(int n, const int *rowptr, const int *colind,
                   int *perm_out) {
    std::vector<int> degree(n);
    for (int i = 0; i < n; ++i) {
        int d = 0;
        for (int p = rowptr[i]; p < rowptr[i + 1]; ++p)
            if (colind[p] != i) ++d;
        degree[i] = d;
    }
    std::vector<char> visited(n, 0);
    std::vector<int> order;
    order.reserve(n);

    for (;;) {
        // pick unvisited node of minimum degree as the next component root
        int root = -1;
        for (int i = 0; i < n; ++i)
            if (!visited[i] && (root < 0 || degree[i] < degree[root]))
                root = i;
        if (root < 0) break;

        std::queue<int> q;
        q.push(root);
        visited[root] = 1;
        while (!q.empty()) {
            int u = q.front();
            q.pop();
            order.push_back(u);
            std::vector<int> nbrs;
            for (int p = rowptr[u]; p < rowptr[u + 1]; ++p) {
                int v = colind[p];
                if (v != u && !visited[v]) {
                    visited[v] = 1;
                    nbrs.push_back(v);
                }
            }
            std::sort(nbrs.begin(), nbrs.end(),
                      [&](int a, int b) { return degree[a] < degree[b]; });
            for (int v : nbrs) q.push(v);
        }
    }
    // reverse (the "R" in RCM)
    for (int k = 0; k < n; ++k) perm_out[k] = order[n - 1 - k];
}

// ---------------------------------------------------------------------------
// Sparse LDL' factorization handle
// ---------------------------------------------------------------------------
struct LdlHandle {
    int n;
    // input pattern (upper triangle, CSC == CSR of lower by symmetry)
    std::vector<int> Ap, Ai;        // column pointers / row indices, upper
    // elimination tree and L pattern
    std::vector<int> parent, Lp, Li;
    std::vector<double> Lx, D;
    // scratch
    std::vector<int> flag, pattern;
    std::vector<double> y;
};

// Create from the FULL symmetric CSR pattern; we keep the upper triangle
// in CSC form (column j holds rows i <= j), which for a symmetric pattern
// equals the CSR rows restricted to entries <= diagonal, transposed.
void *hqp_ldl_create(int n, const int *rowptr, const int *colind) {
    LdlHandle *h = new LdlHandle();
    h->n = n;
    // build upper-triangular CSC: column j: rows i < j with pattern(i, j),
    // plus the diagonal handled separately.
    std::vector<std::vector<int>> cols(n);
    for (int i = 0; i < n; ++i)
        for (int p = rowptr[i]; p < rowptr[i + 1]; ++p) {
            int j = colind[p];
            if (i < j) cols[j].push_back(i);
        }
    h->Ap.resize(n + 1);
    h->Ap[0] = 0;
    for (int j = 0; j < n; ++j) {
        std::sort(cols[j].begin(), cols[j].end());
        h->Ap[j + 1] = h->Ap[j] + (int)cols[j].size();
    }
    h->Ai.resize(h->Ap[n]);
    for (int j = 0; j < n; ++j)
        std::copy(cols[j].begin(), cols[j].end(),
                  h->Ai.begin() + h->Ap[j]);

    // symbolic: elimination tree + column counts of L (Davis ch. 4)
    h->parent.assign(n, -1);
    std::vector<int> ancestor(n, -1), Lnz(n, 0);
    h->flag.assign(n, -1);
    h->pattern.assign(n, 0);
    for (int k = 0; k < n; ++k) {
        h->flag[k] = k;
        for (int p = h->Ap[k]; p < h->Ap[k + 1]; ++p) {
            int i = h->Ai[p];
            while (h->flag[i] != k) {
                if (h->parent[i] == -1) h->parent[i] = k;
                ++Lnz[i];
                h->flag[i] = k;
                i = h->parent[i];
            }
        }
    }
    h->Lp.resize(n + 1);
    h->Lp[0] = 0;
    for (int k = 0; k < n; ++k) h->Lp[k + 1] = h->Lp[k] + Lnz[k];
    h->Li.resize(h->Lp[n]);
    h->Lx.resize(h->Lp[n]);
    h->D.resize(n);
    h->y.assign(n, 0.0);
    return (void *)h;
}

// Numeric factorization.  values: CSR values of the FULL matrix matching
// the (rowptr, colind) passed to create (we read upper incl. diagonal).
// rowptr/colind must be passed again (same arrays as create).
// reg: |D_k| is floored at reg (modified-Cholesky style safeguard,
// spMODCHOLfac role).  Returns 0 on success.
int hqp_ldl_factor(void *handle, const int *rowptr, const int *colind,
                   const double *values, double reg) {
    LdlHandle *h = (LdlHandle *)handle;
    int n = h->n;
    // gather upper-triangular values column-wise (incl. diagonal)
    std::vector<double> diag(n, 0.0);
    std::vector<double> Axv(h->Ap[n], 0.0);
    {
        std::vector<int> fill(n, 0);
        for (int i = 0; i < n; ++i)
            for (int p = rowptr[i]; p < rowptr[i + 1]; ++p) {
                int j = colind[p];
                if (i == j) diag[i] = values[p];
                else if (i < j) {
                    // locate position of row i in column j (sorted)
                    const int *beg = h->Ai.data() + h->Ap[j];
                    const int *end = h->Ai.data() + h->Ap[j + 1];
                    const int *it = std::lower_bound(beg, end, i);
                    Axv[(int)(it - h->Ai.data())] = values[p];
                }
            }
        (void)fill;
    }

    std::vector<int> Lnz(n, 0);
    for (int k = 0; k < n; ++k) {
        // pattern of row k of L = path union in etree
        int top = n;
        h->flag[k] = k;
        h->y[k] = 0.0;
        for (int p = h->Ap[k]; p < h->Ap[k + 1]; ++p) {
            int i = h->Ai[p];
            h->y[i] = Axv[p];
            int len = 0;
            std::vector<int> stack;
            while (h->flag[i] != k) {
                stack.push_back(i);
                h->flag[i] = k;
                i = h->parent[i];
                ++len;
            }
            while (len-- > 0) {
                h->pattern[--top] = stack[len];
            }
        }
        double d = diag[k];
        // sparse triangular solve along the pattern
        for (int s = top; s < n; ++s) {
            int i = h->pattern[s];
            double yi = h->y[i];
            h->y[i] = 0.0;
            int p2 = h->Lp[i] + Lnz[i];
            for (int p = h->Lp[i]; p < p2; ++p)
                h->y[h->Li[p]] -= h->Lx[p] * yi;
            double l_ki = yi / h->D[i];
            d -= l_ki * yi;
            h->Li[p2] = k;
            h->Lx[p2] = l_ki;
            ++Lnz[i];
        }
        // modified-Cholesky safeguard: keep |d| >= reg, preserve sign
        if (std::fabs(d) < reg) d = (d >= 0.0 ? reg : -reg);
        h->D[k] = d;
        if (d == 0.0) return 1;
    }
    return 0;
}

// Solve in place: x <- (LDL')^-1 x
void hqp_ldl_solve(void *handle, double *x) {
    LdlHandle *h = (LdlHandle *)handle;
    int n = h->n;
    // forward: L y = b  (L stored column-wise: column i lists rows k > i)
    for (int i = 0; i < n; ++i) {
        double xi = x[i];
        for (int p = h->Lp[i]; p < h->Lp[i + 1]; ++p)
            x[h->Li[p]] -= h->Lx[p] * xi;
    }
    // diagonal
    for (int i = 0; i < n; ++i) x[i] /= h->D[i];
    // backward: L' x = y
    for (int i = n - 1; i >= 0; --i) {
        double s = x[i];
        for (int p = h->Lp[i]; p < h->Lp[i + 1]; ++p)
            s -= h->Lx[p] * x[h->Li[p]];
        x[i] = s;
    }
}

int hqp_ldl_nnz(void *handle) {
    return ((LdlHandle *)handle)->Lp[((LdlHandle *)handle)->n];
}

void hqp_ldl_destroy(void *handle) { delete (LdlHandle *)handle; }

}  // extern "C"
