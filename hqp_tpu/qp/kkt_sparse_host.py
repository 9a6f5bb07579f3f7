"""Host-native sparse KKT backend for large general NLPs.

Role of the reference's default Hqp_IpRedSpBKP / Hqp_IpSpSC for
CUTE-scale sparse problems: the reduced saddle system

    [-H  A']          H = Q + C' W^-1 Z C
    [ A  dI]          d = dual regularization (quasidefinite)

is factored by the native sparse LDL' (RCM-ordered, modified-Cholesky
safeguarded; hqp_tpu.native / native/sparse_ldl.cpp) on the host CPU.
Use with ``Mehrotra(jit=False)`` -- the interior point runs eagerly and
calls into the C++ kernels directly, the TPU-structured problems stay on
the jitted device backends.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from hqp_tpu.native import SparseLDL, SparseBKP, rcm_order
from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules
from hqp_tpu.qp import kkt as K_
from hqp_tpu.qp.program import DenseQP


class SparseHostKKT:
    """Sparse LDL' backend over the native host kernels (DenseQP path)."""

    #: factorization lives outside XLA: Mehrotra drops to eager for us
    eager_only = True

    def __init__(self, dual_reg: float = 1e-10, reg: float = 1e-12,
                 refine_rounds: int = 5, refine_eps: float = 1e-10,
                 use_rcm: bool = True):
        self.dual_reg = dual_reg
        self.reg = reg
        self.refine_rounds = refine_rounds
        self.refine_eps = refine_eps
        self.use_rcm = use_rcm
        self._perm = None

    def factor(self, qp: DenseQP, z, w, mask):
        sig = np.asarray(K_.barrier_ratios(z, w, mask).g)
        Q = np.asarray(qp.Q)
        C = np.asarray(qp.C)
        A = np.asarray(qp.A) * np.asarray(qp.eq_mask_)[:, None]
        H = Q + (C.T * sig) @ C
        n, me = H.shape[0], A.shape[0]
        Ksys = sp.bmat(
            [[sp.csr_matrix(-H), sp.csr_matrix(A).T],
             [sp.csr_matrix(A),
              self.dual_reg * sp.eye(me) if me else None]],
            format="csr") if me else sp.csr_matrix(-H)
        Ksys = sp.csr_matrix(Ksys)
        Ksys.sort_indices()

        if self.use_rcm and self._perm is None:
            self._perm = rcm_order(Ksys.shape[0], Ksys.indptr,
                                   Ksys.indices)
        if self.use_rcm:
            p = self._perm
            Ksys = Ksys[p][:, p].tocsr()
            Ksys.sort_indices()

        f = SparseLDL(Ksys.shape[0], Ksys.indptr, Ksys.indices)
        f.factor(Ksys.data, reg=self.reg)
        return (f, n, me)

    def solve(self, fac, qp: DenseQP, z, w, mask, r1, r2, r3, r4):
        f, n, me = fac

        def base(a1, a2, a3, a4):
            g = np.asarray(K_.reduce_r1(qp, z, w, mask, a1, a3, a4))
            rhs = np.concatenate([g, np.asarray(a2)]) if me \
                else g
            if self.use_rcm:
                rhs = rhs[self._perm]
            sol = f.solve(rhs)
            if self.use_rcm:
                out = np.empty_like(sol)
                out[self._perm] = sol
                sol = out
            dx = jnp.asarray(sol[:n])
            dy = jnp.asarray(sol[n:])
            dz, dw = K_.recover_zw(qp, z, w, mask, dx, a3, a4)
            return dx, dy, dz, dw

        # eager iterative refinement (host path; K_.refine traces)
        sol = base(r1, r2, r3, r4)
        dx, dy, dz, dw = sol
        *_, res = K_.kkt_residual(qp, z, w, mask, r1, r2, r3, r4,
                                  dx, dy, dz, dw)
        res = float(res)
        for _ in range(self.refine_rounds):
            if res <= self.refine_eps:
                break
            e1, e2, e3, e4, _ = K_.kkt_residual(
                qp, z, w, mask, r1, r2, r3, r4, dx, dy, dz, dw)
            cx, cy, cz, cw = base(e1, e2, e3, e4)
            nx_, ny_ = dx + cx, dy + cy
            nz_, nw_ = mk.add(dz, cz), mk.add(dw, cw)
            *_, nres = K_.kkt_residual(qp, z, w, mask, r1, r2, r3, r4,
                                       nx_, ny_, nz_, nw_)
            if float(nres) >= res:
                break
            dx, dy, dz, dw, res = nx_, ny_, nz_, nw_, float(nres)
        return dx, dy, dz, dw


modules.register("qp_mat_solver", "RedSpBKP_host")(SparseHostKKT)


class SparseCallbackKKT:
    """JITTABLE host-sparse backend: the reference's factor-per-iteration /
    structure-per-problem discipline (hqp/Hqp_IpRedSpBKP.C:281 ->
    spBKP.C:369) behind ``jax.pure_callback``.

    The eager ``SparseHostKKT`` + ``Mehrotra(jit=False)`` combination paid
    ~17 s on the 2000-variable lqblend bench -- almost entirely JAX eager
    dispatch and hundreds of per-primitive mini-compiles, not linear
    algebra (measured: 292 XLA compile/loads ~ 17 s, LDL time invisible).
    Here the whole Mehrotra iteration compiles ONCE (``jit=True``, on-device
    ``lax.while_loop``); each iteration crosses to the host exactly twice:

    * ``factor``: one callback carrying (Q, C, A, sig); the host assembles
      the quasidefinite saddle in scipy CSR, projects it onto the CACHED
      symbolic pattern (union pattern + RCM permutation + elimination tree,
      computed once per problem structure), runs the native LDL' numeric
      factorization into reused workspaces, and returns a token.
    * ``solve``: one callback per rhs (g, r2) -> saddle solve; the token's
      data-dependence orders it after its factorization.

    Refinement runs unrolled in the traced program (residuals in JAX, one
    solve callback per round).
    """

    #: refine runs UNROLLED (callbacks inside a While body are fragile on
    #: XLA:CPU), so every round's solve callback executes even when the
    #: where-gating discards it -- with the f64 LDL one round is both
    #: sufficient (base residual ~1e-12 * cond) and half the per-solve
    #: callback traffic of the former 3
    def __init__(self, dual_reg: float = 1e-10, reg: float = 1e-12,
                 refine_rounds: int = 1, use_rcm: bool = True):
        self.dual_reg = dual_reg
        self.reg = reg
        self.refine_rounds = refine_rounds
        self.use_rcm = use_rcm
        self._sym = {}       # (n, me) -> symbolic record
        self._token = 0
        self._live = {}      # token -> SparseLDL (keep last 2)
        self._prep = None    # host-pinned (Qs, Cs, As) for this solve

    # value-based identity (jit static-arg contract; see PartitionedKKT)
    def _config(self):
        return (type(self), self.dual_reg, self.reg, self.refine_rounds,
                self.use_rcm, id(self))

    def __hash__(self):
        # id() participates: the host-side factor cache is per-instance
        return hash(self._config())

    def __eq__(self, other):
        return self is other

    # -- host side -----------------------------------------------------------

    def _symbolic(self, key, pat):
        """Symbolic record for a saddle PATTERN: explicit-zero pattern
        holder, RCM permutation, data permutation map and the native LDL
        handle (elimination-tree analysis) -- recomputed only when the
        pattern changes (Hqp_IpRedSpBKP.C:281: structure once per
        problem, factor once per iteration)."""
        pat = sp.csr_matrix(pat)
        pat.sort_indices()
        N = pat.shape[0]
        # global row-major entry keys (sorted ascending for a canonical
        # CSR): numeric data is PROJECTED onto the pattern by
        # searchsorted -- scipy csr addition prunes explicit zeros, so a
        # sum-based projection silently drops pattern slots
        rows = np.repeat(np.arange(N, dtype=np.int64),
                         np.diff(pat.indptr))
        pat_keys = rows * np.int64(N) + pat.indices.astype(np.int64)

        if self.use_rcm:
            perm = rcm_order(N, pat.indptr, pat.indices)
        else:
            perm = np.arange(N)
        T = pat.copy()
        # 1-based positions: value 0 must not collide with a pruned slot
        T.data = np.arange(1, pat.nnz + 1, dtype=np.float64)
        Tp = T[perm][:, perm].tocsr()
        Tp.sort_indices()
        data_map = Tp.data.astype(np.int64) - 1
        ldl = SparseLDL(Tp.shape[0], Tp.indptr, Tp.indices)
        rec = dict(pat_keys=pat_keys, pat=pat, perm=np.asarray(perm),
                   data_map=data_map, ldl=ldl, nnz=pat.nnz)
        self._sym[key] = rec
        return rec

    def prepare(self, qp):
        """Pin the loop-invariant problem data host-side, once per IP
        solve (called by Mehrotra.solve with the concrete qp): the
        per-iteration factor callback then ships only the barrier
        diagonal sig (O(mi)) instead of Q/C/A (O(n^2)) -- the
        structure-once-per-problem discipline extended to the data
        transfer (Hqp_IpRedSpBKP.C:281 keeps its sparse views alive
        across iterations the same way)."""
        A = np.asarray(qp.A) * np.asarray(qp.eq_mask_)[:, None]
        self._prep = dict(
            Qs=sp.csr_matrix(np.asarray(qp.Q)),
            Cs=sp.csr_matrix(np.asarray(qp.C)),
            As=sp.csr_matrix(A),
            n=qp.n, me=qp.me)

    def _host_factor_sig(self, sig):
        """Factor callback: barrier diagonal only (prepare() pinned the
        rest)."""
        p = self._prep
        return self._host_factor_from(p["Qs"], p["Cs"], p["As"],
                                      p["n"], p["me"], sig)

    def _host_factor(self, Q, C, A, sig):
        n, me = Q.shape[0], A.shape[0]
        return self._host_factor_from(
            sp.csr_matrix(Q), sp.csr_matrix(C), sp.csr_matrix(A),
            n, me, sig)

    def _host_factor_from(self, Qs, Cs, As, n, me, sig):
        key = (n, me)
        H = (Qs + Cs.T @ sp.diags([np.asarray(sig).ravel()], [0],
                                  shape=(Cs.shape[0], Cs.shape[0])) @ Cs
             ).tocsr()
        if me:
            Knum = sp.bmat([[-H, As.T], [As, self.dual_reg * sp.eye(me)]],
                           format="csr")
        else:
            Knum = sp.csr_matrix(-H)
        Knum = sp.csr_matrix(Knum)
        Knum.sort_indices()
        N = Knum.shape[0]
        krows = np.repeat(np.arange(N, dtype=np.int64),
                          np.diff(Knum.indptr))
        kkeys = krows * np.int64(N) + Knum.indices.astype(np.int64)

        rec = self._sym.get(key)
        if rec is not None:
            pos = np.searchsorted(rec["pat_keys"], kkeys)
            grown = (pos >= rec["nnz"]) if rec["nnz"] else \
                np.ones_like(pos, bool)
            ok = not bool(np.any(grown)) and \
                bool(np.all(rec["pat_keys"][np.minimum(pos, rec["nnz"] - 1)]
                            == kkeys))
            if not ok:
                # the pattern GREW (e.g. an exact-Hessian strategy filled
                # new off-diagonals at a later SQP iterate): rebuild the
                # symbolic record from the union pattern
                rec = None
        if rec is None:
            patn = Knum.copy()
            patn.data = np.ones_like(patn.data)
            old = self._sym.get(key)
            if old is not None:
                pat_old = old["pat"].copy()
                pat_old.data = np.ones_like(pat_old.data)
                patn = (patn + pat_old).tocsr()
            rec = self._symbolic(key, patn)
            pos = np.searchsorted(rec["pat_keys"], kkeys)
        data_full = np.zeros(rec["nnz"])
        data_full[pos] = Knum.data
        data = data_full[rec["data_map"]]
        rec["ldl"].factor(data, reg=self.reg)
        self._token += 1
        self._live[self._token] = rec
        # keep only the last two factorizations alive
        for k in [k for k in self._live if k < self._token - 1]:
            del self._live[k]
        return np.int64(self._token)

    def _host_solve(self, token, rhs):
        rec = self._live.get(int(token))
        if rec is None:  # stale token: re-entrant misuse
            raise RuntimeError(
                f"SparseCallbackKKT: no live factorization for token "
                f"{int(token)} (live: {sorted(self._live)})")
        p = rec["perm"]
        sol = rec["ldl"].solve(np.asarray(rhs)[p])
        out = np.empty_like(sol)
        out[p] = sol
        return out

    # -- traced side ----------------------------------------------------------

    def factor(self, qp: DenseQP, z, w, mask):
        import jax
        sig = K_.barrier_ratios(z, w, mask).g
        if self._prep is not None:
            # prepare() pinned Q/C/A host-side: ship only the barrier
            # diagonal.  NOTE: participates in the value-based hash via
            # id(self) -- a prepared and an unprepared instance never
            # share a trace, so the branch is trace-consistent.
            token = jax.pure_callback(
                self._host_factor_sig,
                jax.ShapeDtypeStruct((), jnp.int64), sig)
            return token
        A = qp.A * qp.eq_mask_[:, None].astype(qp.A.dtype)
        token = jax.pure_callback(
            self._host_factor,
            jax.ShapeDtypeStruct((), jnp.int64),
            qp.Q, qp.C, A, sig)
        return token

    def solve(self, fac, qp: DenseQP, z, w, mask, r1, r2, r3, r4):
        import jax
        n, me = qp.n, qp.me

        def base(a1, a2, a3, a4):
            g = K_.reduce_r1(qp, z, w, mask, a1, a3, a4)
            rhs = jnp.concatenate([g, a2]) if me else g
            sol = jax.pure_callback(
                self._host_solve,
                jax.ShapeDtypeStruct((n + me,), jnp.float64),
                fac, rhs)
            dx, dy = sol[:n], sol[n:]
            dz, dw = K_.recover_zw(qp, z, w, mask, dx, a3, a4)
            return dx, dy, dz, dw

        sol = base(r1, r2, r3, r4)
        if self.refine_rounds > 0:
            sol = K_.refine(base, qp, z, w, mask, r1, r2, r3, r4, sol,
                            eps=1e-10, max_rounds=self.refine_rounds,
                            unroll=True, relative=False)
        return sol


modules.register("qp_mat_solver", "RedSpBKP")(SparseCallbackKKT)


class FullSparseBKPKKT:
    """Full 3x3 KKT backend over the native sparse Bunch-Kaufman kernel --
    the role of the reference's Hqp_IpSpBKP (hqp/Hqp_IpSpBKP.C): no
    reduction, no quasidefiniteness assumption.  The symmetric indefinite
    saddle system (our sign convention, qp/kkt.py kkt_residual)

        [-Q   A'  C' ] [dx]   [ r1         ]
        [ A   0   0  ] [dy] = [ r2         ]
        [ C   0  W/Z ] [dz]   [ r3 + r4/z  ]      dw = C dx - r3

    is assembled in scipy CSR (Hqp_IpSpBKP::update, Hqp_IpSpBKP.C:117-137),
    symmetrically scaled on the slack rows by min(1, sqrt(z/w))
    (Hqp_IpSpBKP::factor, Hqp_IpSpBKP.C:158-176) and factored each
    iteration by the native BKP with dynamic 1x1/2x2 pivoting
    (native/sparse_ldl.cpp hqp_bkp_factor, spBKP.C:369 role).  Dead
    (masked) equality/inequality rows become unit-diagonal pins.

    Use with ``Mehrotra(jit=False)`` like :class:`SparseHostKKT`.  This is
    the robustness-class backend: zero/small slack diagonals and
    rank-deficient moments that defeat the pivot-free LDL' are handled by
    the 2x2 pivots instead of regularization."""

    #: factorization lives outside XLA: Mehrotra drops to eager for us
    eager_only = True

    def __init__(self, tol: float = 1.0, reg: float = 0.0,
                 refine_rounds: int = 3, refine_eps: float = 1e-10,
                 use_rcm: bool = True):
        self.tol = tol
        self.reg = reg
        self.refine_rounds = refine_rounds
        self.refine_eps = refine_eps
        self.use_rcm = use_rcm
        self._perm = None

    def factor(self, qp: DenseQP, z, w, mask):
        zg = np.asarray(z.g, dtype=np.float64)
        wg = np.asarray(w.g, dtype=np.float64)
        mg = np.asarray(mask.g)
        n, me, mi = qp.n, qp.me, qp.mi
        Q = sp.csr_matrix(np.asarray(qp.Q))
        em = np.asarray(qp.eq_mask_)
        A = sp.csr_matrix(np.asarray(qp.A) * em[:, None])
        C = sp.csr_matrix(np.asarray(qp.C) * mg[:, None])
        # slack diagonal w/z on live rows, 1.0 pins on dead rows
        # (Hqp_IpSpBKP.C:131 inserts the raw 1.0 diagonal the same way)
        wz = np.where(mg, wg / np.where(mg, zg, 1.0), 1.0)
        scale = np.where(mg, np.minimum(1.0, np.sqrt(1.0 / wz)), 1.0)
        Wz = sp.diags(wz * scale * scale)
        blocks = [[-Q, A.T if me else None,
                   (C.T @ sp.diags(scale)) if mi else None]]
        if me:
            # dead equality rows: unit diagonal pin
            pin = sp.diags(np.where(em, 0.0, 1.0))
            blocks.append([A, pin, None])
        if mi:
            blocks.append([sp.diags(scale) @ C, None, Wz])
        J = sp.bmat(blocks, format="csr")
        J.sort_indices()

        if self.use_rcm:
            if self._perm is None or len(self._perm) != J.shape[0]:
                self._perm = rcm_order(J.shape[0], J.indptr, J.indices)
            p = self._perm
            J = J[p][:, p].tocsr()
            J.sort_indices()
        f = SparseBKP(J.shape[0], J.indptr, J.indices, J.data,
                      tol=self.tol, reg=self.reg)
        return (f, scale, n, me, mi)

    def solve(self, fac, qp: DenseQP, z, w, mask, r1, r2, r3, r4):
        import jax.tree_util as jtu
        f, scale, n, me, mi = fac
        zg = np.asarray(z.g, dtype=np.float64)
        mg = np.asarray(mask.g)
        treedef = jtu.tree_structure(z)

        def base(a1, a2, a3, a4):
            a3g = np.asarray(jtu.tree_leaves(a3)[0]) if mi else \
                np.zeros(0)
            a4g = np.asarray(jtu.tree_leaves(a4)[0]) if mi else \
                np.zeros(0)
            parts = [np.asarray(a1)]
            if me:
                parts.append(np.where(np.asarray(qp.eq_mask_),
                                      np.asarray(a2), 0.0))
            if mi:
                r3eff = np.where(mg, a3g + a4g / np.where(mg, zg, 1.0),
                                 0.0)
                parts.append(r3eff * scale)
            rhs = np.concatenate(parts)
            if self.use_rcm:
                rhs = rhs[self._perm]
            sol = f.solve(rhs)
            if self.use_rcm:
                out = np.empty_like(sol)
                out[self._perm] = sol
                sol = out
            dx = jnp.asarray(sol[:n])
            dy = jnp.asarray(sol[n:n + me])
            dzg = jnp.asarray(np.where(mg, sol[n + me:] * scale, 0.0)) \
                if mi else jnp.zeros(0)
            # dw from the path row: C dx - dw = r3  (Hqp_IpSpBKP.C:216)
            dwg = jnp.asarray(
                np.where(mg, np.asarray(qp.matvec_ineq(dx).g) - a3g,
                         0.0)) if mi else jnp.zeros(0)
            dz = jtu.tree_unflatten(treedef, [dzg])
            dw = jtu.tree_unflatten(treedef, [dwg])
            return dx, dy, dz, dw

        sol = base(r1, r2, r3, r4)
        dx, dy, dz, dw = sol
        *_, res = K_.kkt_residual(qp, z, w, mask, r1, r2, r3, r4,
                                  dx, dy, dz, dw)
        res = float(res)
        for _ in range(self.refine_rounds):
            if res <= self.refine_eps:
                break
            e1, e2, e3, e4, _ = K_.kkt_residual(
                qp, z, w, mask, r1, r2, r3, r4, dx, dy, dz, dw)
            cx, cy, cz, cw = base(e1, e2, e3, e4)
            nx_, ny_ = dx + cx, dy + cy
            nz_, nw_ = mk.add(dz, cz), mk.add(dw, cw)
            *_, nres = K_.kkt_residual(qp, z, w, mask, r1, r2, r3, r4,
                                       nx_, ny_, nz_, nw_)
            if float(nres) >= res:
                break
            dx, dy, dz, dw, res = nx_, ny_, nz_, nw_, float(nres)
        return dx, dy, dz, dw


modules.register("qp_mat_solver", "SpBKP")(FullSparseBKPKKT)
