"""Branch-and-bound mixed-integer QP solver.

Role of the reference's MIP layer (hqp/Hqp_MipSolver.{h,C} module slot +
hqp/Hqp_LPSolve.{h,C}, the lp_solve 5.5 branch&bound driven over the
final LP relaxation after SQP, hqp/hqp_solve.tcl:258-262).  Here the
relaxations keep the QUADRATIC objective (strictly tighter bounds than
the reference's LP relaxation) and are solved by the framework's own
Mehrotra interior-point solver.

TPU-native design point: branching never changes array shapes.  The
integer bounds live in two dedicated inequality-row blocks appended to
the QP (x_i - lb_i >= 0 and ub_i - x_i >= 0 for every integer variable),
and a node only rewrites their offsets ``d`` and row masks -- so ONE
jit-compiled interior-point solve is reused for every node of the tree.
Best-first search with incumbent pruning on the host drives the
(inherently sequential, data-dependent) tree.
"""

from __future__ import annotations

import dataclasses
import heapq
import itertools

import jax.numpy as jnp
import numpy as np

from hqp_tpu.qp.program import DenseQP
from hqp_tpu.qp.mehrotra import Mehrotra, RESULT_STRINGS, OPTIMAL, \
    SUBOPTIMAL
from hqp_tpu.utils.registry import modules


@modules.register("mip_solver", "LPSolve")
@modules.register("mip_solver", "BranchBound")
class BranchBound:
    """Best-first branch & bound over interior-point QP relaxations."""

    def __init__(self, qp_solver=None, eps_int: float = 1e-5,
                 max_nodes: int = 1000, gap_tol: float = 1e-9,
                 logging: bool = False):
        if qp_solver is None:
            from hqp_tpu.qp.kkt import DenseKKT
            qp_solver = Mehrotra(backend=DenseKKT())
        self.qp_solver = qp_solver
        self.eps_int = eps_int
        self.max_nodes = max_nodes
        self.gap_tol = gap_tol
        self.logging = logging
        #: statistics of the last solve
        self.nodes = 0
        self.status = "iterating"

    # -- QP augmentation -------------------------------------------------------

    @staticmethod
    def _augment(qp: DenseQP, int_idx):
        """Append the 2*n_int bound rows whose offsets branching rewrites."""
        n = qp.n
        ni = len(int_idx)
        E = np.zeros((ni, n))
        E[np.arange(ni), int_idx] = 1.0
        C = jnp.concatenate([qp.C, jnp.asarray(E), jnp.asarray(-E)], axis=0)
        d = jnp.concatenate([qp.d, jnp.zeros(ni), jnp.zeros(ni)])
        mask = jnp.concatenate([qp.ineq_mask_,
                                jnp.zeros(2 * ni, dtype=bool)])
        return dataclasses.replace(qp, C=C, d=d, ineq_mask_=mask)

    @staticmethod
    def _node_qp(aug: DenseQP, mi0, lb, ub):
        """Write node bounds into the dedicated rows: x_i - lb >= 0,
        ub - x_i >= 0; rows with infinite bounds stay masked out."""
        ni = len(lb)
        lb = np.asarray(lb)
        ub = np.asarray(ub)
        d = np.asarray(aug.d).copy()
        m = np.asarray(aug.ineq_mask_).copy()
        d[mi0: mi0 + ni] = np.where(np.isfinite(lb), -lb, 0.0)
        d[mi0 + ni: mi0 + 2 * ni] = np.where(np.isfinite(ub), ub, 0.0)
        m[mi0: mi0 + ni] = np.isfinite(lb)
        m[mi0 + ni: mi0 + 2 * ni] = np.isfinite(ub)
        return dataclasses.replace(aug, d=jnp.asarray(d),
                                   ineq_mask_=jnp.asarray(m))

    # -- driver -----------------------------------------------------------------

    def solve(self, qp: DenseQP, int_mask):
        """Minimize the mixed-integer QP.  int_mask: [n] bool of integer
        variables (the reference's Hqp_Program x_int marks,
        hqp/Hqp_Program.h:47).  Returns (x, f, status_string)."""
        int_idx = np.flatnonzero(np.asarray(int_mask))
        if int_idx.size == 0:
            st = self._relax(qp)
            f = self._obj(qp, st.x)
            self.status = RESULT_STRINGS[int(st.result)]
            return st.x, f, self.status

        aug = self._augment(qp, int_idx)
        mi0 = qp.mi
        ni = int_idx.size

        lb0 = np.full(ni, -np.inf)
        ub0 = np.full(ni, np.inf)

        best_x, best_f = None, np.inf
        self.nodes = 0
        counter = itertools.count()
        heap = [(-np.inf, next(counter), lb0, ub0)]

        while heap and self.nodes < self.max_nodes:
            bound, _, lb, ub = heapq.heappop(heap)
            if bound >= best_f - self.gap_tol:
                continue  # pruned by incumbent
            self.nodes += 1
            nqp = self._node_qp(aug, mi0, lb, ub)
            st = self._relax(nqp)
            if int(st.result) not in (OPTIMAL, SUBOPTIMAL):
                continue  # infeasible / degenerate node
            if not self._feasible(nqp, st.x):
                # the IP's suboptimal fallback can return an infeasible
                # point for an infeasible node (Hqp_Suboptimal role,
                # hqp/Hqp_SqpSolver.C:343); such a node is fathomed
                continue
            f = float(self._obj(nqp, st.x))
            if f >= best_f - self.gap_tol:
                continue
            xi = np.asarray(st.x)[int_idx]
            frac = np.abs(xi - np.round(xi))
            j = int(np.argmax(frac))
            if frac[j] <= self.eps_int:
                # integral: new incumbent (round exactly)
                x = np.asarray(st.x).copy()
                x[int_idx] = np.round(xi)
                best_x, best_f = x, f
                if self.logging:
                    print(f"mip: node {self.nodes} incumbent f={f:.6g}")
                continue
            # branch on the most fractional variable
            lo, hi = lb.copy(), ub.copy()
            hi[j] = np.floor(xi[j])
            heapq.heappush(heap, (f, next(counter), lb.copy(), hi))
            lo[j] = np.ceil(xi[j])
            heapq.heappush(heap, (f, next(counter), lo, ub.copy()))

        self.status = "optimal" if best_x is not None else "infeasible"
        if heap and self.nodes >= self.max_nodes:
            self.status = "iterating"  # node limit hit (reference: iters)
        return (jnp.asarray(best_x) if best_x is not None else None,
                best_f, self.status)

    def _relax(self, qp):
        state = self.qp_solver.init_state(qp)
        return self.qp_solver.solve(qp, state)

    @staticmethod
    def _feasible(qp, x, tol=1e-6):
        x = np.asarray(x)
        if qp.me:
            eq = np.asarray(qp.A @ x + qp.b)[np.asarray(qp.eq_mask_)]
            if eq.size and np.max(np.abs(eq)) > tol:
                return False
        if qp.mi:
            g = np.asarray(qp.C @ x + qp.d)[np.asarray(qp.ineq_mask_)]
            if g.size and np.min(g) < -tol:
                return False
        return True

    @staticmethod
    def _obj(qp, x):
        return 0.5 * x @ (qp.Q @ x) + qp.c @ x
