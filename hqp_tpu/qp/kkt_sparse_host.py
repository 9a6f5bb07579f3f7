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

from hqp_tpu.native import SparseLDL, rcm_order
from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules
from hqp_tpu.qp import kkt as K_
from hqp_tpu.qp.program import DenseQP


class SparseHostKKT:
    """Sparse LDL' backend over the native host kernels (DenseQP path)."""

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
