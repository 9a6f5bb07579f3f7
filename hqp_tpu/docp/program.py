"""Stage-wise DOCP program abstraction.

The TPU-native analog of ``Hqp_Docp`` (hqp/Hqp_Docp.{h,C}): a user defines a
discrete-time optimal control problem by per-stage functions

    f(k, x_k, u_k)  -> x_{k+1}        (state transition, k = 0..K-1)
    f0(k, x_k, u_k) -> scalar         (stage cost, summed over k = 0..K)
    c(k, x_k, u_k)  -> R^mc           (general constraints)

plus bound arrays.  Where the reference hand-codes derivatives or tapes with
ADOL-C (hqp/Hqp_DocpAdol.C, omu/Omu_Program.C:388-519) and evaluates stages
under OpenMP (hqp/Hqp_Docp.C:837,955), here derivatives come from
``jax.jacobian``/``jax.grad``/``jax.hessian`` and all stages evaluate batched
under ``vmap`` -- the stage axis is the data-parallel axis on device.

The stage functions must be written with ``jnp`` ops and be vectorizable
over the traced stage index ``k`` (use ``jnp.where(k < K, ..., ...)`` for
stage-dependent behaviour).  Variable bounds (including fixed initial/final
states, the reference's min == max convention, e.g. hqp_docp/Prg_DID.C:51-63)
are box constraints handled by the interior point's barrier.

Assembled QP form: see :class:`hqp_tpu.qp.program.StageQP`; the per-stage
variable is v_k = (x_k, u_k) with u padded (fixed to 0) at stage K.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hqp_tpu.qp.program import StageQP
from hqp_tpu.utils.registry import modules


class Docp:
    """Base class for stage-structured programs.  Subclass and override
    the dims, bounds and stage functions."""

    K: int = 0
    nx: int = 0
    nu: int = 0
    mc: int = 0

    name = "Docp"

    # ---- user interface (override) ----------------------------------------

    def setup_vars(self):
        """Return a dict with optional keys:
        x_init [K1, nx], u_init [K, nu],
        x_min/x_max [K1, nx], u_min/u_max [K, nu],
        c_min/c_max [K1, mc].
        Missing bounds default to +-inf, missing inits to zero."""
        return {}

    def _setup_vars_processed(self):
        """Hook between the user's setup_vars and the assembly; the Omu
        layer widens per-sample-period constraint bounds here."""
        return self.setup_vars()

    # ---- jit identity ------------------------------------------------------

    def _static_config(self):
        """Override to return a hashable constructor-config tuple.

        Program instances ride as STATIC arguments of the jitted
        evaluation entry points; with only identity-based hashing, every
        fresh instance of the same problem re-traces and re-lowers them
        (measured ~1 s of the 2.7 s warm did1000 solve).  A program whose
        trace depends only on constructor configuration should return
        that configuration here so identically-configured instances share
        the in-memory trace cache (the same contract as the solvers'
        value-based identity, hqp_tpu.qp.mehrotra.Mehrotra._config).
        Return None (default) to keep identity semantics."""
        return None

    #: bumped (to a globally unique value) by the shell on any in-place
    #: knob write: a mutated instance must stop matching the trace-cache
    #: entries of its constructor config (attributes mutated after
    #: construction are NOT covered by _static_config; advisor r4)
    _trace_nonce = 0

    def __hash__(self):
        c = self._static_config()
        return object.__hash__(self) if c is None else \
            hash((type(self), c, self._trace_nonce))

    def __eq__(self, other):
        c = self._static_config()
        if c is None:
            return self is other
        return type(other) is type(self) and \
            other._static_config() == c and \
            other._trace_nonce == self._trace_nonce

    def f(self, k, x, u):
        raise NotImplementedError

    def f0(self, k, x, u):
        return jnp.asarray(0.0)

    def c(self, k, x, u):
        return jnp.zeros((0,))

    # ---- assembled views ---------------------------------------------------

    @property
    def nv(self):
        return self.nx + self.nu

    def setup(self):
        """Build initial iterate, bounds and the QP skeleton (static data).

        Analog of Hqp_Docp::setup + setup_qp (hqp/Hqp_Docp.C:400-758), but
        the block structure is explicit instead of assembled into sparse
        matrices.
        """
        K, K1, nx, nu, nv, mc = (self.K, self.K + 1, self.nx, self.nu,
                                 self.nv, self.mc)
        v = self._setup_vars_processed()
        inf = np.inf

        # All of setup runs in HOST numpy: on the tunneled TPU backend each
        # eager device op pays an XLA compile + round trip (measured ~0.3-5 s
        # per distinct op), which turned this pure bookkeeping step into
        # minutes.  Only the final arrays are placed on device.
        def get(key, shape, default):
            a = v.get(key)
            if a is None:
                return np.full(shape, default, np.float64)
            return np.asarray(a, np.float64).reshape(shape)

        x_init = get("x_init", (K1, nx), 0.0)
        u_init = get("u_init", (K, nu), 0.0)
        x_min = get("x_min", (K1, nx), -inf)
        x_max = get("x_max", (K1, nx), inf)
        u_min = get("u_min", (K, nu), -inf)
        u_max = get("u_max", (K, nu), inf)
        c_min = get("c_min", (K1, mc), -inf)
        c_max = get("c_max", (K1, mc), inf)

        # Fixed variables (min == max; statically known values since bounds
        # are setup-time arrays) -- the reference's equality bucket
        # (hqp/Hqp_Docp.C:372 parse_constr _xu_eq):
        #   * stage-0 states and fixed CONTROLS are PINNED: structurally
        #     eliminated (var_mask False), values held in the iterate, the
        #     dynamics residuals carry them.  Exact, and keeps the common
        #     MPC shape (fixed x0) out of the equality machinery entirely.
        #   * fixed STATES at stages k >= 1 (e.g. a fixed terminal state)
        #     stay as QP variables with lb == ub: StageQP's fixed_mask()
        #     turns them into exact 'fix' equality rows handled by every
        #     KKT backend (penalty + iterative refinement), including the
        #     sequential Riccati recursion which cannot represent absent
        #     states mid-horizon (hqp_tpu/qp/kkt.py RiccatiKKT docstring).
        # Fixed GENERAL constraints (c_min == c_max) become exact per-stage
        # equality rows E_k v_k + e_k = 0, linearized each make_qp -- the
        # role of GE_QP stage-constraint elimination
        # (hqp/Hqp_IpLQDOCP.C:1377; meschach/addon_hqp.h:207-209).
        fixed_c = np.isfinite(c_min) & (c_min == c_max)
        self._has_eqg = bool(fixed_c.any())
        self._eqg_mask = jnp.asarray(fixed_c)
        self._c_eq_target = jnp.asarray(np.where(fixed_c, c_min, 0.0))
        c_min = np.where(fixed_c, -inf, c_min)
        c_max = np.where(fixed_c, inf, c_max)

        fx = np.isfinite(x_min) & (x_min == x_max)
        fu = np.isfinite(u_min) & (u_min == u_max)
        fx_pin = np.zeros_like(fx)
        fx_pin[0] = fx[0]            # structural pins: stage-0 states only

        # per-stage variable v_k = (x_k, u_k); u padding at stage K and
        # pinned variables are structurally absent
        var_mask = np.concatenate(
            [~fx_pin, np.concatenate([~fu, np.zeros((1, nu), bool)])],
            axis=1)
        pin_mask = np.concatenate(
            [fx_pin, np.concatenate([fu, np.zeros((1, nu), bool)])], axis=1)
        lb = np.concatenate(
            [np.asarray(x_min), np.concatenate([np.asarray(u_min),
                                                np.full((1, nu), -inf)])],
            axis=1)
        ub = np.concatenate(
            [np.asarray(x_max), np.concatenate([np.asarray(u_max),
                                                np.full((1, nu), inf)])],
            axis=1)
        # absent variables carry no bounds
        lb = np.where(var_mask, lb, -inf)
        ub = np.where(var_mask, ub, inf)
        pin_vals = np.where(pin_mask, np.nan_to_num(
            np.where(pin_mask, np.concatenate(
                [np.asarray(x_min), np.concatenate(
                    [np.asarray(u_min), np.zeros((1, nu))])], axis=1), 0.0)),
            0.0)

        x0 = np.concatenate(
            [np.asarray(x_init), np.concatenate([np.asarray(u_init),
                                                 np.zeros((1, nu))])],
            axis=1)
        # clip into bounds, then pin fixed values exactly
        x0 = np.clip(x0, np.where(np.isfinite(lb), lb, -inf),
                     np.where(np.isfinite(ub), ub, inf))
        x0 = np.where(pin_mask, pin_vals, x0)

        con_mask = np.isfinite(c_min) | np.isfinite(c_max)

        # Constraint arrays are padded to at least one (masked-off) row:
        # zero-size buffers are a liability on both XLA backends (the CPU
        # runtime corrupts the heap on 0-size outputs inside
        # while_loop+shard_map bodies; TPU cannot tile them) and a
        # con_mask=False row is a no-op through the mask machinery.
        if mc == 0:
            c_min = np.full((K1, 1), -inf)
            c_max = np.full((K1, 1), inf)
            con_mask = np.zeros((K1, 1), bool)

        self._pin_mask = jnp.asarray(pin_mask)
        self._pin_vals = jnp.asarray(pin_vals)
        self._bounds = (jnp.asarray(lb), jnp.asarray(ub),
                        jnp.asarray(c_min), jnp.asarray(c_max),
                        jnp.asarray(var_mask), jnp.asarray(con_mask))
        return jnp.asarray(x0)

    # vectorized stage evaluations ------------------------------------------

    def stage_all(self, k, x, u):
        """Combined per-stage evaluation (f, f0, c) for stages k < K.

        Override when dynamics/cost/constraints share expensive work (the
        Omuses layer integrates once and derives all three -- the role of
        Hqp_Omuses::update_stage, omu/Hqp_Omuses.C:566-780).  The default
        composes the separate f/f0/c callbacks.
        """
        return (self.f(k, x, u), self.f0(k, x, u),
                jnp.atleast_1d(self.c(k, x, u)))

    def stage_final(self, x, u):
        """(f0, c) of the terminal stage (u is the zero padding)."""
        K = jnp.asarray(self.K)
        return (self.f0(K, x, u), jnp.atleast_1d(self.c(K, x, u)))

    def _split_fns(self):
        nx = self.nx

        def all_v(k, v):
            f, f0, c = self.stage_all(k, v[:nx], v[nx:])
            return f, f0, c

        def fin_v(v):
            f0, c = self.stage_final(v[:nx], v[nx:])
            return f0, c

        return all_v, fin_v

    @partial(jax.jit, static_argnums=0)
    def eval_vals(self, v):
        """Values only: objective, dynamics residual, constraint values.
        Analog of Hqp_Docp::update_fbd (hqp/Hqp_Docp.C:831-892)."""
        K, nx = self.K, self.nx
        all_v, fin_v = self._split_fns()
        fvals, f0s, cvals = jax.vmap(all_v)(jnp.arange(K), v[:-1])
        f0K, cK = fin_v(v[-1])
        b = fvals - v[1:, :nx]
        cvals = jnp.concatenate([cvals, cK[None]], axis=0)
        if self.mc == 0:  # padded masked-off row (see setup())
            cvals = jnp.zeros((K + 1, 1))
        return jnp.sum(f0s) + f0K, b, cvals

    @partial(jax.jit, static_argnums=0)
    def eval_derivs(self, v):
        """Jacobians: A = [fx fu], objective gradient, C = dc/dv in ONE
        vectorized forward-mode pass per stage.  Analog of
        Hqp_Docp::update/update_grds (hqp/Hqp_Docp.C:944-1193), with
        jax.jacfwd replacing finite differences / ADOL-C forward."""
        K = self.K
        all_v, fin_v = self._split_fns()
        A, cgrad, C = jax.vmap(jax.jacfwd(all_v, argnums=1))(
            jnp.arange(K), v[:-1])
        gK, CK = jax.jacfwd(fin_v)(v[-1])
        cgrad = jnp.concatenate([cgrad, gK[None]], axis=0)
        C = jnp.concatenate([C, CK[None]], axis=0)
        if self.mc == 0:  # padded masked-off row (see setup())
            C = jnp.zeros((K + 1, 1, self.nv))
        return A, cgrad, C

    # program protocol consumed by the SQP solver ---------------------------

    #: evaluation counters (prg_fbd_evals role, hqp/Hqp_Docp.h:113)
    fbd_evals: int = 0
    grd_evals: int = 0

    def make_qp(self, v, Q=None):
        """Assemble the StageQP linearization at iterate v."""
        self.fbd_evals += 1
        self.grd_evals += 1
        lb, ub, c_min, c_max, var_mask, con_mask = self._bounds
        f, b, cvals = self.eval_vals(v)
        A, cgrad, C = self.eval_derivs(v)
        if Q is None:
            Q = jnp.zeros((self.K + 1, self.nv, self.nv))
        eqg = {}
        if self._has_eqg:
            # fixed general constraints c(v) == t as exact equality rows:
            # C_k dv + (c(v) - t) = 0 in the delta coordinates of the QP
            eqg = dict(E=C, eqg_mask=self._eqg_mask,
                       e=jnp.where(self._eqg_mask,
                                   cvals - self._c_eq_target, 0.0))
        qp = StageQP(
            Q=Q, c=cgrad, A=A, b=b,
            lb=lb - v, ub=ub - v,
            C=C, d_lo=c_min - cvals, d_up=c_max - cvals,
            var_mask=var_mask, con_mask=con_mask, **eqg,
        )
        return f, qp

    def update_fbd_qp(self, qp: StageQP, v_old, v_new):
        self.fbd_evals += 1
        return self._update_fbd_qp(qp, v_old, v_new)

    @partial(jax.jit, static_argnums=0)
    def _update_fbd_qp(self, qp: StageQP, v_old, v_new):
        """Re-evaluate only values at v_new, keeping derivatives of qp.
        Analog of Hqp_SqpProgram::update_fbd for line search."""
        lb, ub, c_min, c_max, var_mask, con_mask = self._bounds
        f, b, cvals = self.eval_vals(v_new)
        upd = {}
        if self._has_eqg:
            upd["e"] = jnp.where(self._eqg_mask,
                                 cvals - self._c_eq_target, 0.0)
        qp = dataclasses.replace(
            qp, b=b, lb=lb - v_new, ub=ub - v_new,
            d_lo=c_min - cvals, d_up=c_max - cvals, **upd)
        return f, qp

    @partial(jax.jit, static_argnums=0)
    def eval_grd_L(self, v, y, z):
        """grad of Lagrangian = c - A'y - C'z at iterate v
        (hqp/Hqp_SqpSolver.C:430-445), with z an IneqGroups pytree."""
        A, cgrad, C = self.eval_derivs(v)
        lb, ub, c_min, c_max, var_mask, con_mask = self._bounds
        fmask = (jnp.isfinite(lb) & jnp.isfinite(ub) & (lb == ub)
                 & var_mask)
        # adjoint of dynamics + fixed-variable multipliers
        yd = y["dyn"]
        out = jnp.zeros_like(v)
        out = out.at[:-1].add(jnp.einsum("kij,ki->kj", A, yd))
        out = out.at[1:, :self.nx].add(-yd)
        out = out + jnp.where(fmask, y["fix"], 0.0)
        # bound/constraint multipliers, masking out IP sentinel entries
        zbl = jnp.where(jnp.isfinite(lb) & var_mask, z.bl, 0.0)
        zbu = jnp.where(jnp.isfinite(ub) & var_mask, z.bu, 0.0)
        zg = (jnp.where(jnp.isfinite(c_min) & con_mask, z.gl, 0.0)
              - jnp.where(jnp.isfinite(c_max) & con_mask, z.gu, 0.0))
        out = out + (zbl - zbu) + jnp.einsum("kij,ki->kj", C, zg)
        if self._has_eqg and isinstance(y, dict) and "gen" in y:
            yg = jnp.where(self._eqg_mask, y["gen"], 0.0)
            out = out + jnp.einsum("kij,ki->kj", C, yg)
        return cgrad - out

    def eval_hess_blocks(self, v, y, z):
        """Exact per-stage Lagrangian Hessian blocks [K1, nv, nv]
        (for the Gerschgorin hela; role of Omu linearity analysis)."""
        all_v, fin_v = self._split_fns()
        K = self.K
        zg = z.gl - z.gu
        # fixed general constraints (c_min == c_max) are equality rows
        # whose multipliers y["gen"] carry curvature -y_gen * grad^2 c
        # exactly like the inequality multipliers
        if self._has_eqg and isinstance(y, dict) and "gen" in y:
            zg = zg + jnp.where(self._eqg_mask, y["gen"], 0.0)

        def lag(k, vk, yk, zk):
            f, f0, c = all_v(k, vk)
            return f0 - yk @ f - zk @ c

        H = jax.vmap(jax.hessian(lag, argnums=1))(
            jnp.arange(K), v[:-1], y, zg[:-1])

        def lagK(vk):
            f0, c = fin_v(vk)
            return f0 - zg[-1] @ c

        HK = jax.hessian(lagK)(v[-1])
        return jnp.concatenate([H, HK[None]], axis=0)

    def repin(self, v):
        """Force pinned (fixed) variables to their current values -- used
        after pin values change (MPC initial-state update) or any
        operation that may have perturbed them."""
        return jnp.where(self._pin_mask, self._pin_vals, v)

    def set_pinned(self, x_fixed=None, stage=0):
        """Update the pinned state values of one stage (MPC: the new
        measured initial state).  x_fixed: [nx] array; only components
        that were declared fixed in setup_vars are affected."""
        if x_fixed is not None:
            vals = self._pin_vals.at[stage, : self.nx].set(
                jnp.asarray(x_fixed, jnp.float64))
            self._pin_vals = jnp.where(self._pin_mask, vals,
                                       self._pin_vals)

    def split_blocks(self, vec):
        """Map a variable-space vector to the BFGS block partition
        ([K1, nv] is already the per-stage block layout)."""
        return vec

    def q_to_blocks(self, Q):
        """The stage Hessian [K1, nv, nv] is already block form."""
        return Q

    def q_from_blocks(self, Qb):
        return Qb

    def simulate(self, v):
        """Initial-value rollout from x_0 with the given controls
        (Hqp_Docp::simulate, hqp/Hqp_Docp.C:793-830)."""
        nx = self.nx
        all_v, _ = self._split_fns()

        def stepk(x, inp):
            k, vk = inp
            vk = vk.at[:nx].set(x)
            xn, _, _ = all_v(k, vk)
            return xn, vk

        xK, vs = jax.lax.scan(stepk, v[0, :nx],
                              (jnp.arange(self.K), v[:-1]))
        vK = v[-1].at[:nx].set(xK)
        out = jnp.concatenate([vs, vK[None]], axis=0)
        # re-pin fixed variables the rollout may have overwritten
        return jnp.where(self._pin_mask, self._pin_vals, out)
