"""Generated CUTE-style large sparse NLP families.

The reference's CUTE bridge (hqp/Prg_CUTE.C:117+614, Prg_CUTE_ST.C:1263,
hqp_cute/hqp_cute.tcl) feeds SIF-decoded Fortran problems into the SQP
engine through the general sparse path.  A SIF decoder needs the external
CUTE(st) distribution even in the reference (optional HQP_WITH_CUTE build,
configure.in); the TPU build instead generates the same *kind* of problems
-- classic CUTE families with banded/sparse structure, scalable n, mixes
of equality/inequality/bound constraints -- directly as :class:`Nlp`
programs, and routes them through SQP-Powell + Mehrotra (eager) +
:class:`~hqp_tpu.qp.kkt_sparse_host.SparseHostKKT` (RCM-ordered native
sparse LDL', the Hqp_IpRedSpBKP role).

Families (names follow their CUTE(st) inspirations):

* ``lqblend``   -- convex banded QP: Laplacian objective, window-sum
                   equality rows, box bounds (LP/QP blending plants).
* ``broydn3d``  -- Broyden tridiagonal nonlinear least squares
                   (BROYDN3DLS), unconstrained, banded Hessian.
* ``bdqrtic``   -- banded quartic objective (BDQRTIC), unconstrained.
* ``catena``    -- hanging chain: minimize potential energy subject to
                   nonlinear link-length equalities (CATENA/CHAIN).
* ``srosenbr``  -- chained Rosenbrock with lower bounds (SROSENBR + box).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hqp_tpu.docp.nlp import Nlp
from hqp_tpu.utils.registry import modules


@modules.register("prg_name", "LQBlend")
class PrgLQBlend(Nlp):
    """min 1/2 x'Tx - 1'x,  T = tridiag(-1, 2, -1);
    window-sum equalities  sum_{i in window_j} x_i = 1;  -2 <= x <= 2."""

    name = "LQBlend"

    def __init__(self, n=1000, wlen=10):
        self.n = n
        self.wlen = wlen
        self.m = n // wlen

    def _static_config(self):
        return (self.n, self.wlen)

    def setup_vars(self):
        return dict(x_init=np.full(self.n, 0.1),
                    x_min=np.full(self.n, -2.0),
                    x_max=np.full(self.n, 2.0),
                    c_min=np.ones(self.m), c_max=np.ones(self.m))

    def f0(self, x):
        d = x[1:] - x[:-1]
        return 0.5 * (jnp.sum(d * d) + x[0] ** 2 + x[-1] ** 2) \
            - jnp.sum(x)

    def c(self, x):
        return jnp.sum(x.reshape(self.m, self.wlen), axis=1)


@modules.register("prg_name", "Broydn3d")
class PrgBroydn3d(Nlp):
    """Broyden tridiagonal system as least squares (CUTE BROYDN3DLS):
    r_i = (3 - 2 x_i) x_i - x_{i-1} - 2 x_{i+1} + 1, min sum r_i^2."""

    name = "Broydn3d"

    def __init__(self, n=1000):
        self.n = n
        self.m = 0

    def _static_config(self):
        return (self.n,)

    def setup_vars(self):
        return dict(x_init=np.full(self.n, -1.0))

    def f0(self, x):
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        r = (3.0 - 2.0 * x) * x - xm - 2.0 * xp + 1.0
        return jnp.sum(r * r)


@modules.register("prg_name", "Bdqrtic")
class PrgBdqrtic(Nlp):
    """CUTE BDQRTIC: banded quartic,
    sum_{i<=n-4} (-4 x_i + 3)^2 + (x_i^2 + 2x_{i+1}^2 + 3x_{i+2}^2
                                   + 4x_{i+3}^2 + 5x_n^2)^2."""

    name = "Bdqrtic"

    def __init__(self, n=1000):
        self.n = n
        self.m = 0

    def _static_config(self):
        return (self.n,)

    def setup_vars(self):
        return dict(x_init=np.ones(self.n))

    def f0(self, x):
        n = self.n
        i = jnp.arange(n - 4)
        lin = (-4.0 * x[i] + 3.0) ** 2
        quad = (x[i] ** 2 + 2.0 * x[i + 1] ** 2 + 3.0 * x[i + 2] ** 2
                + 4.0 * x[i + 3] ** 2 + 5.0 * x[n - 1] ** 2) ** 2
        return jnp.sum(lin + quad)


@modules.register("prg_name", "Catena")
class PrgCatena(Nlp):
    """Hanging chain (CUTE CATENA/CHAIN): nodes y_0..y_N at fixed
    horizontal spacing h; minimize potential energy sum y_i subject to
    link length sqrt(h^2 + (y_{i+1}-y_i)^2) = L (nonlinear equalities),
    endpoints pinned at 0.  Variables: interior node heights."""

    name = "Catena"

    def __init__(self, n=1000, slack=1.2):
        self.n = n                     # interior nodes
        self.m = n + 1                 # links
        self.h = 1.0 / (n + 1)
        self.L = slack * self.h        # each link longer than the spacing

    def _static_config(self):
        return (self.n, self.L)

    def setup_vars(self):
        # sagging initial guess keeps the link-length Jacobian nonsingular
        t = np.linspace(0.0, 1.0, self.n + 2)[1:-1]
        return dict(x_init=-0.2 * np.sin(np.pi * t),
                    c_min=np.full(self.m, self.L ** 2),
                    c_max=np.full(self.m, self.L ** 2))

    def f0(self, x):
        return jnp.sum(x)

    def c(self, x):
        y = jnp.concatenate([jnp.zeros(1), x, jnp.zeros(1)])
        dy = y[1:] - y[:-1]
        return self.h ** 2 + dy * dy   # squared link lengths == L^2


@modules.register("prg_name", "SRosenbr")
class PrgSRosenbr(Nlp):
    """Chained Rosenbrock (CUTE SROSENBR) with box bounds x >= -1.5."""

    name = "SRosenbr"

    def __init__(self, n=1000):
        self.n = n
        self.m = 0

    def _static_config(self):
        return (self.n,)

    def setup_vars(self):
        x0 = np.tile([-1.2, 1.0], self.n // 2 + 1)[: self.n]
        return dict(x_init=x0, x_min=np.full(self.n, -1.5))

    def f0(self, x):
        e = x[1::2] - x[0::2] ** 2
        o = 1.0 - x[0::2]
        return jnp.sum(100.0 * e * e + o * o)


FAMILIES = {
    "lqblend": PrgLQBlend,
    "broydn3d": PrgBroydn3d,
    "bdqrtic": PrgBdqrtic,
    "catena": PrgCatena,
    "srosenbr": PrgSRosenbr,
}


# per-family Hessian strategy: the banded ill-conditioned objectives need
# the exact Lagrangian Hessian (from-identity quasi-Newton would take O(n)
# iterations to recover the Laplacian-like spectrum; the reference uses
# ADOL-C exact Hessians there, Hqp_HL_Gerschgorin), while the
# Rosenbrock-type families converge fastest under damped BFGS (the
# Gerschgorin diagonal-dominance repair distorts their large off-diagonal
# curvature).
FAMILY_HELA = {
    "lqblend": "Gerschgorin",
    "broydn3d": "Gerschgorin",
    "bdqrtic": "Gerschgorin",
    "catena": "BFGS",
    "srosenbr": "BFGS",
}


_SHARED = {}


def solve_generated(name: str, n: int = 1000, eps: float = 1e-6,
                    max_iters: int = 200, hela: str | None = None):
    """Solve one generated family instance through the CUTE-scale path:
    SQP-Powell + eager Mehrotra + host sparse LDL (RCM ordered).

    hela = None picks the family default (FAMILY_HELA).

    Returns a summary dict (used by bench.py config 3 and the large-NLP
    tests)."""
    from hqp_tpu.qp import mehrotra as ip
    from hqp_tpu.qp.kkt_sparse_host import SparseCallbackKKT
    from hqp_tpu.sqp.powell import SqpPowell
    from hqp_tpu.sqp import hessian  # noqa: F401  (registers hela slots)

    prg = FAMILIES[name](n=n)
    kw = {"hela": modules.create("sqp_hela",
                                 hela or FAMILY_HELA.get(name, "BFGS"))}
    # jit=True + the pure_callback sparse backend: the IP loop compiles
    # once and runs as a device while_loop; each iteration pays one host
    # factor callback (cached symbolic, native LDL) + solve callbacks.
    # The jit=False + SparseHostKKT combination cost ~17 s on lqblend
    # n=2000 in eager dispatch/mini-compiles alone (bench r4 config 3).
    # The backend/solver pair is SHARED across calls: SparseCallbackKKT
    # is identity-hashed (it owns host-side factor state), so a fresh
    # instance per call would miss every jit trace cache and re-compile
    # the whole IP program (measured ~6 s per warm lqblend solve).
    if "pair" not in _SHARED:
        _SHARED["pair"] = (ip.Mehrotra(eps=1e-9, max_iters=60),
                           SparseCallbackKKT())
    qp_solver, backend = _SHARED["pair"]
    s = SqpPowell(prg, max_iters=max_iters, eps=eps,
                  qp_solver=qp_solver, kkt_backend=backend, **kw)
    s.init()
    result = s.solve()
    return {"problem": name, "n": prg.n, "m": prg.m, "result": result,
            "obj": float(s.f), "sqp_iters": s.iter,
            "qp_iters_total": s.qp_iters_total,
            "norm_inf": s.norm_inf, "norm_grd_L": s.norm_grd_L,
            "ok": result == "optimal"}
