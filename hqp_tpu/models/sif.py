"""SIF-lite reader: ingest real SIF/QPS test problems (CUTE role).

The reference's CUTE bridge decodes SIF files through the external
SIF decoder + Fortran callbacks (hqp/Prg_CUTE.C:117+614, Prg_CUTE_ST.C,
hqp_cute/hqp_cute.tcl) and feeds them to the SQP engine as sparse NLPs.
This module implements the *linear/quadratic subset* of SIF natively --
enough to ingest classic QP test problems (Hock-Schittkowski /
Maros-Meszaros style files: ROWS/GROUPS, COLUMNS/VARIABLES, RHS/CONSTANTS,
RANGES, BOUNDS, START POINT, QUADOBJ/QSECTION/QMATRIX, OBJSENSE) -- and
routes them through the same general sparse path as the generated CUTE
families (SQP-Powell + eager Mehrotra + host sparse LDL',
hqp_tpu.qp.kkt_sparse_host).  Genuinely nonlinear SIF (ELEMENT/GROUP
TYPE/USES sections) is out of scope and rejected with a clear error;
the generated families (hqp_tpu.models.nlp_gen) remain the nonlinear
scale battery.

Format reference: the SIF definition in "The SIF reference report"
(Conn/Gould/Toint) as exercised by the reference's own test battery;
semantics of RHS/RANGES/BOUNDS follow the MPS conventions the decoder
implements (default variable bounds [0, inf), range rows, negative-UP
rule).
"""

from __future__ import annotations

import dataclasses

import numpy as np


class SifError(ValueError):
    pass


@dataclasses.dataclass
class SifData:
    """Parsed linear/quadratic SIF problem (numpy, host-side)."""

    name: str
    var_names: list
    con_names: list            # constraint rows (objective excluded)
    con_types: list            # 'E' | 'L' | 'G' per row
    g: np.ndarray              # linear objective coefficients [n]
    Q: np.ndarray              # quadratic term, f = c0 + g'x + 1/2 x'Qx
    c0: float                  # objective constant
    A: np.ndarray              # constraint coefficients [m, n]
    rhs: np.ndarray            # per-row right-hand side [m]
    ranges: np.ndarray         # per-row range (nan = none) [m]
    x_lo: np.ndarray
    x_up: np.ndarray
    x0: np.ndarray
    x_int: np.ndarray          # integer-variable marker [n] bool
    solution: float | None     # *LO SOLTN comment if present
    maximize: bool = False

    @property
    def n(self):
        return len(self.var_names)

    @property
    def m(self):
        return len(self.con_names)

    def bounds(self):
        """(c_min, c_max) from row types + RHS + RANGES (MPS ranges
        semantics: L row b-|r| <= c <= b; G row b <= c <= b+|r|;
        E row with r >= 0: b <= c <= b+r, with r < 0: b+r <= c <= b)."""
        inf = np.inf
        c_min = np.full(self.m, -inf)
        c_max = np.full(self.m, inf)
        for i, t in enumerate(self.con_types):
            b, r = self.rhs[i], self.ranges[i]
            if t == "E":
                c_min[i] = c_max[i] = b
                if np.isfinite(r):
                    if r >= 0:
                        c_max[i] = b + r
                    else:
                        c_min[i] = b + r
            elif t == "L":
                c_max[i] = b
                if np.isfinite(r):
                    c_min[i] = b - abs(r)
            elif t == "G":
                c_min[i] = b
                if np.isfinite(r):
                    c_max[i] = b + abs(r)
        return c_min, c_max


#: sections the lite subset understands (everything else is an error,
#: except harmless no-op sections)
_SECTIONS = {
    "NAME", "OBJSENSE", "ROWS", "GROUPS", "CONSTRAINTS", "COLUMNS",
    "VARIABLES", "RHS", "CONSTANTS", "RANGES", "BOUNDS", "START", "QUADOBJ",
    "QSECTION", "QMATRIX", "QUADS", "QUADRATIC", "HESSIAN",
    "OBJECT", "ENDATA",
}

_NONLINEAR = {"ELEMENT", "GROUP", "OBJECT GROUPS"}


def parse_sif(text: str, name_hint: str = "SIF") -> SifData:
    """Parse the linear/quadratic SIF subset from ``text``."""
    name = name_hint
    var_idx, var_names = {}, []
    con_idx, con_names, con_types = {}, [], []
    obj_row = None
    g_ent, A_ent, Q_ent = [], [], []     # (idx..., value) triples
    rhs_ent, rng_ent = [], []
    bnd_ent = []                         # (type, var, value|None)
    sp_ent = []                          # (var, value)
    c0 = 0.0
    solution = None
    maximize = False
    int_mode = False
    x_int_names = set()

    section = None
    for raw in text.splitlines():
        if not raw.strip():
            continue
        if raw.lstrip().startswith("*"):
            # comment; harvest the conventional solution annotation
            toks = raw.replace("*", " ").split()
            if len(toks) >= 3 and toks[0] in ("LO", "UP") \
                    and toks[1] in ("SOLTN", "SOLUTION"):
                try:
                    solution = float(toks[2].replace("D", "E"))
                except ValueError:
                    pass
            continue
        if raw[0] not in " \t":          # indicator (section) line
            toks = raw.split()
            head = toks[0].upper()
            if head in ("ELEMENT", "GROUP") or \
                    (head == "OBJECT" and len(toks) > 1
                     and toks[1].upper() == "GROUPS"):
                raise SifError(
                    f"nonlinear SIF section '{raw.strip()}' is outside the "
                    "SIF-lite subset (linear/quadratic problems only); use "
                    "the generated CUTE families for nonlinear tests")
            if head not in _SECTIONS:
                raise SifError(f"unknown SIF section '{raw.strip()}'")
            section = head
            if head == "NAME" and len(toks) > 1:
                name = toks[1]
            if head == "ENDATA":
                break
            continue

        toks = raw.split()
        if not toks:
            continue
        if section == "OBJSENSE":
            maximize = toks[0].upper() in ("MAX", "MAXIMIZE")
        elif section in ("ROWS", "GROUPS", "CONSTRAINTS"):
            t = toks[0].upper().lstrip("X")
            if t.startswith("Z"):
                raise SifError("parametric (Z*) SIF rows are unsupported")
            rname = toks[1]
            if t == "N":
                if obj_row is None:
                    obj_row = rname      # first N row is the objective
                # later N rows: free rows, ignored (MPS convention)
            elif t in ("E", "L", "G"):
                con_idx[rname] = len(con_names)
                con_names.append(rname)
                con_types.append(t)
            else:
                raise SifError(f"unsupported row type '{toks[0]}'")
        elif section in ("COLUMNS", "VARIABLES"):
            if len(toks) >= 3 and toks[1].strip("'").upper() == "MARKER":
                mk_ = toks[2].strip("'").upper()
                if mk_ == "INTORG":
                    int_mode = True
                elif mk_ == "INTEND":
                    int_mode = False
                continue
            v = toks[0]
            if v not in var_idx:
                var_idx[v] = len(var_names)
                var_names.append(v)
                if int_mode:
                    x_int_names.add(v)
            for rname, val in _pairs(toks[1:], raw):
                if rname == obj_row:
                    g_ent.append((var_idx[v], val))
                elif rname in con_idx:
                    A_ent.append((con_idx[rname], var_idx[v], val))
                # entries on ignored free rows are dropped
        elif section in ("RHS", "CONSTANTS"):
            # first token is the rhs-set name unless it is a known row
            body = toks if toks[0] in con_idx or toks[0] == obj_row \
                else toks[1:]
            for rname, val in _pairs(body, raw):
                if rname == obj_row:
                    c0 = -val            # MPS objective-constant rule
                elif rname in con_idx:
                    rhs_ent.append((con_idx[rname], val))
        elif section == "RANGES":
            body = toks if toks[0] in con_idx else toks[1:]
            for rname, val in _pairs(body, raw):
                if rname in con_idx:
                    rng_ent.append((con_idx[rname], val))
        elif section == "BOUNDS":
            t = toks[0].upper().lstrip("X")
            # layout: TYPE SETNAME VAR [VALUE]; value-less types: FR/MI/PL/BV
            if t in ("FR", "MI", "PL", "BV"):
                bnd_ent.append((t, toks[-1], None))
            else:
                bnd_ent.append((t, toks[-2], _num(toks[-1], raw)))
        elif section == "START":
            body = toks
            if toks[0].upper() == "XV":
                body = toks[2:]
            elif len(toks) % 2 == 1 and toks[0] not in var_idx:
                body = toks[1:]          # leading start-point-set name
            for vname, val in _pairs(body, raw):
                if vname in var_idx:
                    sp_ent.append((var_idx[vname], val))
        elif section in ("QUADOBJ", "QSECTION", "QMATRIX", "QUADS",
                         "QUADRATIC", "HESSIAN"):
            if len(toks) < 3:
                raise SifError(f"malformed quadratic entry '{raw.strip()}'")
            i, j = var_idx.get(toks[0]), var_idx.get(toks[1])
            if i is None or j is None:
                raise SifError(f"quadratic entry on unknown variable: "
                               f"'{raw.strip()}'")
            Q_ent.append((i, j, _num(toks[2], raw)))
        elif section == "OBJECT":        # OBJECT BOUND: documentation only
            continue
        elif section == "NAME":
            continue
        else:
            raise SifError(f"data line outside a known section: "
                           f"'{raw.strip()}'")

    n, m = len(var_names), len(con_names)
    g = np.zeros(n)
    for i, v in g_ent:
        g[i] += v
    A = np.zeros((m, n))
    for r, i, v in A_ent:
        A[r, i] += v
    Q = np.zeros((n, n))
    for i, j, v in Q_ent:
        # QUADOBJ/QMATRIX entries define f = 1/2 x'Qx; one-triangle input
        # is mirrored, explicit both-triangle input overwrites itself
        Q[i, j] = v
        Q[j, i] = v
    rhs = np.zeros(m)
    for r, v in rhs_ent:
        rhs[r] = v
    rng = np.full(m, np.nan)
    for r, v in rng_ent:
        rng[r] = v

    # default SIF/MPS variable bounds: [0, inf)
    x_lo = np.zeros(n)
    x_up = np.full(n, np.inf)
    lo_explicit = np.zeros(n, bool)
    for t, vname, val in bnd_ent:
        if vname not in var_idx:
            raise SifError(f"bound on unknown variable '{vname}'")
        i = var_idx[vname]
        if t in ("LO", "LI"):
            x_lo[i] = val
            lo_explicit[i] = True
        elif t in ("UP", "UI"):
            x_up[i] = val
            # MPS rule: a negative upper bound with a still-default lower
            # bound frees the lower bound
            if val < 0.0 and not lo_explicit[i]:
                x_lo[i] = -np.inf
        elif t == "FX":
            x_lo[i] = x_up[i] = val
            lo_explicit[i] = True
        elif t == "FR":
            x_lo[i], x_up[i] = -np.inf, np.inf
            lo_explicit[i] = True
        elif t == "MI":
            x_lo[i] = -np.inf
            lo_explicit[i] = True
        elif t == "PL":
            x_up[i] = np.inf
        elif t == "BV":
            x_lo[i], x_up[i] = 0.0, 1.0
            x_int_names.add(vname)
        else:
            raise SifError(f"unsupported bound type '{t}'")

    x0 = np.clip(np.zeros(n), x_lo, x_up)
    x0[~np.isfinite(x0)] = 0.0
    for i, v in sp_ent:
        x0[i] = v
    x_int = np.array([vn in x_int_names for vn in var_names], bool)

    return SifData(name=name, var_names=var_names, con_names=con_names,
                   con_types=con_types, g=g, Q=Q, c0=float(c0), A=A,
                   rhs=rhs, ranges=rng, x_lo=x_lo, x_up=x_up, x0=x0,
                   x_int=x_int, solution=solution, maximize=maximize)


def _pairs(toks, raw):
    if len(toks) % 2:
        raise SifError(f"odd (name, value) list in '{raw.strip()}'")
    for k in range(0, len(toks), 2):
        yield toks[k], _num(toks[k + 1], raw)


def _num(tok, raw):
    try:
        return float(tok.replace("D", "E").replace("d", "e"))
    except ValueError:
        raise SifError(f"expected a number, got '{tok}' in '{raw.strip()}'")


def load_sif(path: str) -> SifData:
    with open(path) as fh:
        return parse_sif(fh.read(), name_hint=path)


# ---------------------------------------------------------------------------
# program wrapper: the Prg_CUTE role
# ---------------------------------------------------------------------------

from hqp_tpu.docp.nlp import Nlp  # noqa: E402
from hqp_tpu.utils.registry import modules  # noqa: E402


@modules.register("prg_name", "SIF")
@modules.register("prg_name", "CUTE")
class PrgSIF(Nlp):
    """An ingested SIF problem as a general NLP program
    (hqp/Prg_CUTE.C's role: CSETUP-style data -> Hqp_SqpProgram)."""

    name = "SIF"

    def __init__(self, source: str | SifData = None, path: str = None):
        import jax.numpy as jnp

        if path is not None:
            data = load_sif(path)
        elif isinstance(source, SifData):
            data = source
        elif isinstance(source, str):
            data = parse_sif(source)
        else:
            raise SifError("PrgSIF needs a SIF text, path= or SifData")
        self.data = data
        self.name = data.name
        self.n = data.n
        self.m = data.m
        sgn = -1.0 if data.maximize else 1.0
        self._Q = jnp.asarray(sgn * data.Q)
        self._g = jnp.asarray(sgn * data.g)
        self._c0 = sgn * data.c0
        self._A = jnp.asarray(data.A)

    def setup_vars(self):
        c_min, c_max = self.data.bounds()
        return dict(x_init=self.data.x0, x_min=self.data.x_lo,
                    x_max=self.data.x_up, c_min=c_min, c_max=c_max)

    def f0(self, x):
        return self._c0 + self._g @ x + 0.5 * x @ (self._Q @ x)

    def c(self, x):
        return self._A @ x

    def objective(self, f_internal):
        """Report in the problem's own sense (max problems are solved
        as minimizations internally)."""
        return -f_internal if self.data.maximize else f_internal


def solve_sif(path_or_text: str, eps: float = 1e-7, max_iters: int = 100):
    """Solve a SIF file through the CUTE-scale general sparse path
    (SQP-Powell + eager Mehrotra + host sparse LDL; the same routing as
    hqp_tpu.models.nlp_gen.solve_generated)."""
    import os

    from hqp_tpu.qp import mehrotra as ip
    from hqp_tpu.qp.kkt_sparse_host import SparseHostKKT
    from hqp_tpu.sqp.powell import SqpPowell
    from hqp_tpu.sqp.hessian import Gerschgorin

    prg = (PrgSIF(path=path_or_text) if os.path.exists(path_or_text)
           else PrgSIF(path_or_text))
    s = SqpPowell(prg, max_iters=max_iters, eps=eps,
                  hela=Gerschgorin(),
                  qp_solver=ip.Mehrotra(eps=1e-10, max_iters=60, jit=False),
                  kkt_backend=SparseHostKKT())
    s.init()
    result = s.solve()
    obj = prg.objective(float(s.f))
    out = {"problem": prg.name, "n": prg.n, "m": prg.m, "result": result,
           "obj": obj, "sqp_iters": s.iter,
           "qp_iters_total": s.qp_iters_total,
           "known_solution": prg.data.solution,
           "ok": result == "optimal"}
    if prg.data.solution is not None:
        out["ok"] = out["ok"] and abs(obj - prg.data.solution) <= \
            1e-4 * max(1.0, abs(prg.data.solution))
    return out
