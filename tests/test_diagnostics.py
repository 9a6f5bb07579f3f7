"""prg_test / qp_dump / est_y diagnostics (round-2 verdict item 9)."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.models.did import PrgDID
from hqp_tpu.utils.diagnostics import prg_test, qp_dump, qp_load, est_y
from hqp_tpu.sqp.powell import SqpPowell


def test_prg_test_passes_on_correct_program():
    info = prg_test(PrgDID(kmax=12, with_cns=True))
    assert info["ok"]
    assert info["max_rel_err"] < 1e-4


def test_prg_test_catches_wrong_jacobian():
    class Broken(PrgDID):
        def eval_derivs(self, v):
            A, cgrad, C = super().eval_derivs(v)
            return A * 1.01, cgrad, C   # 1% systematic Jacobian error

    with pytest.raises(ValueError):
        prg_test(Broken(kmax=12))


def test_qp_dump_roundtrip(tmp_path):
    prg = PrgDID(kmax=10)
    v = prg.setup()
    _, qp = prg.make_qp(v)
    p = str(tmp_path / "qp.npz")
    qp_dump(qp, p)
    qp2 = qp_load(p)
    assert type(qp2).__name__ == "StageQP"
    np.testing.assert_allclose(np.asarray(qp2.A), np.asarray(qp.A))
    np.testing.assert_allclose(np.asarray(qp2.lb), np.asarray(qp.lb))


def test_est_y_least_squares_property():
    """est_y produces the least-squares stationary point of
    ||g - J' y||: the normal-equations residual J (g - J' y_hat) must be
    tiny relative to J g (Hqp_HL::est_y role; an exact match with the
    converged duals is only defined when no inequality is active)."""
    import hqp_tpu.utils.masked as mk

    prg = PrgDID(kmax=20, with_cns=False)
    v = prg.setup()
    _, qp = prg.make_qp(v)
    y_hat = est_y(qp, iters=200)

    g = jnp.where(qp.x_mask(), qp.c, 0.0)
    r = g - qp.matvec_eqT(y_hat)

    def J(d):
        e1 = qp.eval_eq(qp.zero_x() + d)
        e0 = qp.eval_eq(qp.zero_x())
        return mk.tmap(lambda a, b: a - b, e1, e0)

    num = mk.norm_inf(J(jnp.where(qp.x_mask(), r, 0.0)), qp.eq_mask())
    den = mk.norm_inf(J(g), qp.eq_mask())
    assert float(num) / (float(den) + 1e-300) < 1e-6


def test_est_y_exact_on_equality_only_qp():
    """On an equality-only QP at its optimum, the gradient is exactly
    A' y*, so est_y recovers the true duals."""
    import numpy as np
    from hqp_tpu.qp.program import DenseQP
    from hqp_tpu.qp import mehrotra as ip
    from hqp_tpu.qp.kkt import DenseKKT
    import dataclasses

    rng = np.random.default_rng(3)
    n, me = 20, 6
    M = rng.standard_normal((n, n)) * 0.3
    Q = jnp.asarray(M @ M.T + np.eye(n))
    c = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((me, n)))
    b = jnp.asarray(rng.standard_normal(me) * 0.1)
    qp = DenseQP.build(Q, c, A=A, b=b)

    s = ip.Mehrotra(backend=DenseKKT())
    st = s.solve(qp, s.init_state(qp))
    assert int(st.result) == ip.OPTIMAL
    # shift to the optimum: gradient there is Q x* + c
    qp_star = dataclasses.replace(
        qp, c=qp.matvec_Q(st.x) + qp.c,
        b=jnp.einsum("ij,j->i", A, st.x) + b)
    y_hat = est_y(qp_star, iters=200)   # DenseQP: y is a plain array
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(st.y),
                               atol=1e-6)


def test_init_multipliers_is_wired():
    """The constructor knob must change the initial multipliers (it was a
    dead parameter in round 1, hessian.py:42-45)."""
    from hqp_tpu.sqp.hessian import BFGS

    prg = PrgDID(kmax=12, with_cns=False)
    s = SqpPowell(prg, hela=BFGS(init_multipliers=True), max_iters=50)
    s.init()
    assert float(jnp.max(jnp.abs(s.y["dyn"]))) > 0.0
    assert s.solve() == "optimal"
