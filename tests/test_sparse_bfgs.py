"""HL_SparseBFGS: sparsity-partitioned BFGS updates
(hqp/Hqp_HL_SparseBFGS.C -- sp_symrcm setup :70-113, next_block
:255-276, per-block damped update :216-247)."""

import numpy as np
import jax.numpy as jnp

import hqp_tpu
from hqp_tpu.docp.nlp import Nlp
from hqp_tpu.qp.program import DenseIneq
from hqp_tpu.sqp.hessian import BFGS, SparseBFGS
from hqp_tpu.sqp.powell import SqpPowell


class SeparablePairs(Nlp):
    """Partially separable: f = sum_i (x_i^2 - x_{i+h})^2 + (x_i - 1)^2.

    Variable i couples only with i+h (h = n/2) -- the Hessian pattern is
    2x2-block diagonal AFTER a reordering that RCM must discover."""

    name = "SeparablePairs"
    n = 8
    m = 0

    def setup_vars(self):
        return dict(x_init=np.full(self.n, 0.5))

    def f0(self, x):
        h = self.n // 2
        a, b = x[:h], x[h:]
        return jnp.sum((a ** 2 - b) ** 2 + (a - 1.0) ** 2)


def test_block_discovery_via_rcm():
    """The discovered partition is n/2 blocks of size 2 (pairs (i, i+h)
    brought adjacent by RCM), not one n-block and not singletons."""
    prg = SeparablePairs()
    prg.setup()
    hela = SparseBFGS()
    x = jnp.asarray(np.full(prg.n, 0.5))
    hela.bind(prg, x, jnp.zeros(0), DenseIneq(g=jnp.zeros(0)))
    assert hela._blocks is not None
    sizes = sorted(s for _, s in hela._blocks)
    assert sizes == [2, 2, 2, 2]
    # each block holds a true (i, i+h) pair under the permutation
    h = prg.n // 2
    for offs, size in hela._blocks:
        ids = sorted(int(hela._perm[offs + k]) for k in range(size))
        assert ids[1] - ids[0] == h


def test_update_preserves_block_sparsity():
    """The semantic difference vs plain BFGS: entries outside the
    discovered blocks stay exactly zero after updates (the reference
    only allocates/fills within blocks, Hqp_HL_SparseBFGS.C:97-113)."""
    prg = SeparablePairs()
    prg.setup()
    n = prg.n
    hela = SparseBFGS()
    x = jnp.asarray(np.full(n, 0.5))
    hela.bind(prg, x, jnp.zeros(0), DenseIneq(g=jnp.zeros(0)))

    rng = np.random.default_rng(0)
    Q = jnp.eye(n)[None]
    mask = np.zeros((n, n), bool)
    for offs, size in hela._blocks:
        idx = hela._perm[offs:offs + size]
        mask[np.ix_(idx, idx)] = True
    for _ in range(5):
        s = jnp.asarray(rng.standard_normal(n))[None]
        u = jnp.asarray(rng.standard_normal(n))[None]
        Q = hela.update(Q, s, u, 1.0)
        off = np.asarray(Q[0])[~mask]
        np.testing.assert_array_equal(off, 0.0)

    # plain BFGS fills the whole matrix from the same data
    Qf = BFGS().update(jnp.eye(n)[None],
                       jnp.asarray(rng.standard_normal(n))[None],
                       jnp.asarray(rng.standard_normal(n))[None], 1.0)
    assert np.max(np.abs(np.asarray(Qf[0])[~mask])) > 0.0


def test_sqp_converges_with_sparse_bfgs():
    """Full SQP with the partitioned update reaches the optimum
    (x_i = 1, x_{i+h} = 1, f = 0)."""
    prg = SeparablePairs()
    s = SqpPowell(prg, max_iters=60, hela=SparseBFGS())
    s.init()
    assert s.solve() == "optimal"
    assert float(s.f) < 1e-8
    np.testing.assert_allclose(np.asarray(s.x), 1.0, atol=1e-4)


def test_stage_layout_delegates_to_bfgs():
    """Pre-partitioned [B, nb, nb] stage Hessians take the batched BFGS
    path unchanged (the stage partition is what discovery would find)."""
    rng = np.random.default_rng(1)
    B, nb = 4, 3
    Q = jnp.asarray(np.tile(np.eye(nb), (B, 1, 1)))
    s = jnp.asarray(rng.standard_normal((B, nb)))
    u = jnp.asarray(rng.standard_normal((B, nb)))
    out_sparse = SparseBFGS().update(Q, s, u, 1.0)
    out_bfgs = BFGS().update(Q, s, u, 1.0)
    np.testing.assert_allclose(np.asarray(out_sparse),
                               np.asarray(out_bfgs), atol=1e-14)
