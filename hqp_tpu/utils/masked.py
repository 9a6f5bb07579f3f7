"""Masked pytree reductions.

The reference stores exactly-sized meschach vectors per constraint class
(hqp/Hqp_Program.h:33-65).  On TPU everything is padded to static shapes and
validity is carried as boolean masks of identical pytree structure; the
reductions here (inner products, norms, minima) are the masked analogs of
meschach's ``in_prod``/``v_norm_inf``/``v_min`` (meschach/vecop.c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e300


def tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _reduce_sum(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(0.0)
    return sum(jnp.sum(l) for l in leaves)


def _reduce_max(tree, init=-jnp.inf):
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(init)
    out = jnp.asarray(init)
    for l in leaves:
        out = jnp.maximum(out, jnp.max(l) if l.size else jnp.asarray(init))
    return out


def _reduce_min(tree, init=jnp.inf):
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(init)
    out = jnp.asarray(init)
    for l in leaves:
        out = jnp.minimum(out, jnp.min(l) if l.size else jnp.asarray(init))
    return out


def inner(a, b, mask=None):
    """Masked inner product <a, b> over a pytree."""
    if mask is None:
        return _reduce_sum(tmap(lambda x, y: x * y, a, b))
    return _reduce_sum(tmap(lambda x, y, m: jnp.where(m, x * y, 0.0), a, b, mask))


def total(a, mask=None):
    """Masked sum of all entries."""
    if mask is None:
        return _reduce_sum(a)
    return _reduce_sum(tmap(lambda x, m: jnp.where(m, x, 0.0), a, mask))


def count(mask):
    """Number of valid entries in a boolean mask pytree."""
    return _reduce_sum(tmap(lambda m: m.astype(jnp.float64), mask))


def tsize(tree) -> int:
    """Static total element count of a pytree."""
    return sum(l.size for l in jax.tree_util.tree_leaves(tree))


def norm_inf(a, mask=None):
    """Masked infinity norm."""
    if mask is None:
        return _reduce_max(tmap(lambda x: jnp.abs(x), a), init=0.0)
    return _reduce_max(
        tmap(lambda x, m: jnp.where(m, jnp.abs(x), 0.0), a, mask), init=0.0
    )


def vmin(a, mask=None):
    """Masked minimum entry (inf if mask empty)."""
    if mask is None:
        return _reduce_min(a)
    return _reduce_min(tmap(lambda x, m: jnp.where(m, x, BIG), a, mask))


def vmax(a, mask=None):
    if mask is None:
        return _reduce_max(a)
    return _reduce_max(tmap(lambda x, m: jnp.where(m, x, -BIG), a, mask))


def where(mask, a, b):
    """Elementwise select over pytrees; b may be a scalar."""
    if isinstance(b, (int, float)):
        return tmap(lambda m, x: jnp.where(m, x, b), mask, a)
    return tmap(jnp.where, mask, a, b)


def fill(tree, value):
    """Pytree of the same structure filled with a constant.  Boolean
    leaves (masks) are promoted to float64 -- filling a mask tree with a
    numeric value must not silently truncate to {0, 1}."""
    def leaf(x):
        dt = x.dtype if jnp.issubdtype(x.dtype, jnp.inexact) else jnp.float64
        return jnp.full(x.shape, value, dtype=dt)

    return tmap(leaf, tree)


def axpy(alpha, x, y):
    """y + alpha * x over pytrees (meschach v_mltadd analog)."""
    return tmap(lambda xi, yi: yi + alpha * xi, x, y)


def add(a, b):
    return tmap(jnp.add, a, b)


def sub(a, b):
    return tmap(jnp.subtract, a, b)


def scale(alpha, a):
    return tmap(lambda x: alpha * x, a)


def ratio_min(num, den, mask):
    """min over valid entries of -num/den where den < 0, else +inf.

    This is the fraction-to-boundary computation of the IP stepsize
    (hqp/Hqp_IpsMehrotra.C:564-574): for each component with d < 0 the
    maximal step is -z/d; entries with d >= 0 or invalid do not bind.
    """
    def leaf(n, d, m):
        ok = m & (d < 0.0)
        r = jnp.where(ok, -n / jnp.where(ok, d, -1.0), BIG)
        return r

    return _reduce_min(tmap(leaf, num, den, mask), init=BIG)
