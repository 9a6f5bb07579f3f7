"""Native host kernels (C++) for the general sparse NLP path.

Compiles native/sparse_ldl.cpp on first use (g++ -O3 -shared) and binds
it via ctypes -- the framework's counterpart of the reference's C sparse
kernels (hqp/sprcm.C RCM ordering; meschach/meschext_hl.C modified
Cholesky behind the Hqp_IpSpSC Schur-complement path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(here, "native", "sparse_ldl.cpp")
    so = os.path.join(here, "native", "libhqpsparse.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
            check=True)
    lib = ctypes.CDLL(so)
    ip = ctypes.POINTER(ctypes.c_int)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.hqp_rcm_order.argtypes = [ctypes.c_int, ip, ip, ip]
    lib.hqp_ldl_create.restype = ctypes.c_void_p
    lib.hqp_ldl_create.argtypes = [ctypes.c_int, ip, ip]
    lib.hqp_ldl_factor.restype = ctypes.c_int
    lib.hqp_ldl_factor.argtypes = [ctypes.c_void_p, ip, ip, dp,
                                   ctypes.c_double]
    lib.hqp_ldl_solve.argtypes = [ctypes.c_void_p, dp]
    lib.hqp_ldl_nnz.restype = ctypes.c_int
    lib.hqp_ldl_nnz.argtypes = [ctypes.c_void_p]
    lib.hqp_ldl_destroy.argtypes = [ctypes.c_void_p]
    lib.hqp_bkp_factor.restype = ctypes.c_void_p
    lib.hqp_bkp_factor.argtypes = [ctypes.c_int, ip, ip, dp,
                                   ctypes.c_double, ctypes.c_double]
    lib.hqp_bkp_solve.argtypes = [ctypes.c_void_p, dp]
    lib.hqp_bkp_nnz.restype = ctypes.c_int
    lib.hqp_bkp_nnz.argtypes = [ctypes.c_void_p]
    lib.hqp_bkp_n2x2.restype = ctypes.c_int
    lib.hqp_bkp_n2x2.argtypes = [ctypes.c_void_p]
    lib.hqp_bkp_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _ci(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def rcm_order(n, rowptr, colind):
    """Reverse Cuthill-McKee permutation of a symmetric CSR pattern
    (hqp/sprcm.C sp_rcm_scan/sp_rcm_order role)."""
    lib = _lib()
    rowptr, colind = _ci(rowptr), _ci(colind)
    perm = np.zeros(n, dtype=np.int32)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.hqp_rcm_order(n, rowptr.ctypes.data_as(ip),
                      colind.ctypes.data_as(ip),
                      perm.ctypes.data_as(ip))
    return perm


class SparseLDL:
    """Sparse LDL' of a symmetric (quasidefinite) matrix in CSR form,
    with modified-Cholesky diagonal safeguarding (spMODCHOLfac role)."""

    def __init__(self, n, rowptr, colind):
        self.n = n
        self.rowptr = _ci(rowptr)
        self.colind = _ci(colind)
        lib = _lib()
        ip = ctypes.POINTER(ctypes.c_int)
        self._h = lib.hqp_ldl_create(
            n, self.rowptr.ctypes.data_as(ip),
            self.colind.ctypes.data_as(ip))

    def factor(self, values, reg=0.0):
        lib = _lib()
        vals = np.ascontiguousarray(values, dtype=np.float64)
        ip = ctypes.POINTER(ctypes.c_int)
        dp = ctypes.POINTER(ctypes.c_double)
        rc = lib.hqp_ldl_factor(
            ctypes.c_void_p(self._h),
            self.rowptr.ctypes.data_as(ip),
            self.colind.ctypes.data_as(ip),
            vals.ctypes.data_as(dp), ctypes.c_double(reg))
        if rc != 0:
            raise ArithmeticError("sparse LDL: zero pivot")
        return self

    def solve(self, b):
        lib = _lib()
        x = np.array(b, dtype=np.float64, copy=True)
        dp = ctypes.POINTER(ctypes.c_double)
        if x.ndim == 1:
            lib.hqp_ldl_solve(ctypes.c_void_p(self._h),
                              x.ctypes.data_as(dp))
        else:
            for j in range(x.shape[1]):
                col = np.ascontiguousarray(x[:, j])
                lib.hqp_ldl_solve(ctypes.c_void_p(self._h),
                                  col.ctypes.data_as(dp))
                x[:, j] = col
        return x

    @property
    def nnz(self):
        return _lib().hqp_ldl_nnz(ctypes.c_void_p(self._h))

    def __del__(self):
        try:
            _lib().hqp_ldl_destroy(ctypes.c_void_p(self._h))
        except Exception:
            pass


class SparseBKP:
    """Sparse Bunch-Kaufman-Parlett factorization P'AP = MDM' of a
    symmetric INDEFINITE matrix in full CSR form (both triangles), with
    1x1/2x2 pivots -- the reference's spBKP kernel family
    (hqp/spBKP.C:369 spBKPfactor, hqp/Hqp_IpSpBKP.C:179).

    Unlike :class:`SparseLDL` this does not assume quasidefiniteness:
    dynamic symmetric pivoting handles zero/small diagonals (saddle-point
    KKT blocks) without regularization.  ``tol`` scales the pivot test
    (1.0 = textbook alpha; the reference exposes it as ``sp_tol``,
    spBKP.C:392); re-factor each iteration (pivoting is value-dependent,
    so there is no reusable symbolic phase)."""

    def __init__(self, n, rowptr, colind, values, tol=1.0, reg=0.0):
        lib = _lib()
        rowptr, colind = _ci(rowptr), _ci(colind)
        vals = np.ascontiguousarray(values, dtype=np.float64)
        ip = ctypes.POINTER(ctypes.c_int)
        dp = ctypes.POINTER(ctypes.c_double)
        self.n = n
        self._h = lib.hqp_bkp_factor(
            n, rowptr.ctypes.data_as(ip), colind.ctypes.data_as(ip),
            vals.ctypes.data_as(dp), ctypes.c_double(tol),
            ctypes.c_double(reg))
        if not self._h:
            raise MemoryError("sparse BKP: allocation failure")

    def solve(self, b):
        lib = _lib()
        x = np.array(b, dtype=np.float64, copy=True)
        dp = ctypes.POINTER(ctypes.c_double)
        if x.ndim == 1:
            lib.hqp_bkp_solve(ctypes.c_void_p(self._h),
                              x.ctypes.data_as(dp))
        else:
            for j in range(x.shape[1]):
                col = np.ascontiguousarray(x[:, j])
                lib.hqp_bkp_solve(ctypes.c_void_p(self._h),
                                  col.ctypes.data_as(dp))
                x[:, j] = col
        return x

    @property
    def nnz(self):
        return _lib().hqp_bkp_nnz(ctypes.c_void_p(self._h))

    @property
    def n_2x2(self):
        """Number of 2x2 pivot blocks chosen (diagnostic)."""
        return _lib().hqp_bkp_n2x2(ctypes.c_void_p(self._h))

    def __del__(self):
        try:
            _lib().hqp_bkp_destroy(ctypes.c_void_p(self._h))
        except Exception:
            pass
