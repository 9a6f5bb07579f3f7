"""Binary S-function loading.

Role of the reference's hxi/Hxi_SFunction.{h,C}: dlopen a compiled
S-function shared library and drive its mdl* callbacks.  The C ABI is
defined by native/hxi/hxi_sfun.h (a ctypes-friendly SimStruct struct) and
native/hxi/hxi_sfun_exports.h (fixed-name exported wrappers
hxi_mdlInitializeSizes/...).  ``compile_sfunction`` builds a .c model
source against those headers with the system compiler, so the in-tree
demo models (native/hxi/sfun_did.c, sfun_dic.c -- the roles of
odc/sfun_did.c, odc/sfun_dic.c) are usable without a prebuilt binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

HXI_MAX_PARAMS = 16
HXI_ERRMSG_LEN = 256

_dp = ctypes.POINTER(ctypes.c_double)


class _CSimStruct(ctypes.Structure):
    """ctypes mirror of native/hxi/hxi_sfun.h struct HxiSimStruct."""

    _fields_ = [
        ("nx", ctypes.c_int),
        ("nxd", ctypes.c_int),
        ("nu", ctypes.c_int),
        ("ny", ctypes.c_int),
        ("np", ctypes.c_int),
        ("np_set", ctypes.c_int),
        ("cap", ctypes.c_int),
        ("t", ctypes.c_double),
        ("sample_time", ctypes.c_double),
        ("x", _dp),
        ("dx", _dp),
        ("xd", _dp),
        ("u", _dp),
        ("y", _dp),
        ("p", _dp * HXI_MAX_PARAMS),
        ("p_len", ctypes.c_int * HXI_MAX_PARAMS),
        ("errmsg", ctypes.c_char * HXI_ERRMSG_LEN),
    ]


def _hxi_dir():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "hxi")


def compile_sfunction(src: str, out: str | None = None) -> str:
    """Compile an S-function .c source against the hxi headers to a
    shared library; returns the .so path.  Rebuilds when stale."""
    inc = _hxi_dir()
    if out is None:
        out = os.path.splitext(src)[0] + ".so"
    deps = [src, os.path.join(inc, "hxi_sfun.h"),
            os.path.join(inc, "hxi_sfun_exports.h")]
    if (not os.path.exists(out)
            or any(os.path.getmtime(out) < os.path.getmtime(d)
                   for d in deps if os.path.exists(d))):
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-I", inc, src, "-o", out],
            check=True)
    return out


def demo_sfunction_path(name: str) -> str:
    """Path of an in-tree demo S-function ('sfun_did' or 'sfun_dic'),
    compiled on demand."""
    return compile_sfunction(os.path.join(_hxi_dir(), name + ".c"))


class SFunction:
    """A loaded binary S-function instance.

    Evaluator interface (shared with PySFunctionHost): sizes as
    attributes, plus derivatives/outputs/update methods operating on
    numpy arrays.  Each instance owns a private SimStruct, so multiple
    instances of one library evaluate independently (the role of the
    per-thread SimStruct copies in omu/Omu_Model.h:55).
    """

    _CAP = 1024

    def __init__(self, path: str, params=()):
        if path.endswith(".c"):
            path = compile_sfunction(path)
        self.path = path
        self._lib = ctypes.CDLL(path)
        for fn in ("hxi_mdlInitializeSizes", "hxi_mdlStart",
                   "hxi_mdlInitializeConditions", "hxi_mdlDerivatives",
                   "hxi_mdlOutputs", "hxi_mdlUpdate", "hxi_mdlTerminate"):
            getattr(self._lib, fn).argtypes = [ctypes.POINTER(_CSimStruct)]
            getattr(self._lib, fn).restype = ctypes.c_int

        self.S = _CSimStruct()
        cap = self._CAP
        self._bufs = {n: np.zeros(cap) for n in ("x", "dx", "xd", "u", "y")}
        for n, b in self._bufs.items():
            setattr(self.S, n, b.ctypes.data_as(_dp))
        self.S.cap = cap

        params = [np.atleast_1d(np.asarray(p, np.float64)).copy()
                  for p in params]
        if len(params) > HXI_MAX_PARAMS:
            raise ValueError("too many S-function parameters")
        self._params = params
        self.S.np_set = len(params)
        for i, p in enumerate(params):
            self.S.p[i] = p.ctypes.data_as(_dp)
            self.S.p_len[i] = p.size

        self._check("hxi_mdlInitializeSizes")
        if max(self.S.nx, self.S.nxd, self.S.nu, self.S.ny) > cap:
            raise ValueError("model sizes exceed host buffer capacity")
        self._check("hxi_mdlInitializeSampleTimes", optional=True)
        self._check("hxi_mdlStart")
        self._check("hxi_mdlInitializeConditions")

    def _check(self, fn, optional=False):
        f = getattr(self._lib, fn, None)
        if f is None:
            if optional:
                return
            raise AttributeError(fn)
        if f(ctypes.byref(self.S)) != 0:
            raise RuntimeError(
                f"{fn}: {self.S.errmsg.decode(errors='replace')}")

    # -- sizes ----------------------------------------------------------------
    @property
    def nx(self):
        return self.S.nx

    @property
    def nxd(self):
        return self.S.nxd

    @property
    def nu(self):
        return self.S.nu

    @property
    def ny(self):
        return self.S.ny

    @property
    def sample_time(self):
        return self.S.sample_time

    # -- evaluation -----------------------------------------------------------
    def derivatives(self, t, x, u):
        S = self.S
        S.t = float(t)
        self._bufs["x"][: S.nx] = x
        self._bufs["u"][: S.nu] = u
        self._bufs["dx"][: S.nx] = 0.0
        self._check("hxi_mdlDerivatives")
        return self._bufs["dx"][: S.nx].copy()

    def outputs(self, t, x, u):
        S = self.S
        S.t = float(t)
        if S.nx:
            self._bufs["x"][: S.nx] = x
        else:
            self._bufs["xd"][: S.nxd] = x
        self._bufs["u"][: S.nu] = u
        self._bufs["y"][: S.ny] = 0.0
        self._check("hxi_mdlOutputs")
        return self._bufs["y"][: S.ny].copy()

    def update(self, t, xd, u):
        S = self.S
        S.t = float(t)
        self._bufs["xd"][: S.nxd] = xd
        self._bufs["u"][: S.nu] = u
        self._check("hxi_mdlUpdate")
        return self._bufs["xd"][: S.nxd].copy()

    def terminate(self):
        self._check("hxi_mdlTerminate")
