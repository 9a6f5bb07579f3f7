"""MEX S-function hosting (Hxi_MEX_SFunction role).

The reference loads MATLAB-MEX-compiled S-functions -- shared objects
whose ONLY entry point is ``mexFunction`` -- by smuggling its emulated
SimStruct pointer through the MEX calling convention and harvesting the
method pointers the gateway registers (hxi/Hxi_MEX_SFunction.C:235-370;
configure.in:457-460).  Same design here:

* ``build_mex_sfunction(src)`` compiles an UNMODIFIED level-2 C
  S-function source with ``-DMATLAB_MEX_FILE`` so its trailing
  ``#include "simulink.c"`` pulls in our gateway twin
  (native/hxi_simulink/simulink.c) instead of the cg_sfun.h export
  shims -- the built object exports ``mexFunction`` and nothing else of
  the S-function;
* the host-support library (native/hxi_simulink/mex_host.c ->
  libhximexhost.so, built on demand) allocates the SimStruct, performs
  the flag-0 initialization call and drives the registered method
  table;
* :class:`MexSFunction` exposes the same driving surface as
  :class:`hqp_tpu.hxi.simulink.SimulinkSFunction`, so everything built
  on it (SimulinkModel -> hosted models -> DynamicOpt/DynamicEst) works
  with a MEX-built binary unchanged.

Parameters may be given as Python values or as MATLAB-style argument
text parsed by :mod:`hqp_tpu.hxi.mx_parse` (Hxi_mx_parse.h role);
string parameters are stored as char-code arrays readable through the
emulation's mxIsChar/mxGetString.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

from hqp_tpu.hxi.mx_parse import parse_args

_INC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "hxi_simulink")


def build_mex_sfunction(src: str, out: str | None = None,
                        include_dir: str | None = None) -> str:
    """Compile a level-2 C S-function source as a MEX file (the
    -DMATLAB_MEX_FILE branch of its trailing include)."""
    inc = include_dir or _INC
    if out is None:
        out = os.path.join(
            tempfile.mkdtemp(prefix="hxi_mex_"),
            os.path.splitext(os.path.basename(src))[0] + ".mexa64")
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-DMATLAB_MEX_FILE",
           "-I", inc, src, "-o", out, "-lm"]
    p = subprocess.run(cmd, capture_output=True, text=True)
    if p.returncode != 0:
        raise RuntimeError(
            f"MEX S-function build failed:\n{' '.join(cmd)}\n{p.stderr}")
    return out


_host_lib_cache = None


def _host_lib():
    """Build + load libhximexhost.so once per process."""
    global _host_lib_cache
    if _host_lib_cache is not None:
        return _host_lib_cache
    so = os.path.join(_INC, "libhximexhost.so")
    src = os.path.join(_INC, "mex_host.c")
    if not os.path.exists(so) or \
            os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["gcc", "-O2", "-fPIC", "-shared", "-I", _INC, src,
               "-o", so]
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            raise RuntimeError(f"mex host build failed:\n{p.stderr}")
    lib = ctypes.CDLL(so)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    sigs = {
        "hxi_ss_create": (ctypes.c_void_p, []),
        "hxi_ss_set_param": (None, [ctypes.c_void_p, ctypes.c_int, dp,
                                    ctypes.c_int, ctypes.c_int]),
        "hxi_ss_set_param_char": (None, [ctypes.c_void_p, ctypes.c_int,
                                         dp, ctypes.c_int, ctypes.c_int]),
        "hxi_ss_allocate": (None, [ctypes.c_void_p]),
        "hxi_ss_destroy": (None, [ctypes.c_void_p]),
        "hxi_ss_ncont": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_ss_ndisc": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_ss_nin": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_ss_nout": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_ss_in_width": (ctypes.c_int, [ctypes.c_void_p, ctypes.c_int]),
        "hxi_ss_out_width": (ctypes.c_int, [ctypes.c_void_p,
                                            ctypes.c_int]),
        "hxi_ss_sample_time": (ctypes.c_double, [ctypes.c_void_p,
                                                 ctypes.c_int]),
        "hxi_ss_error": (ctypes.c_char_p, [ctypes.c_void_p]),
        "hxi_ss_xc": (dp, [ctypes.c_void_p]),
        "hxi_ss_dx": (dp, [ctypes.c_void_p]),
        "hxi_ss_xd": (dp, [ctypes.c_void_p]),
        "hxi_ss_u": (dp, [ctypes.c_void_p, ctypes.c_int]),
        "hxi_ss_y": (dp, [ctypes.c_void_p, ctypes.c_int]),
        "hxi_ss_set_t": (None, [ctypes.c_void_p, ctypes.c_double]),
        "hxi_ss_jac_nnz": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_ss_jac_ncols": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_ss_jac_pr": (dp, [ctypes.c_void_p]),
        "hxi_ss_jac_ir": (ip, [ctypes.c_void_p]),
        "hxi_ss_jac_jc": (ip, [ctypes.c_void_p]),
        "hxi_mex_init": (ctypes.c_int, [ctypes.c_void_p,
                                        ctypes.c_void_p]),
        "hxi_mex_initializeSampleTimes": (None, [ctypes.c_void_p]),
        "hxi_mex_initializeConditions": (None, [ctypes.c_void_p]),
        "hxi_mex_start": (None, [ctypes.c_void_p]),
        "hxi_mex_outputs": (None, [ctypes.c_void_p, ctypes.c_int]),
        "hxi_mex_update": (None, [ctypes.c_void_p, ctypes.c_int]),
        "hxi_mex_derivatives": (None, [ctypes.c_void_p]),
        "hxi_mex_jacobian": (None, [ctypes.c_void_p]),
        "hxi_mex_terminate": (None, [ctypes.c_void_p]),
        "hxi_mex_has_update": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_mex_has_derivatives": (ctypes.c_int, [ctypes.c_void_p]),
        "hxi_mex_has_jacobian": (ctypes.c_int, [ctypes.c_void_p]),
    }
    for name, (res, args) in sigs.items():
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    _host_lib_cache = lib
    return lib


class MexSFunction:
    """A MEX-built level-2 S-function driven through the method table.

    Same public surface as SimulinkSFunction (outputs/update/
    derivatives/jacobian/xd/xc/set_inputs/sample_time), so SimulinkModel
    and everything above it host MEX binaries unchanged."""

    def __init__(self, mex_path: str, params=(), args: str | None = None):
        self._mex = ctypes.CDLL(mex_path)
        mexfn = ctypes.cast(self._mex.mexFunction, ctypes.c_void_p)
        lib = _host_lib()
        self._lib = lib
        if args is not None:
            params = parse_args(args)
        self.S = lib.hxi_ss_create()
        self._params = []
        for i, p in enumerate(params):
            if isinstance(p, str):
                arr = np.asarray([float(ord(c)) for c in p], np.float64)
                self._params.append(arr)
                lib.hxi_ss_set_param_char(
                    self.S, i,
                    arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    1, arr.size)
            else:
                arr = np.ascontiguousarray(np.atleast_1d(p), np.float64)
                self._params.append(arr)
                lib.hxi_ss_set_param(
                    self.S, i,
                    arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    arr.size, 1)
        rc = lib.hxi_mex_init(self.S, mexfn)
        self._check()
        if rc:
            raise RuntimeError(f"hxi_mex_init failed (rc {rc})")
        lib.hxi_ss_allocate(self.S)
        lib.hxi_mex_initializeSampleTimes(self.S)
        lib.hxi_mex_initializeConditions(self.S)
        lib.hxi_mex_start(self.S)
        self._check()

        self.ncont = lib.hxi_ss_ncont(self.S)
        self.ndisc = lib.hxi_ss_ndisc(self.S)
        self.nin = sum(lib.hxi_ss_in_width(self.S, p)
                       for p in range(lib.hxi_ss_nin(self.S)))
        self.nout = sum(lib.hxi_ss_out_width(self.S, p)
                        for p in range(lib.hxi_ss_nout(self.S)))
        self.has_update = bool(lib.hxi_mex_has_update(self.S))
        self.has_derivatives = bool(lib.hxi_mex_has_derivatives(self.S))
        self.has_jacobian = bool(lib.hxi_mex_has_jacobian(self.S))

    def _check(self):
        err = self._lib.hxi_ss_error(self.S)
        if err:
            raise RuntimeError(f"MEX S-function error: {err.decode()}")

    def _view(self, ptr, n):
        if n == 0:
            return np.zeros(0)
        return np.ctypeslib.as_array(ptr, shape=(n,))

    @property
    def xd(self):
        return self._view(self._lib.hxi_ss_xd(self.S), self.ndisc)

    @property
    def xc(self):
        return self._view(self._lib.hxi_ss_xc(self.S), self.ncont)

    def sample_time(self, i=0):
        return float(self._lib.hxi_ss_sample_time(self.S, i))

    def set_inputs(self, u):
        u = np.asarray(u, np.float64).ravel()
        off = 0
        for p in range(self._lib.hxi_ss_nin(self.S)):
            w = self._lib.hxi_ss_in_width(self.S, p)
            buf = self._view(self._lib.hxi_ss_u(self.S, p), w)
            buf[:] = u[off:off + w]
            off += w

    def outputs(self, t=0.0):
        self._lib.hxi_ss_set_t(self.S, t)
        self._lib.hxi_mex_outputs(self.S, 0)
        self._check()
        ys = []
        for p in range(self._lib.hxi_ss_nout(self.S)):
            w = self._lib.hxi_ss_out_width(self.S, p)
            ys.append(self._view(self._lib.hxi_ss_y(self.S, p), w).copy())
        return np.concatenate(ys) if ys else np.zeros(0)

    def update(self, t=0.0):
        self._lib.hxi_ss_set_t(self.S, t)
        self._lib.hxi_mex_update(self.S, 0)
        self._check()

    def derivatives(self, t=0.0):
        self._lib.hxi_ss_set_t(self.S, t)
        self._lib.hxi_mex_derivatives(self.S)
        self._check()
        return self._view(self._lib.hxi_ss_dx(self.S), self.ncont).copy()

    def jacobian(self):
        """Dense J (same layout as SimulinkSFunction.jacobian)."""
        if not self.has_jacobian:
            raise RuntimeError("MEX S-function provides no mdlJacobian")
        self._lib.hxi_mex_jacobian(self.S)
        nnz = self._lib.hxi_ss_jac_nnz(self.S)
        ncols = self._lib.hxi_ss_jac_ncols(self.S)
        nrows = self.ncont + self.ndisc + self.nout
        pr = self._view(self._lib.hxi_ss_jac_pr(self.S), nnz)
        ir = np.ctypeslib.as_array(self._lib.hxi_ss_jac_ir(self.S),
                                   shape=(nnz,))
        jc = np.ctypeslib.as_array(self._lib.hxi_ss_jac_jc(self.S),
                                   shape=(ncols + 1,))
        J = np.zeros((nrows, ncols))
        for c in range(ncols):
            for k in range(jc[c], jc[c + 1]):
                J[ir[k], c] = pr[k]
        return J

    def terminate(self):
        self._lib.hxi_mex_terminate(self.S)

    def __del__(self):  # pragma: no cover - GC order dependent
        try:
            self._lib.hxi_ss_destroy(self.S)
        except Exception:
            pass


class MexEvaluator:
    """Evaluator-protocol adapter over a MEX S-function, so
    :class:`hqp_tpu.omu.hosted.HostedModel` (and DynamicOpt/DynamicEst
    above it) host MEX binaries exactly like hxi-ABI ones: attributes
    nx/nxd/nu/ny plus stateless update/derivatives/outputs (the state is
    written into the SimStruct buffers per call)."""

    def __init__(self, mex_path: str, params=(), args: str | None = None):
        if mex_path.endswith(".c"):
            mex_path = build_mex_sfunction(mex_path)
        self.sf = MexSFunction(mex_path, params=params, args=args)
        self.nx = self.sf.ncont
        self.nxd = self.sf.ndisc
        self.nu = self.sf.nin
        self.ny = self.sf.nout
        self.sample_time = self.sf.sample_time()

    def _load(self, x, u):
        sf = self.sf
        if self.nx:
            sf.xc[:] = np.asarray(x, np.float64)[: self.nx]
        if self.nxd:
            sf.xd[:] = np.asarray(x, np.float64)[: self.nxd]
        sf.set_inputs(u)

    def update(self, t, x, u):
        self._load(x, u)
        self.sf.update(float(t))
        return self.sf.xd.copy()

    def derivatives(self, t, x, u):
        self._load(x, u)
        return self.sf.derivatives(float(t))

    def outputs(self, t, x, u):
        self._load(x, u)
        return self.sf.outputs(float(t))
