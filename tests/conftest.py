"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (the driver's multichip
dry-run uses the same mechanism; see __graft_entry__.py).

Whole-suite runs are transparently SPLIT INTO SUBPROCESS GROUPS (see
``pytest_cmdline_main`` below): XLA:CPU on the 8-device virtual platform
segfaults after many large compilations accumulate in one process (the
crash surfaces inside ``backend_compile_and_load`` / the compilation-
cache write at varying tests, is layout-sensitive, and reproduces with
the compilation cache disabled, without any ctypes test, and without the
axon plugin -- i.e. it is an upstream XLA:CPU in-process-lifetime bug,
not one of this repo's components; single files and small groups always
pass).  Grouped subprocesses bound the per-process compile count; the
per-platform persistent compilation cache (hqp_tpu/__init__.py) keeps
the extra processes cheap on repeat runs.
"""

import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU AOT cache loads spew error-level "machine feature mismatch"
# warnings for its own prefer-no-scatter/gather pseudo-features even for
# same-machine entries (upstream cosmetic bug); the compile-cache buckets
# are already keyed by a real host-CPU fingerprint (hqp_tpu/__init__.py),
# so silence the log noise in test runs only.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

#: max test FILES per subprocess group (crashes were first observed
#: ~30-70 tests into a single process; 4 files ~ 15-25 tests)
_GROUP_FILES = int(os.environ.get("HQP_SUITE_GROUP_FILES", "4"))


def _whole_suite(config):
    """True iff this invocation targets the whole tests/ tree with only
    safe-to-forward options (no -k/--collect-only/explicit files)."""
    here = os.path.dirname(os.path.abspath(__file__))
    for p in config.args:
        ap = os.path.abspath(p)
        if ap != here and not (ap + os.sep).startswith(here + os.sep):
            return False
        if os.path.isfile(ap):
            return False
    if config.getoption("keyword", "") or \
            config.getoption("collectonly", False):
        return False
    return True


def pytest_cmdline_main(config):
    """Split a whole-suite run into subprocess groups (see module doc)."""
    if os.environ.get("HQP_SUITE_CHUNKED"):
        return None  # inside a group subprocess: run normally
    try:
        if not _whole_suite(config):
            return None
    except Exception:
        return None

    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(
        f for f in os.listdir(here)
        if f.startswith("test_") and f.endswith(".py"))
    groups = [files[i:i + _GROUP_FILES]
              for i in range(0, len(files), _GROUP_FILES)]
    # forward every non-path invocation token (options AND their values,
    # e.g. "-m", "not slow") in original order
    path_toks = set(config.args)
    opts = [a for a in config.invocation_params.args
            if a not in path_toks]
    fail_fast = ("-x" in opts) or ("--exitfirst" in opts)

    env = dict(os.environ, HQP_SUITE_CHUNKED="1")
    worst = 0
    for grp in groups:
        cmd = [sys.executable, "-m", "pytest",
               *[os.path.join(here, f) for f in grp], *opts]
        rc = subprocess.call(cmd, env=env)
        if rc == 5:      # no tests collected in this group (e.g. -m)
            rc = 0
        worst = max(worst, rc)
        if worst and fail_fast:
            break
    return worst


# The container's sitecustomize registers a TPU ("axon") PJRT backend and
# overrides jax_platforms; force CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
