"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX substitute is
8 virtual CPU devices, which exercises the same GSPMD partitioning/collective
code paths as a real mesh.

This environment ships a sitecustomize (PYTHONPATH) that imports jax and
registers/initializes a remote-TPU PJRT backend before ANY user code runs —
so backend selection cannot be fixed in-process. If we detect that, re-exec
pytest once with a clean environment (CPU platform, 8 virtual devices,
sitecustomize dropped). The exec happens in pytest_configure, where pytest's
fd capture is suspended, so output reaches the real stdout.
"""

import os
import sys

_MARK = "_YNT_TESTS_REEXECED"


def pytest_configure(config):
    import jax

    config.addinivalue_line(
        "markers", "tpu: opt-in smoke tests on the real TPU backend "
        "(YNT_TPU_TESTS=1 python -m pytest tests -m tpu)")
    if os.environ.get("YNT_TPU_TESTS"):
        # opt-in real-hardware run: keep the TPU backend, no re-exec;
        # non-tpu-marked tests deselect themselves via their mesh asserts,
        # so invoke with `-m tpu`
        return
    if (os.environ.get(_MARK) or
            (jax.default_backend() == "cpu" and jax.device_count() >= 8)):
        jax.config.update("jax_enable_x64", False)
        return
    env = dict(os.environ)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""  # drop the sitecustomize that pre-inits TPU
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + args, env)
