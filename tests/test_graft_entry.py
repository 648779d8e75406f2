"""Driver-entry-point tests that run EXACTLY the way the driver does:
a fresh interpreter (sitecustomize active, no conftest env forcing), so a
regression in the entry points' own backend bootstrapping is caught here
and not by the driver's MULTICHIP check (the round-1 failure mode)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_fresh(code: str, timeout: int = 600) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # the driver's process has neither of conftest's overrides
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    # keep PYTHONPATH intact (axon backend lives there); prepend the repo
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


@pytest.mark.parametrize("pre_init", [False, True])
def test_dryrun_multichip_driver_style(pre_init):
    """dryrun_multichip must bring up its own 8-device world whether or not
    something initialized a jax backend first."""
    prelude = "import jax; jax.devices()\n" if pre_init else ""
    r = _run_fresh(
        prelude + "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multichip OK" in r.stdout, (r.stdout, r.stderr[-2000:])


def test_entry_compiles_driver_style():
    """entry() must return (fn, args) that jit-lowers in a fresh process.

    Lower+compile-check only (abstract eval); actually executing would hit
    the remote TPU tunnel, which is slow and may be contended."""
    r = _run_fresh(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"  # don't touch the tunnel
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "jax.jit(fn).lower(*args)\n"
        "print('ENTRY_LOWER_OK')\n"
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ENTRY_LOWER_OK" in r.stdout
