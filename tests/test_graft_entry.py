"""Driver-contract tests for __graft_entry__.py.

The driver imports __graft_entry__ from a fresh process whose jax backend
exposes ONE real TPU chip (not 8 CPU devices), then calls
``dryrun_multichip(8)``. Round 1 shipped a hard ``len(jax.devices())==8``
assert that failed exactly there (MULTICHIP_r01.json rc=1), so this test
replays the driver invocation as faithfully as possible: a fresh
subprocess with NO virtual-device XLA flags, single-device jax, calling
``dryrun_multichip(8)``.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env(device_count: int = 1) -> dict:
    env = dict(os.environ)
    # Safety: never let a test subprocess register the real TPU plugin
    # (single-session grant; see CLAUDE.md). The driver's own process has
    # one TPU device; we emulate "one device, not n" with one CPU device.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    if device_count != 1:
        flags.append(
            f"--xla_force_host_platform_device_count={device_count}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("_PYANNOTE_TPU_DRYRUN_CHILD", None)
    return env


@pytest.mark.slow
def test_dryrun_multichip_from_single_device_process():
    """dryrun_multichip(8) must pass from a 1-device parent process."""
    code = ("import sys; sys.path.insert(0, {repo!r}); "
            "import jax; assert len(jax.devices()) == 1, jax.devices(); "
            "import __graft_entry__; "
            "__graft_entry__.dryrun_multichip(8)").format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_driver_env(1), cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dp training ok" in proc.stdout, proc.stdout
    assert "tp+dp SSL forward ok" in proc.stdout, proc.stdout
    assert "sharded SpeakerDiarization apply ok" in proc.stdout, \
        proc.stdout


def test_entry_compiles_and_runs():
    """entry() returns a jittable fn + args the driver can compile-check."""
    code = ("import sys; sys.path.insert(0, {repo!r}); "
            "import __graft_entry__, jax; "
            "fn, args = __graft_entry__.entry(); "
            "out = jax.jit(fn)(*args); "
            "print('OK', out.shape)").format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_driver_env(1), cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "OK" in proc.stdout, proc.stdout
