"""Driver entry-point contract (`__graft_entry__`).

The driver compile-checks `entry()` single-chip and runs
`dryrun_multichip(N)` externally; what the tests pin here is the
routing logic that keeps those calls safe when the axon TPU tunnel is
wedged (CLAUDE.md "If the axon tunnel wedges"): deciding between the
in-process and CPU-subprocess path must never itself trigger backend
initialization, and the subprocess env must not re-register the axon
plugin. The full dryrun execution is covered by the driver and by
/verify, not here (it is a multi-minute CPU-mesh compile).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_initialized_device_count_sees_the_test_mesh():
    # conftest initializes an 8-device virtual CPU backend; the counter
    # must report it so dryrun_multichip(<=8) takes the in-process path.
    import jax

    assert len(jax.devices()) == 8
    assert graft._initialized_device_count() >= 8


def test_initialized_device_count_does_not_initialize_backends():
    # In a fresh interpreter that has NOT touched any jax op, the count
    # must be 0 AND the probe itself must leave the backend registry
    # empty — jax.devices() here would hang forever on a wedged tunnel,
    # which is exactly what this guard exists to avoid.
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "assert g._initialized_device_count() == 0\n"
        "from jax._src import xla_bridge as xb\n"
        "assert not getattr(xb, '_backends', {}), xb._backends\n"
        "print('NOINIT-OK')\n" % REPO
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
    )
    assert "NOINIT-OK" in r.stdout, (r.stdout, r.stderr)


def test_cpu_mesh_env_strips_axon_and_pins_device_count():
    os.environ.setdefault("_GRAFT_TEST_SENTINEL", "1")
    base_pp = os.environ.get("PYTHONPATH")
    try:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            ["/root/.axon_site", "/some/other/path"]
        )
        os.environ["JAX_PLATFORMS"] = "axon"
        env = graft._cpu_mesh_env(4)
    finally:
        if base_pp is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = base_pp
        os.environ.pop("JAX_PLATFORMS", None)
    assert "JAX_PLATFORMS" not in env
    assert env["JAX_PLATFORM_NAME"] == "cpu"
    assert "/root/.axon_site" not in env.get("PYTHONPATH", "")
    assert "/some/other/path" in env["PYTHONPATH"]
    assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
    # non-axon env vars ride through untouched
    assert env["_GRAFT_TEST_SENTINEL"] == "1"


def test_cpu_mesh_env_drops_empty_pythonpath():
    base_pp = os.environ.get("PYTHONPATH")
    try:
        os.environ["PYTHONPATH"] = "/root/.axon_site"
        env = graft._cpu_mesh_env(2)
    finally:
        if base_pp is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = base_pp
    assert "PYTHONPATH" not in env
