"""Test configuration: force an 8-device virtual CPU platform BEFORE jax is
imported, so multi-chip sharding (pjit/shard_map over a Mesh) is testable
without TPU hardware."""
import os

# Force CPU: the shell environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel); tests must run on the virtual multi-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def _probe_backend_init(timeout_s=180):
    """Fail FAST instead of hanging when the axon TPU tunnel is down.

    The container's sitecustomize registers the axon PJRT plugin at
    interpreter startup whenever PALLAS_AXON_POOL_IPS is set, and that plugin
    initializes (dialing the tunnel) even under JAX_PLATFORMS=cpu — during a
    tunnel outage EVERY backend init hangs, tests included (observed
    2026-08-18, registration cannot be undone in-process). Probe the init in
    a daemon thread; on timeout, exit with an actionable message."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no axon plugin registered — plain CPU init cannot hang
    import threading

    ready = threading.Event()

    def _init():
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        ready.set()

    threading.Thread(target=_init, daemon=True).start()
    if not ready.wait(timeout_s):
        msg = (
            f"\nconftest: JAX backend init did not complete in {timeout_s}s — "
            "the axon TPU tunnel looks unreachable, and its PJRT plugin blocks "
            "even CPU-only runs. Re-run with the plugin disabled:\n"
            "  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest ...\n"
        ).encode()
        os.write(2, msg)
        try:  # pytest captures fd 2; the terminal still sees /dev/tty
            tty = os.open("/dev/tty", os.O_WRONLY)
            os.write(tty, msg)
            os.close(tty)
        except OSError:
            pass
        os._exit(3)


_probe_backend_init()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, (
    "expected 8 virtual CPU devices; the TPU backend was initialized before "
    "conftest could force the CPU platform"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- test tiers
#
# `pytest tests/ -q`          -> fast tier (multi-minute tests skipped)
# `pytest tests/ -q --slow`   -> everything (CI / pre-release tier)
# `RUN_SLOW=1 pytest tests/`  -> everything (env form for wrappers)
#
# Slow tests are marked @pytest.mark.slow (whole files via pytestmark). The
# fast tier still covers every subsystem — the slow tier adds the
# multi-epoch end-to-end flows and large-geometry parity sweeps.

def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute end-to-end flows)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute test (runs with --slow or RUN_SLOW=1)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --slow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
