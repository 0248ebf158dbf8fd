"""Test configuration: run everything on CPU with 8 virtual XLA devices so
sharding/collective tests exercise a multi-device mesh without a TPU pod.

Note: the environment's sitecustomize pre-imports jax and registers the
'axon' TPU backend in every process, so plain JAX_PLATFORMS env handling is
not enough — we override the platform in-process before any backend is
initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def chunked(x, n):
    """Split last axis into n equal chunks."""
    t = x.shape[-1]
    assert t % n == 0
    return np.split(x, n, axis=-1)


def run_chunked(block, x, n):
    """Run a streaming block over n chunks and concatenate outputs."""
    import jax.numpy as jnp

    state = block.init_state()
    outs = []
    for c in np.split(np.asarray(x), n, axis=-1):
        state, y = block(state, jnp.asarray(c))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


# -- fast inner-loop subset ("pytest -m fast", ~2 min) ----------------------
# Modules whose tests are cheap: pure-numpy/FEC/protocol units and small
# CPU DSP checks. The full suite (~17 min on 2 cores) stays the CI gate.
FAST_MODULES = {
    "test_fir", "test_resample", "test_ops", "test_firdes", "test_sync",
    "test_fec", "test_framing", "test_command", "test_command_parity",
    "test_m17_golden", "test_dmr_fec", "test_block_codes",
    "test_limits_gpredict", "test_audio_processor", "test_channelizer",
    "test_ambe_fec", "test_dmr_protocol", "test_dmr_signalling",
    "test_dmr_data",
}


def pytest_collection_modifyitems(items):
    for it in items:
        mod = getattr(it, "module", None)
        if mod is not None and mod.__name__ in FAST_MODULES:
            it.add_marker(pytest.mark.fast)
