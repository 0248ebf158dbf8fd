"""Sequence parallelism: a FULL digital chain time-sharded across the
8-device CPU mesh must reproduce the serial output exactly (SURVEY §2.8
block/time parallelism with whole-chain halo)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from qradiolink_tpu.chains.fsk import Fsk4DemodFF, Fsk4Mod
from qradiolink_tpu.parallel.sharding import (
    make_mesh, time_sharded_chain, time_sharded_fir)


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 400).astype(np.uint8)
    mod = Fsk4Mod()
    _, tx = mod(mod.init_state(), jnp.asarray(data))
    return np.asarray(tx["iq"])


def test_time_sharded_fsk4_ff_equals_serial(signal):
    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 devices")
    # partition-invariance: fixed 320-sample (20 ksps) estimator windows
    # (16000-input quantum) and halo/local aligned to the 128-symbol
    # Viterbi tile (64000-input quantum), so the serial and sharded runs
    # see IDENTICAL window and tile boundaries
    halo = 64_000   # one Viterbi tile; > total chain memory at 1 Msps
    local = 192_000
    total = n_dev * local
    iq = np.zeros(total, np.complex64)
    iq[:min(len(signal), total)] = signal[:total]

    chain = Fsk4DemodFF(sync_window=320)
    # serial reference: one big block (chain is zero-initialized, same as
    # each shard's effective start state)
    _, serial = chain(chain.init_state(), jnp.asarray(iq))
    serial_bits = np.asarray(serial["bits"])

    mesh = make_mesh(n_dev, axis="t")
    fn = time_sharded_chain(chain, mesh, halo=halo, out_keys=("bits",),
                            axis="t")
    x = jax.device_put(jnp.asarray(iq), NamedSharding(mesh, P("t")))
    out = fn(x)
    sharded_bits = np.asarray(out["bits"])

    assert sharded_bits.shape == serial_bits.shape
    # contract: exact equality beyond the stream-head shard. Inside the
    # first shard a handful of bits may differ: the zero-state stream
    # head produces Viterbi path-metric ties at tile seams that resolve
    # differently under different fusion orders (float associativity) —
    # acquisition-region bits that framing discards anyway.
    per_shard = local // 250
    head, rest = sharded_bits[:per_shard], sharded_bits[per_shard:]
    np.testing.assert_array_equal(rest, serial_bits[per_shard:])
    head_mm = int(np.sum(head != serial_bits[:per_shard]))
    assert head_mm <= 16, f"{head_mm} head-shard mismatches"


def test_time_sharded_fir_matches_serial():
    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 devices")
    from qradiolink_tpu.ops import firdes
    from qradiolink_tpu.ops.fir import FirFilter
    taps = firdes.low_pass(1.0, 1e6, 100e3, 50e3)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n_dev * 8192).astype(np.float32)
    f = FirFilter(taps)
    _, serial = f(f.init_state(), jnp.asarray(x))
    mesh = make_mesh(n_dev, axis="t")
    fir = time_sharded_fir(np.asarray(taps), mesh, axis="t")
    y = np.asarray(fir(jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("t")))))
    np.testing.assert_allclose(y, np.asarray(serial), atol=1e-4)
