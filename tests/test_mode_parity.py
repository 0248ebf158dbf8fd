"""Mode-table parity vs the reference gr_modem_types enum.

Extracts every ModemType* entry from /root/reference/src/modem_types.h
and asserts the registry covers each one via MODEM_TYPE_MAP, that every
mapped mode exists and constructs, plus loopback smoke for the modes
added in round 5 (GMSK10K, 2FSK1KFB).
"""

import pathlib
import re

import numpy as np
import pytest

from qradiolink_tpu.models import registry

pytestmark = pytest.mark.fast

REF = pathlib.Path("/root/reference/src/modem_types.h")


def _reference_modem_types():
    text = REF.read_text()
    body = text.split("namespace gr_modem_types")[1]
    body = body.split("}")[0]
    return re.findall(r"\b(ModemType\w+)\b", body)


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_every_reference_modem_type_is_mapped():
    ref_types = _reference_modem_types()
    assert len(ref_types) == 42, ref_types
    missing = [t for t in ref_types if t not in registry.MODEM_TYPE_MAP]
    assert not missing, f"unmapped reference modem types: {missing}"
    extra = [t for t in registry.MODEM_TYPE_MAP if t not in ref_types]
    assert not extra, f"stale map entries: {extra}"
    for t, mode in registry.MODEM_TYPE_MAP.items():
        assert mode in registry.MODES, f"{t} -> {mode} not in registry"


def test_mapped_modes_construct():
    """Every mapped digital mode's RX and TX factories build."""
    for mode in sorted(set(registry.MODEM_TYPE_MAP.values())):
        spec = registry.get_mode(mode)
        if mode.startswith("FreeDV"):
            continue  # vocoder-backed; covered by test_freedv
        if spec.rx_factory is not None:
            spec.rx_factory()
        if spec.tx_factory is not None:
            spec.tx_factory()


@pytest.mark.parametrize("mode,nbytes,snr", [("GMSK10K", 2500, 14.0),
                                             ("2FSK1KFB", 300, 14.0)])
def test_new_mode_loopback(mode, nbytes, snr):
    import jax.numpy as jnp
    from qradiolink_tpu.chains.channel import ChannelModel
    from qradiolink_tpu.chains.digital_common import bytes_to_bits
    from tests.test_chains_digital import best_ber

    rng = np.random.default_rng(3)
    tx = registry.tx_chain(mode)
    rx = registry.rx_chain(mode)
    data = rng.integers(0, 256, nbytes).astype(np.uint8)
    _, out = tx(tx.init_state(), jnp.asarray(data))
    chan = ChannelModel(1_000_000, snr_db=snr)
    rx_iq = chan(out["iq"])
    _, rout = rx(rx.init_state(), rx_iq)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = best_ber(rout["bits"], sent)
    if "bits_alt" in rout:
        ber = min(ber, best_ber(rout["bits_alt"], sent))
    assert ber < 0.02, f"{mode} loopback BER {ber}"
