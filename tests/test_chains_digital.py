"""Loopback BER tests for the digital chains: bytes -> TX -> channel -> RX
-> bits; align and measure BER (the reference's over-the-air verification,
done as the SURVEY §4 test plan prescribes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.chains.fsk import Fsk4Mod, Fsk4Demod, Fsk2Mod, Fsk2Demod
from qradiolink_tpu.chains.psk import BpskMod, BpskDemod, QpskMod, QpskDemod
from qradiolink_tpu.chains.channel import ChannelModel
from qradiolink_tpu.chains.digital_common import bytes_to_bits


def best_ber(decoded, sent_bits, max_offset=400):
    """Min BER over bit alignments, measured on the steady-state segment
    [n/2, 7n/8) — past loop acquisition, as over-the-air operation in the
    reference is (frames are preceded by preamble frames; decode starts at
    a sync word found after the loops lock)."""
    sent = np.asarray(sent_bits)
    dec = np.asarray(decoded)
    n = len(sent)
    lo, hi = n // 2, (7 * n) // 8
    seg_sent = sent[lo:hi]
    best = 1.0
    for off in range(0, max_offset):
        seg_dec = dec[off + lo: off + hi]
        if len(seg_dec) < len(seg_sent):
            break
        ber = np.mean(seg_dec != seg_sent)
        best = min(best, ber)
    return best


def loopback(mod, demod, n_bytes, snr_db, seed=7, freq_offset=0.0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, n_bytes).astype(np.uint8)
    _, tx = mod(mod.init_state(), jnp.asarray(data))
    iq = tx["iq"]
    chan = ChannelModel(1_000_000, snr_db=snr_db, freq_offset_hz=freq_offset)
    rx_iq = chan(iq)
    _, out = demod(demod.init_state(), rx_iq)
    return data, out


def test_fsk4_clean_loopback():
    data, out = loopback(Fsk4Mod(), Fsk4Demod(), n_bytes=250, snr_db=None)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = best_ber(out["bits"], sent)
    assert ber < 0.01, f"4FSK clean BER {ber}"


def test_fsk4_awgn_loopback():
    data, out = loopback(Fsk4Mod(), Fsk4Demod(), n_bytes=250, snr_db=12.0)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = best_ber(out["bits"], sent)
    assert ber < 0.02, f"4FSK 12dB BER {ber}"


def test_fsk4_symbols_are_4_level():
    data, out = loopback(Fsk4Mod(), Fsk4Demod(), n_bytes=250, snr_db=None)
    syms = np.asarray(out["symbols"])[500:]
    # symbols should cluster near the 4 levels
    dists = np.min(np.abs(syms[:, None] - np.array([-1.5, -0.5, 0.5, 1.5])), axis=1)
    assert np.median(dists) < 0.3


def test_bpsk_clean_loopback():
    data, out = loopback(BpskMod(), BpskDemod(), n_bytes=250, snr_db=None)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = min(best_ber(out["bits"], sent), best_ber(out["bits_alt"], sent))
    assert ber < 0.01, f"BPSK clean BER {ber}"


def test_bpsk_awgn_loopback():
    data, out = loopback(BpskMod(), BpskDemod(), n_bytes=250, snr_db=10.0)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = min(best_ber(out["bits"], sent), best_ber(out["bits_alt"], sent))
    assert ber < 0.02, f"BPSK 10dB BER {ber}"


def test_qpsk_clean_loopback():
    data, out = loopback(QpskMod(), QpskDemod(), n_bytes=1250, snr_db=None)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = best_ber(out["bits"], sent)
    assert ber < 0.01, f"QPSK clean BER {ber}"


def test_fsk2_clean_loopback():
    data, out = loopback(Fsk2Mod(), Fsk2Demod(), n_bytes=125, snr_db=None)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = min(best_ber(out["bits"], sent), best_ber(out["bits_alt"], sent))
    assert ber < 0.01, f"2FSK clean BER {ber}"


def test_fsk4_ff_clean_loopback():
    """TPU-path 4FSK chain (feedforward sync + tiled Viterbi): clean BER.

    This is the benched chain (bench.py) — its correctness must be proven
    by the same loopback the feedback chain passes."""
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    data, out = loopback(Fsk4Mod(), Fsk4DemodFF(), n_bytes=250, snr_db=None)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = best_ber(out["bits"], sent)
    assert ber < 0.01, f"4FSK FF clean BER {ber}"


def test_fsk4_ff_awgn_loopback():
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    data, out = loopback(Fsk4Mod(), Fsk4DemodFF(), n_bytes=250, snr_db=12.0)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = best_ber(out["bits"], sent)
    assert ber < 0.02, f"4FSK FF 12dB BER {ber}"


def test_gmsk_clean_loopback():
    from qradiolink_tpu.chains.fsk import GmskMod, GmskDemod
    data, out = loopback(GmskMod(symbol_rate=2000),
                         GmskDemod(symbol_rate=2000), n_bytes=250,
                         snr_db=None)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = min(best_ber(out["bits"], sent), best_ber(out["bits_alt"], sent))
    assert ber < 0.01, f"GMSK clean BER {ber}"


def test_gmsk_awgn_loopback():
    from qradiolink_tpu.chains.fsk import GmskMod, GmskDemod
    data, out = loopback(GmskMod(symbol_rate=2000),
                         GmskDemod(symbol_rate=2000), n_bytes=250,
                         snr_db=12.0)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = min(best_ber(out["bits"], sent), best_ber(out["bits_alt"], sent))
    assert ber < 0.02, f"GMSK 12dB BER {ber}"


def test_full_chain_block_size_invariance():
    """A whole digital RX chain streamed in 2 blocks equals one big
    block — the scheduler-correctness property at CHAIN level (VERDICT
    r1 flagged that only primitives were covered)."""
    from qradiolink_tpu.chains.fsk import Fsk4Mod, Fsk4Demod
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 250).astype(np.uint8)
    mod = Fsk4Mod()
    _, tx = mod(mod.init_state(), jnp.asarray(data))
    iq = np.asarray(tx["iq"])
    m = len(iq) - len(iq) % 5000
    iq = iq[:m]
    dem = Fsk4Demod()
    _, full = dem(dem.init_state(), jnp.asarray(iq))
    st = dem.init_state()
    st, o1 = dem(st, jnp.asarray(iq[: m // 2]))
    _, o2 = dem(st, jnp.asarray(iq[m // 2:]))
    split_bits = np.concatenate(
        [np.asarray(o1["bits"]), np.asarray(o2["bits"])])
    np.testing.assert_array_equal(split_bits, np.asarray(full["bits"]))
    split_syms = np.concatenate(
        [np.asarray(o1["symbols"]), np.asarray(o2["symbols"])])
    # overlap-save FFT FIR block sizes depend on input length, so float
    # rounding differs at the ~1e-3 level; the hard bits must be exact
    np.testing.assert_allclose(split_syms, np.asarray(full["symbols"]),
                               atol=1e-2)
