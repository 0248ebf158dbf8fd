"""Frozen-IQ regression: a committed 4FSK2K capture (own TX chain +
AWGN at -6 dB full-band, fixed seed, float16-quantized IQ) must keep
decoding cleanly on BOTH the feedback and feedforward demods.

This is the recorded-capture stand-in SURVEY §4.2 calls for (GNU Radio
is not in the image): unlike loopbacks that regenerate their stimulus,
this pins the exact sample stream, so any accidental change to
resampler phase, filter design, sync, or FEC behavior shows up as a
BER jump against bits that never change.
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.chains.fsk import Fsk4Demod, Fsk4DemodFF
from qradiolink_tpu.chains.digital_common import bytes_to_bits
from tests.test_chains_digital import best_ber

FIX = pathlib.Path(__file__).parent / "fixtures" / "iq_4fsk2k_-6db.npz"


@pytest.mark.parametrize("demod_cls", [Fsk4Demod, Fsk4DemodFF])
def test_frozen_capture_decodes(demod_cls):
    data = np.load(FIX)
    iq = (data["iq_re"].astype(np.float32)
          + 1j * data["iq_im"].astype(np.float32)).astype(np.complex64)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data["payload"])))
    dem = demod_cls()
    m = len(iq) - len(iq) % 2000
    _, out = dem(dem.init_state(), jnp.asarray(iq[:m]))
    ber = best_ber(out["bits"], sent)
    assert ber < 0.01, f"{demod_cls.__name__} frozen-capture BER {ber}"
