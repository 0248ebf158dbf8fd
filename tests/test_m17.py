"""M17 protocol stack tests: callsign codec, Golay(24,12), conv/puncture/
interleave round trips, LSF and stream frame encode->decode, LICH
reassembly, and error-correction behavior."""

import numpy as np
import pytest

from qradiolink_tpu.protocols import m17
from qradiolink_tpu.protocols.m17 import (
    LinkSetupFrame, FrameEncoder, FrameDecoder,
    encode_callsign, decode_callsign, golay24_encode, golay24_decode,
    conv_encode_bits, puncture_bits, depuncture_bits,
    interleave_bits, deinterleave_bits, decorrelate_bits,
    viterbi_decode_bits, decode_lich,
)


def test_callsign_roundtrip():
    for cs in ["AB1CDE", "N0CALL", "SP5WWP", "M17-1/P", "A.B-9"]:
        assert decode_callsign(encode_callsign(cs)) == cs


def test_callsign_special():
    assert decode_callsign(b"\xFF" * 6) == "BROADCAST"
    assert decode_callsign(b"\x00\x00\x00\x0E\xD8\x7D") == "ECHO"
    assert decode_callsign(b"\x00\x00\x45\x4F\x77\x45") == "UNLINK"


def test_callsign_too_long():
    with pytest.raises(ValueError):
        encode_callsign("ABCDEFGHIJ")


def test_golay_roundtrip_and_correction():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 4096, size=200).astype(np.uint32)
    cw = golay24_encode(data)
    dec, ok = golay24_decode(cw)
    assert np.all(ok) and np.array_equal(dec, data)
    # flip up to 3 random bits per codeword: all must correct
    for nerr in (1, 2, 3):
        bits = rng.integers(0, 24, size=(len(cw), nerr))
        corrupted = cw.copy()
        for i in range(len(cw)):
            for b in set(bits[i].tolist()):
                corrupted[i] ^= np.uint32(1 << b)
        dec, ok = golay24_decode(corrupted)
        assert np.all(ok), f"{nerr} errors not corrected"
        assert np.array_equal(dec, data)


def test_golay_matches_generator_structure():
    # codeword = (data << 12) | parity; single data bit i's parity must be
    # the M17 encode_matrix row (spec constant), and the code must be
    # closed under XOR (linearity)
    a = golay24_encode(np.uint32(1))
    assert a & 0xFFF == 0x8EB  # encode_matrix[0] (M17 spec constant)
    b = golay24_encode(np.uint32(1 << 11))
    assert b & 0xFFF == 0xC75  # encode_matrix[11] == generator 0xC75
    x, y = np.uint32(0x123), np.uint32(0xABC)
    assert golay24_encode(x ^ y) == golay24_encode(x) ^ golay24_encode(y)


def test_conv_encode_flush_length():
    bits = np.zeros(240, np.uint8)
    assert conv_encode_bits(bits).shape == (488,)


def test_viterbi_clean_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 240).astype(np.uint8)
    coded = conv_encode_bits(bits)
    dec = viterbi_decode_bits(coded)
    assert np.array_equal(dec[:240], bits)


def test_viterbi_corrects_errors():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 240).astype(np.uint8)
    coded = conv_encode_bits(bits)
    # 2% bit errors, spread out (K=5 free distance 8: corrects sparse
    # errors; the reference uses the same hard-decision decoder)
    errs = rng.random(coded.shape) < 0.02
    dec = viterbi_decode_bits(coded ^ errs.astype(np.uint8))
    assert np.array_equal(dec[:240], bits)


def test_puncture_depuncture():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 488).astype(np.uint8)
    p = puncture_bits(bits, m17.LSF_PUNCTURE)
    assert p.shape == (368,)
    d = depuncture_bits(p, m17.LSF_PUNCTURE, 488)
    mask = np.tile(m17.LSF_PUNCTURE.astype(bool), 8)[:488]
    assert np.array_equal(d[mask], bits[mask])


def test_interleave_roundtrip():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 368).astype(np.uint8)
    assert np.array_equal(deinterleave_bits(interleave_bits(bits)), bits)
    assert np.array_equal(
        decorrelate_bits(decorrelate_bits(bits)), bits)


def test_lsf_crc_and_fields():
    lsf = LinkSetupFrame.for_stream("SP5WWP", "AB1CDE", can=7)
    data = lsf.to_bytes()
    assert len(data) == 30
    assert lsf.valid(data)
    back = LinkSetupFrame.from_bytes(data)
    assert back.source == "SP5WWP"
    assert back.destination == "AB1CDE"
    assert back.can == 7


def test_lich_segment_roundtrip():
    lsf = LinkSetupFrame.for_stream("N0CALL", "ALL")
    raw = lsf.to_bytes()
    for num in range(6):
        lich = lsf.lich_segment(num)
        assert lich.shape == (12,)
        seg, n, ok = decode_lich(lich)
        assert ok and n == num
        assert bytes(seg) == raw[num * 5: num * 5 + 5]


def test_lsf_frame_roundtrip():
    lsf = LinkSetupFrame.for_stream("SP5WWP", "AB1CDE", can=3)
    enc = FrameEncoder(lsf)
    frame = enc.encode_lsf()
    assert frame.shape == (384,)
    dec = FrameDecoder()
    out = dec.decode_lsf(frame[16:])
    assert out is not None
    assert out.source == "SP5WWP" and out.destination == "AB1CDE"
    assert out.can == 3


def test_lsf_frame_with_bit_errors():
    lsf = LinkSetupFrame.for_stream("N0CALL", "")
    enc = FrameEncoder(lsf)
    frame = enc.encode_lsf()
    rng = np.random.default_rng(5)
    idx = rng.choice(368, size=4, replace=False) + 16
    frame = frame.copy()
    frame[idx] ^= 1
    out = FrameDecoder().decode_lsf(frame[16:])
    assert out is not None and out.source == "N0CALL"


def test_stream_frames_and_lich_reassembly():
    lsf = LinkSetupFrame.for_stream("SP5WWP", "AB1CDE", can=1)
    enc = FrameEncoder(lsf)
    dec = FrameDecoder()
    payloads = [bytes([i] * 16) for i in range(8)]
    for i, p in enumerate(payloads):
        fbits = enc.encode_stream(p, last=(i == len(payloads) - 1))
        assert fbits.shape == (384,)
        sf = dec.decode_stream(fbits[16:])
        assert sf.payload == p
        assert sf.frame_number == i
        assert sf.last == (i == len(payloads) - 1)
    # after 6+ stream frames the LSF must be reassembled from LICH
    assert dec.lsf_valid
    assert dec.lsf.source == "SP5WWP"
    assert dec.lsf.destination == "AB1CDE"


def test_stream_frame_with_errors():
    lsf = LinkSetupFrame.for_stream("N0CALL", "")
    enc = FrameEncoder(lsf)
    dec = FrameDecoder()
    rng = np.random.default_rng(6)
    payload = bytes(rng.integers(0, 256, 16, dtype=np.uint8).tolist())
    fbits = enc.encode_stream(payload).copy()
    idx = rng.choice(368, size=6, replace=False) + 16
    fbits[idx] ^= 1
    sf = dec.decode_stream(fbits[16:])
    assert sf.payload == payload


def test_m17_chain_end_to_end():
    """Full M17 over-the-air loopback: protocol frames -> M17Mod -> AWGN
    channel -> M17Demod -> layer1 Deframer sync hunt -> FrameDecoder.

    Mirrors the reference's full path: M17Transmitter frame build ->
    gr_mod_m17 -> air -> gr_demod_m17 -> gr_modem findSync M17 branch ->
    M17FrameDecoder (reference src/gr/gr_mod_m17.cpp:30-85,
    gr_demod_m17.cpp:32-105, gr_modem.cpp:1187-1210)."""
    import jax.numpy as jnp
    from qradiolink_tpu.chains.m17 import M17Mod, M17Demod
    from qradiolink_tpu.chains.channel import ChannelModel
    from qradiolink_tpu.framing.layer1 import Deframer, FrameType

    lsf = LinkSetupFrame.for_stream("SP5WWP", "AB1CDE", can=3)
    enc = FrameEncoder(lsf)
    frames = [enc.encode_preamble(), enc.encode_lsf()]
    payloads = [bytes([i] * 16) for i in range(6)]
    for i, p in enumerate(payloads):
        frames.append(enc.encode_stream(p, last=(i == 5)))
    bits = np.concatenate(frames + [np.zeros(2000, np.uint8)])
    bits = np.concatenate([bits, np.zeros((-len(bits)) % 48, np.uint8)])

    m17m, m17d = M17Mod(), M17Demod()
    _, tx = m17m(m17m.init_state(), jnp.asarray(bits))
    iq = tx["iq"]
    trim = iq.shape[-1] % 625
    if trim:
        iq = iq[..., :iq.shape[-1] - trim]
    rx = ChannelModel(1_000_000, snr_db=20.0)(iq)
    _, out = m17d(m17d.init_state(), rx)
    rx_bits = np.asarray(out["bits"])

    defr = Deframer("M17")
    hits = defr.process(rx_bits)
    dec = FrameDecoder()
    got_lsf = None
    got_payloads = []
    for ftype, fb in hits:
        fbits = np.unpackbits(np.frombuffer(fb, np.uint8))
        if ftype == FrameType.M17_LSF:
            got_lsf = dec.decode_lsf(fbits)
        elif ftype == FrameType.M17_STREAM:
            got_payloads.append(dec.decode_stream(fbits).payload)
    assert got_lsf is not None
    assert got_lsf.source == "SP5WWP" and got_lsf.destination == "AB1CDE"
    assert sum(p in payloads for p in got_payloads) == 6


def _m17_rf_roundtrip(snr_db, freq_offset_hz, gain=1.0, n_payloads=6,
                      min_ok=None):
    """TX a full M17 stream, run it through an impaired channel, and
    count recovered voice payloads."""
    import jax.numpy as jnp
    from qradiolink_tpu.chains.m17 import M17Mod, M17Demod
    from qradiolink_tpu.chains.channel import ChannelModel
    from qradiolink_tpu.framing.layer1 import Deframer, FrameType

    lsf = LinkSetupFrame.for_stream("SP5WWP", "AB1CDE", can=3)
    enc = FrameEncoder(lsf)
    frames = [enc.encode_preamble(), enc.encode_preamble(),
              enc.encode_lsf()]
    payloads = [bytes([17 * i % 251] * 16) for i in range(n_payloads)]
    for i, p in enumerate(payloads):
        frames.append(enc.encode_stream(p, last=(i == n_payloads - 1)))
    bits = np.concatenate(frames + [np.zeros(2000, np.uint8)])
    bits = np.concatenate([bits, np.zeros((-len(bits)) % 48, np.uint8)])

    m17m, m17d = M17Mod(), M17Demod()
    _, tx = m17m(m17m.init_state(), jnp.asarray(bits))
    iq = tx["iq"]
    trim = iq.shape[-1] % 625
    if trim:
        iq = iq[..., :iq.shape[-1] - trim]
    rx = ChannelModel(1_000_000, snr_db=snr_db,
                      freq_offset_hz=freq_offset_hz, gain=gain, seed=11)(iq)
    _, out = m17d(m17d.init_state(), rx)
    defr = Deframer("M17")
    hits = defr.process(np.asarray(out["bits"]))
    dec = FrameDecoder()
    got_lsf, ok = None, 0
    for ftype, fb in hits:
        fbits = np.unpackbits(np.frombuffer(fb, np.uint8))
        if ftype == FrameType.M17_LSF:
            got_lsf = dec.decode_lsf(fbits)
        elif ftype == FrameType.M17_STREAM:
            if dec.decode_stream(fbits).payload in payloads:
                ok += 1
    # late entry: when the LSF frame itself was lost in acquisition,
    # the LSF reassembles from the stream frames' LICH chunks (the M17
    # spec's late-entry path; FrameDecoder.decode_stream)
    if got_lsf is None and dec.lsf_valid:
        got_lsf = dec.lsf
    return got_lsf, ok


def test_m17_end_to_end_10db():
    """Round-1 done-bar: voice-frame recovery at 10 dB SNR; the LSF
    arrives via LICH late entry when the header frame is lost during
    loop acquisition."""
    lsf, ok = _m17_rf_roundtrip(10.0, 0.0)
    assert ok >= 5, f"only {ok}/6 payloads at 10 dB"
    assert lsf is not None and lsf.source == "SP5WWP"


def test_m17_end_to_end_freq_offset():
    """Carrier offset within the FM discriminator's tolerance (the
    reference tolerates real channels; 150 Hz at 4800 sym/s)."""
    lsf, ok = _m17_rf_roundtrip(12.0, 150.0)
    assert ok >= 5, f"only {ok}/6 payloads with 150 Hz offset"


def test_m17_end_to_end_level_mismatch():
    """0.3x input level: symbol slicing must survive via the chain's
    gain control rather than fixed thresholds."""
    lsf, ok = _m17_rf_roundtrip(15.0, 0.0, gain=0.3)
    assert ok >= 5, f"only {ok}/6 payloads at 0.3x level"


def test_m17_feedforward_demod_loopback(rng):
    """M17DemodFF (TPU path) decodes an M17Mod stream at 12 dB."""
    import numpy as np
    import jax.numpy as jnp
    from qradiolink_tpu.chains.m17 import M17Mod, M17DemodFF
    from qradiolink_tpu.chains.channel import ChannelModel

    bits = rng.integers(0, 2, 4800).astype(np.uint8)
    tx = M17Mod()
    _, out = tx(tx.init_state(), jnp.asarray(bits))
    iq = np.asarray(out["iq"])
    iq = iq[: len(iq) - len(iq) % 2500]
    rx_iq = ChannelModel(1_000_000, snr_db=12.0)(jnp.asarray(iq))
    dem = M17DemodFF()
    _, o = dem(dem.init_state(), rx_iq)
    got = np.asarray(o["bits"]).ravel()
    n = len(bits)
    lo, hi = n // 2, 7 * n // 8
    best = 1.0
    for off in range(0, 200):
        if off + hi > len(got):
            break
        best = min(best, float(np.mean(got[off + lo: off + hi]
                                       != bits[lo:hi])))
    assert best <= 0.01, f"FF M17 BER {best:.3f}"
