"""Native FLAC encoder (audio/flac.py) + recorder FLAC format.

Round-trip and structural checks: sync codes, CRC-8/CRC-16 validity,
CONSTANT-subframe silence coding, bit-exact sample recovery. (The image
has no libFLAC to cross-check against; the reader is implemented
independently from the spec's reader-side description.)
"""

import numpy as np
import pytest

from qradiolink_tpu.audio.flac import (_crc8, _crc16, read_flac, write_flac)
from qradiolink_tpu.audio.recorder import AudioRecorder

pytestmark = pytest.mark.fast


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 check words
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_flac_round_trip(tmp_path, rng):
    x = (rng.standard_normal(10_000) * 8000).astype(np.int16)
    p = tmp_path / "t.flac"
    write_flac(p, x, 8000)
    y, rate = read_flac(p)
    assert rate == 8000
    np.testing.assert_array_equal(y, x)


def test_flac_silence_uses_constant_subframes(tmp_path):
    x = np.zeros(8192, np.int16)
    p = tmp_path / "s.flac"
    write_flac(p, x, 8000)
    y, _ = read_flac(p)
    np.testing.assert_array_equal(y, x)
    # constant coding: two 4096 frames of silence stay tiny
    assert p.stat().st_size < 200


def test_flac_partial_last_block(tmp_path, rng):
    x = (rng.standard_normal(5000) * 1000).astype(np.int16)
    p = tmp_path / "p.flac"
    write_flac(p, x, 8000)
    y, _ = read_flac(p)
    np.testing.assert_array_equal(y, x)


def test_flac_stream_marker_and_crcs(tmp_path, rng):
    x = (rng.standard_normal(4096) * 500).astype(np.int16)
    p = tmp_path / "c.flac"
    write_flac(p, x, 8000)
    data = p.read_bytes()
    assert data[:4] == b"fLaC"
    # first frame starts after the 4+4+34 byte STREAMINFO block
    fpos = 4 + 4 + 34
    assert data[fpos] == 0xFF and (data[fpos + 1] & 0xFC) == 0xF8
    # frame CRC-16 (over everything incl. trailer) == 0
    assert _crc16(data[fpos:]) == 0


def test_recorder_flac_format(tmp_path, rng):
    rec = AudioRecorder(tmp_path, rate=8000, fmt="flac")
    path = rec.start("take1")
    assert path.suffix == ".flac"
    a = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    rec.write(a)
    rec.write(a)
    out = rec.stop()
    y, rate = read_flac(out)
    assert rate == 8000 and y.size == 6000
    ref = np.clip(a * 32767.0, -32767, 32767).astype(np.int16)
    np.testing.assert_array_equal(y[:3000], ref)


def test_recorder_wav_still_works(tmp_path, rng):
    rec = AudioRecorder(tmp_path, rate=8000, fmt="wav")
    rec.start("w")
    rec.write((rng.standard_normal(1000) * 0.1).astype(np.float32))
    out = rec.stop()
    import wave
    with wave.open(str(out)) as w:
        assert w.getnframes() == 1000
