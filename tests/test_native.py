"""Native C++ host-IO engine: sample conversion parity, lock-free ring
buffer, and the background UDP receiver (qradiolink_tpu/native/
qrl_native.cpp — the VOLK/gr_buffer/network-thread roles of the
reference's C++ runtime at the host boundary)."""

import socket
import time

import numpy as np
import pytest

from qradiolink_tpu.io import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C++ toolchain")


def test_conversion_parity_with_numpy():
    rng = np.random.default_rng(0)
    s16 = rng.integers(-32767, 32768, 10_000).astype(np.int16)
    np.testing.assert_allclose(native.cs16_to_f32(s16),
                               s16.astype(np.float32) / 32767.0,
                               rtol=0, atol=1e-7)
    f = rng.uniform(-1.2, 1.2, 10_000).astype(np.float32)
    want = np.round(np.clip(f * 32767.0, -32767, 32767)).astype(np.int16)
    # C rounds half away from zero, numpy half-to-even: +-1 LSB at ties
    got = native.f32_to_cs16(f).astype(np.int32)
    assert np.abs(got - want.astype(np.int32)).max() <= 1
    u8 = rng.integers(0, 256, 10_000).astype(np.uint8)
    np.testing.assert_allclose(native.cu8_to_f32(u8),
                               (u8.astype(np.float32) - 127.5) / 127.5,
                               rtol=0, atol=1e-7)
    want8 = np.round(np.clip(f * 127.5 + 127.5, 0, 255)).astype(np.uint8)
    got8 = native.f32_to_cu8(f).astype(np.int32)
    assert np.abs(got8 - want8.astype(np.int32)).max() <= 1


def test_iq_codec_uses_native_and_roundtrips():
    from qradiolink_tpu.io.iq import _decode, _encode
    rng = np.random.default_rng(1)
    x = (rng.uniform(-0.9, 0.9, 2000)
         + 1j * rng.uniform(-0.9, 0.9, 2000)).astype(np.complex64)
    for fmt, tol in (("cs16", 1e-4), ("cu8", 1e-2)):
        y = _decode(_encode(x, fmt), fmt)
        np.testing.assert_allclose(y, x, atol=tol)


def test_ring_buffer_wrap_and_backpressure():
    r = native.RingBuffer(256)       # rounded to a power of two
    data = bytes(range(200))
    assert r.write(data) == 200
    assert r.read(200) == data
    # wraparound across the boundary
    assert r.write(data) == 200
    assert r.read(100) == data[:100]
    assert r.write(data) == 156      # only free space accepted
    got = r.read(1000)
    assert got == data[100:] + data[:156]
    r.close()


def test_ring_buffer_threaded_spsc():
    import threading
    r = native.RingBuffer(1 << 16)
    total = 2_000_000
    src = np.random.default_rng(2).integers(0, 256, total,
                                            dtype=np.uint8).tobytes()

    def producer():
        pos = 0
        while pos < total:
            pos += r.write(src[pos:pos + 4096])

    t = threading.Thread(target=producer)
    t.start()
    out = bytearray()
    deadline = time.time() + 20
    while len(out) < total and time.time() < deadline:
        out += r.read(8192)
    t.join(timeout=5)
    assert bytes(out) == src
    r.close()


def test_udp_rx_engine():
    eng = native.UdpRxEngine(port=0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    payload = bytes(range(256)) * 4
    for _ in range(10):
        tx.sendto(payload, ("127.0.0.1", eng.port))
    deadline = time.time() + 5
    got = bytearray()
    while len(got) < 10 * len(payload) and time.time() < deadline:
        got += eng.read(65536)
        time.sleep(0.01)
    assert eng.datagrams == 10 and eng.dropped == 0
    assert bytes(got) == payload * 10
    eng.close()
    tx.close()


def test_udp_tx_engine_paced_egress():
    """Native paced UDP sender: chunks written to the ring arrive as
    datagrams at the configured cadence (the timed-egress role of the
    reference's UDP audio/sample sinks)."""
    import socket
    import time
    from qradiolink_tpu.io.native import UdpTxEngine, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]

    chunk = 512
    tx = UdpTxEngine("127.0.0.1", port, chunk_bytes=chunk,
                     ns_per_chunk=2_000_000)  # 500 datagrams/s
    try:
        payload = bytes(range(256)) * 2  # 512 bytes
        for _ in range(10):
            assert tx.write(payload) == chunk
        got = []
        t0 = time.time()
        while len(got) < 10 and time.time() - t0 < 2.0:
            got.append(rx.recvfrom(65536)[0])
        assert len(got) == 10
        assert all(g == payload for g in got)
        assert tx.datagrams >= 10
        # 10 datagrams at 2 ms cadence should take >= ~16 ms (paced,
        # not a burst); allow slack for scheduler jitter
        assert time.time() - t0 >= 0.014
    finally:
        tx.close()
        rx.close()
