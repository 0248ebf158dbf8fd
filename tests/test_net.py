"""IP-over-radio: frame codec, data-modem flow control, and packet
round-trips over the QPSK250K / 4FSK100K modem loopbacks (reference
src/net/netdevice.cpp, src/radiocontroller.cpp:745-824,1260-1290,
1669-1704)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.net import (
    LoopbackNetDevice, NetPump, ip_frame_decode, ip_frame_encode,
    IP_MODE_PARAMS)
from qradiolink_tpu.net.netdev import idle_frame
from qradiolink_tpu.app.controller import RadioController
from qradiolink_tpu.config import Settings


def test_ip_frame_roundtrip_and_majority_vote():
    payload = bytes(np.random.default_rng(0).integers(0, 256, 900,
                                                      dtype=np.uint8))
    frame = ip_frame_encode(payload, 1516)
    assert len(frame) == 1516
    assert ip_frame_decode(frame) == payload
    # one corrupted length copy survives the majority vote
    bad = bytearray(frame)
    bad[0] ^= 0xFF
    assert ip_frame_decode(bytes(bad)) == payload
    # corrupted payload fails CRC
    bad = bytearray(frame)
    bad[100] ^= 0xFF
    assert ip_frame_decode(bytes(bad)) is None
    # idle frame decodes to None
    assert ip_frame_decode(idle_frame(1516)) is None


def test_net_pump_flow_control():
    dev = LoopbackNetDevice()
    pump = NetPump(dev, "QPSK250K")
    # no data -> idle frames keep the modem fed
    f = pump.poll_tx(0.05)
    assert f is not None and ip_frame_decode(f) is None
    dev.inject(b"\x45" + b"\x00" * 99)
    f = pump.poll_tx(0.05)
    assert ip_frame_decode(f) == b"\x45" + b"\x00" * 99
    # after 300 s of TX the modem resets for 2 s
    for _ in range(int(300 / 0.05) + 2):
        pump.poll_tx(0.05)
    assert pump.resets == 1
    assert pump.poll_tx(0.05) is None          # sleeping
    for _ in range(int(2 / 0.05) + 1):
        pump.poll_tx(0.05)
    assert pump.poll_tx(0.05) is not None      # awake again


def test_burst_mode_sends_nothing_when_idle():
    pump = NetPump(LoopbackNetDevice(), "4FSK100K", burst_mode=True)
    assert pump.poll_tx(0.05) is None


@pytest.mark.parametrize("mode,n_payloads", [("QPSK250K", 3),
                                             ("4FSK100K", 2)])
def test_ip_over_radio_loopback(mode, n_payloads):
    """TAP -> pump -> layer1 IP frames -> modem TX -> RX chain ->
    deframer -> pump -> TAP, flow control engaged."""
    rng = np.random.default_rng(3)
    read_size = IP_MODE_PARAMS[mode][1]
    payloads = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
                for n in (120, read_size, 64)][:n_payloads]

    tx_dev, rx_dev = LoopbackNetDevice(), LoopbackNetDevice()
    tx_pump = NetPump(tx_dev, mode, burst_mode=True)
    rx_pump = NetPump(rx_dev, mode)
    for p in payloads:
        tx_dev.inject(p)

    s = Settings()
    s.tx_mode = s.rx_mode = mode
    ctl = RadioController(s)
    ctl.start_transmission()
    iq_parts = []
    # preamble so the RX loops lock before the first frame
    iq_parts.append(ctl.tx_bytes(b"\xaa" * (3000 if mode == "QPSK250K"
                                            else 1200)))
    for _ in range(n_payloads):
        iq = ctl.tx_net_poll(tx_pump, 0.05)
        assert iq is not None
        iq_parts.append(iq)
    iq_parts.append(ctl.tx_bytes(b"\xaa" * 2000))
    iq = np.concatenate(iq_parts)

    rx = RadioController(s)
    rx.attach_net(rx_pump)
    rx.toggle_rx_mode(mode)
    from qradiolink_tpu.models.registry import get_mode
    block = 50_000
    m = len(iq) - len(iq) % block
    events = []
    for i in range(0, m, block):
        events.extend(rx.rx_block(jnp.asarray(iq[i:i + block])))
    got = rx_dev.delivered()
    assert got == payloads, (
        f"{mode}: delivered {[len(g) for g in got]} "
        f"wanted {[len(p) for p in payloads]}")
