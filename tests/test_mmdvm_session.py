"""MMDVM as a first-class mode: toggle_rx_mode("MMDVM") drives the full
ZMQ transport loop through the RadioController session glue
(reference radiocontroller.cpp:1996-2003 + gr_mmdvm_sink/source)."""

import functools
import threading

import numpy as np
import jax.numpy as jnp
import pytest

zmq = pytest.importorskip("zmq")

from qradiolink_tpu.app.controller import RadioController
from qradiolink_tpu.config import Settings
from qradiolink_tpu.io.mmdvm_transport import (
    SAMPLES_PER_SLOT, pack_tx_message, unpack_rx_message)
from qradiolink_tpu.models.registry import MODES, get_mode


def test_mmdvm_modes_registered():
    for name in ("MMDVM", "MMDVMmulti"):
        spec = get_mode(name)
        assert spec.kind == "mmdvm"
        assert spec.rx_factory is not None and spec.tx_factory is not None
    # reference mode map radiocontroller.cpp:2111-2360 includes both
    assert "MMDVM" in MODES and "MMDVMmulti" in MODES


def test_mmdvm_session_full_loop(tmp_path, monkeypatch):
    from qradiolink_tpu.app import mmdvm_session as ms
    from qradiolink_tpu.chains.mmdvm import MmdvmMod, MmdvmDemod, TARGET_RATE

    rx_tpl = f"ipc://{tmp_path}/mmdvm-rx{{}}.ipc"
    tx_tpl = f"ipc://{tmp_path}/mmdvm-tx{{}}.ipc"
    orig = ms.MmdvmSession
    monkeypatch.setattr(
        ms, "MmdvmSession",
        functools.partial(orig, rx_path_tpl=rx_tpl, tx_path_tpl=tx_tpl,
                          timeout_ms=3000))

    ctl = RadioController(Settings(rx_mode="MMDVM", tx_mode="MMDVM"))
    ctl.toggle_rx_mode("MMDVM")
    ctl.toggle_tx_mode("MMDVM")
    assert ctl._mmdvm is not None and ctl._mmdvm.C == 1

    ctx = zmq.Context.instance()
    pull = ctx.socket(zmq.PULL)
    pull.setsockopt(zmq.RCVTIMEO, 60000)
    pull.connect(rx_tpl.format(1))
    rep = ctx.socket(zmq.REP)
    rep.bind(tx_tpl.format(1))

    def mmdvmhost():
        slots = []
        for _ in range(4):
            samples, ctrl, rssi = unpack_rx_message(pull.recv())
            slots.append(samples)
        served = 0
        while served < len(slots):
            rep.recv()
            rep.send(pack_tx_message(
                slots[served], np.zeros(SAMPLES_PER_SLOT, np.uint8)))
            served += 1

    th = threading.Thread(target=mmdvmhost, daemon=True)
    th.start()

    # RF in: FM tone on the MMDVM carrier, through the controller RX path
    n24 = SAMPLES_PER_SLOT * 8
    audio_t = np.arange(n24) / TARGET_RATE
    mod0 = MmdvmMod()
    _, m0 = mod0(mod0.init_state(), jnp.asarray(
        (0.15 * np.sin(2 * np.pi * 1000.0 * audio_t)).astype(np.float32)))
    iq_in = np.asarray(m0["iq"])
    m = len(iq_in) - len(iq_in) % 125
    ctl.rx_block(iq_in[:m])
    th.join(timeout=10)

    # TX side: controller polls MMDVMHost and modulates the bursts
    iq_out = ctl.mmdvm_tx_poll(SAMPLES_PER_SLOT * 4)
    assert iq_out is not None
    dem = MmdvmDemod()
    m2 = len(iq_out) - len(iq_out) % 125
    _, out2 = dem(dem.init_state(), jnp.asarray(iq_out[:m2]))
    rec = np.asarray(out2["audio"])[1000:]
    x = rec - rec.mean()
    sp = np.abs(np.fft.rfft(x * np.hanning(x.size))) ** 2
    f = np.fft.rfftfreq(x.size, 1 / TARGET_RATE)
    sig = sp[np.abs(f - 1000.0) < 150].sum()
    noise = sp[(np.abs(f - 1000.0) >= 150) & (f > 50) & (f < 4000)].sum()
    snr = 10 * np.log10(sig / (noise + 1e-12))
    assert snr > 20.0, f"controller MMDVM loop tone SNR {snr:.1f} dB"
    ctl._mmdvm.close()
    pull.close(0)
    rep.close(0)
