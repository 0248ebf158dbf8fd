"""Band-plan limits + GPredict Doppler protocol (reference
src/limits.cpp, src/gpredictcontrol.cpp)."""

import socket

from qradiolink_tpu.app.limits import check_limit, get_rfe_band
from qradiolink_tpu.app.gpredict import (
    GPredictControl, GPredictServer, OFFSET_RX, TUNE_RX)
from qradiolink_tpu.app.controller import RadioController
from qradiolink_tpu.config import Settings


def test_band_limits():
    assert check_limit(145_500_000)
    assert check_limit(433_500_000)
    assert check_limit(14_200_000)
    assert not check_limit(100_000_000)     # FM broadcast
    assert not check_limit(146_500_000)     # just above 2m (region 1)
    assert not check_limit(1_000_000)
    assert get_rfe_band(145_000_000) == 2
    assert get_rfe_band(170_000_000) == -1


def test_gpredict_doppler_classification():
    s = Settings()
    s.rx_frequency = 435_000_000
    s.demod_offset = 0
    gp = GPredictControl(s)
    # small Doppler delta -> carrier offset correction
    reply, act = gp.process_messages("F 435003000\n")
    assert reply == "RPRT 0\n"
    assert act.action == OFFSET_RX and act.rx_freq_delta == 3_000
    # report commands
    reply, _ = gp.process_messages("f\n")
    assert reply.startswith("f: 435000000")
    # big jump -> retune
    reply, act = gp.process_messages("F 437500000\n")
    assert act.action == TUNE_RX and act.rx_freq == 437_500_000


def test_gpredict_server_applies_offsets():
    s = Settings()
    s.rx_frequency = 435_000_000
    ctl = RadioController(s)
    srv = GPredictServer(ctl, port=0)
    srv.start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=5) as c:
            f = c.makefile("rwb")
            f.write(b"F 435004000\n"); f.flush()
            assert f.readline() == b"RPRT 0\n"
            assert s.demod_offset == 4_000
            f.write(b"F 435004500\n"); f.flush()
            assert f.readline() == b"RPRT 0\n"
            assert s.demod_offset == 4_500
    finally:
        srv.stop()
