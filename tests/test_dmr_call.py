"""DMR call layer: CSBK, talker alias, DmrControl state machines, and
the full two-slot TDMA voice-call IQ loopback (reference
src/DMR/dmrcontrol.cpp, src/DMR/dmrtiming.cpp, src/gr_modem.cpp DMR TX
drive)."""

import json
import pathlib

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.fec import ambe
from qradiolink_tpu.protocols import dmr
from qradiolink_tpu.protocols.dmr import (
    Csbk, CSBKO_BSDWNACT, TalkerAliasAssembler, talker_alias_tx_lcs,
    make_voice_superframe, make_lc_burst, LinkControl,
    DT_VOICE_LC_HEADER, DT_TERMINATOR_WITH_LC, _crc_ccitt162,
)
from qradiolink_tpu.protocols.dmr_control import (
    DmrControl, DmrConfig, DmrTiming, MODE_REPEATER, RX_AUDIO, RX_IDLE,
    SLOT_TIME_NS, TIME_PER_SAMPLE_NS, extract_gps,
)
from qradiolink_tpu.protocols.dmr_stream import (
    DmrRxStream, DmrTxStream, build_bs_stream, SAMPLES_PER_SLOT,
)

FIX = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "ambe_golden.json")
    .read_text())


def test_csbk_crc_matches_reference():
    """_crc_ccitt162 vs CCRC::addCCITT162 golden bytes (high byte at
    [10], low at [11])."""
    for case in FIX["crc_ccitt162_csbk"]:
        b = np.frombuffer(bytes.fromhex(case["bytes"]), np.uint8)
        want = (int(b[10]) << 8) | int(b[11])
        assert _crc_ccitt162(b[:10]) == want
        assert case["ok"] == 1


def test_csbk_roundtrip():
    c = Csbk(csbko=CSBKO_BSDWNACT, src_id=2345678, dst_id=91,
             data1=0x00, cbf=0x00)
    got = Csbk.from_bytes(c.to_bytes())
    assert got is not None
    assert got.csbko == CSBKO_BSDWNACT
    assert got.src_id == 2345678 and got.dst_id == 91
    # corrupted CRC -> reject
    bad = c.to_bytes().copy()
    bad[5] ^= 0xFF
    assert Csbk.from_bytes(bad) is None


def test_csbk_burst_through_decode():
    c = Csbk(csbko=CSBKO_BSDWNACT, src_id=111222, dst_id=3334)
    burst = dmr.make_csbk_burst(c, color_code=5)
    d = dmr.decode_burst(burst)
    assert d.kind == "data" and d.data_type == dmr.DT_CSBK
    assert d.color_code == 5
    got = Csbk.from_bytes(d.payload[:12])
    assert got.src_id == 111222 and got.dst_id == 3334


def test_talker_alias_roundtrip():
    lcs = talker_alias_tx_lcs("N0CALL/QRL")
    asm = TalkerAliasAssembler()
    out = None
    for lc in lcs:
        r = asm.add(lc)
        if r is not None:
            out = r
    assert out is not None and "N0CALL/QRL" in out


def test_gps_extract():
    # build raw LC with known lon/lat: lon=+90deg -> lonI = 2^23,
    # lat=-45deg -> latI = -2^22
    raw = np.zeros(9, np.uint8)
    lon_word = (2 ** 23) << 7               # 25-bit value in bits 31..7
    raw[2] |= (lon_word >> 31) & 1
    raw[3] = (lon_word >> 23) & 0xFF
    raw[4] = (lon_word >> 15) & 0xFF
    raw[5] = (lon_word >> 7) & 0xFF
    lat_word = ((-(2 ** 22)) & 0xFFFFFF) << 8   # 24-bit value in bits 31..8
    raw[6] = (lat_word >> 24) & 0xFF
    raw[7] = (lat_word >> 16) & 0xFF
    raw[8] = (lat_word >> 8) & 0xFF
    lon, lat, err = extract_gps(raw)
    assert abs(lon - 90.0) < 1e-3 and abs(lat + 45.0) < 1e-3


def _make_rx_control(**kw):
    cfg = DmrConfig(color_code=1, timeslot=2, source_id=0,
                    destination_id=0, **kw)
    ctl = DmrControl(cfg)
    events = {"audio": [], "headers": [], "terms": [], "aliases": []}
    ctl.on_digital_audio = lambda b: events["audio"].append(b)
    ctl.on_header = lambda h: events["headers"].append(h)
    ctl.on_terminator = lambda t: events["terms"].append(t)
    ctl.on_talker_alias = lambda a: events["aliases"].append(a)
    return ctl, events


def _tx_voice_call(n_superframes=2, alias="TPU TEST", vocoder=True):
    """Drive a TX DmrControl through a full voice call; returns the
    burst list and the per-burst 3x49 voice payloads sent."""
    cfg = DmrConfig(color_code=1, timeslot=2, source_id=2345678,
                    destination_id=91, talker_alias=alias, vocoder=vocoder)
    tx = DmrControl(cfg)
    bursts = list(tx._voice_header_bursts())
    rng = np.random.default_rng(3)
    payloads = []
    for _ in range(n_superframes * 6):
        p = rng.integers(0, 2, (3, 49)).astype(np.uint8)
        payloads.append(p)
        voice = ambe.voice_encode(p) if vocoder else \
            np.packbits(np.zeros(216, np.uint8))
        b27 = np.packbits(voice)
        for k in range(3):
            tx.add_tx_audio(b27[9 * k:9 * k + 9].tobytes())
        bursts.extend(tx.get_tx_bursts())
    tx.stop_voice_tx()
    bursts.extend(tx.get_tx_bursts())
    return bursts, payloads


def test_protocol_level_call():
    """Header -> superframes -> terminator through decode_burst +
    DmrControl RX (no RF)."""
    bursts, payloads = _tx_voice_call()
    rx, ev = _make_rx_control(vocoder=True)
    decoded = [(dmr.decode_burst(b), 2) for b in bursts]
    rx.add_bursts(decoded)
    # the header burst goes out twice (gr_modem.cpp:760, x2 for
    # robustness) and the reference emits per received header
    assert len(ev["headers"]) == 2
    assert ev["headers"][0].src_id == 2345678
    assert ev["headers"][0].dst_id == 91
    assert len(ev["terms"]) == 1
    assert rx.rx_state == RX_IDLE
    assert len(ev["audio"]) == len(payloads)
    for got, sent in zip(ev["audio"], payloads):
        bits = np.unpackbits(np.frombuffer(got, np.uint8))
        dec, errs = ambe.voice_decode(bits)
        np.testing.assert_array_equal(dec, sent)
    # talker alias arrives during superframes 1..4 rotation — needs at
    # least 5 superframes; with 2 superframes only header+block1 sent
    bursts5, _ = _tx_voice_call(n_superframes=5)
    rx2, ev2 = _make_rx_control(vocoder=True)
    rx2.add_bursts([(dmr.decode_burst(b), 2) for b in bursts5])
    assert ev2["aliases"] and "TPU TEST" in ev2["aliases"][0]


def test_two_slot_iq_loopback_late_entry_10db():
    """The VERDICT done-bar: BS downlink with slot 1 idle and slot 2
    voice (no header — late entry), through DmrMod -> AWGN 10 dB ->
    DmrDemod -> DmrRxStream -> DmrControl: src/dst recovered from the
    embedded LC, voice payloads FEC-corrected, slot timing derived
    from the stream, and the TX scheduler launches on the RX grid."""
    from qradiolink_tpu.chains.dmr import DmrMod, DmrDemod
    from qradiolink_tpu.chains.channel import ChannelModel

    rng = np.random.default_rng(7)
    lc = LinkControl(flco=dmr.FLCO_GROUP, src_id=2345678, dst_id=91)
    payloads = rng.integers(0, 2, (12, 3, 49)).astype(np.uint8)
    voice = ambe.voice_encode(payloads)            # (12, 216)
    sf1 = make_voice_superframe(voice[:6], lc, color_code=1)
    sf2 = make_voice_superframe(voice[6:], lc, color_code=1)
    term = make_lc_burst(lc, 1, DT_TERMINATOR_WITH_LC)
    slot2 = list(sf1) + list(sf2) + [term]
    # slot 1 idles for 2 extra frames so the downlink keeps running past
    # the terminator (covers demod chain delay at the stream tail)
    idle_pad = [None] * (len(slot2) + 2)
    bits = build_bs_stream([dmr.make_data_burst(
        np.zeros(196, np.uint8), 1, dmr.DT_IDLE)] * len(idle_pad),
        slot2, lead_idle=2)

    mod = DmrMod()
    _, txo = mod(mod.init_state(), jnp.asarray(bits))
    iq = txo["iq"]
    chan = ChannelModel(1_000_000, snr_db=10.0, seed=5)
    iq = chan(iq)
    m = iq.shape[-1] - (iq.shape[-1] % 625)
    dem = DmrDemod()
    _, rxo = dem(dem.init_state(), iq[:m])
    rx_bits = np.asarray(rxo["bits"])

    ctl, ev = _make_rx_control(vocoder=True)
    stream = DmrRxStream(ctl)
    # feed in blocks (streaming shape)
    B = 2 * SAMPLES_PER_SLOT * 2 // 5 * 2   # bits per 2 slots
    for i in range(0, len(rx_bits), B):
        stream.push_bits(rx_bits[i:i + B])

    # late entry: no header, but embedded LC recovered src/dst (the
    # terminator event snapshots the call info before clearing it)
    assert len(ev["terms"]) == 1
    assert ev["terms"][0].src_id == 2345678
    assert ev["terms"][0].dst_id == 91
    # voice recovered: match emitted audio bursts to the sent payloads
    assert len(ev["audio"]) >= 8
    ok = 0
    sent = {tuple(np.packbits(p.reshape(-1))): i
            for i, p in enumerate(payloads)}
    for got in ev["audio"]:
        bits_got = np.unpackbits(np.frombuffer(got, np.uint8))
        dec, errs = ambe.voice_decode(bits_got)
        if tuple(np.packbits(dec.reshape(-1))) in sent:
            ok += 1
    assert ok >= 8, f"only {ok} voice bursts FEC-recovered at 10 dB"
    # slot timing captured from the stream
    assert ctl.timing._slot_times[1] > 0
    assert ctl.timing.timing_recent(2)

    # TX scheduling on the RX-derived grid
    ctl.config.source_id, ctl.config.destination_id = 2345678, 91
    start = ctl.start_transmission()
    assert start == []              # timing recent -> no CSBK needed
    # next RX burst fires timing_ready -> header pending
    ctl.timing.set_slot_times(2)
    hdr = ctl.poll_header()
    assert len(hdr) == 2
    txs = DmrTxStream(ctl)
    txs.send_bursts(hdr, slot_no=2)
    launches = [q[0] for q in txs._queue]
    slot_ref = ctl.timing._slot_times[1] // TIME_PER_SAMPLE_NS
    want_first = (slot_ref + 3 * SLOT_TIME_NS // TIME_PER_SAMPLE_NS
                  + 12 * 5)
    assert abs(launches[0] - want_first) <= 5
    assert launches[1] - launches[0] == 2 * SAMPLES_PER_SLOT


def test_tx_stream_blocks_and_mask():
    """DmrTxStream bit/mask assembly across block boundaries."""
    cfg = DmrConfig(timeslot=1)
    ctl = DmrControl(cfg)
    txs = DmrTxStream(ctl)
    burst = np.arange(264) % 2
    txs.send_bursts([burst.astype(np.uint8)])
    # burst scheduled at a slot boundary >= 2 slots out
    launch = txs._queue[0][0]
    n1 = launch + 100 - (launch + 100) % 5
    bits1, mask1 = txs.next_block(n1)
    assert mask1[:launch].sum() == 0
    assert mask1[launch:].all()
    bits2, mask2 = txs.next_block(1000)
    total_on = mask1.sum() + mask2.sum()
    assert total_on == 264 // 2 * 5    # 660 samples of burst
    got = np.concatenate([bits1, bits2])
    on = np.nonzero(np.concatenate([mask1, mask2]))[0]
    b0 = on[0] // 5 * 2
    np.testing.assert_array_equal(got[b0:b0 + 264], burst)


def test_dmo_soft_correlation_sink():
    """DMO float-correlation reception (reference gr_dmr_dmo_sink):
    bursts found and decoded from the soft 24 ksps stream despite DC
    offset and level scaling that break fixed-threshold slicing."""
    from qradiolink_tpu.protocols.dmr_stream import find_bursts_dmo
    from qradiolink_tpu.protocols.dmr import (
        SYNC_DMO1_AUDIO, SYNC_DMO1_DATA, make_lc_burst, make_voice_burst)

    rng = np.random.default_rng(5)
    lc = LinkControl(flco=dmr.FLCO_GROUP, src_id=333, dst_id=9)
    voice = np.random.default_rng(1).integers(0, 2, 216).astype(np.uint8)
    bursts = [
        make_lc_burst(lc, 1, DT_VOICE_LC_HEADER, sync=SYNC_DMO1_DATA),
        make_voice_burst(voice, 1, 0, sync=SYNC_DMO1_AUDIO),
    ]
    # symbol-domain soft stream at 5 sps with gaps between bursts
    lv = np.array([1.0, 3.0, -1.0, -3.0])  # dibit {00,01,10,11} levels
    parts = [np.zeros(400, np.float32)]
    for b in bursts:
        pairs = b.reshape(132, 2)
        syms = lv[pairs[:, 0] * 2 + pairs[:, 1]]
        parts.append(np.repeat(syms, 5).astype(np.float32))
        parts.append(np.zeros(600, np.float32))
    soft = np.concatenate(parts)
    # level error + DC offset + noise
    soft = soft * 0.4 + 0.35 + rng.standard_normal(soft.size) * 0.08

    hits = find_bursts_dmo(soft)
    kinds = [(d.kind, name) for _s, d, name in hits]
    assert ("data", "dmo1_data") in kinds, kinds
    assert any(k == "voice_sync" for k, _ in kinds), kinds
    for _s, d, name in hits:
        if d.kind == "data":
            assert d.lc.src_id == 333 and d.lc.dst_id == 9
        if d.kind == "voice_sync":
            np.testing.assert_array_equal(d.voice_bits, voice)
