"""DMR packet-data calls: header codec, CRC9/CRC32 blocks, reassembly,
and the full data call through DmrControl (reference
src/MMDVM/DMRDataHeader.cpp, src/DMR/dmrmessagehandler.cpp)."""

import numpy as np

from qradiolink_tpu.protocols import dmr
from qradiolink_tpu.protocols.dmr_data import (
    DataHeader, DmrMessageHandler, DPF_CONFIRMED_DATA, DPF_UDT,
    build_confirmed_blocks, crc9, crc32_dmr, _block_crc_ok)
from qradiolink_tpu.protocols.dmr_control import DmrControl, DmrConfig


def test_data_header_roundtrip():
    h = DataHeader(gi=True, dpf=DPF_CONFIRMED_DATA, dst_id=91,
                   src_id=2345678, blocks=3, sap=0, pad_nibble=5)
    b = h.to_bytes()
    got = DataHeader.from_bytes(b)
    assert got is not None
    assert got.dpf == DPF_CONFIRMED_DATA and got.blocks == 3
    assert got.src_id == 2345678 and got.dst_id == 91 and got.gi
    assert got.pad_nibble == 5
    # corrupt CRC -> rejected
    bad = b.copy(); bad[3] ^= 0xFF
    assert DataHeader.from_bytes(bad) is None


def test_confirmed_block_crc9_roundtrip():
    blocks = build_confirmed_blocks(b"hello dmr data call!")
    for blk in blocks:
        ok, dbsn = _block_crc_ok(blk)
        assert ok
    # corrupted payload fails
    bad = bytearray(blocks[0]); bad[5] ^= 0x10
    ok, _ = _block_crc_ok(bytes(bad))
    assert not ok


def test_confirmed_message_reassembly():
    payload = b"The quick brown fox jumps over the lazy DMR"
    blocks = build_confirmed_blocks(payload)
    h = DataHeader(gi=False, dpf=DPF_CONFIRMED_DATA, dst_id=91,
                   src_id=777, blocks=len(blocks))
    mh = DmrMessageHandler()
    assert mh.process_header(bytes(h.to_bytes())) is not None
    msg = None
    for blk in blocks:
        msg = mh.process_block(dmr.DT_RATE_12_DATA, blk, 777)
    assert msg is not None and msg.crc_valid
    assert msg.payload.rstrip(b"\x00") == payload
    assert msg.src_id == 777 and msg.dst_id == 91


def test_data_call_through_dmr_control():
    """Header + blocks as decoded bursts through the call layer."""
    payload = b"packet data over DMR tier II"
    blocks = build_confirmed_blocks(payload)
    h = DataHeader(gi=True, dpf=DPF_CONFIRMED_DATA, dst_id=9,
                   src_id=2345678, blocks=len(blocks))
    hdr_info = np.asarray(
        __import__('qradiolink_tpu.fec.bptc', fromlist=['bptc'])
        .encode(np.unpackbits(h.to_bytes())), np.uint8)
    bursts = [dmr.make_data_burst(hdr_info, 1, dmr.DT_DATA_HEADER)]
    for blk in blocks:
        bursts.append(dmr.make_rate12_burst(
            np.frombuffer(blk, np.uint8), 1))
    ctl = DmrControl(DmrConfig(color_code=1, timeslot=2))
    got = []
    ctl.on_data_message = got.append
    ctl.add_bursts([(dmr.decode_burst(b), 2) for b in bursts])
    assert got and got[0].crc_valid
    assert got[0].payload.rstrip(b"\x00") == payload
    assert got[0].src_id == 2345678
