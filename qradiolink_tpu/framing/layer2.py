"""Layer-2 radio messages: CRC32-guarded payloads (paging, repeater info).

Mirrors the role of the reference's Layer2 (reference src/layer2.h:34-70:
protobuf PageMessage/RepeaterInfo + CRC32 trailer). The wire format here is
a compact length-prefixed binary encoding rather than protobuf (the
reference's .proto schema is not reproduced); the API surface (build/parse
with CRC check, page messages with callsigns) is equivalent.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from qradiolink_tpu.fec.crc import crc32

MAGIC = 0x4C32  # "L2"


@dataclass
class PageMessage:
    target_callsign: str = ""
    source_callsign: str = ""
    message: str = ""

    def encode(self) -> bytes:
        parts = []
        for s in (self.target_callsign, self.source_callsign, self.message):
            b = s.encode("utf-8")[:255]
            parts.append(struct.pack("B", len(b)) + b)
        return b"".join(parts)

    @classmethod
    def decode(cls, data: bytes) -> "PageMessage":
        fields = []
        pos = 0
        for _ in range(3):
            ln = data[pos]
            fields.append(data[pos + 1: pos + 1 + ln].decode("utf-8",
                                                             "replace"))
            pos += 1 + ln
        return cls(*fields)


MSG_PAGE = 1
MSG_REPEATER_INFO = 2
MSG_RAW = 0


def build_layer2_frame(payload: bytes, msg_type: int = MSG_RAW) -> bytes:
    """[magic u16][type u8][len u16][payload][crc32 u32] big-endian."""
    head = struct.pack(">HBH", MAGIC, msg_type, len(payload))
    body = head + payload
    return body + struct.pack(">I", crc32(body))


def parse_layer2_frame(frame: bytes):
    """Returns (msg_type, payload) or None on CRC/format failure."""
    if len(frame) < 9:
        return None
    magic, msg_type, ln = struct.unpack(">H B H", frame[:5])
    if magic != MAGIC or len(frame) < 5 + ln + 4:
        return None
    body = frame[: 5 + ln]
    (crc,) = struct.unpack(">I", frame[5 + ln: 9 + ln])
    if crc32(body) != crc:
        return None
    return msg_type, frame[5: 5 + ln]
