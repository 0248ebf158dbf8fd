"""VOIP: Mumble client (control + voice) and helpers."""

from qradiolink_tpu.voip.mumble import (   # noqa: F401
    MumbleClient, Station, mumble_varint, read_mumble_varint,
)

from qradiolink_tpu.voip.forwarder import VoipForwarder  # noqa: F401
