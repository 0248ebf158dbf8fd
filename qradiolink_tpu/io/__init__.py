"""Host I/O boundary: IQ sources/sinks (file, UDP, synthetic), WAV
audio, and the MMDVM ZeroMQ transport.

Replaces the reference's L0 hardware layer (SURVEY §1 L0: osmosdr/UHD/
LimeSDR device blocks) with file/network sample transports — the TPU
framework's ingest/egress is host-side streams of batched IQ blocks.
"""

from qradiolink_tpu.io.iq import (  # noqa: F401
    IqFileSource, IqFileSink, UdpIqSource, UdpIqSink, SignalSource,
    read_iq, write_iq,
)
from qradiolink_tpu.io.wav import read_wav, write_wav  # noqa: F401
