"""Audio subsystem: voice codecs (Codec2/Opus via system C libraries),
processing, and mixing (reference src/audio/)."""

from qradiolink_tpu.audio.codecs import (  # noqa: F401
    AudioEncoder, codec2_available, opus_available,
)
