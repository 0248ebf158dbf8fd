"""Video over DQPSK: JPEG codec with the reference's frame budget."""

from qradiolink_tpu.video.jpeg import (   # noqa: F401
    VideoEncoder, VIDEO_FRAME_BYTES, encode_jpeg_frame, decode_jpeg_frame,
)
