"""Video over DQPSK: JPEG budget codec + image round-trip over the
QPSKVideo chain (reference src/video/videoencoder.cpp,
gr_modem.cpp:159-162 3122-byte frames)."""

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.video import (
    VideoEncoder, VIDEO_FRAME_BYTES, encode_jpeg_frame, decode_jpeg_frame)


def _test_image():
    """320x240 gradient + blocks — compressible but structured."""
    y, x = np.mgrid[0:240, 0:320]
    r = (x * 255 // 320).astype(np.uint8)
    g = (y * 255 // 240).astype(np.uint8)
    b = (((x // 40 + y // 40) % 2) * 200).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_jpeg_budget_roundtrip():
    img = _test_image()
    frame = encode_jpeg_frame(img)
    assert len(frame) == VIDEO_FRAME_BYTES
    out = decode_jpeg_frame(frame)
    assert out is not None and out.shape == (240, 320, 3)
    # JPEG is lossy: structural similarity via mean abs error
    err = np.mean(np.abs(out.astype(int) - img.astype(int)))
    assert err < 20, f"decoded image MAE {err}"
    # corrupted size field -> None, encoder repeats last good
    enc = VideoEncoder()
    enc.decode(frame)
    bad = b"\xff\xff\xff\xff" + frame[4:]
    assert enc.decode(bad) is not None       # last-good fallback


def test_video_over_qpsk_loopback():
    """One JPEG frame over the QPSKVideo air chain."""
    from qradiolink_tpu.models.registry import rx_chain, tx_chain
    from qradiolink_tpu.framing.layer1 import (
        Deframer, Layer1Framer, FrameType)
    from qradiolink_tpu.chains.channel import ChannelModel

    img = _test_image()
    frame = encode_jpeg_frame(img)
    framer = Layer1Framer("QPSKVideo")
    data = (b"\xaa" * 2000 + framer.frame(frame, FrameType.VIDEO)
            + framer.end_frame() + b"\xaa" * 1000)
    tx = tx_chain("QPSKVideo")
    _, out = tx(tx.init_state(), jnp.asarray(np.frombuffer(data, np.uint8)))
    iq = out["iq"]
    iq = ChannelModel(1_000_000, snr_db=18.0, seed=4)(iq)
    m = iq.shape[-1] - iq.shape[-1] % 2
    rx = rx_chain("QPSKVideo")
    _, rxo = rx(rx.init_state(), iq[:m])
    defr = Deframer("QPSKVideo")
    frames = defr.process(np.asarray(rxo["bits"]).ravel())
    vids = [p for ft, p in frames if ft == FrameType.VIDEO]
    assert vids, "no VIDEO frame recovered"
    got = decode_jpeg_frame(vids[0])
    assert got is not None
    err = np.mean(np.abs(got.astype(int) - img.astype(int)))
    assert err < 25, f"image over RF MAE {err}"


def test_controller_video_tx_rx():
    """Video through the controller: tx_video_frame -> RF -> rx_block
    video events with the decoded image."""
    from qradiolink_tpu.app.controller import RadioController
    from qradiolink_tpu.config import Settings
    from qradiolink_tpu.chains.channel import ChannelModel

    img = _test_image()
    s = Settings()
    s.rx_mode = s.tx_mode = "QPSKVideo"
    tx = RadioController(s)
    tx.toggle_tx_mode("QPSKVideo")
    iq = np.concatenate([
        tx.tx_bytes(b"\xaa" * 2000),
        tx.tx_video_frame(img),
        tx.tx_bytes(b"\xaa" * 1500),
    ])
    iq = np.asarray(ChannelModel(1_000_000, snr_db=20.0, seed=9)(
        jnp.asarray(iq)))
    rx = RadioController(s)
    rx.toggle_rx_mode("QPSKVideo")
    blk = 50_000
    vids = []
    for i in range(0, len(iq) - len(iq) % blk, blk):
        for ev in rx.rx_block(iq[i:i + blk]):
            if ev.kind == "video" and getattr(ev, "image", None) is not None:
                vids.append(ev.image)
    assert vids, "no video frame decoded via controller"
    err = np.mean(np.abs(vids[0].astype(int) - img.astype(int)))
    assert err < 25, f"controller video MAE {err}"
