"""DMR chain loopback: protocol bursts -> TX chain -> channel -> RX chain
-> sync hunt -> burst decode. The over-the-air integration test for the
DMR mode (reference verifies this only by live operation)."""

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.chains.dmr import DmrMod, DmrDemod
from qradiolink_tpu.chains.channel import ChannelModel
from qradiolink_tpu.protocols import dmr


def _tx_stream(bursts_bits, lead_frames=8, tail_frames=2):
    """Concatenate bursts into a continuous bit stream with idle padding
    (alternating dibits = a tone, letting the RX loops lock)."""
    pad = np.tile([0, 1, 1, 1], 66 * lead_frames)  # alternating levels
    tail = np.tile([0, 1, 1, 1], 66 * tail_frames)
    return np.concatenate([pad] + [np.asarray(b).ravel() for b in bursts_bits]
                          + [tail]).astype(np.uint8)


def _loopback(tx_bits, snr_db=None, mask=None):
    mod, dem = DmrMod(), DmrDemod()
    # pad bit count so the 24k sample count is a multiple of 3 for 125/3
    n = len(tx_bits)
    need = (-n * 5 // 2) % 6
    tx_bits = np.concatenate([tx_bits, np.zeros(need * 2, np.uint8)])
    _, tx = mod(mod.init_state(), jnp.asarray(tx_bits), mask=mask)
    iq = tx["iq"]
    if snr_db is not None:
        iq = ChannelModel(1_000_000, snr_db=snr_db)(iq)
    # demod needs multiples of 625 samples
    m = iq.shape[-1] - (iq.shape[-1] % 625)
    _, out = dem(dem.init_state(), iq[:m])
    return np.asarray(out["bits"]).ravel(), np.asarray(out["symbols"])


def _decode_stream(rx_bits):
    """Sync-hunt + position tracking: voice frames B..F carry an EMB
    instead of a sync, so after a voice sync (frame A) the following 5
    burst positions are decoded by dead reckoning — the reference's
    gr_dmr_sink does the same (sync detect, then fixed 264-bit strides).
    """
    hits = dict(dmr.find_bursts(rx_bits))
    starts = set(hits)
    for s, name in list(hits.items()):
        if name.endswith("audio"):
            for k in range(1, 6):
                p = s + k * dmr.FRAME_BITS
                if p + dmr.FRAME_BITS <= len(rx_bits) and p not in starts:
                    starts.add(p)
    return [(s, hits.get(s), dmr.decode_burst(rx_bits[s:s + dmr.FRAME_BITS]))
            for s in sorted(starts)]


def _make_transmission():
    rng = np.random.default_rng(11)
    lc = dmr.LinkControl(flco=dmr.FLCO_GROUP, dst_id=91, src_id=2405321)
    voice = rng.integers(0, 2, (6, 216)).astype(np.uint8)
    header = dmr.make_lc_burst(lc, color_code=1,
                               data_type=dmr.DT_VOICE_LC_HEADER)
    superframe = dmr.make_voice_superframe(voice, lc, color_code=1)
    term = dmr.make_lc_burst(lc, color_code=1,
                             data_type=dmr.DT_TERMINATOR_WITH_LC)
    return lc, voice, [header, *superframe, term]


def test_dmr_loopback_clean():
    lc, voice, bursts = _make_transmission()
    rx_bits, syms = _loopback(_tx_stream(bursts))
    decoded = _decode_stream(rx_bits)
    kinds = [d.kind for _, _, d in decoded]
    assert kinds.count("data") >= 2, kinds          # header + terminator
    assert kinds.count("voice_sync") >= 1, kinds    # frame A
    assert kinds.count("voice") >= 4, kinds         # frames B..F
    # LC recovered from the header
    headers = [d for _, _, d in decoded
               if d.kind == "data" and d.data_type == dmr.DT_VOICE_LC_HEADER]
    assert headers and headers[0].ok
    assert headers[0].lc.src_id == lc.src_id
    assert headers[0].lc.dst_id == lc.dst_id
    # voice payload of frame A survives bit-exact
    va = [d for _, _, d in decoded if d.kind == "voice_sync"][0]
    np.testing.assert_array_equal(va.voice_bits, voice[0])
    # embedded LC reassembles from frames B..E
    asm = dmr.EmbeddedLCAssembler()
    out = None
    for _, _, d in decoded:
        if d.kind == "voice":
            out = out or asm.add(d.embedded_fragment, d.emb_lcss)
    assert out is not None and out.src_id == lc.src_id


def test_dmr_loopback_awgn():
    lc, voice, bursts = _make_transmission()
    rx_bits, _ = _loopback(_tx_stream(bursts), snr_db=12.0)
    decoded = _decode_stream(rx_bits)
    headers = [d for _, _, d in decoded
               if d.kind == "data" and d.data_type == dmr.DT_VOICE_LC_HEADER]
    assert headers and headers[0].ok and headers[0].lc.src_id == lc.src_id


def test_dmr_tx_burst_mask_zeroes_idle_slot():
    """TDMA gating: masked 24k samples produce (near-)zero RF in the idle
    slot (reference gr_zero_idle_bursts semantics)."""
    _, _, bursts = _make_transmission()
    tx_bits = _tx_stream(bursts, lead_frames=2, tail_frames=2)
    n = len(tx_bits)
    need = (-n * 5 // 2) % 6
    tx_bits = np.concatenate([tx_bits, np.zeros(need * 2, np.uint8)])
    n24 = len(tx_bits) // 2 * 5
    mask = np.ones(n24, np.float32)
    z0, z1 = n24 // 3, n24 // 3 + 720  # one 30 ms slot (720 samples @24k)
    mask[z0:z1] = 0.0
    mod = DmrMod()
    _, tx = mod(mod.init_state(), jnp.asarray(tx_bits), mask=jnp.asarray(mask))
    iq = np.asarray(tx["iq"])
    # center of the masked window at 1 Msps (125/3 interpolation)
    c = (z0 + 360) * 125 // 3
    idle_pow = np.mean(np.abs(iq[c - 5000:c + 5000]) ** 2)
    act_pow = np.mean(np.abs(iq[:z0 * 125 // 3 - 5000]) ** 2)
    assert idle_pow < act_pow * 1e-3


def test_dmr_feedforward_demod_loopback(rng):
    """DmrDemodFF (TPU path: O&M feedforward timing, no scan) decodes a
    DmrMod burst stream at 12 dB like the feedback chain."""
    import numpy as np
    import jax.numpy as jnp
    from qradiolink_tpu.chains.dmr import DmrMod, DmrDemodFF
    from qradiolink_tpu.chains.channel import ChannelModel

    bits = rng.integers(0, 2, 4800).astype(np.uint8)
    tx = DmrMod()
    _, out = tx(tx.init_state(), jnp.asarray(bits))
    iq = np.asarray(out["iq"])
    iq = iq[: len(iq) - len(iq) % 2500]
    rx_iq = ChannelModel(1_000_000, snr_db=12.0)(jnp.asarray(iq))
    dem = DmrDemodFF()
    _, o = dem(dem.init_state(), rx_iq)
    got = np.asarray(o["bits"]).ravel()
    # steady-state dibit BER over the middle, best alignment
    n = len(bits)
    lo, hi = n // 2, 7 * n // 8
    best = 1.0
    for off in range(0, 200):
        if off + hi > len(got):
            break
        best = min(best, float(np.mean(got[off + lo: off + hi]
                                       != bits[lo:hi])))
    assert best <= 0.01, f"FF DMR BER {best:.3f}"
