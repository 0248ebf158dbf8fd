"""Mode-table parity vs the reference gr_modem_types enum.

Extracts every ModemType* entry from /root/reference/src/modem_types.h
and asserts the registry covers each one via MODEM_TYPE_MAP, that every
mapped mode exists and constructs, plus loopback smoke for the modes
added in round 5 (GMSK10K, 2FSK1KFB).
"""

import pathlib
import re

import numpy as np
import pytest

from qradiolink_tpu.models import registry

pytestmark = pytest.mark.fast

REF = pathlib.Path("/root/reference/src/modem_types.h")


def _reference_modem_types():
    text = REF.read_text()
    body = text.split("namespace gr_modem_types")[1]
    body = body.split("}")[0]
    return re.findall(r"\b(ModemType\w+)\b", body)


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_every_reference_modem_type_is_mapped():
    ref_types = _reference_modem_types()
    assert len(ref_types) == 42, ref_types
    missing = [t for t in ref_types if t not in registry.MODEM_TYPE_MAP]
    assert not missing, f"unmapped reference modem types: {missing}"
    extra = [t for t in registry.MODEM_TYPE_MAP if t not in ref_types]
    assert not extra, f"stale map entries: {extra}"
    for t, mode in registry.MODEM_TYPE_MAP.items():
        assert mode in registry.MODES, f"{t} -> {mode} not in registry"


def test_mapped_modes_construct():
    """Every mapped digital mode's RX and TX factories build."""
    for mode in sorted(set(registry.MODEM_TYPE_MAP.values())):
        spec = registry.get_mode(mode)
        if mode.startswith("FreeDV"):
            continue  # vocoder-backed; covered by test_freedv
        if spec.rx_factory is not None:
            spec.rx_factory()
        if spec.tx_factory is not None:
            spec.tx_factory()


@pytest.mark.parametrize("mode,nbytes,snr", [("GMSK10K", 2500, 14.0),
                                             ("2FSK1KFB", 300, 14.0)])
def test_new_mode_loopback(mode, nbytes, snr):
    import jax.numpy as jnp
    from qradiolink_tpu.chains.channel import ChannelModel
    from qradiolink_tpu.chains.digital_common import bytes_to_bits
    from tests.test_chains_digital import best_ber

    rng = np.random.default_rng(3)
    tx = registry.tx_chain(mode)
    rx = registry.rx_chain(mode)
    data = rng.integers(0, 256, nbytes).astype(np.uint8)
    _, out = tx(tx.init_state(), jnp.asarray(data))
    chan = ChannelModel(1_000_000, snr_db=snr)
    rx_iq = chan(out["iq"])
    _, rout = rx(rx.init_state(), rx_iq)
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = best_ber(rout["bits"], sent)
    if "bits_alt" in rout:
        ber = min(ber, best_ber(rout["bits_alt"], sent))
    assert ber < 0.02, f"{mode} loopback BER {ber}"


REF_RC = pathlib.Path("/root/reference/src/radiocontroller.cpp")

# reference OperationMode name -> our registry mode (the FM/FB naming
# swap is documented at MODEM_TYPE_MAP)
_OPMODE_ALIAS = {
    "FM": "FM", "NBFM": "NBFM", "WBFM": "WBFM", "USB": "USB", "LSB": "LSB",
    "AM": "AM", "BPSK2K": "BPSK2K", "BPSK1K": "BPSK1K", "QPSK2K": "QPSK2K",
    "QPSK10K": "QPSK20K", "2FSK2KFM": "2FSK2K", "2FSK1KFM": "2FSK1K",
    "2FSK2K": "2FSK2KFB", "2FSK1K": "2FSK1KFB", "2FSK10KFM": "2FSK10K",
    "GMSK2K": "GMSK2K", "GMSK1K": "GMSK1K", "GMSK10K": "GMSK10K",
    "4FSK2K": "4FSK2KFB", "4FSK2KFM": "4FSK2K", "4FSK1KFM": "4FSK1KFM",
    "4FSK10KFM": "4FSK10KFM", "QPSK250K": "QPSK250K", "4FSK100K": "4FSK100K",
    "MMDVM": "MMDVM", "MMDVMMulti": "MMDVMmulti", "M17": "M17", "DMR": "DMR",
}


@pytest.mark.skipif(not REF_RC.exists(), reason="reference tree not mounted")
def test_scan_steps_match_reference_tables():
    """Per-mode frequency-scan steps vs the reference RX mode table
    (radiocontroller.cpp:2111-2360). Modes with no _scan_step_hz
    assignment there (QPSKVideo — video is never scanned) are skipped."""
    lines = REF_RC.read_text().splitlines()
    steps = {}
    cur = None
    for ln in lines:
        m = re.search(r"case OperationMode::Mode(\w+):", ln)
        if m:
            cur = m.group(1)
            continue
        s = re.search(r"_scan_step_hz\s*=\s*(\d+)", ln)
        if s and cur and cur not in steps:
            steps[cur] = int(s.group(1))
    assert len(steps) >= 30, steps
    bad = []
    for ref_name, hz in sorted(steps.items()):
        ours = _OPMODE_ALIAS.get(
            ref_name, ref_name if ref_name.startswith("FreeDV") else None)
        assert ours is not None, f"unmapped reference mode {ref_name}"
        got = registry.MODES[ours].scan_step_hz
        if got != hz:
            bad.append((ref_name, ours, hz, got))
    assert not bad, f"scan-step mismatches (ref, ours, ref_hz, our_hz): {bad}"


REF_MODEM = pathlib.Path("/root/reference/src/gr_modem.cpp")


@pytest.mark.skipif(not REF_MODEM.exists(), reason="reference not mounted")
def test_frame_lengths_match_reference_tables():
    """Layer-1 frame lengths vs the reference's per-modem-type tables
    (gr_modem.cpp toggleTxMode/toggleRxMode). M17 is asymmetric there by
    design (TX builds 16-byte payload frames inside the M17 stack, RX
    assembles 46-byte type-4 frames — our config carries the RX side);
    DMR frames flow through the DMR stack, not layer 1."""
    from qradiolink_tpu.framing.layer1 import MODE_FRAME_CONFIG

    src = REF_MODEM.read_text()
    tx = {}
    for m in re.finditer(r"modem_type == gr_modem_types::(\w+)\)\s*\{\s*"
                         r"_tx_frame_length = (\d+);", src):
        tx.setdefault(m.group(1), int(m.group(2)))
    rx = {}
    for m in re.finditer(r"modem_type == gr_modem_types::(\w+)\)\s*\{\s*"
                         r"(?:_bit_buf_len = [^;]+;\s*)?"
                         r"_rx_frame_length = (\d+);", src):
        rx.setdefault(m.group(1), int(m.group(2)))
    assert len(tx) >= 20 and len(rx) >= 20
    skip = {"ModemTypeDMR"}          # DMR stack, no layer-1 framing
    tx_skip = {"ModemTypeM17"}       # 16-byte TX payloads inside the stack
    bad = []
    for mt, n in sorted(tx.items()):
        if mt in skip or mt in tx_skip:
            continue
        mode = registry.MODEM_TYPE_MAP[mt]
        key = registry.MODES[mode].framing
        assert key is not None, (mt, mode)
        if MODE_FRAME_CONFIG[key].frame_length != n:
            bad.append(("tx", mt, mode, n,
                        MODE_FRAME_CONFIG[key].frame_length))
    for mt, n in sorted(rx.items()):
        if mt in skip:
            continue
        mode = registry.MODEM_TYPE_MAP[mt]
        key = registry.MODES[mode].framing
        if key is None:
            continue
        if MODE_FRAME_CONFIG[key].frame_length != n:
            bad.append(("rx", mt, mode, n,
                        MODE_FRAME_CONFIG[key].frame_length))
    assert not bad, f"frame-length mismatches: {bad}"


REF_L1 = pathlib.Path("/root/reference/src/layer1framing.h")


@pytest.mark.skipif(not REF_L1.exists(), reason="reference not mounted")
def test_frame_type_words_match_reference_header():
    """FrameType sync/type words vs the reference enum
    (layer1framing.h:8-24), matched by name."""
    from qradiolink_tpu.framing.layer1 import FrameType

    src = REF_L1.read_text()
    ref = {m.group(1): int(m.group(2), 16) for m in re.finditer(
        r"FrameType(\w+)\s*=\s*(0x[0-9A-Fa-f]+)", src)}
    assert len(ref) >= 8, ref
    name_map = {"None": "NONE", "Voice": "VOICE_2",  # legacy alias
                "Voice1": "VOICE_1", "Voice2": "VOICE_2", "Text": "TEXT",
                "IP": "IP", "Video": "VIDEO", "Sync": "SYNC",
                "Callsign": "CALLSIGN", "Proto": "PROTO", "End": "END",
                "M17Stream": "M17_STREAM", "M17LSF": "M17_LSF",
                "M17EOT": "M17_EOT"}
    bad = []
    for rname, val in sorted(ref.items()):
        ours = name_map.get(rname)
        if ours is None or not hasattr(FrameType, ours):
            bad.append(("missing", rname, hex(val)))
            continue
        got = int(getattr(FrameType, ours))
        if got != val:
            bad.append((rname, hex(val), hex(got)))
    assert not bad, f"frame-type word mismatches: {bad}"


REF_BT = pathlib.Path("/root/reference/src/bursttimer.h")


@pytest.mark.skipif(not REF_BT.exists(), reason="reference not mounted")
def test_tdma_constants_match_reference_header():
    """BurstTimer constants vs the reference header (bursttimer.h:26-32)."""
    from qradiolink_tpu.framing import tdma

    src = REF_BT.read_text()

    def ref(name):
        m = re.search(name + r"\s*=\s*(\d+)", src)
        assert m, name
        return int(m.group(1))

    assert tdma.BURST_DELAY_NS == ref("BURST_DELAY")
    assert tdma.SLOT_TIME_NS == ref("SLOT_TIME")
    assert tdma.SAMPLES_PER_SLOT == ref("SAMPLES_PER_SLOT")
    assert tdma.TIME_PER_SAMPLE_NS == ref("TIME_PER_SAMPLE")
    m = re.search(r"#define MAX_MMDVM_CHANNELS\s+(\d+)", src)
    assert m and tdma.MAX_MMDVM_CHANNELS == int(m.group(1))
