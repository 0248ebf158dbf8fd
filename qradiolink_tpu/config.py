"""Settings + memory channels: the framework's config system.

Equivalent of reference src/settings.{h,cpp} (libconfig file with ~100
typed keys read into a Settings object) and src/radiochannel.{h,cpp}
(memory-channel store). Here both are dataclasses persisted as JSON
under ~/.config/qradiolink_tpu/, keeping the reference's key names
where they map 1:1 so operators recognize them.
"""

from __future__ import annotations

import json
import dataclasses
from dataclasses import dataclass, field, asdict
from pathlib import Path

DEFAULT_DIR = Path.home() / ".config" / "qradiolink_tpu"


@dataclass
class Settings:
    # radio (settings.h rx_frequency/tx_shift/rx_mode... subset that has
    # meaning without physical hardware)
    rx_frequency: int = 434_000_000
    demod_offset: int = 0
    tx_shift: int = 0
    rx_mode: str = "NBFM"
    tx_mode: str = "NBFM"
    rx_sample_rate: int = 1_000_000
    squelch_db: float = -140.0
    rx_volume: float = 1.0
    tx_volume: float = 1.0
    bb_gain: float = 1.0
    rssi_calibration_value: float = -80.0
    # voice
    audio_compressor: bool = False
    vox_level: float = 0.0
    voip_bitrate: int = 24_600
    vocoder_bitrate: int = 1400       # codec2 rate for digital voice
    # station
    callsign: str = "CALL"
    video_enabled: bool = False
    # TDMA / MMDVM
    mmdvm_channels: int = 7
    mmdvm_channel_separation: int = 25_000
    burst_delay_msec: int = 60
    # control
    repeater_enabled: bool = False    # digital repeater forwarding
    tx_band_limits: bool = False      # enforce IARU band plan on TX
    tot_seconds: float = 120.0        # TX timeout timer
    rx_timeout_ms: int = 200          # data watchdog (radiocontroller:336)
    scan_resume_ms: int = 5000
    # processing
    block_len: int = 125_000          # samples per device step (125 ms)

    def save(self, path=None) -> Path:
        path = Path(path) if path else DEFAULT_DIR / "qradiolink_tpu.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(asdict(self), indent=2))
        return path

    @classmethod
    def load(cls, path=None) -> "Settings":
        path = Path(path) if path else DEFAULT_DIR / "qradiolink_tpu.json"
        if not path.exists():
            return cls()
        data = json.loads(path.read_text())
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})


@dataclass
class MemoryChannel:
    """One stored channel (reference radiochannel.h)."""
    name: str = ""
    rx_frequency: int = 0
    tx_shift: int = 0
    rx_mode: str = "NBFM"
    tx_mode: str = "NBFM"
    squelch_db: float = -140.0
    skip: bool = False


class RadioChannels:
    """Memory-channel table with JSON persistence
    (reference qradiolink_mem.cfg)."""

    def __init__(self, channels=None):
        self.channels: list[MemoryChannel] = list(channels or [])

    def add(self, ch: MemoryChannel):
        self.channels.append(ch)

    def save(self, path=None) -> Path:
        path = Path(path) if path else DEFAULT_DIR / "memory_channels.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps([asdict(c) for c in self.channels],
                                   indent=2))
        return path

    @classmethod
    def load(cls, path=None) -> "RadioChannels":
        path = Path(path) if path else DEFAULT_DIR / "memory_channels.json"
        if not path.exists():
            return cls()
        return cls([MemoryChannel(**d) for d in json.loads(path.read_text())])
