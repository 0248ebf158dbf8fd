"""RX audio recorder (reference src/audio/audiorecorder.cpp:1-80).

The reference records decoded RX audio to timestamped FLAC files via
libsndfile; this image has no libsndfile, so the recorder writes
standard WAV (stdlib `wave`) with the same surface: start a recording,
append PCM frames as they decode, stop closes the file. File naming
matches the reference's pattern rec-<timestamp> in a configurable
directory.
"""

from __future__ import annotations

import time
import wave
from pathlib import Path

import numpy as np


class AudioRecorder:
    def __init__(self, directory: str | Path = ".", rate: int = 8000):
        self.dir = Path(directory)
        self.rate = int(rate)
        self._wav: wave.Wave_write | None = None
        self.path: Path | None = None

    @property
    def recording(self) -> bool:
        return self._wav is not None

    def start(self, name: str | None = None) -> Path:
        if self._wav is not None:
            self.stop()
        stamp = name or time.strftime("rec-%Y-%m-%d-%H%M%S")
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{stamp}.wav"
        self._wav = wave.open(str(self.path), "wb")
        self._wav.setnchannels(1)
        self._wav.setsampwidth(2)
        self._wav.setframerate(self.rate)
        return self.path

    def write(self, pcm: np.ndarray):
        """Append float [-1,1] or int16 PCM."""
        if self._wav is None:
            return
        x = np.asarray(pcm)
        if x.dtype != np.int16:
            x = np.clip(x * 32767.0, -32767, 32767).astype(np.int16)
        self._wav.writeframes(x.tobytes())

    def stop(self) -> Path | None:
        if self._wav is None:
            return None
        self._wav.close()
        self._wav = None
        return self.path
