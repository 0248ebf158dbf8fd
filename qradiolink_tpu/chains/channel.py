"""Channel simulator for loopback tests and BER benchmarking.

The reference has no channel model (verification was on-air); loopback
TX -> channel -> RX is this framework's core integration test (SURVEY §4).
Applies gain, carrier frequency/phase offset, sample timing offset
(integer), and AWGN at a specified SNR.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class ChannelModel:
    def __init__(self, samp_rate: float, snr_db: float | None = None,
                 freq_offset_hz: float = 0.0, phase_offset: float = 0.0,
                 gain: float = 1.0, delay_samples: int = 0, seed: int = 1234):
        self.samp_rate = float(samp_rate)
        self.snr_db = snr_db
        self.freq_offset = float(freq_offset_hz)
        self.phase_offset = float(phase_offset)
        self.gain = float(gain)
        self.delay = int(delay_samples)
        self.key = jax.random.PRNGKey(seed)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = x * self.gain
        if self.delay:
            y = jnp.concatenate(
                [jnp.zeros(y.shape[:-1] + (self.delay,), y.dtype),
                 y[..., :-self.delay]], axis=-1)
        if self.freq_offset or self.phase_offset:
            t = jnp.arange(y.shape[-1], dtype=jnp.float32)
            ph = (2 * np.pi * self.freq_offset / self.samp_rate) * t \
                + self.phase_offset
            y = y * jnp.exp(1j * ph).astype(jnp.complex64)
        if self.snr_db is not None:
            sig_pow = jnp.mean(jnp.abs(y) ** 2)
            noise_pow = sig_pow / (10.0 ** (self.snr_db / 10.0))
            k1, k2, self.key = jax.random.split(self.key, 3)
            if jnp.iscomplexobj(y):
                n = (jax.random.normal(k1, y.shape) +
                     1j * jax.random.normal(k2, y.shape)) \
                    * jnp.sqrt(noise_pow / 2.0)
            else:
                n = jax.random.normal(k1, y.shape) * jnp.sqrt(noise_pow)
            y = y + n.astype(y.dtype)
        return y
