"""AGC with attack/decay rates (gr::analog::agc2_cc/ff equivalent).

The reference inserts agc2 in SSB/AM/PSK chains (e.g. reference
src/gr/gr_demod_ssb.cpp AGC2(1e-1, 1e-1, 0.25) and gr_demod_bpsk.cpp).
The gain recurrence
    g[n+1] = g[n] + rate * (reference - |x[n]| * g[n])
is data-dependent (attack when envelope above reference, decay below), so
it runs as lax.scan — but only at the low post-decimation rates (8-80 ksps)
where a sequential scan is cheap; channels batch through vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block


class Agc2(Block):
    """y[n] = x[n]*g[n]; g updated per sample with attack/decay rates."""

    def __init__(self, attack_rate: float = 1e-1, decay_rate: float = 1e-2,
                 reference: float = 1.0, gain: float = 1.0,
                 max_gain: float = 65536.0, lead_shape: tuple = ()):
        self.attack = float(attack_rate)
        self.decay = float(decay_rate)
        self.reference = float(reference)
        self.gain0 = float(gain)
        self.max_gain = float(max_gain)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.full(self.lead_shape, self.gain0, dtype=jnp.float32)

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        if isinstance(x, IqPair):
            # the gain recurrence is a sequential scan (low-rate path);
            # complex form keeps the code simple there
            x = x.to_complex()
        mag = jnp.abs(x).astype(jnp.float32)

        def step(g, m):
            err = self.reference - m * g
            rate = jnp.where(err < 0, self.attack, self.decay)
            g_new = jnp.clip(g + rate * err, 1e-6, self.max_gain)
            return g_new, g

        # scan over time axis; state/g has lead_shape
        g_last, gains = jax.lax.scan(step, state, jnp.moveaxis(mag, -1, 0))
        gains = jnp.moveaxis(gains, 0, -1)
        return g_last, x * gains.astype(x.real.dtype)
