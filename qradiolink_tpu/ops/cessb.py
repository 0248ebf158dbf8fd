"""Controlled-envelope SSB (CESSB) clipper and overshoot stretcher.

Equivalents of the reference's vendored cessb blocks (reference
src/gr/cessb/clipper_cc_impl.cc:43-95 — magnitude clip at 0.95 preserving
phase; stretcher_cc_impl.cc:43-110 — envelope max over a 5-sample window
driving a gain normalization). Both are elementwise/windowed vector ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from qradiolink_tpu.core import Block, Stateless


class CessbClipper(Stateless):
    """Clip |x| to `limit`, preserving phase."""

    def __init__(self, limit: float = 0.95):
        self.limit = float(limit)

    def apply(self, x):
        mag = jnp.abs(x)
        scale = jnp.where(mag > self.limit, self.limit / (mag + 1e-20), 1.0)
        return x * scale.astype(x.real.dtype)


class CessbStretcher(Block):
    """Normalize by the max envelope over a sliding window (default 5).

    State: last window-1 input samples so the sliding max is seamless
    across block boundaries.
    """

    def __init__(self, window: int = 5, lead_shape: tuple = ()):
        self.window = int(window)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros(self.lead_shape + (self.window - 1,), jnp.complex64)

    def __call__(self, state, x):
        xc = jnp.concatenate([state, x], axis=-1)
        mag = jnp.abs(xc)
        T = x.shape[-1]
        win = jnp.stack([mag[..., i:i + T] for i in range(self.window)], axis=0)
        env = jnp.max(win, axis=0)
        gain = 1.0 / jnp.maximum(env, 1.0)
        # delay x by (window-1)//2 to center the window (matches the
        # 2-sample history of the reference's general_work implementation)
        d = (self.window - 1) // 2
        xd = xc[..., self.window - 1 - d: self.window - 1 - d + T]
        y = xd * gain.astype(x.real.dtype)
        new_tail = xc[..., xc.shape[-1] - (self.window - 1):]
        return new_tail, y
