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
    """Divide by the reference's overshoot-stretch gain, computed from
    the max envelope over a centered 5-sample window.

    Reference law (stretcher_cc_impl.cc:79-96, kept op-for-op):
        env  = max(|x[j-2..j+2]|)
        e    = max(env * emax, 1),   emax = 1 / (sqrt(0.5) / 2)
        out  = x[j] / ((e - 1) * 2 + 1)
    The reference reads 2 samples of lookahead; this streaming block
    instead emits outputs delayed 2 samples (identical values, shifted).
    State: last window-1 input samples so the window is seamless across
    block boundaries. Bit-exact vs the compiled reference block
    (tests/test_golden_parity.py).
    """

    EMAX = 1.0 / (0.5 ** 0.5 / 2.0)

    def __init__(self, window: int = 5, lead_shape: tuple = ()):
        self.window = int(window)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros(self.lead_shape + (self.window - 1,), jnp.complex64)

    def __call__(self, state, x):
        xc = jnp.concatenate([state, x], axis=-1)
        mag = jnp.abs(xc)
        T = x.shape[-1]
        win = jnp.stack([mag[..., i:i + T] for i in range(self.window)],
                        axis=0)
        env = jnp.max(win, axis=0)
        e = jnp.maximum(env * jnp.float32(self.EMAX), 1.0)
        divisor = (e - 1.0) * 2.0 + 1.0
        # delay x by (window-1)//2 to center the window (the reference
        # uses 2 samples of lookahead instead)
        d = (self.window - 1) // 2
        xd = xc[..., self.window - 1 - d: self.window - 1 - d + T]
        y = xd / divisor.astype(x.real.dtype)
        new_tail = xc[..., xc.shape[-1] - (self.window - 1):]
        return new_tail, y
