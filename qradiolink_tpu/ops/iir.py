"""First-order IIR recurrences, parallelized with associative scan.

Single-pole IIRs appear throughout the reference (de-emphasis, DC blocker,
RSSI smoothing, squelch power average). The recurrence
    y[n] = a1 * y[n-1] + u[n]
is a linear first-order recurrence, solved in O(log T) depth with
jax.lax.associative_scan over pairs (A, B) composing (A2*A1, A2*B1 + B2) —
no sequential sample loop on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block


def linear_recurrence(a: jax.Array, u: jax.Array, y0) -> jax.Array:
    """Solve y[n] = a[n]*y[n-1] + u[n] along the last axis, y[-1] = y0."""
    a = jnp.broadcast_to(a, u.shape)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    A, B = jax.lax.associative_scan(combine, (a, u), axis=-1)
    return A * jnp.expand_dims(y0, -1) + B


class FirstOrderIir(Block):
    """y[n] = a1*y[n-1] + b0*x[n] + b1*x[n-1]; state = (x[-1], y[-1])."""

    def __init__(self, b0: float, b1: float = 0.0, a1: float = 0.0,
                 lead_shape: tuple = ()):
        self.b0 = float(b0)
        self.b1 = float(b1)
        self.a1 = float(a1)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        z = jnp.zeros(self.lead_shape, dtype=jnp.float32)
        return (z, z)

    def __call__(self, state, x):
        x_prev, y_prev = state
        x_shift = jnp.concatenate([x_prev[..., None], x[..., :-1]], axis=-1)
        u = self.b0 * x + self.b1 * x_shift
        y = linear_recurrence(jnp.asarray(self.a1, x.dtype), u, y_prev)
        return (x[..., -1], y[..., -1]), y


class SinglePoleIir(Block):
    """y[n] = (1-alpha)*y[n-1] + alpha*x[n] (gr::filter::single_pole_iir)."""

    def __init__(self, alpha: float, lead_shape: tuple = ()):
        self.alpha = float(alpha)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros(self.lead_shape, dtype=jnp.float32)

    def __call__(self, state, x):
        y = linear_recurrence(jnp.asarray(1.0 - self.alpha, x.dtype),
                              self.alpha * x, state)
        return y[..., -1], y
