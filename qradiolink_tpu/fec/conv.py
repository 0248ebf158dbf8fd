"""Convolutional coding: feed-forward encoder + soft-decision Viterbi.

The reference decodes every digital mode with gr::fec cc_decoder(k=7,
rate=2, polys={109,79}) — the CCSDS K=7 code with GR's bit ordering
(polynomials bit-reversed relative to the classic {0o133, 0o171} notation;
LSB of the polynomial taps the newest bit). SURVEY §2.2.

TPU formulation:
  * encoder: GF(2) FIR — XOR of shifted bit streams, fully vectorized
  * decoder: lax.scan over time; the 64-state add-compare-select step is
    vectorized across states (and any leading batch axes, e.g. the
    delay-diversity pair the BPSK/2FSK/GMSK chains decode in parallel —
    reference src/gr/gr_demod_bpsk.cpp:97-103)
  * soft input: uint8-style floats in [0,255], 128 = erasure (the chains'
    x128+128 soft-bit convention); punctured positions are filled with 128
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _parity(x: np.ndarray) -> np.ndarray:
    p = x.copy()
    for s in (16, 8, 4, 2, 1):
        p ^= p >> s
    return p & 1


class ConvCode:
    """Rate 1/n feed-forward convolutional code.

    Bit convention (matches GR cc_encoder): at time t the encoder window is
    w = b[t] | b[t-1]<<1 | ... | b[t-K+1]<<(K-1); output_i = parity(poly_i & w).
    State = previous K-1 bits, newest at LSB.
    """

    def __init__(self, k: int, polys):
        self.K = int(k)
        self.polys = tuple(int(p) for p in polys)
        self.n = len(self.polys)
        ns = 1 << (self.K - 1)
        self.num_states = ns
        # transition tables: for state s (K-1 bits, newest at LSB) and input
        # b, the window is w = b | (s << 1) and next state = w & (ns-1)
        s = np.arange(ns, dtype=np.uint32)
        tables = []
        for b in (0, 1):
            w = (s << 1) | b
            outs = [_parity(w & p) for p in self.polys]
            nxt = w & (ns - 1)
            tables.append((nxt, np.stack(outs, axis=-1)))
        self.next_state = np.stack([tables[0][0], tables[1][0]])   # (2, ns)
        self.outputs = np.stack([tables[0][1], tables[1][1]])      # (2, ns, n)
        # predecessor table for ACS: state s' has preds p in {s'>>1, s'>>1 + ns/2}
        # via w = (p<<1)|b with b = s'&1 ... derive directly:
        # next = ((p<<1)|b) & (ns-1)  => bits of next: [p_{K-3}..p_0, b]
        # so b = s'&1 and p = (s'>>1) | (hi << (K-2)) for hi in {0,1}
        sp = np.arange(ns, dtype=np.uint32)
        self.pred = np.stack([sp >> 1, (sp >> 1) | (1 << (self.K - 2))])  # (2, ns)
        self.pred_bit = (sp & 1).astype(np.uint32)                        # (ns,)
        # expected outputs along each pred edge: outputs[b=s'&1, pred]
        exp = []
        for hi in (0, 1):
            exp.append(self.outputs[self.pred_bit, self.pred[hi]])  # (ns, n)
        self.edge_out = np.stack(exp)  # (2, ns, n)


CCSDS_K7 = ConvCode(7, (109, 79))


def conv_encode(code: ConvCode, bits: jax.Array, init_state: int = 0) -> jax.Array:
    """bits (..., T) {0,1} -> coded (..., T*n), streams interleaved per input bit."""
    K, polys = code.K, code.polys
    T = bits.shape[-1]
    # history prefix from init_state (newest-first bits at LSB)
    hist = jnp.asarray(
        [(init_state >> i) & 1 for i in range(K - 1)][::-1], dtype=bits.dtype)
    hist = jnp.broadcast_to(hist, bits.shape[:-1] + (K - 1,))
    bx = jnp.concatenate([hist, bits], axis=-1)
    outs = []
    for p in polys:
        acc = jnp.zeros_like(bits)
        for j in range(K):
            if (p >> j) & 1:
                acc = acc ^ bx[..., K - 1 - j : K - 1 - j + T]
        outs.append(acc)
    return jnp.stack(outs, axis=-1).reshape(bits.shape[:-1] + (T * code.n,))


def viterbi_decode(code: ConvCode, soft: jax.Array,
                   start_metric: jax.Array | None = None):
    """Soft Viterbi decode.

    soft: (..., T, n) in [0, 255]; 255 = confident 1, 0 = confident 0,
          128 = erasure.
    Returns (bits (..., T) uint8, final_metrics (..., num_states)).
    Traceback starts at the best-metric end state (free-running stream
    convention; pass start_metric to pin a known start state).
    """
    ns = code.num_states
    pred = jnp.asarray(code.pred.astype(np.int32))          # (2, ns)
    edge_out = jnp.asarray(code.edge_out.astype(np.float32))  # (2, ns, n)

    lead = soft.shape[:-2]
    T = soft.shape[-2]
    x = soft.astype(jnp.float32).reshape((-1, T, code.n))
    B = x.shape[0]

    if start_metric is None:
        pm0 = jnp.zeros((B, ns), jnp.float32)
    else:
        pm0 = jnp.broadcast_to(start_metric.reshape((-1, ns)), (B, ns))

    xs = jnp.moveaxis(x, 1, 0)  # (T, B, n)

    def acs(pm, s_t):
        # branch metric for an edge expecting bits e: sum_i (e? 255-s : s)
        # s_t: (B, n); edge_out: (2, ns, n)
        bm = jnp.sum(jnp.where(edge_out[None] > 0.5,
                               255.0 - s_t[:, None, None, :],
                               s_t[:, None, None, :]), axis=-1)  # (B, 2, ns)
        # cand[b, hi, s'] = pm[b, pred[hi, s']] + bm[b, hi, s']
        cand = jnp.take(pm, pred, axis=-1) + bm
        dec = jnp.argmin(cand, axis=1).astype(jnp.uint8)  # (B, ns)
        new_pm = jnp.min(cand, axis=1)
        new_pm = new_pm - jnp.min(new_pm, axis=-1, keepdims=True)  # normalize
        return new_pm, dec

    pm, decs = jax.lax.scan(acs, pm0, xs)  # decs: (T, B, ns)

    # traceback (reverse scan)
    end_state = jnp.argmin(pm, axis=-1).astype(jnp.int32)  # (B,)
    hi_shift = code.K - 2

    def tb(s, dec_t):
        # bit emitted on the transition INTO state s is s & 1
        bit = (s & 1).astype(jnp.uint8)
        d = jnp.take_along_axis(dec_t, s[:, None], axis=-1)[:, 0].astype(jnp.int32)
        p = (s >> 1) | (d << hi_shift)
        return p, bit

    _, bits_rev = jax.lax.scan(tb, end_state, decs, reverse=True)
    # bits_rev[t] = bit decoded for time t (scan reverse keeps time order)
    bits = jnp.moveaxis(bits_rev, 0, -1).reshape(lead + (T,))
    return bits, pm.reshape(lead + (ns,))


def _acs_scan(code: ConvCode, pm0, xs, pred, edge_out):
    """Run the add-compare-select recursion; xs (T, B, n)."""
    def acs(pm, s_t):
        bm = jnp.sum(jnp.where(edge_out[None] > 0.5,
                               255.0 - s_t[:, None, None, :],
                               s_t[:, None, None, :]), axis=-1)
        cand = jnp.take(pm, pred, axis=-1) + bm
        dec = jnp.argmin(cand, axis=1).astype(jnp.uint8)
        new_pm = jnp.min(cand, axis=1)
        new_pm = new_pm - jnp.min(new_pm, axis=-1, keepdims=True)
        return new_pm, dec

    return jax.lax.scan(acs, pm0, xs)


class StreamingViterbi:
    """Continuous Viterbi with carried path metrics and delayed decisions.

    Replaces the reference's free-running gr::fec cc_decoder: each call
    consumes T soft symbol pairs and emits T bits, delayed by `lag` symbols
    (the traceback merge depth, default 64 ≈ 9*K). State carries the path
    metrics at the emission horizon plus the pending soft symbols, so the
    output is independent of how the stream is blocked.
    """

    def __init__(self, code: ConvCode = None, lag: int = 64,
                 lead_shape: tuple = ()):
        self.code = code or CCSDS_K7
        self.lag = int(lag)
        self.lead_shape = tuple(lead_shape)
        self._pred = jnp.asarray(self.code.pred.astype(np.int32))
        self._edge_out = jnp.asarray(self.code.edge_out.astype(np.float32))

    def init_state(self):
        ns = self.code.num_states
        pm = jnp.zeros(self.lead_shape + (ns,), jnp.float32)
        tail = jnp.full(self.lead_shape + (self.lag, self.code.n), 128.0,
                        jnp.float32)
        return (pm, tail)

    def __call__(self, state, soft):
        """soft: (..., T, n) -> bits (..., T) uint8 (delayed by lag)."""
        pm0, tail = state
        lead = soft.shape[:-2]
        T = soft.shape[-2]
        n = self.code.n
        ns = self.code.num_states
        x = jnp.concatenate([tail, soft.astype(jnp.float32)], axis=-2)
        xb = x.reshape((-1, T + self.lag, n))
        B = xb.shape[0]
        xs = jnp.moveaxis(xb, 1, 0)
        pm0b = pm0.reshape((-1, ns))
        # phase 1: first T symbols -> new carried metrics
        pm1, dec1 = _acs_scan(self.code, pm0b, xs[:T], self._pred, self._edge_out)
        # phase 2: lag lookahead symbols
        pm2, dec2 = _acs_scan(self.code, pm1, xs[T:], self._pred, self._edge_out)
        decs = jnp.concatenate([dec1, dec2], axis=0)
        end_state = jnp.argmin(pm2, axis=-1).astype(jnp.int32)
        hi_shift = self.code.K - 2

        def tb(s, dec_t):
            bit = (s & 1).astype(jnp.uint8)
            d = jnp.take_along_axis(dec_t, s[:, None], axis=-1)[:, 0].astype(jnp.int32)
            p = (s >> 1) | (d << hi_shift)
            return p, bit

        _, bits_all = jax.lax.scan(tb, end_state, decs, reverse=True)
        bits = jnp.moveaxis(bits_all[:T], 0, -1).reshape(lead + (T,))
        new_tail = x[..., T:, :]
        return (pm1.reshape(lead + (ns,)), new_tail), bits


def depuncture(soft: jax.Array, pattern, n: int = 2) -> jax.Array:
    """Insert neutral (128) soft values at punctured positions.

    pattern: 1-D 0/1 array over the coded-bit cycle (1 = transmitted).
    soft: (..., Tp) received soft bits; returns (..., Tc) with
    Tc = Tp * len(pattern) / sum(pattern), reshaped to (..., Tc//n, n).
    """
    pat = np.asarray(pattern, dtype=bool)
    kept = int(pat.sum())
    Tp = soft.shape[-1]
    if Tp % kept != 0:
        raise ValueError("soft length not a multiple of puncture pattern keeps")
    cycles = Tp // kept
    Tc = cycles * pat.size
    out = jnp.full(soft.shape[:-1] + (cycles, pat.size), 128.0, soft.dtype)
    idx = np.nonzero(pat)[0]
    out = out.at[..., idx].set(soft.reshape(soft.shape[:-1] + (cycles, kept)))
    out = out.reshape(soft.shape[:-1] + (Tc,))
    return out.reshape(soft.shape[:-1] + (Tc // n, n))
