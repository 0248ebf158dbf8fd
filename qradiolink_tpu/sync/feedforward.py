"""Feedforward (block-parallel) synchronization — the TPU-native high-rate
path.

The reference recovers timing/carrier/gain with sample-sequential feedback
loops (gr::digital::symbol_sync, costas_loop, agc2 — SURVEY §2.2), which
cannot batch: every output sample depends on the previous loop state. This
module re-derives each loop as a *feedforward estimate-then-apply* pass
(SURVEY §5 "two-pass reformulations"), so a whole IQ block is processed as
a handful of reshapes, reductions and elementwise ops — no lax.scan, no
gather, no FFT, no conv (none of which the axon TPU backend implements):

  gain     -> per-sub-block RMS normalization (replaces agc2)
  carrier  -> Viterbi&Viterbi M-th-power phase estimate per sub-block,
              linear phase interpolation between sub-blocks (replaces
              Costas/FLL)
  timing   -> Oerder&Meyr square-law estimator: the symbol-rate spectral
              line of |x|^2 is ONE DFT bin, computed as a dot product with
              a host-precomputed complex exponential (replaces M&M TED);
              applied with a cubic-Lagrange Farrow interpolator (fixed
              branch filters, per-sample fractional delay as elementwise
              math) and a one-hot frame-column contraction for the integer
              symbol offset (replaces the sequential interpolator stepping)

These are textbook burst-modem estimators (Oerder & Meyr 1988; Viterbi &
Viterbi 1983); their accuracy at the chains' operating SNRs is validated by
the loopback BER tests (tests/test_feedforward.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block


def block_agc(x: jax.Array, reference: float = 1.0,
              n_sub: int = 16, eps: float = 1e-12) -> jax.Array:
    """Feedforward AGC: normalize each of n_sub sub-blocks to `reference`
    RMS. T must be a multiple of n_sub."""
    t = x.shape[-1]
    lead = x.shape[:-1]
    sub = x.reshape(lead + (n_sub, t // n_sub))
    rms = jnp.sqrt(jnp.mean(jnp.abs(sub) ** 2, axis=-1, keepdims=True) + eps)
    return (sub * (reference / rms)).reshape(x.shape)


def _subblock_phases(x: jax.Array, order: int, n_sub: int):
    """V&V: phase of sum(x^order) per sub-block, divided by order."""
    t = x.shape[-1]
    lead = x.shape[:-1]
    xm = x
    for _ in range(int(np.log2(order))):
        xm = xm * xm  # order is 2 or 4
    sub = xm.reshape(lead + (n_sub, t // n_sub))
    s = jnp.sum(sub, axis=-1)
    return jnp.arctan2(s.imag, s.real) / order  # (..., n_sub)


def _unwrap(ph: jax.Array, period: float) -> jax.Array:
    """Unwrap sub-block phase estimates (few entries — log-depth cumsum
    via host loop over the small n_sub axis is fine; implemented with a
    prefix-sum tree of adds, no cumsum primitive)."""
    d = ph[..., 1:] - ph[..., :-1]
    jumps = jnp.round(d / period)
    corr = -jumps * period
    # prefix sum over the (small, static) sub-block axis
    n = corr.shape[-1]
    acc = corr
    shift = 1
    while shift < n:
        pad = jnp.zeros(corr.shape[:-1] + (shift,), corr.dtype)
        acc = acc + jnp.concatenate([pad, acc[..., :-shift]], axis=-1)
        shift *= 2
    return jnp.concatenate([ph[..., :1], ph[..., 1:] + acc], axis=-1)


def vv_carrier_correct(x: jax.Array, order: int = 2, n_sub: int = 16):
    """Viterbi&Viterbi carrier recovery: estimate residual carrier phase
    per sub-block from x^order, linearly interpolate the phase over time,
    and derotate. Returns (corrected, phases). Handles frequency offsets
    up to ~ order-ambiguity-limited slew per sub-block."""
    t = x.shape[-1]
    ph = _subblock_phases(x, order, n_sub)           # (..., n_sub)
    ph = _unwrap(ph, 2 * np.pi / order)
    # piecewise-linear phase at every sample: sub-block centers as knots
    ls = t // n_sub
    centers = (jnp.arange(n_sub, dtype=jnp.float32) + 0.5) * ls
    tt = jnp.arange(t, dtype=jnp.float32)
    # segment index per sample (static; computed via comparison sum)
    seg = jnp.clip(((tt - centers[0]) / ls), 0, n_sub - 1 - 1e-6)
    i0 = jnp.floor(seg)
    frac = seg - i0
    # select knot phases without gather: one-hot matmul over n_sub.
    # ph (..., n_sub) @ oh.T (n_sub, t) -> (..., t)
    ar = jnp.arange(n_sub, dtype=jnp.float32)
    oh0 = (i0[:, None] == ar[None, :]).astype(ph.dtype)
    oh1 = ((i0 + 1)[:, None] == ar[None, :]).astype(ph.dtype)
    p0 = ph @ oh0.T
    p1 = ph @ oh1.T
    phase_t = p0 + frac * (p1 - p0)
    rot = jnp.cos(phase_t) - 1j * jnp.sin(phase_t)
    return x * rot.astype(jnp.complex64), ph


def om_timing_bins(x: jax.Array, sps: int, n_sub: int = 4):
    """Oerder&Meyr spectral bin per sub-block, as REAL (re, im) planes.

    bin_k = sum_n |x[n]|^2 exp(-j 2 pi n / sps) over sub-block k, with
    the phase referenced to the BLOCK start (sub-block start offsets are
    compensated), evaluated as two real dot products against precomputed
    cos/sin vectors (complex64 arithmetic costs multi-ms representation
    shims on the axon TPU; see core.IqPair). Because the reference is
    the block start, bins from consecutive blocks whose lengths are
    multiples of sps share one phase reference and may be summed —
    which is what FeedforwardSymbolSync's streaming accumulator does.
    """
    t = x.shape[-1]
    lead = x.shape[:-1]
    ls = t // n_sub
    if jnp.iscomplexobj(x):
        p = (x.real * x.real + x.imag * x.imag).astype(jnp.float32)
    else:
        p = (x * x).astype(jnp.float32)
    p = p.reshape(lead + (n_sub, ls))
    n = np.arange(ls, dtype=np.float64)
    ang = -2 * np.pi * n / sps
    wc = jnp.asarray(np.cos(ang).astype(np.float32))
    ws = jnp.asarray(np.sin(ang).astype(np.float32))
    # sub-block start offsets shift the reference phase; compensate
    starts = np.arange(n_sub, dtype=np.float64) * ls
    a0 = -2 * np.pi * starts / sps
    w0c = jnp.asarray(np.cos(a0).astype(np.float32))
    w0s = jnp.asarray(np.sin(a0).astype(np.float32))
    sr = p @ wc
    si = p @ ws
    re = sr * w0c - si * w0s
    im = sr * w0s + si * w0c
    return re, im  # each (..., n_sub)


def _bins_to_tau(re: jax.Array, im: jax.Array, sps: int) -> jax.Array:
    return jnp.mod((-float(sps) / (2 * np.pi)) * jnp.arctan2(im, re),
                   float(sps))


def om_timing_estimate(x: jax.Array, sps: int, n_sub: int = 4) -> jax.Array:
    """Oerder&Meyr: per-sub-block symbol-timing offset in samples [0, sps).

    tau = -sps/(2*pi) * arg(bin_k); see om_timing_bins.
    """
    re, im = om_timing_bins(x, sps, n_sub)
    return _bins_to_tau(re, im, sps)  # (..., n_sub)


# cubic Lagrange Farrow branch filters over points [-1, 0, 1, 2]:
# y(n+mu) = sum_p mu^p * (c_p . x[n-1 : n+3])
_FARROW_C = np.array([
    [0.0, 1.0, 0.0, 0.0],                      # mu^0
    [-1 / 3, -1 / 2, 1.0, -1 / 6],             # mu^1
    [1 / 2, -1.0, 1 / 2, 0.0],                 # mu^2
    [-1 / 6, 1 / 2, -1 / 2, 1 / 6],            # mu^3
], dtype=np.float32)


def farrow_delay(x: jax.Array, mu: jax.Array) -> jax.Array:
    """Fractional-delay resample: y[n] = x(n + mu[n]), mu in [0, 1).

    Four fixed 4-tap branch FIRs + a per-sample cubic in mu. Output length
    T-3 (needs one sample of history and two of lookahead relative to n).
    y[n] uses x[n-1..n+2] evaluated at position n+mu.
    """
    t = x.shape[-1]
    n_out = t - 3
    win = [x[..., i: i + n_out] for i in range(4)]  # x[n-1+i] for out n
    branches = []
    for p in range(4):
        c = _FARROW_C[p]
        b = win[0] * c[0] + win[1] * c[1] + win[2] * c[2] + win[3] * c[3]
        branches.append(b)
    mu = mu[..., :n_out]
    acc = branches[3]
    for p in (2, 1, 0):
        acc = acc * mu + branches[p]
    return acc


def symbol_pick(y: jax.Array, tau_int: jax.Array, sps: int) -> jax.Array:
    """Pick one sample per symbol period at integer offset tau_int (per
    sub-block) via one-hot frame-column contraction — no gather.

    y: (..., S, Ns*sps) per-sub-block samples; tau_int: (..., S) in
    [0, sps). Returns (..., S, Ns) symbols.
    """
    lead = y.shape[:-1]
    ns = y.shape[-1] // sps
    frames = y.reshape(lead + (ns, sps))
    oh = (tau_int[..., None] ==
          jnp.arange(sps, dtype=tau_int.dtype)).astype(y.real.dtype)
    # contract the sps axis: (..., S, Ns, sps) * (..., S, 1, sps) -> sum
    return jnp.sum(frames * oh[..., None, :], axis=-1)


class FeedforwardSymbolSync(Block):
    """Block-parallel symbol timing recovery (O&M + Farrow).

    Consumes T samples at `sps` samples/symbol, emits T//sps symbols.
    Timing is estimated per sub-block and applied with a fractional
    (Farrow) plus integer (one-hot pick) correction. State carries the
    previous block's 4-sample tail so outputs are continuous; unlike the
    feedback SymbolSync there is no loop state to converge — acquisition
    is instant, which is also why this is the high-rate path.

    Streaming continuity (two carried mechanisms, both zero-cost):

    * a decayed sum of previous blocks' O&M spectral bins — each
      sub-block's timing is arg(bin_k + acc), so short blocks (few
      symbols per sub-block) can't flip the integer symbol offset from
      estimator self-noise alone. Valid because bins are
      phase-referenced to the block start and block lengths are
      multiples of sps, so consecutive blocks share one phase
      reference.
    * an EXTENDED pick (frames 2*sps wide, one symbol of carried
      history) with a one-time per-channel center: the circular offset
      estimate is applied as its representative nearest the carried
      center, so jitter around the mod-sps boundary cannot flip the
      pick by a whole symbol. Without this, a channel whose true
      timing lands near the application boundary duplicates/drops a
      symbol at block seams however stable the estimate is — measured
      at ~5% BER on a CLEAN channel when a 2 ksym/s chain was streamed
      in 200-symbol blocks. The sampling instant itself is unchanged
      (always the O&M optimum mod sps); only the cut point of the
      circle->interval map moves, at worst delaying every output by
      one symbol.

    `window` mode reads neither (block-partition invariance for
    parallel/sharding.time_sharded_chain requires window-local,
    stateless estimates).
    """

    #: accumulator decay per block: effective memory ~1/(1-decay) blocks
    ACC_DECAY = 0.75

    def __init__(self, sps: int, n_sub: int = 4, lead_shape: tuple = (),
                 window: int | None = None):
        """window: fixed estimator window in samples. When set, the
        number of sub-blocks scales with the block length (n_sub is
        ignored) so estimates are BLOCK-PARTITION INVARIANT — required
        for time-sharded processing to reproduce the serial stream
        exactly (parallel/sharding.time_sharded_chain)."""
        self.sps = int(sps)
        self.n_sub = int(n_sub)
        self.window = None if window is None else int(window)
        if self.window is not None and self.window % self.sps != 0:
            raise ValueError("window must be a multiple of sps")
        self.lead_shape = tuple(lead_shape)
        self.tail_len = 4

    def init_state(self):
        # f32 (re, im) tail planes (see core.IqPair for the complex64
        # tax; sps extra history so the streaming pick can reach one
        # symbol into the past) + [bin_re, bin_im, center, have]: the
        # streaming O&M bin accumulator and the one-time pick center
        return (jnp.zeros(self.lead_shape + (2, self.tail_len + self.sps),
                          jnp.float32),
                jnp.zeros(self.lead_shape + (4,), jnp.float32))

    def __call__(self, state, x):
        sps = self.sps
        tail, acc = state
        t = x.shape[-1]
        lead = x.shape[:-1]
        if jnp.iscomplexobj(x):
            tail_x = jax.lax.complex(tail[..., 0, :], tail[..., 1, :])
        else:
            tail_x = tail[..., 0, :].astype(x.dtype)
        xc = jnp.concatenate([tail_x, x], axis=-1)  # (..., t + sps + 4)
        if self.window is not None:
            if t % self.window != 0:
                raise ValueError(
                    f"block {t} not a multiple of window {self.window}")
            s = t // self.window
            assert t % (s * sps) == 0, "block must divide into n_sub*sps"
            # stateless window-local path (block-partition invariance):
            # 4-sample history, plain [0, sps) pick
            tau = om_timing_estimate(x, sps, n_sub=s)   # (..., s)
            # farrow_delay output is y[n] = x(n - 3 + mu) (4-sample
            # history, interpolation centered one past the window
            # start), so the pick offset compensates with +3
            tau = jnp.mod(tau + 3.0, float(sps))
            tau_i = jnp.floor(tau)
            mu = tau - tau_i
            ls = t // s
            mu_t = jnp.repeat(mu, ls, axis=-1, total_repeat_length=t)
            y = farrow_delay(xc[..., sps:], jnp.concatenate(
                [mu_t, mu_t[..., -3:]], axis=-1))       # (..., t+1)
            y = y[..., :t]
            ysub = y.reshape(lead + (s, ls))
            syms = symbol_pick(ysub, tau_i, sps)        # (..., s, ls/sps)
            syms = syms.reshape(lead + (t // sps,))
            new_acc = acc
        else:
            s = self.n_sub
            assert t % (s * sps) == 0, "block must divide into n_sub*sps"
            bre, bim = om_timing_bins(x, sps, n_sub=s)  # (..., s)
            sre = bre + acc[..., 0:1]
            sim = bim + acc[..., 1:2]
            tau = _bins_to_tau(sre, sim, sps)
            tau = jnp.mod(tau + 3.0, float(sps))        # applied offset
            # one-time per-channel pick center in [sps/2, 3*sps/2):
            # the circular offset is mapped to its representative
            # nearest the center, so estimate jitter around the mod-sps
            # boundary can never flip the pick by a whole symbol
            pool = _bins_to_tau(jnp.sum(sre, axis=-1),
                                jnp.sum(sim, axis=-1), sps)
            pool = jnp.mod(pool + 3.0, float(sps))
            c_new = pool + jnp.where(pool < sps / 2.0, float(sps), 0.0)
            center = jnp.where(acc[..., 3] > 0.5, acc[..., 2], c_new)
            k = jnp.round((center[..., None] - tau) / sps)
            o = jnp.clip(tau + k * float(sps), 0.0, 2.0 * sps - 1e-3)
            o_i = jnp.floor(o)                          # [0, 2*sps)
            mu = o - o_i
            ls = t // s
            mu_t = jnp.repeat(mu, ls, axis=-1, total_repeat_length=t)
            # y[j] = x(j - sps - 3 + mu_j), j in [0, t + sps): one
            # symbol of reach into the previous block
            mu_ext = jnp.concatenate(
                [jnp.repeat(mu[..., :1], sps, axis=-1,
                            total_repeat_length=sps),
                 mu_t, mu_t[..., -1:]], axis=-1)        # (..., t+sps+1)
            y = farrow_delay(xc, mu_ext)[..., : t + sps]
            # extended frames: 2*sps wide at sps stride, so the pick
            # window straddles the frame boundary
            ns = t // sps
            yf = y.reshape(lead + (ns + 1, sps))
            ext = jnp.concatenate([yf[..., :-1, :], yf[..., 1:, :]],
                                  axis=-1)              # (..., ns, 2sps)
            ext = ext.reshape(lead + (s, ns // s, 2 * sps))
            oh = (o_i[..., None] ==
                  jnp.arange(2 * sps, dtype=o_i.dtype)
                  ).astype(ext.real.dtype)
            syms = jnp.sum(ext * oh[..., None, :], axis=-1)
            syms = syms.reshape(lead + (ns,))
            new_acc = jnp.concatenate([
                self.ACC_DECAY * (
                    acc[..., :2]
                    + jnp.stack([jnp.sum(bre, axis=-1),
                                 jnp.sum(bim, axis=-1)], axis=-1)),
                center[..., None], jnp.ones(lead + (1,), jnp.float32)],
                axis=-1)
        new_tail = xc[..., xc.shape[-1] - (self.tail_len + sps):]
        if jnp.iscomplexobj(new_tail):
            new_tail = jnp.stack([new_tail.real, new_tail.imag], axis=-2)
        else:
            new_tail = new_tail.astype(jnp.float32)
            new_tail = jnp.stack([new_tail, jnp.zeros_like(new_tail)],
                                 axis=-2)
        return (new_tail, new_acc), syms
