"""Streaming FIR filters.

The reference filters everything with gr::filter::fft_filter_ccf/ccc/fff
(overlap-save FFT convolution) and polyphase fir_filter blocks. Here a FIR
is a pure function on (tail_state, x): the carried state is the last
ntaps-1 input samples, so output is bit-identical regardless of how the
stream is split into blocks.

Convention: y[n] = sum_k h[k] * x[n-k] with x[<0] from the carried tail
(zeros at stream start). Output length == input length / decim. With
decimation D, blocks must have T % D == 0 so the decimation phase is
preserved across block boundaries. Output y[m] aligns with input x[m*D].

Two implementations, selected automatically:
  * time-domain via lax.conv_general_dilated (XLA maps this onto the MXU)
  * frequency-domain via FFT multiply (overlap-save over the whole block)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from qradiolink_tpu.core import Block

_CONV_PRECISION = lax.Precision.HIGHEST


def _use_conv_primitive() -> bool:
    """Backend dispatch for the FIR inner loop.

    The axon TPU backend now implements lax.conv_general_dilated
    (verified empirically 2026-08; earlier revisions did not), but LARGE
    single FFTs remain UNIMPLEMENTED (complex FFT over ~256k points fails
    at runtime), so FirFilter's "auto" never picks the fft impl on TPU.
    CPU keeps the conv primitive (fastest there, used by the test suite);
    TPU uses the slice multiply-accumulate form, which XLA fuses into a
    single bandwidth-bound loop and which benchmarked faster than the
    conv primitive through this backend.
    """
    return jax.default_backend() == "cpu"


def _conv1d_real_conv(x: jax.Array, taps_flipped: jax.Array, stride: int = 1) -> jax.Array:
    """VALID 1-D correlation via the XLA convolution primitive."""
    lead = x.shape[:-1]
    xb = x.reshape((-1, 1, x.shape[-1]))
    rhs = taps_flipped.reshape((1, 1, -1))
    y = lax.conv_general_dilated(
        xb,
        rhs,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=_CONV_PRECISION,
    )
    return y.reshape(lead + (y.shape[-1],))


def _conv1d_real_slices(x: jax.Array, taps_flipped: jax.Array,
                        stride: int = 1) -> jax.Array:
    """VALID 1-D correlation as K plain slices x weighted sum.

    y[m] = sum_k tf[k] * x[m*stride + k]. Each k contributes one slice of
    x scaled by a scalar tap; XLA fuses the K-term reduction into a single
    bandwidth-bound elementwise loop. No conv primitive, no strided
    slicing (both UNIMPLEMENTED on the axon TPU backend): decimation is a
    reshape to (n_out, stride) frames followed by frame-column picks.
    """
    # concrete taps become numpy so each tf[j] is a Python scalar (constant
    # folded); traced taps (e.g. flipped under jit) stay traced — tf[j] is
    # then a 0-d tracer, which multiplies fine.
    if isinstance(taps_flipped, jax.core.Tracer):
        tf = taps_flipped
    else:
        tf = np.asarray(taps_flipped)
    k = tf.shape[-1]
    t = x.shape[-1]
    n_out = (t - k) // stride + 1
    if stride == 1:
        acc = x[..., 0:n_out] * tf[0]
        for j in range(1, k):
            acc = acc + x[..., j:j + n_out] * tf[j]
        return acc
    # stride > 1: view x[j::stride] as reshape-then-column. For offset j
    # write j = f*stride + r: frames of x[..., f*stride :] reshaped to
    # (n_out, stride) give column r == x[j + m*stride].
    lead = x.shape[:-1]
    # the frame slab for the largest offset f can extend up to stride-1
    # elements past the end of x (those columns are never read) — pad so
    # the reshape is always total
    max_f = (k - 1) // stride
    need = max_f * stride + n_out * stride
    if need > t:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, need - t)]
        x = jnp.pad(x, pad)
    frames = {}  # f -> (..., n_out, stride)
    acc = None
    for j in range(k):
        f, r = divmod(j, stride)
        if f not in frames:
            seg = x[..., f * stride: f * stride + n_out * stride]
            frames[f] = seg.reshape(lead + (n_out, stride))
        term = frames[f][..., r] * tf[j]
        acc = term if acc is None else acc + term
    return acc


def _conv1d_real_frames(x: jax.Array, taps_flipped: jax.Array,
                        stride: int) -> jax.Array:
    """Strided (decimating) FIR as F frame-chunk contractions.

    View x as frames xf[n, r] = x[n*stride + r]; then
      y[m] = sum_f dot(xf[m + f, :], H[f, :]),  H = tf padded to F*D.
    Each term is one einsum contracting the D axis — XLA maps these to
    MXU/VPU reductions with unit-stride reads, which benchmarked 3.6x
    faster than the slice-MAC form on the axon TPU for the 1 Msps /50
    chain heads (419 taps: 2.95 ms vs 10.54 ms at 128x200k f32).
    """
    tf = jnp.asarray(taps_flipped)
    k = tf.shape[-1]
    d = int(stride)
    t = x.shape[-1]
    n_out = (t - k) // d + 1
    f = -(-k // d)
    h = jnp.zeros(f * d, tf.dtype).at[:k].set(tf).reshape(f, d)
    need = (n_out + f - 1) * d
    if need > t:
        # the padded tail only ever multiplies the zero-padded taps
        # (indices >= k), so zero-fill is exact
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - t)])
    xf = x[..., :need].reshape(*x.shape[:-1], n_out + f - 1, d)
    acc = None
    for j in range(f):
        slab = lax.dynamic_slice_in_dim(xf, j, n_out, axis=-2)
        term = jnp.einsum("...nr,r->...n", slab, h[j],
                          precision=_CONV_PRECISION)
        acc = term if acc is None else acc + term
    return acc


def _conv1d_real(x: jax.Array, taps_flipped: jax.Array, stride: int = 1) -> jax.Array:
    if _use_conv_primitive():
        return _conv1d_real_conv(x, taps_flipped, stride)
    if stride > 1:
        return _conv1d_real_frames(x, taps_flipped, stride)
    return _conv1d_real_slices(x, taps_flipped, stride)


def conv1d_valid(x: jax.Array, taps: jax.Array, stride: int = 1,
                 out_len: int | None = None) -> jax.Array:
    """VALID FIR: y[m] = sum_k taps[k] * x[m*stride + K-1 - k].

    Handles any real/complex combination of x and taps via real convs.
    out_len (optional) truncates the output to the first out_len samples
    — callers that zero-pad x for the Pallas banded kernel (see
    ops/pallas_fir.py) pass the true output count here so the padding
    never leaks into results.
    """
    taps = jnp.asarray(taps)
    if not isinstance(taps, jax.core.Tracer) and jax.default_backend() == "tpu":
        from qradiolink_tpu.ops import pallas_fir
        y = pallas_fir.banded_fir(x, taps, stride, out_len)
        if y is not None:
            return y
    tf = taps[::-1]
    cx = jnp.iscomplexobj(x)
    ct = jnp.iscomplexobj(taps)
    if not cx and not ct:
        y = _conv1d_real(x, tf, stride)
    elif cx and not ct:
        yr = _conv1d_real(x.real, tf, stride)
        yi = _conv1d_real(x.imag, tf, stride)
        y = lax.complex(yr, yi)
    elif not cx and ct:
        yr = _conv1d_real(x, tf.real, stride)
        yi = _conv1d_real(x, tf.imag, stride)
        y = lax.complex(yr, yi)
    else:
        # complex * complex: 4 real convs
        rr = _conv1d_real(x.real, tf.real, stride)
        ii = _conv1d_real(x.imag, tf.imag, stride)
        ri = _conv1d_real(x.real, tf.imag, stride)
        ir = _conv1d_real(x.imag, tf.real, stride)
        y = lax.complex(rr - ii, ri + ir)
    if out_len is not None and y.shape[-1] != out_len:
        y = y[..., :out_len]
    return y


def fir_filter(x: jax.Array, taps: jax.Array, decim: int = 1) -> jax.Array:
    """One-shot FIR with zero history. y[m] = sum_k h[k] x[m*decim - k]."""
    k = np.asarray(taps).shape[0]
    pad = [(0, 0)] * (x.ndim - 1) + [(k - 1, 0)]
    return conv1d_valid(jnp.pad(x, pad), jnp.asarray(taps), decim)


def _fft_len(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(n, 2))))


def fft_fir_block(xc: jax.Array, taps: jax.Array, decim: int = 1) -> jax.Array:
    """Overlap-save core: xc already includes the K-1 history prefix.

    Returns the T/decim valid outputs (T = xc.shape[-1] - K + 1).
    """
    taps = jnp.asarray(taps)
    k = taps.shape[-1]
    t = xc.shape[-1] - (k - 1)
    n = _fft_len(xc.shape[-1])
    complex_out = jnp.iscomplexobj(xc) or jnp.iscomplexobj(taps)
    X = jnp.fft.fft(xc, n=n)
    H = jnp.fft.fft(taps.astype(jnp.complex64 if complex_out else None), n=n)
    y = jnp.fft.ifft(X * H)[..., k - 1 : k - 1 + t]
    if not complex_out:
        y = y.real
    if decim > 1:
        y = y[..., ::decim]
    return y


class FirFilter(Block):
    """Streaming FIR with carried input tail; optional decimation.

    impl: 'conv' | 'fft' | 'auto' (fft when ntaps > 96 and decim small).
    """

    def __init__(self, taps, decim: int = 1, impl: str = "auto",
                 lead_shape: tuple = ()):
        taps = np.asarray(taps)
        self.taps = jnp.asarray(taps)
        self.ntaps = int(taps.shape[0])
        self.decim = int(decim)
        self.complex_taps = np.iscomplexobj(taps)
        self.lead_shape = tuple(lead_shape)
        if impl == "auto":
            # fft overlap-save only where the backend supports long FFTs
            # (axon TPU: complex FFT over >~128k points is UNIMPLEMENTED)
            use_fft = (self.ntaps > 96 and self.decim <= 2
                       and jax.default_backend() == "cpu")
            impl = "fft" if use_fft else "conv"
        self.impl = impl

    def init_state(self):
        # tail stored as f32 (re, im) planes: every complex64 op on the
        # axon TPU pays a multi-ms representation shim (see core.IqPair),
        # so the hot IqPair path must touch no complex dtype at all
        return jnp.zeros(self.lead_shape + (2, self.ntaps - 1), jnp.float32)

    def _call_pair(self, state, x):
        """IqPair path: complex-free streaming FIR over f32 planes.

        Uses the concat-free Pallas banded kernel when servable
        (ops/pallas_fir.py banded_fir_stream); otherwise plane-wise jnp
        convolutions. Output is an IqPair; chains recombine to complex64
        only where a later stage genuinely needs the complex dtype.
        """
        from qradiolink_tpu.core import IqPair
        from qradiolink_tpu.ops import pallas_fir

        T = x.shape[-1]
        k = self.ntaps
        tail_re = state[..., 0, :]
        tail_im = state[..., 1, :]
        if (not self.complex_taps and self.impl != "fft"
                and T % self.decim == 0):
            n_out = T // self.decim
            res = pallas_fir.banded_fir_stream(
                (tail_re, tail_im), (x.re, x.im), self.taps,
                self.decim, n_out)
            if res is not None:
                (yr, yi), n_main = res
                if n_main < n_out:
                    m0 = n_main
                    start = m0 * self.decim - (k - 1)
                    ln = (n_out - 1 - m0) * self.decim + k
                    yr = jnp.concatenate([yr, conv1d_valid(
                        x.re[..., start:start + ln], self.taps,
                        self.decim)], axis=-1)
                    yi = jnp.concatenate([yi, conv1d_valid(
                        x.im[..., start:start + ln], self.taps,
                        self.decim)], axis=-1)
                new_state = jnp.stack([x.re[..., T - (k - 1):],
                                       x.im[..., T - (k - 1):]], axis=-2)
                return new_state, IqPair(yr, yi)
        # plane-wise fallback (CPU, small blocks, complex taps); real
        # taps still try the banded kernel on the explicit concat (the
        # stream kernel needs G*D >= padded-tail, which stride-1 long
        # filters like the 251-tap RRC violate)
        xc_re = jnp.concatenate([tail_re, x.re], axis=-1)
        xc_im = jnp.concatenate([tail_im, x.im], axis=-1)
        n_out = (T - 1) // self.decim + 1
        if not self.complex_taps and self.impl != "fft":
            yr = pallas_fir.banded_fir(xc_re, self.taps, self.decim,
                                       out_len=n_out)
            if yr is not None:
                yi = pallas_fir.banded_fir(xc_im, self.taps, self.decim,
                                           out_len=n_out)
                new_state = jnp.stack([xc_re[..., T:], xc_im[..., T:]],
                                      axis=-2)
                return new_state, IqPair(yr, yi)
        if self.complex_taps:
            tr = jnp.real(self.taps)
            ti = jnp.imag(self.taps)
            rr = conv1d_valid(xc_re, tr, self.decim, out_len=n_out)
            ii = conv1d_valid(xc_im, ti, self.decim, out_len=n_out)
            ri = conv1d_valid(xc_re, ti, self.decim, out_len=n_out)
            ir = conv1d_valid(xc_im, tr, self.decim, out_len=n_out)
            y = IqPair(rr - ii, ri + ir)
        else:
            y = IqPair(conv1d_valid(xc_re, self.taps, self.decim,
                                    out_len=n_out),
                       conv1d_valid(xc_im, self.taps, self.decim,
                                    out_len=n_out))
        new_state = jnp.stack([xc_re[..., T:], xc_im[..., T:]], axis=-2)
        return new_state, y

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        if isinstance(x, IqPair):
            return self._call_pair(state, x)
        tail_re = state[..., 0, :]
        if not jnp.iscomplexobj(x):
            tail_x = tail_re.astype(x.dtype)
        else:
            tail_x = lax.complex(tail_re, state[..., 1, :])
        parts = [tail_x, x]
        t_in = x.shape[-1] + self.ntaps - 1
        n_out = (t_in - self.ntaps) // self.decim + 1
        if self.impl != "fft" and not self.complex_taps:
            # zero-pad in the same concat so the Pallas banded kernel
            # (ops/pallas_fir.py) streams the block copy-free
            from qradiolink_tpu.ops import pallas_fir
            lead = int(np.prod(x.shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
            pad = pallas_fir.extra_pad(lead, t_in, self.ntaps, self.decim,
                                       jnp.iscomplexobj(x))
            if pad:
                parts.append(jnp.zeros(x.shape[:-1] + (pad,), x.dtype))
        xc = jnp.concatenate(parts, axis=-1)
        if self.impl == "fft":
            y = fft_fir_block(xc, self.taps, self.decim)
        else:
            y = conv1d_valid(xc, self.taps, self.decim, out_len=n_out)
        new_tail = xc[..., t_in - (self.ntaps - 1): t_in]
        if jnp.iscomplexobj(new_tail):
            new_state = jnp.stack([new_tail.real, new_tail.imag], axis=-2)
        else:
            new_tail = new_tail.astype(jnp.float32)
            new_state = jnp.stack([new_tail, jnp.zeros_like(new_tail)],
                                  axis=-2)
        return new_state, y


class FftFirFilter(FirFilter):
    """FFT-implemented streaming FIR (the fft_filter_ccf/ccc/fff equivalent)."""

    def __init__(self, taps, decim: int = 1, lead_shape: tuple = ()):
        super().__init__(taps, decim=decim, impl="fft", lead_shape=lead_shape)
