"""Core streaming-block abstraction.

The reference (qradiolink) builds GNU Radio flowgraphs: one thread per block,
ring buffers between blocks, implicit per-block state (see reference
src/gr/gr_demod_base.cpp:180-200). Here a *block* is a pure function on
explicit state:

    state' , y = block(state, x)

and a *chain* is a trace-time composition of blocks compiled as ONE XLA
program per IQ time-block. Streaming is an outer host loop (`run_stream`) or
`lax.scan` over pre-split blocks (`scan_stream`). Because state is explicit,
processing a stream in one big block or many small blocks yields identical
output (block-size invariance) — the property that replaces the GR
scheduler's correctness, tested per primitive in tests/test_fir.py,
test_resample.py, test_ops.py, test_sync.py and at whole-chain level in
tests/test_chains_digital.py::test_full_chain_block_size_invariance.

Blocks are dataclass-like Python objects: hyperparameters (tap arrays, rates)
are Python/ndarray constants baked into the trace; state is a pytree of
jnp arrays. All blocks operate on the LAST axis (time) and broadcast over
leading axes, so `jax.vmap` over channels is mechanical.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

State = Any
Array = jax.Array


class _BuildOnHost(type):
    """Metaclass running Block constructors with the CPU as default device.

    Hyperparameter arrays (filter taps, symbol maps) created with jnp.* in
    constructors become host-backed constants. When a chain is later traced
    for an accelerator, XLA embeds them as literals — which requires a
    device->host copy if they lived on the accelerator, an operation the
    axon TPU backend does not implement. Host-backed constants avoid that
    and also keep construction (tap design) off the device entirely.
    """

    def __call__(cls, *args, **kwargs):
        try:
            # process-LOCAL cpu device: in a multi-host session
            # jax.devices("cpu")[0] is process 0's device, and constants
            # placed there cannot be embedded when other hosts trace the
            # chain (parallel/multihost.py)
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:  # pragma: no cover - cpu platform always exists
            return super().__call__(*args, **kwargs)
        with jax.default_device(cpu):
            return super().__call__(*args, **kwargs)


class Block(metaclass=_BuildOnHost):
    """Base class for streaming DSP blocks.

    Subclasses implement:
      init_state(self) -> State           (pytree of jnp arrays; may be ())
      __call__(self, state, x) -> (State, y)

    Stateless blocks may subclass `Stateless` instead and implement
    `apply(self, x)`.
    """

    def init_state(self) -> State:
        return ()

    def __call__(self, state: State, x: Array):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- conveniences -------------------------------------------------------
    def one_shot(self, x: Array) -> Array:
        """Run on a single block from fresh state, return output only."""
        _, y = self(self.init_state(), x)
        return y


class Stateless(Block):
    """Block with no carried state."""

    def apply(self, x: Array) -> Array:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, state: State, x: Array):
        return state, self.apply(x)


class Fn(Stateless):
    """Wrap a plain function as a stateless block."""

    def __init__(self, fn: Callable[[Array], Array], name: str | None = None):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "fn")

    def apply(self, x: Array) -> Array:
        return self.fn(x)


class Chain(Block):
    """Serial composition of blocks. State is a tuple of member states.

    Mirrors the role of gr::hier_block2 in the reference's demod chains
    (e.g. reference src/gr/gr_demod_nbfm.cpp:31-79) but is compiled as one
    fused XLA program instead of a thread-per-block pipeline.
    """

    def __init__(self, blocks: Sequence[Block], name: str = "chain"):
        self.blocks = tuple(blocks)
        self.name = name

    def init_state(self) -> State:
        return tuple(b.init_state() for b in self.blocks)

    def __call__(self, state: State, x: Array):
        new_states = []
        for b, s in zip(self.blocks, state):
            s, x = b(s, x)
            new_states.append(s)
        return tuple(new_states), x


class Sequencer:
    """Helper for chains with taps/branches: threads state through blocks
    called in a fixed order.

        def __call__(self, state, x):
            seq = Sequencer(state)
            y = seq(self.resamp, x)
            tap = probe(y)                # taps are just reads
            y = seq(self.filter, y)
            return seq.states(), {...}

    The call order must be static (same every trace) — it defines the
    state pytree layout.
    """

    def __init__(self, state: State):
        self._iter = iter(state)
        self._new = []

    def __call__(self, block: Block, x: Array) -> Array:
        s, y = block(next(self._iter), x)
        self._new.append(s)
        return y

    def states(self) -> State:
        return tuple(self._new)


def init_states(blocks: Sequence[Block]) -> State:
    return tuple(b.init_state() for b in blocks)


def device_init_state(block: Block) -> State:
    """Materialize a block's initial state on the default device via a
    jitted program.

    The axon TPU backend does not implement host->device transfer of
    complex64 arrays (device_put of complex poisons the device stream for
    the whole process), but complex arrays *computed by* an XLA program —
    including jnp.zeros constants inside jit — work fine. Any state
    pytree with complex leaves headed for the TPU must be created this
    way rather than by calling init_state() eagerly.
    """
    return jax.jit(block.init_state)()


class IqPair(NamedTuple):
    """Complex IQ carried as two float32 planes.

    On the axon TPU backend every op touching complex64 arrays pays a
    multi-millisecond representation-shim cost (X64SplitHigh/Low
    custom-calls; measured ~3 ms just for .real on a 128x200k block).
    High-rate chain heads therefore accept IqPair — the decimating
    front-end (ops/pallas_fir.py) consumes the planes directly and the
    chain recombines to complex64 only after decimation, where arrays
    are ~50x smaller. A plain NamedTuple, so it is a pytree and shards
    like its leaves.
    """
    re: Array
    im: Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    # complex-API aliases so plane-wise consumers (mag, power) written
    # against .real/.imag work unchanged
    @property
    def real(self):
        return self.re

    @property
    def imag(self):
        return self.im

    def to_complex(self) -> Array:
        return jax.lax.complex(self.re, self.im)

    # real-scalar/array scaling stays plane-wise (complex-free); the
    # tuple-repetition semantics a NamedTuple would inherit are useless
    # for a signal type
    def __mul__(self, other):
        return IqPair(self.re * other, self.im * other)

    __rmul__ = __mul__


def iq_abs(x) -> Array:
    """Magnitude for complex arrays or IqPair (plane-wise, complex-free)."""
    if isinstance(x, IqPair):
        return jnp.sqrt(x.re * x.re + x.im * x.im)
    return jnp.abs(x)


def iq_take(x, idx, axis: int = -2):
    """Channel-subset selection that works for complex arrays and IqPair.

    Contiguous ascending index ranges (the MultichannelRx group layout)
    lower to a plain slice instead of a gather — gathers are expensive
    on the TPU backend."""
    import numpy as np

    if isinstance(idx, jax.core.Tracer):
        idx_np = None
    else:
        idx_np = np.asarray(idx)
    if idx_np is not None and idx_np.ndim == 1 and idx_np.size > 0 and \
            np.array_equal(idx_np, np.arange(idx_np[0],
                                             idx_np[0] + idx_np.size)):
        lo = int(idx_np[0])
        hi = lo + int(idx_np.size)
        def sl(a):
            ax = axis % a.ndim
            ix = [slice(None)] * a.ndim
            ix[ax] = slice(lo, hi)
            return a[tuple(ix)]
        if isinstance(x, IqPair):
            return IqPair(sl(x.re), sl(x.im))
        return sl(x)
    if isinstance(x, IqPair):
        return IqPair(jnp.take(x.re, idx, axis=axis),
                      jnp.take(x.im, idx, axis=axis))
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def put_iq_pair(x) -> IqPair:
    """Transfer complex IQ to the device as an IqPair (two f32 planes).

    The zero-copy-friendly input form for the 1 Msps chain heads; see
    IqPair. Accepts numpy complex or a (re, im) tuple."""
    import numpy as np

    if isinstance(x, IqPair):
        return x
    if isinstance(x, tuple) and len(x) == 2:
        return IqPair(jnp.asarray(x[0], jnp.float32),
                      jnp.asarray(x[1], jnp.float32))
    x = np.asarray(x)
    r = jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32))
    i = jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32))
    return IqPair(r, i)


def get_iq(x):
    """Fetch IQ to the host as numpy complex64.

    Device->host transfer of complex64 is UNIMPLEMENTED on the axon TPU
    backend (like the host->device direction put_iq works around), so a
    complex device array is split on-device by a jitted program and the
    two float32 planes are fetched instead. IqPair and numpy inputs pass
    straight through."""
    import numpy as np

    if isinstance(x, IqPair):
        return (np.asarray(x.re) + 1j * np.asarray(x.im))             .astype(np.complex64)
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "dtype") and jnp.iscomplexobj(x):
        r, i = _split_iq(x)
        return (np.asarray(r) + 1j * np.asarray(i)).astype(np.complex64)
    return np.asarray(x)


@jax.jit
def _split_iq(c: Array):
    return c.real, c.imag


def put_iq(x) -> Array:
    """Transfer a complex IQ array to the default device.

    Complex64 device_put is UNIMPLEMENTED on the axon TPU backend, so the
    real and imaginary planes are transferred as float32 and recombined
    on-device by a tiny jitted program. Works identically (if needlessly)
    on CPU.
    """
    import numpy as np

    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jnp.asarray(x)
    r = jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32))
    i = jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32))
    return _combine_iq(r, i)


@jax.jit
def _combine_iq(r: Array, i: Array) -> Array:
    return jax.lax.complex(r, i)


def run_stream(block: Block, chunks: Iterable[Array], state: State = None):
    """Host-side streaming loop: feed successive chunks through `block`.

    Yields outputs per chunk. This is the online/real-time path; for offline
    whole-file processing prefer `scan_stream` (single device program).
    """
    if state is None:
        state = block.init_state()
    for chunk in chunks:
        state, y = block(state, chunk)
        yield y


def scan_stream(block: Block, x_blocks: Array, state: State = None):
    """Run `block` over a pre-split stream with `lax.scan`.

    x_blocks: array of shape (num_blocks, ...block shape...).
    Returns (final_state, y_blocks).
    """
    if state is None:
        state = block.init_state()

    def step(s, xb):
        s, yb = block(s, xb)
        return s, yb

    return jax.lax.scan(step, state, x_blocks)


def concat_stream_out(y_blocks: Array) -> Array:
    """Collapse scan_stream block outputs (N, ..., T) back to (..., N*T)."""
    y = jnp.moveaxis(y_blocks, 0, -2)
    return y.reshape(*y.shape[:-2], y.shape[-2] * y.shape[-1])


def save_state(path, state: State) -> None:
    """Snapshot a chain's streaming state pytree to disk (.npz).

    The resumable-offline-processing half of checkpoint/resume
    (SURVEY §5): together with Settings.save this captures everything a
    later process needs to continue a stream bit-identically — filter
    tails, loop phases, squelch envelopes, Viterbi overlap windows.
    Complex leaves are stored as f32 planes so the snapshot round-trips
    on the axon TPU backend (complex64 transfers are unimplemented)."""
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        a = get_iq(leaf) if (hasattr(leaf, "dtype")
                             and jnp.iscomplexobj(leaf)) else np.asarray(leaf)
        if np.iscomplexobj(a):
            arrays[f"l{i}_re"] = np.ascontiguousarray(a.real)
            arrays[f"l{i}_im"] = np.ascontiguousarray(a.imag)
        else:
            arrays[f"l{i}"] = a
    arrays["_treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    arrays["_n"] = np.asarray(len(leaves))
    np.savez(path, **arrays)


def load_state(path, like: State) -> State:
    """Restore a snapshot produced by save_state. `like` provides the
    pytree structure (e.g. chain.init_state()); leaf dtypes/shapes must
    match what was saved."""
    import numpy as np

    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = int(data["_n"])
    if n != len(leaves_like):
        raise ValueError(
            f"snapshot has {n} leaves, structure expects {len(leaves_like)}")
    out = []
    for i, ref in enumerate(leaves_like):
        if f"l{i}_re" in data:
            leaf = _combine_iq(jnp.asarray(data[f"l{i}_re"], jnp.float32),
                               jnp.asarray(data[f"l{i}_im"], jnp.float32))
        else:
            leaf = jnp.asarray(data[f"l{i}"])
        if hasattr(ref, "shape") and tuple(leaf.shape) != tuple(ref.shape):
            if int(np.prod(leaf.shape)) == int(np.prod(ref.shape)):
                leaf = leaf.reshape(ref.shape)  # 0-d/1-d scalar roundtrip
            else:
                raise ValueError(
                    f"leaf {i}: snapshot shape {leaf.shape} != "
                    f"expected {ref.shape}")
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
