"""Sharding utilities over jax.sharding.Mesh.

Channel parallelism: a chain built with lead_shape=(C,) is a pure function
(state, x[C, T]) -> (state, y[C, ...]); sharding the C axis with
NamedSharding lets GSPMD run C/n channels per device with zero
communication — the TPU equivalent of the reference's per-channel flowgraph
threads (reference src/gr/gr_demod_mmdvm_multi2.cpp per-channel chains).

Time parallelism: FIR stages only need the previous K-1 input samples
(their streaming "state"), so a long block can be split across devices with
a left-halo exchange (ppermute from the left neighbor) — the TPU
equivalent of overlap-save block independence (SURVEY §2.8, §5).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qradiolink_tpu.ops.fir import conv1d_valid


def make_mesh(n_devices: int | None = None, axis: str = "ch",
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_over_channels(chain, mesh: Mesh, axis: str = "ch"):
    """Jit a chain's step with its leading channel axis sharded over `axis`.

    The chain must have been built with lead_shape=(C,), C a multiple of
    the mesh axis size. Returns (jitted_step, place) where place(state, x)
    device_puts inputs with the right shardings.
    """
    data_sh = NamedSharding(mesh, P(axis))

    def shard_leaf(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return jax.device_put(leaf, data_sh)
        return leaf

    def place(tree):
        return jax.tree_util.tree_map(shard_leaf, tree)

    @jax.jit
    def step(state, x):
        return chain(state, x)

    return step, place


def halo_exchange_left(x_local: jax.Array, halo: int, axis_name: str):
    """Inside shard_map over a time axis: prepend the left neighbor's last
    `halo` samples (zeros on the first shard)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    tail = x_local[..., -halo:]
    perm = [(i, i + 1) for i in range(n - 1)]
    recv = jax.lax.ppermute(tail, axis_name, perm)
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return jnp.concatenate([recv, x_local], axis=-1)


def time_sharded_fir(taps, mesh: Mesh, axis: str = "t", decim: int = 1):
    """Build a jitted FIR over a time-sharded stream x[T] (T = n*local).

    Each device filters its local block using a K-1 halo from the left
    neighbor — bit-identical to the serial streaming FIR with zero initial
    state. Decimation requires local block length % decim == 0.
    """
    taps = jnp.asarray(taps)
    k = taps.shape[-1]

    def local_fir(x_local):
        xc = halo_exchange_left(x_local, k - 1, axis)
        return conv1d_valid(xc, taps, stride=decim)

    fn = jax.shard_map(
        local_fir, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    return jax.jit(fn)


def time_sharded_chain(chain, mesh: Mesh, halo: int, out_keys=("bits",),
                       axis: str = "t", out_ratio: dict | None = None):
    """Run a FULL feedforward chain with the TIME axis sharded over the
    mesh — sequence parallelism for one high-rate channel (SURVEY §2.8
    "Block/time parallelism": the framework's sequence/context axis).

    Every stage of a feedforward chain (FIR/resampler tails, the
    Oerder&Meyr timing estimator's window, the tiled Viterbi's overlap)
    has bounded input memory, so a shard can reproduce the serial
    output EXACTLY from `halo` extra input samples fetched from its left
    neighbor (one ppermute) — the whole-chain generalization of
    overlap-save. Each shard runs the chain zero-initialized on
    halo+local input and drops the warm-up outputs; provided `halo`
    covers the chain's total memory and the local length keeps the
    chain's block quantum aligned, shard outputs equal the serial run's.

    chain: built for unbatched (T,) IQ in, dict of (T*r,) outputs.
    out_ratio: output key -> outputs-per-input-sample (default inferred
    from a tiny eval is not possible under shard_map; pass explicitly
    for keys whose rate differs from bits).

    Returns jitted fn: x[T_global] (sharded over axis) -> dict of
    sharded outputs, each shard trimmed of its warm-up region (the first
    shard is zero-padded at the front to keep shapes uniform; its
    leading halo*r outputs are the same values a serial run produces
    because both start from zero state).
    """
    ratios = dict(out_ratio or {})

    def local_step(x_local):
        xh = halo_exchange_left(x_local, halo, axis)
        _, out = chain(chain.init_state(), xh)
        trimmed = {}
        for k in out_keys:
            y = out[k]
            r = ratios.get(k)
            if r is None:
                # infer from produced length: len = (local+halo)*r
                r = y.shape[-1] / xh.shape[-1]
            drop = int(round(halo * r))
            trimmed[k] = y[..., drop:]
        return trimmed

    fn = jax.shard_map(
        local_step, mesh=mesh, in_specs=P(axis),
        out_specs={k: P(axis) for k in out_keys})
    return jax.jit(fn)


class MultichannelRx:
    """Polyphase channelizer front-end + per-channel demod chains, with the
    channel axis sharded over the mesh — the BASELINE 64-channel mixed
    config (channelizer on one wideband stream, NBFM+4FSK per channel).

    Because different modes have different chain structures, channels are
    grouped by mode: each group is one vmapped chain over its channel
    subset; groups run in the same jitted step.
    """

    def __init__(self, num_channels: int, groups, mesh: Mesh | None = None,
                 axis: str = "ch", channelizer=None):
        """groups: list of (chain_factory, channel_indices)."""
        from qradiolink_tpu.ops.channelizer import PfbChannelizer

        self.M = int(num_channels)
        self.channelizer = channelizer or PfbChannelizer(self.M)
        self.groups = []
        for factory, idxs in groups:
            idxs = np.asarray(idxs, np.int32)
            chain = factory(lead_shape=(len(idxs),))
            self.groups.append((chain, idxs))
        self.mesh = mesh
        self.axis = axis

    def init_state(self):
        return (self.channelizer.init_state(),
                tuple(c.init_state() for c, _ in self.groups))

    def __call__(self, state, iq):
        from qradiolink_tpu.core import iq_take
        ch_state, g_states = state
        ch_state, chans = self.channelizer(ch_state, iq)  # (M, T/M)
        new_g = []
        outs = []
        for (chain, idxs), gs in zip(self.groups, g_states):
            x = iq_take(chans, idxs, axis=-2)
            gs, out = chain(gs, x)
            new_g.append(gs)
            outs.append(out)
        return (ch_state, tuple(new_g)), outs

    def jit_step(self):
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.axis))

            def constrain(tree):
                def leaf(x):
                    if hasattr(x, "ndim") and x.ndim >= 1:
                        return jax.lax.with_sharding_constraint(x, sh)
                    return x
                return jax.tree_util.tree_map(leaf, tree)
        else:
            def constrain(tree):
                return tree

        def step(state, iq):
            from qradiolink_tpu.core import iq_take
            ch_state, g_states = state
            ch_state, chans = self.channelizer(ch_state, iq)
            new_g = []
            outs = []
            for (chain, idxs), gs in zip(self.groups, g_states):
                x = constrain(iq_take(chans, idxs, axis=-2))
                gs, out = chain(constrain(gs), x)
                new_g.append(gs)
                outs.append(out)
            return (ch_state, tuple(new_g)), outs

        return jax.jit(step)
