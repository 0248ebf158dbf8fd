"""Checkpoint/resume of streaming DSP state (SURVEY §5).

A stream processed as [block1, snapshot, restore-in-fresh-objects,
block2] must produce the same block2 outputs as an uninterrupted run —
the resumable-offline-processing property."""

import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.core import load_state, save_state
from qradiolink_tpu.models.registry import rx_chain

pytestmark = pytest.mark.fast


def test_snapshot_resume_bit_identical(tmp_path, rng):
    x = ((rng.standard_normal(40_000) + 1j * rng.standard_normal(40_000))
         * 0.1).astype(np.complex64)
    b1, b2 = jnp.asarray(x[:20_000]), jnp.asarray(x[20_000:])

    chain = rx_chain("4FSK2K")
    st, _ = chain(chain.init_state(), b1)
    _, ref = chain(st, b2)

    save_state(tmp_path / "st.npz", st)
    chain2 = rx_chain("4FSK2K")          # fresh objects, fresh process sim
    st2 = load_state(tmp_path / "st.npz", chain2.init_state())
    _, out = chain2(st2, b2)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k], np.float32),
                                      np.asarray(out[k], np.float32))


def test_snapshot_rejects_wrong_structure(tmp_path, rng):
    chain = rx_chain("NBFM")
    save_state(tmp_path / "st.npz", chain.init_state())
    other = rx_chain("4FSK2K")
    with pytest.raises(ValueError):
        load_state(tmp_path / "st.npz", other.init_state())
