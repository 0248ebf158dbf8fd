"""Pallas-vs-jnp path selection must be observable, and the headline
bench chain must serve its hot stages from the Pallas kernels at bench
shapes (VERDICT r4 item 8: no silent fallbacks).

Path decisions happen at TRACE time, so jax.eval_shape (abstract
evaluation, no kernel execution) exercises them on CPU with
availability forced — the same decision the chain makes on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qradiolink_tpu.ops.pallas_fir as pf
import qradiolink_tpu.fec.viterbi_pallas as vp
from qradiolink_tpu.utils.profiling import pallas_paths

pytestmark = pytest.mark.fast


@pytest.fixture
def forced_tpu_paths(monkeypatch):
    monkeypatch.setattr(pf, "available", lambda: True)
    monkeypatch.setattr(vp, "available", lambda: True)
    pf.plan.cache_clear()
    pf.stream_plan.cache_clear()
    pf.depthwise_plan.cache_clear()
    pallas_paths.reset()
    yield
    pf.plan.cache_clear()
    pf.stream_plan.cache_clear()
    pf.depthwise_plan.cache_clear()
    pallas_paths.reset()


def test_headline_chain_serves_pallas_at_bench_shapes(forced_tpu_paths):
    """Fsk4DemodFF at the 128ch x 200k bench shape: the decimating head
    must take banded_fir_stream and the FEC tail the Pallas Viterbi."""
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.core import IqPair

    chain = Fsk4DemodFF(lead_shape=(128,))
    state = jax.eval_shape(chain.init_state)
    x = IqPair(jax.ShapeDtypeStruct((128, 200_000), jnp.float32),
               jax.ShapeDtypeStruct((128, 200_000), jnp.float32))
    pallas_paths.reset()
    jax.eval_shape(lambda s, v: chain(s, v), state, x)
    rep = pallas_paths.report()
    # the 419-tap /50 decimating head is the HBM-dominant stage and must
    # ride the banded stream kernel
    heads = [d for d in rep.get("banded_fir_stream", {}).get("details", [])
             if "K419 D50" in d]
    assert heads and all(d.startswith("pallas") for d in heads), rep
    # sub-_MIN_ELEMS stages (the 55-tap channel filter at 20 ksps) fall
    # back to the fused-XLA loop BY DESIGN — but visibly, not silently
    assert rep.get("tiled_viterbi", {}).get("pallas", 0) >= 1, rep
    assert rep["tiled_viterbi"].get("fallback", 0) == 0, rep


def test_fallbacks_are_recorded_not_silent(forced_tpu_paths):
    """A shape the plan rejects must show up as a fallback event."""
    pallas_paths.reset()
    y = pf.banded_fir(jnp.zeros((2, 300), jnp.float32),
                      np.ones(9, np.float32), 2)
    assert y is None
    rep = pallas_paths.report()
    assert rep["banded_fir"]["fallback"] == 1
    assert not pallas_paths.served_only()
