"""DSSS BPSK loopback + CW keying tests."""

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.chains.dsss import DsssBpskMod, DsssBpskDemod, CwMod
from qradiolink_tpu.chains.digital_common import bytes_to_bits


def best_ber(decoded, sent_bits, max_offset=200):
    """DSSS measurement window [n/4, n/2): the feedforward timing/carrier
    estimators converge within one block (no slow loop acquisition), and
    the early window leaves room for the 64-bit Viterbi tail delay in a
    16 bit/s mode where long payloads are impractically large IQ."""
    sent = np.asarray(sent_bits)
    dec = np.asarray(decoded)
    n = len(sent)
    lo, hi = n // 4, n // 2
    best = 1.0
    for off in range(0, max_offset):
        seg = dec[off + lo: off + hi]
        if len(seg) < hi - lo:
            break
        best = min(best, np.mean(seg != sent[lo:hi]))
    return best


def test_dsss_clean_loopback():
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, 24).astype(np.uint8)   # 384 coded bits
    mod, dem = DsssBpskMod(), DsssBpskDemod()
    _, tx = mod(mod.init_state(), jnp.asarray(data))
    iq = tx["iq"]
    m = iq.shape[-1] - (iq.shape[-1] % 62_500)
    _, out = dem(dem.init_state(), iq[:m])
    sent = np.asarray(bytes_to_bits(jnp.asarray(data)))
    ber = min(best_ber(out[k], sent)
              for k in ("bits", "bits_alt", "bits_inv", "bits_alt_inv"))
    assert ber < 0.01, f"DSSS clean BER {ber}"


def test_cw_keying():
    n = 8000
    key = np.zeros(n, np.float32)
    key[1000:3000] = 1.0   # one long dah
    key[5000:5500] = 1.0   # one dit
    cw = CwMod()
    _, out = cw(cw.init_state(), jnp.asarray(key))
    iq = np.asarray(out["iq"])
    up = len(iq) / n
    on = np.mean(np.abs(iq[int(1500*up):int(2500*up)]) ** 2)
    off = np.mean(np.abs(iq[int(3700*up):int(4700*up)]) ** 2)
    assert on > 100 * max(off, 1e-12)


def test_dsss_lead_shape_state_stable():
    """Regression: with lead_shape=(C,), the carried carrier-phase leaf
    must keep shape (C,) across calls (pytree structure stability is
    the scan_stream/jit-reuse contract)."""
    import jax
    C = 2
    dem = DsssBpskDemod(lead_shape=(C,))
    st0 = dem.init_state()
    iq = jnp.zeros((C, 125_000), jnp.complex64)
    st1, _ = dem(st0, iq)
    st2, _ = dem(st1, iq)
    t0 = jax.tree_util.tree_structure(st0)
    assert jax.tree_util.tree_structure(st1) == t0
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st2)):
        assert a.shape == b.shape
