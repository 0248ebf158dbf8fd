"""Multi-host execution path: 2 processes x 4 virtual CPU devices with
gloo collectives over loopback — the pod-rehearsal for
parallel/multihost.py (SURVEY §2.8 multi-host row).

The parent precomputes the unsharded reference stream once; each worker
joins a jax.distributed cluster, ingests only its own channel rows,
runs a channel-sharded Fsk4DemodFF stream over the (host, ch) pod mesh,
and checks its local output rows against the reference
(tests/multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_channel_sharded_chain(tmp_path):
    import jax.numpy as jnp
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF

    C, T, STEPS = 8, 40_000, 2
    rng = np.random.default_rng(7)
    blocks = [(rng.standard_normal((C, T))
               + 1j * rng.standard_normal((C, T))).astype(np.complex64)
              * 0.1 for _ in range(STEPS)]
    chain = Fsk4DemodFF(lead_shape=(C,))
    st = chain.init_state()
    fixture = {"steps": STEPS}
    for i, blk in enumerate(blocks):
        st, out = chain(st, jnp.asarray(blk))
        fixture[f"block{i}"] = blk
        fixture[f"ref{i}"] = np.asarray(out["symbols"])
    fpath = tmp_path / "mh_fixture.npz"
    np.savez(fpath, **fixture)

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(fpath)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n"
                    + "\n".join(o or "" for o in outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-25:])
        assert p.returncode == 0, f"worker {pid} failed:\n{tail}"
        assert "MULTIHOST_OK" in out, f"worker {pid} no OK marker:\n{tail}"
