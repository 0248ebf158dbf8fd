"""Worker process for the multi-host test (spawned by test_multihost.py).

Usage: python tests/multihost_worker.py <pid> <nproc> <port> <fixture.npz>

Joins a 2-process gloo-backed CPU cluster (4 virtual devices per
process = 8-device pod rehearsal), runs a channel-sharded Fsk4DemodFF
step stream with per-host IQ ingest, and asserts this host's output
rows match the single-process reference precomputed by the parent
(recomputing it here would skew the workers by minutes of compile time
on a shared 2-core host and trip gloo's 30 s barriers).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
fixture = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from qradiolink_tpu.parallel import multihost  # noqa: E402

multihost.init_process(f"127.0.0.1:{port}", nproc, pid,
                       local_virtual_devices=4)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from qradiolink_tpu.chains.fsk import Fsk4DemodFF  # noqa: E402

assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc, jax.devices()

# establish the gloo context while both processes are still in lockstep
multihost_utils.sync_global_devices("boot")

data = np.load(fixture)
blocks = [data[f"block{i}"] for i in range(int(data["steps"]))]
refs = [data[f"ref{i}"] for i in range(int(data["steps"]))]
C = blocks[0].shape[0]

mesh = multihost.pod_mesh()
chain = Fsk4DemodFF(lead_shape=(C,))
step = multihost.multihost_step(chain, mesh)
state = multihost.shard_state(jax.tree_util.tree_map(
    np.asarray, chain.init_state()), mesh)
rows = multihost.local_channel_slice(C)
xs = [multihost.distribute_channels(np.ascontiguousarray(blk[rows]),
                                    C, mesh) for blk in blocks]
compiled = step.lower(state, xs[0]).compile()
# realign before the first collective-bearing execution
multihost_utils.sync_global_devices("compiled")

for i, x in enumerate(xs):
    state, out = compiled(state, x)
    mine = multihost.local_output_rows(out["symbols"])
    want = refs[i][rows]
    err = np.abs(mine - want).max()
    print(f"[p{pid}] step {i}: local rows {rows} max err {err:.2e}",
          flush=True)
    assert err < 1e-5, err

# exit together: the distributed runtime's shutdown barrier times out if
# one worker leaves long before the other
multihost_utils.sync_global_devices("done")
print(f"[p{pid}] MULTIHOST_OK", flush=True)
