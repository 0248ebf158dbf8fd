"""Tracing/profiling hooks (SURVEY §5: "JAX profiler/XLA traces + probe
taps as optional outputs").

The reference has no built-in profiler (it leans on VOLK dispatch and
GR thread priorities, docs/OPERATION.md:4-11); the TPU build exposes
the JAX profiler as first-class:

  with trace("/tmp/qrl-trace"):     # XLA/TensorBoard trace of a step
      step(state, iq)

  with annotate("front-half"):      # named region inside a trace
      ...

  stats = step_timer(step, state, iq)   # wall-time/throughput probe
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region (TraceAnnotation) inside an active trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def step_timer(fn, *args, iters: int = 10, samples_per_step: int = 0):
    """Time a jitted step with a device fence; returns a dict with
    per-step ms and samples/s when samples_per_step is given."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    res = {"step_ms": dt * 1e3}
    if samples_per_step:
        res["samples_per_s"] = samples_per_step / dt
    return res


class PallasPathRecorder:
    """Trace-time record of which compute stages were served by Pallas
    kernels vs the jnp fallback (VERDICT r4 item 8: no silent fallbacks).

    Kernel entry points (ops/pallas_fir.py, fec/viterbi_pallas.py,
    ops/pallas_pfb.py) call record() when they decide; because the
    decision is made at trace time, wrapping a jit/trace of a chain step
    between reset() and report() yields the chain's true serving map:

        pallas_paths.reset()
        jax.eval_shape(step, state, iq)      # or a real call
        print(pallas_paths.report())
        # {'banded_fir_stream': {'pallas': 3, 'fallback': 1}, ...}
    """

    def __init__(self):
        self.events = []

    def reset(self):
        self.events = []

    def record(self, op: str, served: bool, detail: str = ""):
        self.events.append((op, bool(served), detail))

    def report(self) -> dict:
        out = {}
        for op, served, detail in self.events:
            row = out.setdefault(op, {"pallas": 0, "fallback": 0,
                                      "details": []})
            row["pallas" if served else "fallback"] += 1
            if detail:
                row["details"].append(
                    ("pallas" if served else "fallback") + ": " + detail)
        return out

    def served_only(self) -> bool:
        """True when every recorded decision took the Pallas path."""
        return bool(self.events) and all(s for _, s, _ in self.events)


pallas_paths = PallasPathRecorder()
