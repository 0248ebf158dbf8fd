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
