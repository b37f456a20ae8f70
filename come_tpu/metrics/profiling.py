"""Tracing hooks (SURVEY.md §5: the reference had none).

Wraps ``jax.profiler`` so any trainer phase can be traced to a TensorBoard-
readable directory:

    from come_tpu.metrics.profiling import trace
    with trace("/tmp/come-trace"):     # no-op when dir is falsy
        trainer.o1_epoch()
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(trace_dir: str | None):
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(str(trace_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
