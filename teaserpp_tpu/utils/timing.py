"""Per-stage timing and profiler hooks.

The reference gates chrono timing macros behind a compile flag
(macros.h:62-68, TEASER_DEBUG_*_TIMING); here timing is compiled-in and
cheap: a StageTimer collects wall times around host-visible stage
boundaries (device work is synchronized at each boundary), and
``trace_to`` wraps ``jax.profiler`` for full device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StageTimer:
    """Accumulates wall-clock durations per named stage."""

    def __init__(self) -> None:
        self.durations: Dict[str, float] = {}
        self.order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; ``sync`` (e.g. an array or pytree) is blocked on at exit."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            if name not in self.durations:
                self.order.append(name)
                self.durations[name] = 0.0
            self.durations[name] += dt

    def report(self) -> str:
        total = sum(self.durations.values())
        lines = [f"{n}: {self.durations[n]*1e3:.2f} ms" for n in self.order]
        lines.append(f"total: {total*1e3:.2f} ms")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.durations)


@contextlib.contextmanager
def trace_to(log_dir: Optional[str]):
    """Wrap a block in a jax.profiler trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
