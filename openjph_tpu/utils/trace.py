"""Per-stage timers and profiler hooks.

The reference offers only coarse CLI wall-clock prints
(ojph_compress.cpp:1222, ojph_expand.cpp:435); SURVEY.md §5 upgrades
this to a first-class observability layer for the TPU build:

- ``stage('name')``: context manager accumulating wall time + call
  count per pipeline stage (host prep, device dispatch, Tier-2 pack,
  ...).  Near-zero overhead when tracing is disabled (one dict lookup
  and a perf_counter call pair only when enabled).
- ``enable()/disable()/reset()/get_stats()/report()``: collector
  control.  Stats are per-thread-safe via a lock; stages may nest.
- ``jax_trace(dir)``: wraps ``jax.profiler.trace`` so a full XLA/xprof
  device trace can be captured around any region (view with
  tensorboard/xprof); no-ops gracefully if the profiler is missing.

Timing a TPU stage measures the *dispatch+sync* the stage performs; a
stage that launches async device work should block (e.g. via
``jax.block_until_ready``) inside the region if device time is wanted.
"""
from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, Optional, TextIO

_lock = threading.Lock()
_enabled = False
_stats: Dict[str, list] = {}  # name -> [total_seconds, calls]


def enable() -> None:
    global _enabled
    _enabled = True


def disable() -> None:
    global _enabled
    _enabled = False


def reset() -> None:
    with _lock:
        _stats.clear()


def is_enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def stage(name: str):
    """Time a pipeline stage.  Cheap no-op unless tracing is enabled."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats.setdefault(name, [0.0, 0])
            s[0] += dt
            s[1] += 1


def get_stats() -> Dict[str, dict]:
    """{stage: {'seconds': float, 'calls': int, 'ms_per_call': float}}."""
    with _lock:
        return {k: {'seconds': v[0], 'calls': v[1],
                    'ms_per_call': 1e3 * v[0] / max(v[1], 1)}
                for k, v in _stats.items()}


def report(stream: Optional[TextIO] = None) -> str:
    """Human-readable stage table; also returned as a string."""
    rows = sorted(get_stats().items(), key=lambda kv: -kv[1]['seconds'])
    w = max([len(k) for k, _ in rows], default=5)
    lines = [f'{"stage".ljust(w)}  {"total_s":>9}  {"calls":>7}  '
             f'{"ms/call":>9}']
    for k, v in rows:
        lines.append(f'{k.ljust(w)}  {v["seconds"]:9.4f}  '
                     f'{v["calls"]:7d}  {v["ms_per_call"]:9.3f}')
    out = '\n'.join(lines)
    if stream is not None:
        stream.write(out + '\n')
    return out


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture a full JAX/XLA device trace (xprof format) around the
    region; inspect with `tensorboard --logdir <dir>`."""
    try:
        import jax
        with jax.profiler.trace(log_dir):
            yield
    except ImportError:
        yield
