"""Device profiling hooks (jax.profiler).

The reference has no tracing/profiling at all (SURVEY.md §5); this pairs the
host-side StageTimer with XLA device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path
from typing import Iterator, Optional

from ..core.logging import get_logger

logger = get_logger(__name__)


@contextmanager
def device_trace(log_dir: str | Path = "logs/jax_trace") -> Iterator[None]:
    """Capture an XLA device trace for the enclosed block.

    View with: tensorboard --logdir <log_dir>  (or open the .perfetto file).
    """
    import jax

    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)


@contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
