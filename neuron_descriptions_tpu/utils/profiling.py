"""First-class profiling hooks (SURVEY.md §5: the reference has only tqdm
instrumentation; the rebuild exposes ``jax.profiler`` traces).

``trace(dir)`` wraps a region in a ``jax.profiler`` trace whose xplane
output loads in TensorBoard / XProf — use it to attribute device time
between the subject-model forward, the stats fold, and host input waits.
``annotate(name)`` marks sub-regions inside a trace.
"""
import contextlib
import pathlib
from typing import Iterator, Optional

import jax

from neuron_descriptions_tpu.utils.typing import PathLike

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: Optional[PathLike],
          create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region.

    A no-op when ``log_dir`` is None, so call sites can thread a
    ``profile_dir`` option unconditionally.
    """
    if log_dir is None:
        yield
        return
    log_dir = pathlib.Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir),
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str) -> "jax.profiler.TraceAnnotation":
    """Named sub-region annotation inside an active trace."""
    return jax.profiler.TraceAnnotation(name)
