"""True device barriers for tunneled TPUs.

``jax.block_until_ready`` is a NO-OP on the tunneled "axon" TPU platform:
dispatch is asynchronous end-to-end and the client's ready-event resolves
at enqueue time, not at execution time (measured: an 8.8 TFLOP matmul
chain "blocks" in 0.1 ms while the scalar pull of its result takes
seconds).  Any wall-clock measurement that ends at ``block_until_ready``
is therefore measuring dispatch, not execution.

``device_sync`` is the honest barrier: it pulls ONE element of each array
to the host — the pull completes only after every queued program that the
array depends on has executed.  Cost: one device->host round trip
(~0.4 s on the tunneled link), so use it at coarse timing boundaries
(builds, benchmark reps of >=100 ms), never inside hot loops.  For sub-ms
kernel timing, amortize with a chained device-side loop instead
(benchmarks/kernels.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["device_sync", "is_tpu_backend"]


def is_tpu_backend() -> bool:
    """True when the default JAX backend is a TPU — including the tunneled
    "axon" platform, whose backend NAME is "axon", not "tpu" (checking
    ``default_backend() == "tpu"`` silently misses the real chip: the
    round-4 fused-gather opt-in never actually enabled there)."""
    import jax

    return jax.default_backend() in ("tpu", "axon")


def device_sync(*arrays) -> None:
    """Block until every queued device program producing ``arrays`` has
    actually executed (pulls one element per array; ~0.4 s each on the
    tunneled link).  ``None`` entries and host numpy arrays are skipped."""
    import jax.numpy as jnp

    for a in arrays:
        if a is None or isinstance(a, np.ndarray):
            continue
        if getattr(a, "size", 0) == 0:
            continue
        np.asarray(jnp.reshape(a, (-1,))[:1])
