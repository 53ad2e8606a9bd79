"""Device transfer-channel warm-up.

On the remote-TPU tunnel this image uses, the FIRST device->host fetch of a
process can stall for many minutes (observed 1-25 min, independent of size —
a transfer-channel establishment cost on the terminal side; execution and
compilation are unaffected). Every subsequent fetch is milliseconds.

``warm_transfer_async`` pays that cost on a background thread started as
early as possible, so it overlaps dataset prep / compilation / precompute
instead of serializing behind them at the first evaluation readback.
"""
from __future__ import annotations

import threading

_started: list[threading.Thread] = []


def warm_transfer_async() -> threading.Thread:
    """Kick one tiny device->host fetch on a daemon thread; returns it.

    Safe to call multiple times (only the first call starts a thread) and
    on any backend (a CPU fetch is instant). Never raises: a failure just
    means the first real fetch pays the cost instead.
    """
    if _started:
        return _started[0]

    def _fetch():
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            np.asarray(jax.block_until_ready(jnp.zeros(8, jnp.float32)))
        except Exception:
            pass

    t = threading.Thread(target=_fetch, name="d2h-warmup", daemon=True)
    t.start()
    _started.append(t)
    return t
