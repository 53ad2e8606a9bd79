"""Cross-process TPU chip lock.

This image exposes ONE remote TPU chip; two processes touching it
concurrently serialize at best (9x per-seed slowdowns measured in round 2)
and at worst wedge one side with RESOURCE_EXHAUSTED — round 3's accuracy
queue lost nine experiment groups in ten minutes when the driver's bench
run grabbed the chip mid-queue (VERDICT r3 weak #1).

Every chip-touching entry point (manager seeded runs, bench.py,
__graft_entry__.entry) takes this advisory ``flock`` so exactly one
workload owns the chip at a time; everyone else blocks. The lock is
per-seeded-run granular in the queue, so a blocked bench waits minutes,
not hours. CPU-mesh work (tests, dryrun_multichip under
JAX_PLATFORMS=cpu) must NOT take it.

No reference analog: the reference assumes an exclusive local GPU
(sgrl_link_pred.py:1582 ``torch.device('cuda')``).
"""
from __future__ import annotations

import contextlib
import errno
import fcntl
import os
import time

LOCK_PATH = os.environ.get("S3GRL_CHIP_LOCK", "/root/repo/logs/chip.lock")


def chip_is_contended() -> bool:
    """True iff this process will touch the shared singleton TPU chip.

    Affirmative-signal check (ADVICE r4 #3): only an explicit axon/tpu
    selection in JAX_PLATFORMS counts as lock-worthy. Unset or anything
    else (cpu, a cpu-first list) means no chip touch — taking the flock
    then would block a pure CPU process behind a multi-minute TPU seed
    run, or forever on a machine with no TPU at all. Decided from the
    ENV / jax.config STATE, never ``jax.default_backend()``: initializing
    the backend client before holding the lock is itself a device touch
    that can OOM the current holder (observed r4).

    ``jax.config.jax_platforms`` wins over the raw env var when jax is
    already imported: this image exports JAX_PLATFORMS=axon globally, and
    the test suite forces the CPU backend via ``jax.config.update``
    without touching the env — deciding from the env alone made the full
    pytest run block on the accuracy queue's flock for a CPU-only test.
    Reading config state imports jax but initializes no backend.
    """
    plats = ""
    import sys

    if "jax" in sys.modules:  # config reflects any update() already made
        try:
            plats = sys.modules["jax"].config.jax_platforms or ""
        except Exception:
            plats = ""
    if not plats:
        plats = os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip()
    return first.lower() in ("axon", "tpu")


@contextlib.contextmanager
def chip_lock(timeout: float | None = None, poll: float = 2.0):
    """Blocking advisory lock on the single TPU chip.

    ``timeout`` None means wait forever (poll so a stale-looking wait is
    visible in logs every ~2 min). The lock auto-releases when the holding
    process exits or is killed, so a watchdog kill can never leave the
    chip wedged behind a dead holder.
    """
    os.makedirs(os.path.dirname(LOCK_PATH), exist_ok=True)
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    start = time.monotonic()
    waited_notice = 0.0
    try:
        if timeout is None:
            # Block IN KERNEL: a polling loop starves against a holder that
            # re-acquires in a tight per-seed loop (release gaps are
            # milliseconds; a 2 s poll hits them with probability ~1e-3 —
            # observed: a probe waited 15+ min behind 30 s queue seeds).
            # Kernel waiters are woken on release and win the race against
            # the holder's NEXT open+flock far more reliably.
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                print(f"chip_lock: waiting (blocking) for {LOCK_PATH}",
                      flush=True)
                fcntl.flock(fd, fcntl.LOCK_EX)
        else:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError as e:
                    if e.errno not in (errno.EAGAIN, errno.EACCES):
                        raise
                    waited = time.monotonic() - start
                    if waited > timeout:
                        raise TimeoutError(
                            f"chip_lock: still held after {waited:.0f}s"
                        ) from None
                    if waited - waited_notice > 120:
                        waited_notice = waited
                        print(f"chip_lock: waiting {waited:.0f}s for "
                              f"{LOCK_PATH}", flush=True)
                    time.sleep(poll)
        try:
            os.truncate(fd, 0)
            os.write(fd, f"pid={os.getpid()}\n".encode())
        except OSError:
            pass
        yield
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)
