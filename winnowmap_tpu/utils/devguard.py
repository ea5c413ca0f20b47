"""Hang-proof device interaction guard.

The tunnel-attached TPU backend can WEDGE (not error) mid-operation: a
remote execute/fetch blocks forever on a TCP recv with no timeout at any
layer below us (observed repeatedly on this install; the reference's CPU
backend, src/ksw2_*_sse.c, has no analogous failure mode).  A production
mapper must degrade to its host kernels instead of hanging the whole run
(SURVEY §5.3 failure detection/recovery).

``device_guard(fn)`` runs a potentially-blocking device interaction
(DevCallPooled construction, collect, device_put, a jitted call) on a
dedicated worker thread and waits with a deadline.  On timeout the device
is declared HUNG for the rest of the process: the guard raises
``DeviceHang``, every later guarded call raises immediately, and
``map.batch._use_device()`` reports False so new work routes to the host
AVX-512 kernels.  The wedged worker thread stays blocked on its recv
(daemon; it consumes no CPU) — the process finishes on the host path.

Processes that detected a hang should exit via ``hard_exit_if_hung()``
(jax atexit teardown can itself block on the wedged runtime).
"""
from __future__ import annotations

import concurrent.futures as _cf
import os
import sys
import threading

DEV_TIMEOUT_S = float(os.environ.get("WM_DEV_TIMEOUT", "240"))

_lock = threading.Lock()
_pool: _cf.ThreadPoolExecutor | None = None
_hung = False


class DeviceHang(Exception):
    """A device interaction exceeded its deadline; the device is presumed
    wedged and is disabled for the rest of the process."""


def device_hung() -> bool:
    return _hung


def _mark_hung(tag: str, timeout: float) -> None:
    global _hung
    with _lock:
        if not _hung:
            _hung = True
            print(f"[WARNING] device interaction '{tag}' exceeded "
                  f"{timeout:.0f}s (wedged tunnel?); disabling the "
                  "device for this process, continuing on host kernels",
                  file=sys.stderr)


def device_guard(fn, timeout: float | None = None, tag: str = "dev"):
    """Run ``fn()`` on the device worker thread with a deadline.  Returns
    fn's result; raises DeviceHang on deadline (device disabled process-
    wide) or re-raises fn's own exception."""
    global _pool
    if _hung:
        raise DeviceHang(tag)
    with _lock:
        if _pool is None:
            # several workers: concurrent drivers (multidev: one engine per
            # device; the pipelined driver: interleaved engines) must not
            # serialize their device interactions behind one another's
            # blocking collects.  A wedged op strands one worker; the hung
            # flag stops everything else at the next guarded call.
            _pool = _cf.ThreadPoolExecutor(
                max_workers=8, thread_name_prefix="wm-devguard")
    fut = _pool.submit(fn)
    if timeout is None:
        timeout = DEV_TIMEOUT_S
        if os.environ.get("WM_PALLAS_INTERPRET") == "1":
            # interpreter-mode kernels (CPU test suites) legitimately run
            # for minutes; only a real chip gets the tight hang deadline
            timeout = max(timeout, 3600.0)
    try:
        return fut.result(timeout)
    except _cf.TimeoutError:
        _mark_hung(tag, timeout)
        raise DeviceHang(tag) from None


def hard_exit_if_hung(code: int = 0) -> None:
    """os._exit when a hang was detected: jax's atexit teardown can block
    forever on the wedged runtime.  Call AFTER flushing output."""
    if _hung:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(code)
