"""Failure handling for long training runs.

The reference's only fault tolerance is "rerun with --restore"
(SURVEY.md section 5).  Here long-running drivers get:

 * transient-backend retry (remote-compile/tunnel blips on hosted TPU
   frontends raise INTERNAL JaxRuntimeErrors that succeed on retry), and
 * periodic Orbax checkpoints (in the drivers), so a crash loses at most
   one checkpoint interval and `--restore` resumes exactly.
"""

from __future__ import annotations

import time

TRANSIENT_MARKERS = ("remote_compile", "INTERNAL", "UNAVAILABLE",
                     "DEADLINE_EXCEEDED")


def is_transient(err: Exception) -> bool:
    msg = str(err)
    return any(m in msg for m in TRANSIENT_MARKERS)


def with_retries(fn, *args, retries: int = 4, backoff_s: float = 20.0,
                 on_retry=None, **kwargs):
    """Call fn, retrying transient backend failures with linear backoff."""
    for attempt in range(retries):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - filtered by is_transient
            if not is_transient(e):
                raise
            if on_retry:
                on_retry(attempt, e)
            time.sleep(backoff_s)
    return fn(*args, **kwargs)
