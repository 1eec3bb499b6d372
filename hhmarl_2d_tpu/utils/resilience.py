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
import traceback

TRANSIENT_MARKERS = ("remote_compile", "UNAVAILABLE", "DEADLINE_EXCEEDED")

# "INTERNAL" alone appears in many non-transient XLA failures (genuine
# compiler bugs included); only treat it as transient when it co-occurs
# with RPC/tunnel context, so a real compile error surfaces immediately
# instead of after 4 x 20 s retries.
_INTERNAL_CONTEXT = ("socket", "stream", "tunnel", "transfer", "connection",
                     "grpc", "rpc", "premature", "peer", "channel")


def is_transient(err: Exception) -> bool:
    msg = str(err)
    if any(m in msg for m in TRANSIENT_MARKERS):
        return True
    low = msg.lower()
    return "INTERNAL" in msg and any(c in low for c in _INTERNAL_CONTEXT)


def with_retries(fn, *args, retries: int = 4, backoff_s: float = 20.0,
                 on_retry=None, **kwargs):
    """Call fn, retrying transient backend failures with linear backoff.

    The full traceback is printed on the first retry so a misclassified
    permanent failure is diagnosable from the training log even while the
    retries run.
    """
    for attempt in range(retries):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - filtered by is_transient
            if not is_transient(e):
                raise
            if attempt == 0:
                traceback.print_exc()
            if on_retry:
                on_retry(attempt, e)
            time.sleep(backoff_s)
    return fn(*args, **kwargs)
