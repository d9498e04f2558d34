"""Failure handling for the host-side HTTP fabric.

The reference's failure story is probe-poll loops (manage_vm.sh:14-21),
pre-run probe validation (app.py:189-208), and broad try/except —
SURVEY §5 "failure detection / elastic recovery: none".  The TPU build
adds explicit, bounded retry:

  * `retry_call` — exponential backoff for IDEMPOTENT operations only
    (screenshots, parses, probes).  VM *actions* are never retried: a
    click that timed out may still have landed, and replaying it is a
    correctness bug, not resilience.
  * `wait_until_ready` — probe-poll until a server answers, the
    manage_vm.sh startup pattern as a library function.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple, Type

import requests


def retry_call(fn: Callable, *, retries: int = 3, backoff_s: float = 0.5,
               max_backoff_s: float = 8.0,
               retry_on: Tuple[Type[BaseException], ...] = (
                   requests.ConnectionError, requests.Timeout),
               on_retry: Callable[[int, BaseException], None] | None = None):
    """Run fn(); on a retryable error, back off exponentially and rerun.

    Raises the last error after `retries` failed attempts.  Only use for
    idempotent calls (see module docstring).
    """
    delay = backoff_s
    for attempt in range(retries + 1):
        try:
            return fn()
        except retry_on as e:
            if attempt == retries:
                raise
            if on_retry is not None:
                on_retry(attempt, e)
            time.sleep(delay)
            delay = min(delay * 2, max_backoff_s)


def wait_until_ready(url: str, *, timeout_s: float = 60.0,
                     interval_s: float = 1.0) -> bool:
    """Poll GET {url}/probe/ until 200 or timeout (manage_vm.sh:14-21)."""
    base = url.rstrip("/")
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            if requests.get(f"{base}/probe/", timeout=5).status_code == 200:
                return True
        except requests.RequestException:
            pass
        time.sleep(interval_s)
    return False
