"""Failure detection / readiness helpers (SURVEY.md §5: the reference's
probe-poll loops — manage_vm.sh:14-21, app.py:189-208 — as a library)."""

from __future__ import annotations

import time
from typing import Callable, Optional

import requests


def probe_poll(url: str, timeout_s: float = 60.0, interval_s: float = 1.0,
               on_attempt: Optional[Callable[[int], None]] = None) -> bool:
    """Poll a /probe endpoint until 200 or timeout.  Returns readiness."""
    deadline = time.monotonic() + timeout_s
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        if on_attempt:
            on_attempt(attempt)
        try:
            if requests.get(url, timeout=min(5.0, interval_s * 5)).status_code == 200:
                return True
        except requests.RequestException:
            pass
        time.sleep(interval_s)
    return False


def validate_endpoints(**urls: str) -> dict:
    """One-shot readiness check of several services (the UI's pre-submit
    validation, app.py:189-208).  Returns {name: bool}."""
    out = {}
    for name, url in urls.items():
        try:
            out[name] = requests.get(url, timeout=5).status_code == 200
        except requests.RequestException:
            out[name] = False
    return out
