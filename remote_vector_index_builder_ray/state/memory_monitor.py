"""Background memory sampler — parity with the reference's MemoryMonitor
(``benchmarking/memory_profiler/memory_monitor.py:50-122``): a daemon thread
samples RSS every ``interval`` seconds and reports start/peak/end deltas.

Uses psutil when available, else /proc/self/statm (no external deps)."""

from __future__ import annotations

import os
import threading
import time

try:
    import psutil

    def _rss_bytes() -> int:
        return psutil.Process().memory_info().rss

except ImportError:  # /proc fallback

    _PAGE = os.sysconf("SC_PAGE_SIZE")

    def _rss_bytes() -> int:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * _PAGE


class MemoryMonitor:
    def __init__(self, interval: float = 0.1):
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.start_rss = 0
        self.peak_rss = 0
        self.end_rss = 0

    def __enter__(self) -> "MemoryMonitor":
        self.start_rss = self.peak_rss = _rss_bytes()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.is_set():
            self.peak_rss = max(self.peak_rss, _rss_bytes())
            time.sleep(self.interval)

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
        self.end_rss = _rss_bytes()
        self.peak_rss = max(self.peak_rss, self.end_rss)

    def report(self) -> dict:
        mb = 1024 * 1024
        return {
            "start_mb": round(self.start_rss / mb, 1),
            "peak_mb": round(self.peak_rss / mb, 1),
            "end_mb": round(self.end_rss / mb, 1),
            "delta_mb": round((self.peak_rss - self.start_rss) / mb, 1),
        }
