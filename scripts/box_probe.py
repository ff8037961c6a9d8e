#!/usr/bin/env python
"""Box-state probe for benchmark hygiene (r14).

This sandbox's host intermittently degrades page-fault servicing by
~10-100x (first-touch of fresh anonymous memory measured as low as
92 MB/s vs >1 GB/s minutes later, with buffered file writes burning
their wall time in SYSTEM CPU inside write()). Every Spark timing on
the box scales with that rate — JVM heap growth, page-cache writes,
Python workers — while CPU reads idle. Run this BEFORE and AFTER any
bench and record both numbers next to the results; within-run A/B
comparisons survive, absolute numbers do not.

Usage: python scripts/box_probe.py [reps]
"""

from __future__ import annotations

import sys
import time


def fault_mb_s(mb: int = 200) -> float:
    """First-touch throughput of fresh anonymous memory, MB/s."""
    buf = bytearray(mb * 1024 * 1024)  # zero pages, not yet faulted
    t0 = time.time()
    bytes(buf)  # forces a read fault on every page
    return mb / (time.time() - t0)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for _ in range(reps):
        print(f"fault_mb_s={fault_mb_s():.0f}")
        time.sleep(0.5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
