"""Wall-clock event tracing for pipeline stages (LEON_TRACE=1).

The axon TPU tunnel charges per-launch overhead that dwarfs kernel time;
optimizing this pipeline is about launch counts and drain stalls, which
XLA profilers do not see. This prints `[tr] <t> <event>` lines to stderr
for offline gap analysis (scripts/analyze_trace.py).
"""

from __future__ import annotations

import os
import sys
import time

ENABLED = os.environ.get("LEON_TRACE") == "1"
_t0 = time.time()


def tr(evt: str) -> None:
    if ENABLED:
        print(f"[tr] {time.time() - _t0:9.4f} {evt}", file=sys.stderr, flush=True)
