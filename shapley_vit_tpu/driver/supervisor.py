"""Process-level recycle supervisor for the continuous service.

The round-4 soak pinned the service's only unbounded memory term on the
TPU-tunnel client itself: it retains ~the full payload of every
host-to-device transfer, so a long-lived ``serve()`` process grows by
roughly its per-round ingest volume forever (BENCH_NOTES round 4;
OPERATIONS.md "Long-running service memory"). No in-process fix can
release native memory the runtime holds — the remedy is a *process*
recycle, which the framework makes nearly free: the persistent XLA
compile cache turns restart compile time into one prewarm (~10 s), and
the fingerprinted utility table resumes a killed round's finished
coalition evals.

``svt-supervise`` is that remedy as a built-in: it runs ``svt-serve`` as
a child with an RSS ceiling (``SVT_MAX_RSS_MB``), and restarts a fresh
process every time the child exits with ``RECYCLE_EXIT_CODE`` (the
service finished its round, flushed artifacts, and persisted its
``service_state.json`` cursor first — nothing is lost). The child
resumes at the cursor (``SVT_START_EPOCH=auto``). Clean exits stop the
supervisor; crashes optionally restart with ``--restart-on-crash``
(bounded by ``--max-restarts`` either way).

The reference has no serving loop at all (its driver runs one round and
exits, start.py:134-222); this subsystem is beyond-reference production
hardening.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from typing import Callable, List, Optional

from shapley_vit_tpu.driver.serve import RECYCLE_EXIT_CODE


def supervise(
    child_cmd: List[str],
    max_rss_mb: Optional[float] = None,
    max_restarts: Optional[int] = None,
    restart_on_crash: bool = False,
    restart_delay_s: float = 1.0,
    env: Optional[dict] = None,
    log_fn: Callable[[str], None] = print,
) -> int:
    """Run ``child_cmd`` under the recycle protocol; return its final exit
    code (0 after a recycle chain that ends cleanly).

    Restart rules: exit ``RECYCLE_EXIT_CODE`` always restarts (that code
    *means* "healthy, recycle me"); other non-zero codes restart only with
    ``restart_on_crash`` (the resumable utility table + cursor make a crash
    restart safe, but silent crash-looping is opt-in). ``max_restarts``
    bounds total restarts of either kind.
    """
    child_env = dict(os.environ if env is None else env)
    if max_rss_mb is not None:
        child_env["SVT_MAX_RSS_MB"] = str(max_rss_mb)
    # the child owns the cursor: always resume from service_state.json
    child_env.setdefault("SVT_START_EPOCH", "auto")

    restarts = 0
    while True:
        t0 = time.time()
        rc = subprocess.call(child_cmd, env=child_env)
        if rc == 0:
            log_fn(f"supervise: child exited cleanly after {restarts} restart(s)")
            return 0
        if rc == RECYCLE_EXIT_CODE:
            reason = "RSS ceiling (recycle)"
        elif restart_on_crash:
            reason = f"crash (exit {rc})"
        else:
            log_fn(f"supervise: child crashed (exit {rc}); not restarting "
                   "(--restart-on-crash to opt in)")
            return rc
        if max_restarts is not None and restarts >= max_restarts:
            log_fn(f"supervise: restart budget ({max_restarts}) exhausted "
                   f"after {reason}; stopping with exit {rc}")
            return rc
        restarts += 1
        log_fn(f"supervise: restarting after {reason} — child #{restarts + 1} "
               f"(previous ran {time.time() - t0:.0f}s)")
        time.sleep(restart_delay_s)


def main(argv=None) -> int:
    """Console entry (``svt-supervise``): supervisor flags, then the
    ``svt-serve`` flag surface verbatim (everything unrecognized is
    forwarded to the child)."""
    ap = argparse.ArgumentParser(
        prog="svt-supervise",
        description="Run the Shapley service with process recycling at an "
                    "RSS ceiling (see OPERATIONS.md: long-running service "
                    "memory).",
    )
    ap.add_argument("--max-rss-mb", type=float, default=None,
                    help="recycle the service process when its post-round "
                         "RSS crosses this ceiling (default: no ceiling)")
    ap.add_argument("--max-restarts", type=int, default=None,
                    help="bound on total child restarts (default: unbounded)")
    ap.add_argument("--restart-on-crash", action="store_true",
                    help="also restart on non-recycle non-zero exits")
    ap.add_argument("--restart-delay-s", type=float, default=1.0)
    ns, child_args = ap.parse_known_args(argv)
    child = [sys.executable, "-m", "shapley_vit_tpu.driver.serve", *child_args]
    return supervise(
        child,
        max_rss_mb=ns.max_rss_mb,
        max_restarts=ns.max_restarts,
        restart_on_crash=ns.restart_on_crash,
        restart_delay_s=ns.restart_delay_s,
    )


if __name__ == "__main__":
    sys.exit(main())
