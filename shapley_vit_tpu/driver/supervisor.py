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
(bounded by ``--max-restarts`` either way). SIGTERM/SIGINT to the
supervisor forward to the child — which drains gracefully (finishes its
round, persists the cursor, exits 0) — and end the restart chain.

The reference has no serving loop at all (its driver runs one round and
exits, start.py:134-222); this subsystem is beyond-reference production
hardening.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from typing import Callable, List, Optional

# the LEAF protocol module, not driver.serve: the supervisor must stay
# import-light (no jax / model stack) — it is pure Popen+wait
from shapley_vit_tpu.driver.protocol import RECYCLE_EXIT_CODE


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

    SIGTERM/SIGINT to the supervisor are FORWARDED to the live child (the
    child drains: finishes its round, persists the cursor, exits 0) and end
    the restart chain — whatever the child's exit code, nothing restarts
    after a stop signal (k8s sends SIGTERM to the supervisor only; without
    forwarding the child would run until SIGKILL). Handler wiring is
    skipped off the main thread.
    """
    child_env = dict(os.environ if env is None else env)
    if max_rss_mb is not None:
        child_env["SVT_MAX_RSS_MB"] = str(max_rss_mb)
    # the child owns the cursor: always resume from service_state.json
    child_env.setdefault("SVT_START_EPOCH", "auto")

    current: List[Optional[subprocess.Popen]] = [None]
    stop_sig: List[Optional[int]] = [None]
    forwarded: List[bool] = [False]

    def _forward(signum, frame):
        stop_sig[0] = signum
        p = current[0]
        if p is not None and p.poll() is None and not forwarded[0]:
            # forward exactly ONE stop signal, ever: the child's drain
            # handler re-arms SIG_DFL after the first, so a second forward
            # would force-kill a drain in progress and the supervisor would
            # have no way to tell that from a boot-window kill. To
            # force-kill a wedged drain, signal the serve child directly
            # (it runs in its own session) or SIGKILL the supervisor tree.
            p.send_signal(signum)
            forwarded[0] = True

    restore = []
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            restore.append((sig, signal.signal(sig, _forward)))
        except ValueError:  # not the main thread (in-process tests)
            break

    try:
        return _supervise_loop(
            child_cmd, child_env, current, stop_sig, forwarded, max_restarts,
            restart_on_crash, restart_delay_s, log_fn,
        )
    finally:
        for sig, old in restore:
            signal.signal(sig, old)


def _supervise_loop(
    child_cmd, child_env, current, stop_sig, forwarded, max_restarts,
    restart_on_crash, restart_delay_s, log_fn,
) -> int:
    restarts = 0
    while True:
        t0 = time.time()
        # start_new_session: the child must receive stop signals ONLY via
        # the forward — in a terminal, Ctrl-C otherwise reaches the whole
        # foreground group, and the supervisor's forward would be a SECOND
        # signal to a child whose drain handler has already re-armed
        # SIG_DFL (= force-kill mid-drain)
        proc = subprocess.Popen(child_cmd, env=child_env,
                                start_new_session=True)
        current[0] = proc
        if stop_sig[0] is not None and not forwarded[0] and proc.poll() is None:
            # a stop signal landed in the launch window, before the child
            # existed to receive the forward — deliver it exactly once
            proc.send_signal(stop_sig[0])
            forwarded[0] = True
        rc = proc.wait()
        current[0] = None
        if stop_sig[0] is not None:
            log_fn(f"supervise: stop signal {stop_sig[0]} received; child "
                   f"exited {rc}; not restarting")
            # an orderly stop is clean even if the child was mid-recycle or
            # was caught in its boot window before its drain handler existed
            # (rc == -signal: killed by exactly the one signal we forwarded,
            # with no round in flight to lose); real crashes propagate
            return 0 if rc in (0, RECYCLE_EXIT_CODE, -stop_sig[0]) else rc
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
