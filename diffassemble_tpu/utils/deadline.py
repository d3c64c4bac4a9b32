"""Round-deadline guard for TPU queue scripts.

The build driver ends each round when its wall clock (PROGRESS.jsonl
`wall_s`, anchored at driver start) crosses the next multiple of 43200 s, and
it needs the TPU chip free at round end to run bench.py — but the axon relay
takes 5-10 min to re-grant the chip after the previous claimant exits
(CLAUDE.md). Round 3's official bench died on exactly this: a training run
held the chip into the cutoff and BENCH_r03.json recorded rc=1.

Every TPU queue script therefore checks `time_left()` in its training loop
and winds down (final eval + checkpoint) at least `margin` seconds before the
cutoff. Verified against PROGRESS.jsonl history: round-1 ended at wall_s
41009<43200, round-2 (post-restart anchor) at 43239≈43200, round-3 at
84685<86400.
"""

from __future__ import annotations

import json
import math
import os
import time

_PROGRESS = os.path.join(os.path.dirname(__file__), "..", "..", "PROGRESS.jsonl")
_PERIOD = 43200.0


def round_deadline(progress_path: str | None = None) -> float:
    """Epoch timestamp of the current round's driver cutoff.

    anchor = ts - wall_s of the newest PROGRESS entry; the cutoff is the next
    multiple of the 12 h period after that entry's wall_s. Driver restarts
    reset the anchor (observed mid-round-2), which only ever EXTENDS the
    deadline — so re-reading the file on each call is safe and self-healing.
    Falls back to now+1h if the file is unreadable (be conservative, not
    crashed).
    """
    # Hard override for short driver windows (round-4 restart ran ~1 h, not
    # 12 h): queue scripts export DIFFASSEMBLE_DEADLINE_EPOCH and every
    # consumer (Trainer guard, watchdog, queue run()) sees the same cutoff.
    if progress_path is None:  # explicit path (tests) bypasses the overrides
        env = os.environ.get("DIFFASSEMBLE_DEADLINE_EPOCH")
        if env:
            try:
                return float(env)
            except ValueError:
                pass
        # Live-updatable file override: the builder writes/updates this epoch
        # as it learns the window length; consumers re-read it on every check,
        # so a mid-run extension takes effect without restarting the process.
        # A STALE file (epoch already well in the past — e.g. left over from a
        # previous short driver window) is ignored, falling through to the
        # PROGRESS heuristic: otherwise every future round's time_left() is
        # permanently negative and no queue script ever starts (ADVICE r4).
        try:
            with open(os.path.join(os.path.dirname(_PROGRESS), ".deadline_epoch")) as f:
                epoch = float(f.read().strip())
            if epoch > time.time() - 600.0:
                return epoch
        except Exception:
            pass
    path = progress_path or _PROGRESS
    try:
        last = None
        with open(path) as f:
            for ln in f:
                if ln.strip():
                    last = ln
        rec = json.loads(last)
        anchor = float(rec["ts"]) - float(rec["wall_s"])
        k = max(1, math.ceil(float(rec["wall_s"]) / _PERIOD))
        return anchor + k * _PERIOD
    except Exception:
        return time.time() + 3600.0


def time_left(margin: float = 0.0, progress_path: str | None = None) -> float:
    """Seconds until (deadline - margin). Negative ⇒ stop now."""
    return round_deadline(progress_path) - margin - time.time()
