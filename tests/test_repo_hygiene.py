"""Round-artifact hygiene gate (round-3/4/5 verdicts, item #1 three
times running): the driver-window rotation (registry._driver_history)
reads CORRECTNESS_r*.json / BENCH_r*.json from the repo ROOT — if a
round's artifacts are left untracked, a fresh clone mis-sorts the next
round's rotation window. This test fails while any artifact sits
untracked or modified, so the suite itself flags the debt before a
round ends.

Freshly written artifacts (the driver drops the current round's files
just before committing them) are exempted by an mtime grace window;
only artifacts old enough that a commit opportunity has clearly passed
fail the gate."""

from __future__ import annotations

import os
import subprocess
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRACE_SEC = 6 * 3600  # a round's wall clock: newer files are in-flight


def _git(*args: str) -> str:
    out = subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True,
        timeout=30,
    )
    if out.returncode != 0:
        pytest.skip(f"git unavailable here: {out.stderr.strip()[:120]}")
    return out.stdout


def test_round_artifacts_are_committed():
    status = _git("status", "--porcelain", "--", "CORRECTNESS_r*.json",
                  "BENCH_r*.json", "BENCH_full.json")
    now = time.time()
    stale = []
    for line in status.splitlines():
        path = line[3:].strip()
        full = os.path.join(REPO, path)
        try:
            age = now - os.path.getmtime(full)
        except FileNotFoundError:
            age = GRACE_SEC + 1  # deleted-but-tracked: always flag
        if age > GRACE_SEC:
            stale.append(f"{line.strip()} (age {age / 3600:.1f}h)")
    assert not stale, (
        "round artifacts uncommitted past the grace window — commit "
        "them (registry._driver_history reads these from the repo "
        f"root): {stale}"
    )
