"""Commit-path driver-cost probe: per-commit metadata wall time vs
live-file count (r8 verdict missing #1 / r9 task #2 done-criterion).

Pure-metadata harness — no Spark: data files are planted as empty
``*.parquet`` names (the commit path never opens them unless stats
columns are configured) and ``_finish_commit`` is driven directly, so
the measurement isolates exactly the driver-side bookkeeping the r9
O(delta) rework changed:

  * r8 shape: every commit expanded the base's FULL flat inventory
    (``_meta``), built an O(live) path->identity map, and re-checked
    every base manifest's entries against it — manifest IO was
    O(delta) but driver CPU/memory stayed O(live files).
  * r9 shape: the commit is (base, added, removed); base manifests
    reuse by reference straight off the list's path-range summaries,
    so an append's driver work is O(delta + #manifest refs).

The probe seeds a table at several live-file counts, measures the
median of a few 2-file appends at each, and prints the r8
counterfactual next to it (the flat expansion + identity map the old
code paid per commit, measured on the same table).

Usage: python tools/commit_scale_probe.py [max_live]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
from time import perf_counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_insert_spark.sources.snapshots import SnapshotTable  # noqa: E402


def _plant(d: str, n: int, tag: str) -> None:
    os.makedirs(d, exist_ok=True)
    for j in range(n):
        open(os.path.join(d, f"{tag}-{j:06d}.parquet"), "w").close()


def _append(t: SnapshotTable, n_files: int) -> float:
    """One n_files append through the real commit tail; returns the
    driver wall time of _finish_commit (metadata only)."""
    with t._commit_lock():
        v = t._next_version()
        d = os.path.join(t.path, f"_snap={v}")
        _plant(d, n_files, "part")
        t0 = perf_counter()
        t._finish_commit(
            v, d, inherit=True, token=None, op=None, wap_id=None
        )
        return perf_counter() - t0


def _r8_counterfactual(t: SnapshotTable) -> float:
    """What the r8 commit path paid PER COMMIT on this table: expand
    the base's flat inventory and build the O(live) identity map."""
    head = t._latest_published()
    # bypass any caching inside the window: _meta re-expands each call
    t0 = perf_counter()
    m = t._meta(head)
    fp = m.get("file_partitions", {})
    eras = m.get("file_schema_v", {})
    desired = {
        p: (
            p,
            tuple(sorted(fp[p].items())) if p in fp else None,
            eras.get(p),
        )
        for p in m["files"]
    }
    dt = perf_counter() - t0
    assert len(desired) == len(m["files"])
    return dt


def main() -> None:
    max_live = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    tiers = [n for n in (10_000, 50_000, 200_000, 500_000) if n <= max_live]
    rows = []
    for live in tiers:
        root = tempfile.mkdtemp(prefix="commit-scale-")
        try:
            t = SnapshotTable(os.path.join(root, "t"))
            # seed commit: one big flat write (the only O(live) step,
            # paid once at table creation — not per commit)
            with t._commit_lock():
                d = os.path.join(t.path, "_snap=1")
                _plant(d, live, "seed")
                t0 = perf_counter()
                t._finish_commit(
                    1, d, inherit=True, token=None, op=None, wap_id=None
                )
                seed_s = perf_counter() - t0
            deltas = [_append(t, 2) for _ in range(5)]
            flat_s = _r8_counterfactual(t)
            refs = len(t._raw_meta(t._latest_published())["manifest_list"])
            rows.append(
                {
                    "live_files": live,
                    "seed_commit_s": round(seed_s, 4),
                    "append_commit_ms_median": round(
                        statistics.median(deltas) * 1e3, 3
                    ),
                    "r8_flat_expansion_ms": round(flat_s * 1e3, 3),
                    "manifest_refs": refs,
                }
            )
            print(json.dumps(rows[-1]))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
