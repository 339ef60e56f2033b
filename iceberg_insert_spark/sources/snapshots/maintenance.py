"""Table maintenance: refs, rollback, compaction, expiry, clone, erasure.

Split out of the original sources/snapshots.py (r7): methods are
verbatim; the class is assembled in .core with an unchanged public
API.
"""

from __future__ import annotations

import json
import os
from time import time as time_time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import CommitConflict


class SnapshotMaintenanceMixin:

    def rollback(self, to: int) -> int:
        """Iceberg ``rollback_to_snapshot``: commit a NEW snapshot whose
        manifest is a copy of snapshot ``to``'s file list. History is
        never rewritten — the bad snapshot(s) stay time-travelable (and
        auditable) until ``expire`` reclaims them, and the rollback
        itself appears in ``history()`` as its own operation. Pure
        metadata: no data file is read, written, or moved, however large
        the table.

        Validation (existence + staged-op guard) runs INSIDE the commit
        lock (round-5 advice): checked outside it, a concurrent expire
        can drop snapshot ``to`` between the check and the manifest
        copy, turning the clean error into a raw FileNotFoundError —
        and the rollback must validate against the state it actually
        commits over."""
        with self._commit_lock():
            snaps = self.snapshots()
            if to not in snaps:
                raise ValueError(
                    f"snapshot {to} does not exist (have {snaps})"
                )
            off_main = dict(self.history()).get(to)
            if off_main in ("stage", "branch-append"):
                # rolling back TO an off-main snapshot would put
                # unaudited/unmerged data on main — the gates
                # (publish / fast_forward) exist to enforce that step.
                what = (
                    "staged (write-audit-publish)"
                    if off_main == "stage"
                    else "a branch commit"
                )
                raise ValueError(
                    f"snapshot {to} is {what}, not on main; "
                    "publish()/fast_forward() it instead of rolling "
                    "back to it"
                )
            v = self._next_version()
            # metadata-only: the target's manifests carry BY REFERENCE
            # (r9: a rollback is O(#manifests) however large the table)
            tmeta = self._raw_meta(to)
            rmeta = {"op": "rollback"}
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "partition_by",
                *self._PROP_CARRY,
            ):
                if carry in tmeta:
                    rmeta[carry] = tmeta[carry]
            self._write_manifest_delta(
                v, rmeta, base=to, base_raw=tmeta
            )
        return v

    def rewrite_manifests(self) -> int:
        """Iceberg's ``rewrite_manifests`` procedure: repack the
        current snapshot's manifest METADATA — all file entries
        re-chunked into target-sized manifest files — as one
        metadata-only commit (op='rewrite_manifests'). Zero data IO:
        data files are untouched; only the manifest layout changes.
        The auto-merge policy already bounds steady-state growth, but
        an admin runs this after a burst of partition-scattered
        commits left many sub-target manifests whose summaries no
        longer cluster (planning reads every one), or to re-cluster
        summaries after heavy CoW churn — the metadata twin of
        ``compact`` for data files. Historic snapshots keep their old
        manifests until ``expire`` reclaims them."""
        with self._commit_lock():
            base = self._latest_published()
            if base is None:
                raise ValueError("nothing published to rewrite")
            meta = self._meta(base)
            v = self._next_version()
            rmeta = {"files": meta["files"], "op": "rewrite_manifests"}
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "file_partitions",
                "partition_by",
                "file_schema_v",
                *self._PROP_CARRY,
            ):
                if carry in meta:
                    rmeta[carry] = meta[carry]
            # the flat writer repacks every entry into fresh
            # target-sized chunks (the whole point of the procedure)
            self._write_manifest(v, rmeta)
        return v

    def compact(
        self,
        spark: SparkSession,
        target_files: int = 1,
        sort_by: list[str] | None = None,
    ) -> int:
        """Bin-pack compaction (Iceberg's ``rewriteDataFiles``): rewrite
        the files visible at the CURRENT snapshot into ``target_files``
        coalesced files and commit them as a ``replace`` snapshot — the
        rows are identical, only the physical layout changes. Historic
        snapshots keep referencing the small pre-compaction files until
        ``expire`` reclaims them, exactly Iceberg's contract.

        This is THE 100 TB maintenance operation: streaming ingest
        (append_once per micro-batch) accretes thousands of small files
        whose per-file open/footer cost eventually dominates scan time;
        compaction restores scan efficiency without blocking readers
        (the replace commit is the same atomic manifest swap). At
        cluster scale ``target_files`` comes from table-size /
        target-file-size (Iceberg's 512 MB default); ``coalesce`` (no
        shuffle) mirrors bin-packing.

        ``sort_by`` switches to a SORT-based rewrite (Iceberg's
        ``rewriteDataFiles(strategy => 'sort')``): range-partition on
        the sort keys + sort within partitions, so the output files
        cover DISJOINT key ranges — which is what makes the manifest
        [min, max] stats actually prune (randomly laid-out files all
        span the full range and nothing is ever disjoint from a
        predicate). One shuffle over the table, paid once at
        maintenance time, bought back on every subsequent range-
        predicated read — at 100 TB this turns a day-range query from
        a full scan into a few files."""
        # Pin the base snapshot the rewrite planned against: if another
        # writer commits while the (long) rewrite runs, a blind replace
        # would silently DROP their rows. _commit validates the base is
        # still current right before the manifest swap and raises
        # CommitConflict otherwise — Iceberg's rewriteDataFiles
        # validation; the caller re-runs compaction on the new state.
        base = self._latest_published()
        if base is None:
            raise ValueError("nothing published to compact")
        df = self._plan_compaction_frame(
            spark, base, target_files, sort_by
        )
        return self._commit(
            df,
            inherit=False,
            op="replace",
            expected_base=base,
        )

    def _plan_compaction_frame(
        self,
        spark: SparkSession,
        base: int,
        target_files: int,
        sort_by: list[str] | None,
    ) -> DataFrame:
        """The rewrite-planning half of ``compact``, shared with the
        transactional compact (CatalogTransaction.compact — review
        catch, r10: a copy would silently diverge on the next lineage
        or layout fix): read the base state — MATERIALIZING row
        lineage into the rewritten files when the table tracks it (a
        compaction is layout-only, so every row keeps its id AND its
        last-updated sequence, Iceberg v3's rewrite rule; without
        this, moving a row would mint it a new identity) — then
        bin-pack (coalesce) or sort-rewrite (range partition + sort
        within) into ``target_files``."""
        rels = self._manifest(base)
        if self._lineage_on() and rels:
            df = self._read_files(
                spark,
                base,
                rels,
                lineage_cols=(self._LIN_ROWID, self._LIN_LASTSEQ),
            )
        else:
            df = self.read(spark, as_of=base)
        if sort_by:
            return df.repartitionByRange(
                target_files, *sort_by
            ).sortWithinPartitions(*sort_by)
        return df.coalesce(target_files)

    def compact_zorder(
        self,
        spark: SparkSession,
        dim_a: str,
        dim_b: str,
        target_files: int = 8,
    ) -> int:
        """Z-ORDER compaction (Delta ``OPTIMIZE ZORDER BY`` / Iceberg's
        z-order sort rewrite): rewrite the current snapshot through
        ``zorder_layout`` — range-normalized Morton interleave of the
        two dimensions, range-partitioned and sorted by the z-value —
        so the per-file [min, max] stats stay NARROW ON BOTH columns
        simultaneously and range predicates on EITHER dimension prune
        files. A linear ``compact(sort_by=[a])`` clusters only its
        leading column; z-order is the multi-dimensional clustering a
        table queried on two independent axes needs at 100 TB. Same
        replace-commit and optimistic base validation as ``compact``;
        the measured pruning table lives in
        operators/partitions.zorder_layout's docstring."""
        from ...operators.partitions import zorder_layout

        base = self._latest_published()
        if base is None:
            raise ValueError("nothing published to compact")
        rels = self._manifest(base)
        if self._lineage_on() and rels:
            # lineage rides through the z-order rewrite as materialized
            # passthrough columns, same rule as linear compact
            df = self._read_files(
                spark,
                base,
                rels,
                lineage_cols=(self._LIN_ROWID, self._LIN_LASTSEQ),
            )
        else:
            df = self.read(spark, as_of=base)
        return self._commit(
            zorder_layout(df, dim_a, dim_b, target_files),
            inherit=False,
            op="replace",
            expected_base=base,
        )

    def compact_with_retry(
        self,
        spark: SparkSession,
        target_files: int = 1,
        max_attempts: int = 3,
        sort_by: list[str] | None = None,
    ) -> int:
        """``compact`` with Iceberg's standard conflict handling: on
        ``CommitConflict`` (a commit landed during the rewrite),
        re-plan against the NEW current state and try again — each
        retry re-reads the advanced table, so no concurrent commit is
        ever lost; the rewrite work is re-done, which is the price of
        optimistic concurrency. Gives up after ``max_attempts`` under
        sustained write pressure (run maintenance in a quieter window,
        or partition the compaction)."""
        last: CommitConflict | None = None
        for _ in range(max_attempts):
            try:
                return self.compact(spark, target_files, sort_by=sort_by)
            except CommitConflict as exc:
                last = exc
        raise CommitConflict(
            f"compaction lost {max_attempts} optimistic races; "
            f"last: {last}"
        )

    @staticmethod
    def _tree_newest_mtime(path: str) -> float:
        newest = os.path.getmtime(path)
        for root, dirs, files in os.walk(path):
            for n in dirs + files:
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(root, n))
                    )
                except FileNotFoundError:
                    pass
        return newest

    def remove_orphan_files(
        self, grace_sec: float = 3600.0, now: float | None = None
    ) -> list[str]:
        """Iceberg's ``remove_orphan_files`` maintenance action (round-5
        verdict item #5): crashed writers leave debris no manifest
        references — ``_staging-*`` dirs (died before the commit
        rename), ``_snap=N`` dirs whose manifest never landed (died
        between rename and manifest write; their number is burned by
        ``_next_version``), stale metadata temps and broken-lock
        leftovers. None of it is reclaimed by ``expire`` (which only
        walks files referenced by expired manifests), so aborted-commit
        data otherwise accumulates forever.

        Sweeps everything under the table root that is referenced by NO
        live manifest AND older than ``grace_sec``: the grace window is
        the safety contract (Iceberg's ``older_than``) — an IN-FLIGHT
        commit's staging dir or freshly renamed ``_snap`` dir is always
        newer than the cutoff, so it survives; only debris old enough
        that its writer must be dead is removed. The reachability scan
        runs under the commit lock (a consistent manifest view); the
        deletions happen outside it — an unreferenced file can never
        become referenced (commits only add their own new files), and a
        crash mid-delete just leaves orphans for the next run, same as
        ``expire``. Returns the removed paths (table-relative)."""
        import shutil
        import time

        if now is None:
            now = time.time()
        cutoff = now - grace_sec
        if not os.path.isdir(self.path):
            return []
        doomed_files: list[str] = []
        doomed_dirs: list[str] = []
        with self._commit_lock():
            referenced = {
                p for v in self.snapshots() for p in self._all_paths(v)
            }
            for name in sorted(os.listdir(self.path)):
                full = os.path.join(self.path, name)
                if name == "_manifests":
                    continue
                if name.startswith("_staging-") and os.path.isdir(full):
                    if self._tree_newest_mtime(full) < cutoff:
                        doomed_dirs.append(full)
                    continue
                if name.startswith("_snap=") and os.path.isdir(full):
                    has_ref = any(
                        r == name or r.startswith(name + os.sep)
                        for r in referenced
                    )
                    if not has_ref:
                        # whole dir orphaned (manifest never landed, or
                        # everything it held was expired around it)
                        if self._tree_newest_mtime(full) < cutoff:
                            doomed_dirs.append(full)
                        continue
                    for root, _dirs, files in os.walk(full):
                        for f in files:
                            p = os.path.join(root, f)
                            rel = os.path.relpath(p, self.path)
                            if (
                                rel not in referenced
                                and f.endswith(".parquet")
                                and os.path.getmtime(p) < cutoff
                            ):
                                doomed_files.append(p)
            # metadata debris: atomic-rename temps and broken-lock
            # leftovers from crashed writers (never the live lock we
            # hold, never manifests/sidecars)
            for f in sorted(os.listdir(self._mdir)):
                if ".tmp-" in f or f.startswith("commit.lock.stale-"):
                    p = os.path.join(self._mdir, f)
                    try:
                        if os.path.getmtime(p) < cutoff:
                            doomed_files.append(p)
                    except FileNotFoundError:
                        pass
        removed: list[str] = []
        for d in doomed_dirs:
            shutil.rmtree(d, ignore_errors=True)
            removed.append(os.path.relpath(d, self.path))
        for p in doomed_files:
            try:
                os.remove(p)
                removed.append(os.path.relpath(p, self.path))
            except FileNotFoundError:
                pass
        return sorted(removed)

    def maintain(
        self,
        spark: SparkSession,
        max_live_files: int = 8,
        target_files: int = 1,
        sort_by: list[str] | None = None,
        keep_last: int | None = None,
        expire_older_than_sec: float | None = None,
        orphan_grace_sec: float = 3600.0,
        now: float | None = None,
    ) -> dict:
        """One-call maintenance policy runner — the scheduled-job
        composition of the table's maintenance actions (what an Iceberg
        deployment wires into Airflow: rewriteDataFiles +
        expire_snapshots + remove_orphan_files), with a report of what
        each action did. Conditional and ordered deliberately:

        * **compact first**, and only when the live snapshot holds more
          than ``max_live_files`` data files — compaction is the
          expensive data-IO step, the threshold keeps steady-state runs
          metadata-only, and compacting BEFORE expiry makes the small
          pre-compaction files reclaimable in the same pass once the
          retention window moves past the replace commit;
        * **expire second** (``keep_last`` newest snapshots, or
          ``expire_older_than_sec`` of history; both honor tag/branch
          pins via ``expire``'s own rules);
        * **orphan sweep last**, inside the same wall-clock ``now`` so
          test and replay runs are deterministic.

        Idempotent by construction: a second run under the same policy
        finds nothing over-threshold, nothing expirable, nothing
        orphaned, and reports all no-ops. Every step inherits its
        action's own concurrency contract (compact's expected_base
        validation, expire/orphan reachability under the commit lock).
        """
        import time as _time

        # policy validation BEFORE any action commits (review catch:
        # validated after compact(), a rejected call had already
        # rewritten the table's data files)
        if keep_last is not None and expire_older_than_sec is not None:
            raise ValueError(
                "pass keep_last OR expire_older_than_sec, not both"
            )
        if keep_last is not None and keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        if now is None:
            now = _time.time()
        latest = self._latest_published()
        if latest is None:
            raise ValueError("nothing published to maintain")
        files_before = len(self._manifest(latest))
        report: dict = {
            "files_before": files_before,
            "compacted_to": None,
            "expired_snapshots": [],
            "reclaimed_files": [],
            "orphans_removed": [],
        }
        if files_before > max_live_files:
            report["compacted_to"] = self.compact(
                spark, target_files=target_files, sort_by=sort_by
            )
        before = set(self.snapshots())
        if keep_last is not None:
            # keep_last counts PUBLISHED main snapshots (review catch,
            # data-loss grade: self.snapshots() includes staged/branch
            # snapshots, so a fresh stage() or branch commit at the
            # newest version would push keep_from PAST the live main
            # head and expire it — permanent loss of the main state).
            # keep_from = the keep_last-th newest published snapshot;
            # expire's own rules keep everything >= it plus ref pins.
            published = [
                v
                for v in self.snapshots()
                if self._raw_meta(v).get("op", "append")
                not in ("stage", "branch-append")
            ]
            if len(published) > keep_last:
                report["reclaimed_files"] = self.expire(
                    keep_from=published[-keep_last]
                )
        elif expire_older_than_sec is not None:
            report["reclaimed_files"] = self.expire_older_than(
                now - expire_older_than_sec
            )
        report["expired_snapshots"] = sorted(before - set(self.snapshots()))
        report["orphans_removed"] = self.remove_orphan_files(
            orphan_grace_sec, now=now
        )
        report["files_after"] = len(
            self._manifest(self._latest_published())
        )
        return report

    # -- named refs (Iceberg TAGS): immutable pins for reproducible
    #    dataset versions ---------------------------------------------

    def _refs_path(self) -> str:
        return os.path.join(self._mdir, "refs.json")

    def _refs(self) -> dict:
        try:
            with open(self._refs_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    def tag(self, name: str, snapshot: int | None = None) -> int:
        """Create an Iceberg TAG: a named immutable ref pinning a
        snapshot (default: latest published). ``expire`` RETAINS tagged
        snapshots and their files regardless of the age cutoff —
        exactly what a training run needs to stay reproducible: tag the
        corpus snapshot it read, and routine retention can't pull the
        data out from under it. Tag moves/deletes go through
        ``untag`` + re-``tag`` (tags are immutable, like Iceberg's)."""
        with self._commit_lock():
            if snapshot is None:
                snapshot = self._latest_published()
                if snapshot is None:
                    raise ValueError("nothing published to tag")
            snaps = self.snapshots()
            if snapshot not in snaps:
                raise ValueError(
                    f"snapshot {snapshot} does not exist (have {snaps})"
                )
            refs = self._refs()
            if name in refs:
                raise ValueError(
                    f"tag {name!r} already exists (pinned to "
                    f"{refs[name]}); untag() it first"
                )
            refs[name] = snapshot
            self._atomic_json(self._refs_path(), refs)
        return snapshot

    def untag(self, name: str) -> None:
        with self._commit_lock():
            refs = self._refs()
            if name not in refs:
                raise ValueError(f"no such tag: {name!r}")
            if isinstance(refs[name], dict):
                raise ValueError(
                    f"{name!r} is a branch, not a tag; use drop_branch()"
                )
            del refs[name]
            self._atomic_json(self._refs_path(), refs)

    def tags(self) -> dict:
        """name -> snapshot id, like Iceberg's ``table.refs`` metadata
        table (tag entries only; branches() lists the mutable refs)."""
        return {
            n: v for n, v in self._refs().items() if not isinstance(v, dict)
        }

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        """Read the snapshot a tag pins — ``VERSION AS OF`` resolved by
        name."""
        refs = self.tags()
        if name not in refs:
            raise ValueError(
                f"no such tag: {name!r} (have {sorted(refs)})"
            )
        return self.read(spark, as_of=refs[name])

    # ------------------------------------------------------------------
    # Branches (Iceberg named MUTABLE refs): an isolated line of append
    # commits forked from main, invisible to main readers, merged back
    # with fast_forward. Generalizes the WAP single-snapshot stage to a
    # multi-commit audit/backfill branch. Branch snapshots share the
    # table's version space (like Iceberg snapshot ids) and carry
    # op="branch-append", which keeps every op-filtering consumer —
    # _latest_published, TIMESTAMP AS OF, the streaming source, the CDC
    # readers — naturally blind to them.
    # ------------------------------------------------------------------

    def _branch_head(self, name: str) -> int:
        entry = self._refs().get(name)
        if not isinstance(entry, dict) or entry.get("type") != "branch":
            raise ValueError(f"no such branch: {name!r}")
        return entry["snapshot"]

    def create_branch(self, name: str, snapshot: int | None = None) -> int:
        """Fork a branch at ``snapshot`` (default: latest published).
        Records the fork point; fast_forward validates main has not
        advanced past it before merging the branch back."""
        with self._commit_lock():
            if snapshot is None:
                snapshot = self._latest_published()
                if snapshot is None:
                    raise ValueError("nothing published to branch from")
            snaps = self.snapshots()
            if snapshot not in snaps:
                raise ValueError(
                    f"snapshot {snapshot} does not exist (have {snaps})"
                )
            refs = self._refs()
            if name in refs:
                raise ValueError(
                    f"ref {name!r} already exists ({refs[name]})"
                )
            refs[name] = {
                "type": "branch",
                "snapshot": snapshot,
                "forked_from": snapshot,
            }
            self._atomic_json(self._refs_path(), refs)
        return snapshot

    def drop_branch(self, name: str) -> None:
        """Delete the branch ref. Its snapshots stay in history until
        ``expire`` reclaims them (they are no longer ref-pinned)."""
        with self._commit_lock():
            refs = self._refs()
            entry = refs.get(name)
            if not isinstance(entry, dict) or entry.get("type") != "branch":
                raise ValueError(f"no such branch: {name!r}")
            del refs[name]
            self._atomic_json(self._refs_path(), refs)

    def branches(self) -> dict:
        """name -> {snapshot, forked_from}, the mutable half of
        Iceberg's ``table.refs`` metadata table."""
        return {
            n: dict(e)
            for n, e in self._refs().items()
            if isinstance(e, dict) and e.get("type") == "branch"
        }

    def append_to_branch(self, df: DataFrame, name: str) -> int:
        """Append a snapshot to branch ``name`` (Iceberg's
        ``toBranch(name).append()``): inherits from the branch head,
        projects onto the branch schema, advances the branch ref —
        all without touching what main readers see. The data write
        runs with full parallelism outside the commit lock, exactly
        like a main append."""
        return self._commit(df, inherit=True, op="branch-append", branch=name)

    def read_branch(self, spark: SparkSession, name: str) -> DataFrame:
        """Read the branch head — ``VERSION AS OF`` resolved by ref."""
        return self.read(spark, as_of=self._branch_head(name))

    def fast_forward(self, name: str) -> int:
        """Iceberg's ``fast_forward('main', branch)``: publish the
        branch head onto main as ONE metadata-only commit. Requires
        main to still sit at the branch's fork point — if main advanced
        (diverged), raises CommitConflict and the caller re-branches or
        cherry-picks; silently replaying branch files onto a moved main
        is exactly the lost-update optimistic concurrency exists to
        prevent. After the merge the branch is reset even with main, so
        the branch handle can keep committing and fast-forwarding in
        rounds (the continuous-backfill pattern). No data IO: the new
        main manifest is a copy of the branch head's."""
        with self._commit_lock():
            refs = self._refs()
            entry = refs.get(name)
            if not isinstance(entry, dict) or entry.get("type") != "branch":
                raise ValueError(f"no such branch: {name!r}")
            head, fork = entry["snapshot"], entry["forked_from"]
            main = self._latest_published()
            if head == fork:
                return main  # no branch commits since fork: no-op
            if main != fork:
                raise CommitConflict(
                    f"main advanced to {main} past branch {name!r}'s "
                    f"fork point {fork}; re-create the branch from the "
                    "current state and re-apply its commits"
                )
            hraw = self._raw_meta(head)
            v = self._next_version()
            meta = {
                k: val
                for k, val in hraw.items()
                if k
                not in (
                    "branch",
                    "ts",
                    "token",
                    "wap_id",
                    "op",
                    "new_files",
                    "manifest_list",
                    "fp",
                    "files",
                    "file_partitions",
                    "file_schema_v",
                )
            }
            # added-files summary relative to MAIN (what the streaming
            # source delivers for this commit) — computed at the
            # manifest tier (r9): candidates are the entries of head's
            # manifests NOT shared with main's list (the branch's own
            # commits plus any merge spill), then a membership probe
            # against main filters the spilled-in main files. O(branch
            # delta), never a flat expansion of either side.
            if "manifest_list" in hraw:
                main_raw = (
                    self._raw_meta(main) if main is not None else {}
                )
                shared = {
                    m["path"]
                    for m in main_raw.get("manifest_list", [])
                }
                cand: list[str] = []
                for mref in hraw["manifest_list"]:
                    if mref["path"] in shared:
                        continue
                    cand.extend(
                        e["p"] for e in self._load_mf(mref["path"])
                    )
                meta["new_files"] = self._paths_missing_from(
                    main_raw, cand
                )
            else:
                main_files = (
                    set(self._meta(main).get("files", []))
                    if main is not None
                    else set()
                )
                meta["new_files"] = sorted(
                    set(self._expand_meta(hraw)["files"]) - main_files
                )
            meta["op"] = "fast_forward"
            self._write_manifest_delta(
                v, meta, base=head, base_raw=hraw
            )
            refs[name] = {**entry, "snapshot": v, "forked_from": v}
            self._atomic_json(self._refs_path(), refs)
            return v

    def verify(self) -> dict:
        """Table FSCK (admin maintenance): cross-check the metadata
        against the filesystem and each sidecar against the live
        history. Returns a report dict — all-empty means healthy:

          * ``missing_files`` — paths a LIVE manifest references that
            do not exist on disk (the one inconsistency the commit
            protocol promises never to create; presence means external
            deletion or a restore from partial backup);
          * ``dangling_tokens`` — exactly-once tokens pointing at
            expired snapshots (harmless — append_once re-checks
            membership — but bounded hygiene);
          * ``dangling_refs`` — tags pinning snapshots that no longer
            exist (possible only via external manifest deletion; tags
            block expire);
          * ``orphan_stats`` / ``orphan_blooms`` / ``orphan_ndv`` —
            sidecar entries (range/null stats, bloom sketches, NDV
            sketches) for files no live manifest references
            (crash-window leftovers expire's trim missed;
            conservative, never wrong reads);
          * ``missing_manifests`` — manifest FILES a live manifest
            list references that do not exist on disk (two-level
            metadata; partial-backup restore or external deletion) —
            reported, not crashed on (review catch: the FSCK whose job
            is diagnosing a partial restore died with a raw
            FileNotFoundError before producing its report). Files of a
            missing manifest cannot be enumerated, so the other
            buckets are computed from the READABLE manifests.

        Metadata-only: O(live files) existence probes, no data IO."""
        snaps = self.snapshots()
        live_paths: set[str] = set()
        missing_m: set[str] = set()
        for v in snaps:
            raw = self._raw_meta(v)
            mlist = raw.get("manifest_list")
            if mlist is None:
                live_paths.update(raw.get("files", []))
            else:
                for ref in mlist:
                    mp = os.path.join(self._mdir, ref["path"])
                    if not os.path.exists(mp):
                        missing_m.add(ref["path"])
                        continue
                    live_paths.update(
                        e["p"] for e in self._load_mf(ref["path"])
                    )
            live_paths.update(
                d["path"] for d in raw.get("delete_files", [])
            )
        report: dict[str, list] = {
            "missing_files": [],
            "missing_manifests": sorted(missing_m),
            "dangling_tokens": [],
            "dangling_refs": [],
            "orphan_stats": [],
            "orphan_blooms": [],
            "orphan_ndv": [],
        }
        for p in sorted(live_paths):
            if not os.path.exists(os.path.join(self.path, p)):
                report["missing_files"].append(p)
        for t, v in sorted(self._token_index().items()):
            if v not in snaps:
                report["dangling_tokens"].append(t)
        for n, v in sorted(self._refs().items()):
            if isinstance(v, dict):
                v = v["snapshot"]
            if v not in snaps:
                report["dangling_refs"].append(n)
        for f in sorted(self._load_stats()):
            if f not in live_paths:
                report["orphan_stats"].append(f)
        for f in sorted(self._load_blooms()):
            if f not in live_paths:
                report["orphan_blooms"].append(f)
        for f in sorted(self._load_ndvs()):
            if f not in live_paths:
                report["orphan_ndv"].append(f)
        return report

    def expire_older_than(self, ts: float) -> list[str]:
        """Iceberg ``expire_snapshots(older_than=ts)``: drop snapshots
        committed before ``ts`` (always keeping at least the latest
        published one — a table never loses its current state). The
        cutoff->keep_from mapping is advisory metadata; ``expire``
        itself re-validates under the commit lock."""
        latest = self._latest_published()
        keep = [
            v
            for v in self.snapshots()
            if self._raw_meta(v).get("ts", float("-inf")) >= ts
        ]
        if latest is not None:
            keep.append(latest)
        if not keep:
            raise ValueError("expire_older_than would delete every snapshot")
        return self.expire(keep_from=min(keep))

    def expire(self, keep_from: int) -> list[str]:
        """Drop snapshots older than ``keep_from`` and delete data files no
        surviving manifest references. Returns the deleted files.

        The METADATA half (reachability computation, manifest removal,
        token-index trim) runs under the commit lock — otherwise a
        concurrent rollback could commit a manifest referencing files
        expire is deciding to delete, or a concurrent tokened commit's
        index entry could be clobbered by the trim's read-modify-write
        (review catch). The (possibly long) data-file deletion happens
        OUTSIDE the lock: once no surviving manifest references a file
        it can never be re-referenced (rollback copies file lists from
        surviving manifests only), and a crash mid-delete leaves only
        harmless orphans a re-run reclaims — never a live manifest
        pointing at deleted files."""
        with self._commit_lock():
            snaps = self.snapshots()
            # ref-pinned snapshots survive the cutoff: tag pins (int
            # entries) and branch HEADS (dict entries — the head's
            # manifest keeps the whole branch state reachable; interior
            # branch snapshots expire like any other history).
            tagged = {
                e["snapshot"] if isinstance(e, dict) else e
                for e in self._refs().values()
            }
            keep = [
                v for v in snaps if v >= keep_from or v in tagged
            ]
            drop = [
                v for v in snaps if v < keep_from and v not in tagged
            ]
            if not keep:
                raise ValueError("expire would delete every snapshot")
            referenced = {
                f for v in keep for f in self._all_paths(v)
            }
            doomed = sorted(
                {f for v in drop for f in self._all_paths(v)}
                - referenced
            )
            for v in drop:
                os.remove(os.path.join(self._mdir, f"v{v}.json"))
            # Manifest-FILE reachability (two-level metadata): an
            # m-*.json no surviving manifest list references —
            # dropped-snapshot manifests, crash-window orphans from
            # writers that died between the manifest write and the
            # list swap, and deltas superseded by a merge — is
            # reclaimed here, under the same lock that guarantees no
            # new list can reference it (reuse candidates come from
            # live snapshots only). Runs on EVERY expire, not just
            # dropping ones (review catch: a table whose retention
            # keeps all snapshots otherwise accumulated orphans
            # forever, and remove_orphan_files deliberately skips
            # _manifests). KB-scale JSON reads: lists only, never
            # entries.
            live_m = set()
            for kv in keep:
                try:
                    live_m.update(
                        r["path"]
                        for r in self._raw_meta(kv).get(
                            "manifest_list", []
                        )
                    )
                except FileNotFoundError:
                    pass
            for name in os.listdir(self._mdir):
                if (
                    name.startswith("m-")
                    and name.endswith(".json")
                    and name not in live_m
                ):
                    os.remove(os.path.join(self._mdir, name))
            # Token-index hygiene: entries for expired snapshots are
            # already ignored (append_once checks membership in
            # snapshots()), but trimming keeps the index bounded by
            # the LIVE history.
            if drop:
                idx = self._token_index()
                live = {
                    t: v
                    for t, v in idx.items()
                    if v >= keep_from or v in tagged
                }
                if len(live) != len(idx):
                    self._atomic_json(self._tokens_path(), live)
        for f in doomed:
            p = os.path.join(self.path, f)
            if os.path.exists(p):
                os.remove(p)
        # Stats-sidecar hygiene outside the lock: a stale entry is
        # harmless (pruning looks up by current manifest) and a lost
        # concurrent entry is only ever conservative, same as
        # _record_stats' own merge.
        if doomed:
            gone = set(doomed)
            stats = self._load_stats()
            trimmed = {k: s for k, s in stats.items() if k not in gone}
            if len(trimmed) != len(stats):
                self._atomic_json(self._stats_path(), trimmed)
            blooms = self._load_blooms()
            btrim = {k: b for k, b in blooms.items() if k not in gone}
            if len(btrim) != len(blooms):
                self._atomic_json(self._bloom_sidecar_path(), btrim)
            ndvs = self._load_ndvs()
            ntrim = {k: n for k, n in ndvs.items() if k not in gone}
            if len(ntrim) != len(ndvs):
                self._atomic_json(self._ndv_sidecar_path(), ntrim)
        return doomed

    def clone_to(self, target_path: str) -> "SnapshotTable":
        """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE``):
        a NEW independent table whose first snapshot references the
        source's live data bytes with ZERO copy — hardlinks on one
        filesystem, the local twin of manifest-level file sharing. The
        clone reads identically to the source's head at clone time and
        diverges independently afterwards: commits on either side never
        touch the other (data files are immutable; a hardlink shares
        bytes, not manifests), and either side's ``expire`` only
        unlinks ITS name (the inode lives while any table references
        it — exactly the ref-counting semantics shallow clones need).

        Refused on tables whose read semantics travel OUTSIDE the data
        bytes: live delete files (MoR state is seq-addressed against
        source paths), row lineage (ids derive from source commit
        seqs), and LIVE PRE-EVOLUTION FILES — any file whose commit seq
        predates the head's ``schema_v`` needs era resolution the clone
        (everything re-homed at seq 1) cannot reproduce; that single
        invariant covers rename/drop/widen/add uniformly (review catch:
        a marker-based check missed drop/widen — a dropped column
        resurrected and a widened clone crashed on read). ``compact``
        unblocks both refusal classes by rewriting every live file at
        the current era. The clone's schema starts a FRESH DDL history
        (iis era markers stripped; ``initial_default`` kept — it is the
        write-default for future appends). Stats/bloom sidecar entries
        are re-keyed to the clone's paths, so pruning works immediately
        with zero footer re-reads. Target must be empty (cloning onto
        an existing table would silently corrupt it); the source
        metadata read + link loop runs under the source commit lock so
        a racing overwrite+expire cannot delete files mid-clone."""
        if os.path.isdir(target_path) and os.listdir(target_path):
            raise ValueError(
                f"clone target {target_path!r} is not empty"
            )
        if self.row_lineage:
            raise ValueError(
                "clone refused: row-lineage ids derive from source "
                "commit sequences and cannot survive re-homing"
            )
        with self._commit_lock():
            head = self._latest_published()
            if head is None:
                raise ValueError("nothing published to clone")
            meta = self._meta(head)
            if meta.get("delete_files"):
                raise ValueError(
                    "clone refused: live delete files — compact first"
                )
            if meta.get("row_lineage"):
                raise ValueError(
                    "clone refused: row-lineage ids derive from source "
                    "commit sequences and cannot survive re-homing"
                )
            sv = meta.get("schema_v") or 1
            if meta.get("file_schema_v") or any(
                self._seq_of(rel) < sv for rel in meta["files"]
            ):
                raise ValueError(
                    "clone refused: live pre-evolution files need era "
                    "resolution the re-homed clone cannot reproduce — "
                    "compact first"
                )
            tgt = type(self)(
                target_path,
                stats_cols=list(self.stats_cols),
                bloom_cols=list(self.bloom_cols),
                ndv_cols=list(self.ndv_cols),
                partition_by=list(
                    meta.get("partition_by", self.partition_by)
                ),
            )
            os.makedirs(
                os.path.join(target_path, "_snap=1"), exist_ok=True
            )
            os.makedirs(tgt._mdir, exist_ok=True)
            src_stats = self._load_stats()
            src_blooms = self._load_blooms()
            src_ndvs = self._load_ndvs()
            new_files, fparts = [], {}
            tstats, tblooms, tndvs = {}, {}, {}
            old_parts = meta.get("file_partitions", {})
            for i, rel in enumerate(meta["files"]):
                dst_rel = os.path.join(
                    "_snap=1", f"clone-{i:05d}.parquet"
                )
                src_abs = os.path.join(self.path, rel)
                dst_abs = os.path.join(target_path, dst_rel)
                try:
                    os.link(src_abs, dst_abs)  # zero-copy
                except OSError:
                    import shutil as _sh

                    _sh.copy2(src_abs, dst_abs)  # cross-device fallback
                new_files.append(dst_rel)
                if rel in old_parts:
                    fparts[dst_rel] = old_parts[rel]
                if rel in src_stats:
                    tstats[dst_rel] = src_stats[rel]
                if rel in src_blooms:
                    tblooms[dst_rel] = src_blooms[rel]
                if rel in src_ndvs:
                    tndvs[dst_rel] = src_ndvs[rel]
        tmeta = {
            "files": new_files,
            "new_files": new_files,
            "op": "clone",
            "ts": time_time(),
        }
        if meta.get("schema") is not None:
            # fresh DDL history: era markers are source-local; the
            # write-default (initial_default) stays
            sj = json.loads(json.dumps(meta["schema"]))
            for f in sj.get("fields", []):
                md = f.get("metadata") or {}
                md.pop("iis_names", None)
                md.pop("iis_added_v", None)
                f["metadata"] = md
            tmeta["schema"] = sj
            tmeta["schema_v"] = 1
        # the spec carries whenever the head records one — even when no
        # live file has a partition record yet (review catch: a spec
        # evolved-but-not-yet-written-under was silently dropped)
        if meta.get("partition_by") or self.partition_by:
            tmeta["partition_by"] = meta.get(
                "partition_by", self.partition_by
            )
        if fparts:
            tmeta["file_partitions"] = fparts
        for carry in self._PROP_CARRY:
            if carry in meta and carry not in (
                "row_lineage",  # refused above
            ):
                tmeta[carry] = meta[carry]
        tgt._write_manifest(1, tmeta)
        if tstats:
            tgt._atomic_json(tgt._stats_path(), tstats)
        if tblooms:
            tgt._atomic_json(tgt._bloom_sidecar_path(), tblooms)
        if tndvs:
            tgt._atomic_json(tgt._ndv_sidecar_path(), tndvs)
        return tgt

    def forget(self, spark: SparkSession, predicate: str) -> dict:
        """GDPR erasure ('right to be forgotten'): physically remove
        every row matching ``predicate`` from the table AND its history,
        then PROVE it. A plain delete cannot do this on a snapshot
        table — a CoW/MoR delete hides rows from the head while every
        older snapshot still serves them and the bytes stay on disk
        until expire. The composition, each step an existing primitive:

          0. ``compact`` first iff live delete files exist — an earlier
             MoR delete leaves matching BYTES inside data files that a
             CoW rewrite would never touch (they have no live matches);
             folding makes every surviving byte live;
          1. ``delete_where(predicate)`` (CoW) — the head stops matching;
          2. ``expire(keep_from=head)`` — every older snapshot drops and
             its exclusive files are DELETED;
          3. verification — every surviving data file is re-read and
             asserted to contain zero matching rows. The read is
             UNMASKED by construction (zero delete files survive a CoW
             delete — runtime-checked) yet era-RESOLVED, so files
             predating a rename/add-column verify under the current
             names instead of crashing or vacuously passing; a
             concurrent commit/tag landing mid-compose voids the claim
             and raises instead of reporting stale success.

        Refuses while tags, branches, or staged (WAP) snapshots exist:
        each would keep serving the rows past the erasure (releasing
        them is an explicit human decision, same contract as fsck).
        Time travel before the erasure point is destroyed BY DESIGN —
        that is what erasure means. At 100 TB the cost is one compact
        (iff MoR state), one CoW rewrite of matching files only, and
        one verification scan."""
        if self._refs():
            raise ValueError(
                "forget refused: tags/branches pin history "
                f"({sorted(self._refs())}) — release them first"
            )
        staged = [
            v
            for v in self.snapshots()
            if self._raw_meta(v).get("op") in ("stage",)
        ]
        if staged:
            raise ValueError(
                f"forget refused: staged (WAP) snapshots {staged} may "
                "hold matching rows — publish or expire them first"
            )
        head = self._latest_published()
        if head is None:
            raise ValueError("nothing published to forget from")
        if self._raw_meta(head).get("delete_files"):
            self.compact(spark)
        before = set(self.snapshots())
        v = self.delete_where(spark, predicate)
        # 'matched' is derived FROM THE DELETE ITSELF — rows in the
        # delete's base minus rows in its result — never from a separate
        # pre-count (advisor catch, r6: a matching append landing
        # between a pre-count and the delete was erased-and-verified but
        # NOT counted, under-stating a compliance figure). The delete's
        # base is v's immediate published predecessor; both counts read
        # pinned snapshots, so the figure is exact whatever lands
        # concurrently (and anything landing after v voids the claim
        # below anyway). A no-op delete (v already existed) matched 0.
        if v in before:
            n_matched = 0
        else:
            base_v = max(
                s
                for s in self.snapshots()
                if s < v
                and self._raw_meta(s).get("op", "append")
                not in ("stage", "branch-append")
            )
            n_matched = (
                self.read(spark, as_of=base_v).count()
                - self.read(spark, as_of=v).count()
            )
        reclaimed = self.expire(keep_from=v)
        # Single-maintainer contract, enforced not assumed (review
        # catch): forget is a multi-commit composition; if ANY commit,
        # tag, or stage landed meanwhile, the erasure claim is void —
        # fail loudly instead of reporting a stale verification.
        if self._latest_published() != v or self._refs():
            raise RuntimeError(
                "table advanced (or grew refs) during forget — erasure "
                "NOT verified; re-run forget against the current state"
            )
        vmeta = self._meta(v)
        if vmeta.get("delete_files"):
            raise RuntimeError(
                "surviving snapshot carries delete files — a concurrent "
                "MoR write raced forget; re-run"
            )
        survivors = vmeta["files"]
        # Era-safe verification (review catch): survivors may predate a
        # rename/add-column, where a raw parquet read either crashes on
        # the unresolved current-name column or reads it as NULL and
        # proves nothing. With zero delete files, read(as_of=v) applies
        # NO masking — it is exactly the surviving bytes, resolved onto
        # the current schema, so the predicate evaluates old-era files
        # correctly.
        residual = (
            self.read(spark, as_of=v).filter(F.expr(predicate)).count()
        )
        if residual:
            raise RuntimeError(
                f"forget verification FAILED: {residual} matching rows "
                "remain in surviving files — do not report erasure"
            )
        return {
            "matched": n_matched,
            "files_reclaimed": len(reclaimed),
            "surviving_files": len(survivors),
            "residual_matches": residual,
            "snapshot": v,
        }
