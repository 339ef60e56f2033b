"""Snapshot append + time travel on plain parquet — the THIRD leg of the
repo's Iceberg-metadata reproduction, next to schema evolution
(schema_evolution.EvolvingTable) and partition-spec evolution
(partition_evolution.PartitionEvolvingTable).

The reference commits one Iceberg snapshot per data file (App.java:147-149)
and can only ever read "latest". Iceberg's actual table format makes every
commit a SNAPSHOT — an immutable manifest of data files — and any historic
snapshot remains readable (time travel: ``VERSION AS OF`` /
``TIMESTAMP AS OF``). This module reproduces that contract locally:

  * ``append`` writes data files under ``_snap=N/`` and records a manifest
    JSON (``_manifests/vN.json``) listing EVERY file visible at snapshot N
    (its own plus all inherited ones) — reads never list directories, they
    read the manifest, exactly like Iceberg's metadata-driven planning;
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
from contextlib import contextmanager
from time import time as time_time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table


class CommitConflict(RuntimeError):
    """A replace-type commit found the table advanced past the snapshot
    it planned against (Iceberg's optimistic-concurrency validation
    failure). The operation made no commit; re-run it against the
    current state."""


class SnapshotTable:
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
            bool(self._meta(lp).get("row_lineage"))
            if lp is not None
            else False
        )

    # -- per-file column statistics (the manifest-metadata half of
    #    Iceberg's scan planning) -------------------------------------

    def _stats_path(self) -> str:
        return os.path.join(self._mdir, "stats.json")

    def _load_stats(self) -> dict:
        try:
            with open(self._stats_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    def _bloom_sidecar_path(self) -> str:
        # Blooms live in their OWN sidecar (Iceberg's puffin-file
        # separation): they are KiB-to-MiB per file where ranges are
        # bytes, and only equality probes ever need them — range,
        # partition, count and files_info paths must not pay their
        # JSON parse (review catch).
        return os.path.join(self._mdir, "blooms.json")

    def _load_blooms(self) -> dict:
        try:
            with open(self._bloom_sidecar_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    @staticmethod
    def _stat_value(v):
        """Footer stat -> JSON-storable value whose ORDERING matches the
        column's. int/float/str store as-is; date/timestamp as ISO
        strings (``_norm_bound`` parses ISO-shaped strings back to
        datetimes at prune time, so bounds of EITHER granularity —
        date-only or full datetime — compare chronologically); anything
        else (binary, nested) -> None = don't record, pruning keeps the
        file conservatively."""
        import datetime

        if isinstance(v, bool):
            return None
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, (int, float, str)):
            return v
        return None

    # -- per-file Bloom indexes (point-lookup pruning) ----------------

    BLOOM_BITS_PER_KEY = 16  # fp ~= 0.24%  with k=4 at this load
    BLOOM_K = 4
    # Per-file size cap: past ~500k distinct keys the fp rate rises
    # above the 16-bits/key design point (still CORRECT — a false
    # positive only keeps a file the residual filter then empties —
    # just less pruning). 1 MiB/file at the cap.
    BLOOM_MAX_BITS = 1 << 23

    @staticmethod
    def _bloom_key(v) -> bytes | None:
        """Canonical byte encoding of one column value for bloom
        hashing, leading with a one-char TYPE TAG. The encoding MUST
        be identical between recording (values as pyarrow converts
        them to Python) and probing (the caller's literal); the tag is
        also checked separately at probe time, because Spark's
        residual equality COERCES across types (a string probe against
        a date column still matches rows) while byte equality does not
        — a cross-type probe must disable bloom pruning, never
        false-negative it (review catch). tz-aware datetimes normalize
        to naive UTC so an aware probe matches naive-recorded
        instants. Returns None for anything without a stable canonical
        form (NULL, binary, nested, Decimal): un-encodable at RECORD
        time voids the file's bloom, at PROBE time skips bloom pruning
        — both conservative."""
        import datetime

        if isinstance(v, bool):
            return b"b:1" if v else b"b:0"
        if isinstance(v, int):
            return b"i:%d" % v
        if isinstance(v, float):
            return ("f:" + repr(float(v))).encode()
        if isinstance(v, str):
            return b"s:" + v.encode("utf-8")
        if isinstance(v, datetime.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            # midnight instants encode as the bare date (both ways:
            # date columns record bare dates, timestamp columns record
            # midnights — a date-vs-midnight probe must agree, like
            # Spark's date/timestamp coercion does)
            if (v.hour, v.minute, v.second, v.microsecond) == (
                0,
                0,
                0,
                0,
            ):
                return ("t:" + v.date().isoformat()).encode()
            return ("t:" + v.isoformat()).encode()
        if isinstance(v, datetime.date):
            return ("t:" + v.isoformat()).encode()
        return None

    @staticmethod
    def _bloom_hashes(key: bytes, m: int, k: int) -> list[int]:
        """k bit positions via Kirsch-Mitzenmacher double hashing over
        one blake2b digest — deterministic across processes (no seed,
        unlike Python's str hash)."""
        import hashlib

        d = hashlib.blake2b(key, digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        return [(h1 + i * h2) % m for i in range(k)]

    @classmethod
    def _bloom_build(cls, values) -> dict | None:
        """Bloom entry for one file's distinct column values, sized to
        the observed NDV (next power of two >= BITS_PER_KEY * ndv,
        capped). None when any value lacks a canonical encoding, or
        when the values mix type tags — a PARTIAL bloom would produce
        false negatives, the one failure mode a bloom must never
        have. Records the (single) tag so probes of a DIFFERENT type
        class fall back to conservative keeps."""
        keys = []
        tag = None
        for v in values:
            k = cls._bloom_key(v)
            if k is None:
                return None
            t = k[:1].decode()
            if tag is None:
                tag = t
            elif t != tag:
                return None
            keys.append(k)
        if tag is None:
            tag = ""  # empty column: any-typed probe may prune
        m = 256
        target = min(
            cls.BLOOM_MAX_BITS,
            max(256, cls.BLOOM_BITS_PER_KEY * max(1, len(keys))),
        )
        while m < target:
            m *= 2
        bits = bytearray(m // 8)
        for k in keys:
            for pos in cls._bloom_hashes(k, m, cls.BLOOM_K):
                bits[pos >> 3] |= 1 << (pos & 7)
        return {
            "m": m,
            "k": cls.BLOOM_K,
            "t": tag,
            "hex": bytes(bits).hex(),
        }

    @classmethod
    def _bloom_maybe_contains(cls, ent: dict | None, key: bytes) -> bool:
        """Membership probe: True = maybe present (keep the file),
        False = PROVABLY absent (prune). Conservative everywhere it
        can be: a missing/malformed entry is 'maybe', and a probe
        whose TYPE TAG differs from the recorded values' tag is
        'maybe' — byte equality can't speak for Spark's coercing
        equality across types, so it must not prune (review catch:
        a string probe on a date column hit every row through the
        residual filter yet pruned every file through the bloom)."""
        if not ent or "hex" not in ent or "m" not in ent:
            return True
        tag = ent.get("t")
        if tag and tag != key[:1].decode():
            return True
        try:
            bits = bytes.fromhex(ent["hex"])
            return all(
                bits[pos >> 3] & (1 << (pos & 7))
                for pos in cls._bloom_hashes(
                    key, ent["m"], ent.get("k", cls.BLOOM_K)
                )
            )
        except (ValueError, IndexError):
            return True  # corrupt sidecar entry -> conservative keep

    def _record_stats(self, new_files: list[str]) -> None:
        """Footer-read [min, max] per stats column for freshly written
        files, merged into the sidecar with the same atomic-rename
        contract as manifests. Files are immutable, so an entry never
        changes once written; a column without usable footer stats is
        simply absent (pruning treats absence as 'must read').

        Columns are located by ``path_in_schema`` on the parquet LEAF
        columns — an Arrow top-level field index is a different index
        space once nested columns exist (review catch: a struct before
        the stats column would have recorded the wrong leaf's range and
        made pruning drop matching rows)."""
        import pyarrow.parquet as pq

        stats = self._load_stats()
        for rel in new_files:
            md = pq.ParquetFile(os.path.join(self.path, rel)).metadata
            if md.num_row_groups == 0:
                # An EMPTY part file still gets a sidecar entry: its row
                # count (0) is a fact, and min_max/count_rows need it to
                # distinguish "provably empty" from "stats never
                # recorded" (only the latter forces a data read).
                stats[rel] = {"::rows": 0}
                continue
            rg0 = md.row_group(0)
            leaf = {
                rg0.column(i).path_in_schema: i
                for i in range(rg0.num_columns)
            }
            # record count under a reserved key (no column can be
            # named '::rows') — the `.files` metadata table reads it
            # without re-opening footers, like Iceberg's manifest
            # record_count
            ent = {"::rows": md.num_rows}
            for c in self.stats_cols:
                idx = leaf.get(c)
                if idx is None:
                    continue
                mins: list = []
                maxs: list = []
                nulls = 0
                ok = True
                nulls_ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None:
                        ok = nulls_ok = False
                        break
                    # NULL count rides the same footer read (Iceberg's
                    # null_value_counts): recorded independently of
                    # min/max because an ALL-NULL row group has a
                    # null_count but no bounds
                    if st.null_count is None:
                        nulls_ok = False
                    else:
                        nulls += st.null_count
                    if not st.has_min_max:
                        ok = False
                        continue
                    lo = self._stat_value(st.min)
                    hi = self._stat_value(st.max)
                    if lo is None or hi is None:
                        ok = False
                        continue
                    mins.append(lo)
                    maxs.append(hi)
                if ok and mins:
                    ent[c] = [min(mins), max(maxs)]
                if nulls_ok:
                    ent["::nulls::" + c] = nulls
            if ent:
                stats[rel] = ent
        self._atomic_json(self._stats_path(), stats)
        if self.bloom_cols:
            blooms = self._load_blooms()
            for rel in new_files:
                bent = {}
                for c in self.bloom_cols:
                    bloom = self._bloom_for_file(rel, c)
                    if bloom is not None:
                        bent[c] = bloom
                if bent:
                    blooms[rel] = bent
            self._atomic_json(self._bloom_sidecar_path(), blooms)

    def _bloom_for_file(self, rel: str, col: str) -> dict | None:
        """Build the bloom entry for one freshly written file: a
        column-pruned Arrow read of JUST that column, deduped
        Arrow-side to NDV before any Python objects exist. This is the
        one stats kind that costs a data read (footers don't carry
        distinct values) — it runs once per immutable file, at commit,
        OUTSIDE the commit lock, exactly where Iceberg writers compute
        puffin blobs. Returns None (no bloom, conservative keeps) for
        a missing column or un-encodable values."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        try:
            t = pq.read_table(
                os.path.join(self.path, rel), columns=[col]
            )
        except Exception:
            return None
        vals = pc.unique(t.column(0)).to_pylist()
        return self._bloom_build(v for v in vals if v is not None)

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

    _ISO_RE = None  # compiled lazily; matches ISO date / datetime strings

    @classmethod
    def _norm_bound(cls, v):
        """Normalize one side of a pruning compare. Date/timestamp stats
        are stored as ISO strings, and callers may pass bounds at a
        DIFFERENT granularity ('1999-06-01' vs '1999-06-01T00:00:00') —
        lexicographic order is only chronological for SAME-granularity
        strings (round-5 advice: a date-only hi bound sorts below the
        same instant's datetime form, so a file whose min is exactly
        midnight of the bound got wrongly pruned while the residual
        filter matches its rows). Any string shaped like an ISO
        date/datetime is parsed to a real datetime (date -> midnight),
        so mixed granularities compare chronologically; everything else
        passes through unchanged."""
        import datetime
        import re

        if cls._ISO_RE is None:
            cls._ISO_RE = re.compile(
                r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?)?$"
            )
        if isinstance(v, str) and cls._ISO_RE.match(v):
            try:
                return datetime.datetime.fromisoformat(v)
            except ValueError:
                return v
        return v

    @classmethod
    def _provably_disjoint(cls, stat_lo, stat_hi, lo, hi) -> bool:
        """True only when the file range [stat_lo, stat_hi] provably
        misses [lo, hi] under normalized (granularity-safe) ordering;
        any normalization or type mismatch -> False (conservatively
        keep the file — pruning must never drop a matching row)."""
        a, b = cls._norm_bound(stat_lo), cls._norm_bound(stat_hi)
        x, y = cls._norm_bound(lo), cls._norm_bound(hi)
        try:
            return bool(b < x or a > y)
        except TypeError:
            return False

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

    def plan_files(
        self,
        where: tuple | None = None,
        as_of: int | None = None,
        partitions: dict | None = None,
        eq: tuple | None = None,
        not_null: list[str] | None = None,
    ) -> tuple[list[str], int]:
        """Metadata-only scan planning: the manifest's file list, pruned
        by (a) PARTITION values — ``partitions = {col: value}`` keeps
        only files whose manifest-recorded partition tuple matches
        (Iceberg's partition pruning: decided from the manifest alone,
        no footer ever read) — and (b) the sidecar [min, max] stats
        against ``where = (column, lo, hi)``: a file survives unless
        its recorded range is provably disjoint; files without
        stats/partition records are conservatively kept. Returns
        (files to scan, total files in the snapshot) — no data file is
        opened."""
        as_of = self._resolve_snapshot(as_of)
        files = self._manifest(as_of)
        total = len(files)
        if partitions:
            meta = self._meta(as_of)
            fparts = meta.get("file_partitions", {})
            pby = meta.get("partition_by", [])
            for c in partitions:
                # valid if in the CURRENT spec or recorded by any file
                # (an old spec after partition evolution) — a column no
                # spec ever had is a caller error
                if c not in pby and not any(
                    c in p for p in fparts.values()
                ):
                    raise ValueError(
                        f"{c!r} is not a partition column (have {pby})"
                    )
            # a file is pruned only when it PROVABLY mismatches: its
            # record has the column and the value differs. Files
            # without a record, or written under a spec lacking the
            # column (partition evolution), are conservatively kept —
            # the residual filter re-applies the predicate, exactly
            # Iceberg's cross-spec scan behavior.
            files = [
                f
                for f in files
                if f not in fparts
                or not any(
                    c in fparts[f]
                    and fparts[f][c] != self._part_str(val)
                    for c, val in partitions.items()
                )
            ]
        conds = self._norm_where(where)
        eqs = self._norm_eq(eq)
        # a NON-NULL equality predicate is also a degenerate range
        # [v, v]: the [min, max] stats and the bloom prune
        # INDEPENDENTLY (ranges win on clustered layouts, blooms on
        # hash-scattered ones); _provably_disjoint's TypeError guard
        # keeps un-comparable values conservative. IS NULL probes
        # (val None) must NOT enter the range path (review catch: the
        # era-predating branch decides ranges from the default, and a
        # (col, None, None) range would prune exactly the all-NULL
        # files an IS NULL probe matches) — they have their own
        # null-count branch below.
        conds += [(c, v, v) for c, v in eqs if v is not None]
        if not conds and not eqs and not not_null:
            return files, total
        stats = self._load_stats()
        # Column-name era mapping (RENAME/DROP COLUMN support): the
        # stats/bloom sidecars key entries by the name the column had
        # WHEN THE FILE WAS WRITTEN. A predicate on the current name
        # must consult the file-era name — and a file written before
        # the field existed (iis_added_v guard) must never consult a
        # same-named predecessor's stats (the wrong-prune hazard field
        # IDs prevent in Iceberg proper); for such files every row
        # holds the field's initial-default, so the predicate is
        # decided EXACTLY from the default instead.
        smeta = self._meta(as_of)
        sjson = smeta.get("schema")
        f_eras = smeta.get("file_schema_v", {})
        fmd = (
            {f["name"]: f.get("metadata") or {} for f in sjson["fields"]}
            if sjson
            else {}
        )
        era_cache: dict[str, int] = {}

        def stat_key(col: str, f: str):
            """(sidecar key for `col` on file `f`, initial_default) —
            key None = the field postdates the file."""
            if sjson is None or col not in fmd:
                return col, None  # no schema tracking: names are fixed
            if f not in era_cache:
                era_cache[f] = int(f_eras.get(f, self._seq_of(f)))
            return (
                self._era_name(fmd[col], col, era_cache[f]),
                fmd[col].get("initial_default"),
            )

        for col in not_null or []:
            # IS NOT NULL probe: a file whose recorded null count
            # equals its recorded row count is provably all-NULL in
            # the column — prune it; anything unrecorded keeps. A file
            # predating the field is all-default: prune iff the
            # default is NULL.
            def _keep_nn(f: str) -> bool:
                n, dv = stat_key(col, f)
                if n is None:
                    return dv is not None
                e = stats.get(f, {})
                return (
                    e.get("::nulls::" + n) is None
                    or e.get("::rows") is None
                    or e["::nulls::" + n] < e["::rows"]
                )

            files = [f for f in files if _keep_nn(f)]
        # CONJUNCTION of range predicates: a file is pruned when it is
        # provably disjoint on ANY dimension — the compound pruning a
        # z-order layout (compact_zorder) exists to unlock, where
        # neither dimension alone isolates the target region but their
        # intersection does.
        for col, lo, hi in conds:

            def _keep_rng(f: str) -> bool:
                n, dv = stat_key(col, f)
                if n is None:
                    # every row holds the default: NULL never matches
                    # a range; a literal default matches iff in-range
                    return dv is not None and not self._provably_disjoint(
                        dv, dv, lo, hi
                    )
                s = stats.get(f, {}).get(n)
                return s is None or not self._provably_disjoint(
                    s[0], s[1], lo, hi
                )

            files = [f for f in files if _keep_rng(f)]
        if eqs:
            blooms = None
            for col, val in eqs:
                if val is None:
                    # IS NULL probe (Iceberg's null_value_counts
                    # pruning): a file whose recorded null count is
                    # ZERO provably holds no matching row; files
                    # without a recorded count keep conservatively
                    def _keep_isnull(f: str) -> bool:
                        n, dv = stat_key(col, f)
                        if n is None:
                            return dv is None  # all-default file
                        return (
                            stats.get(f, {}).get("::nulls::" + n) != 0
                        )

                    files = [f for f in files if _keep_isnull(f)]
                    continue
                key = self._bloom_key(val)
                if key is None:
                    continue  # no canonical form -> no bloom pruning
                if blooms is None:
                    blooms = self._load_blooms()  # lazy: eq probes only

                def _keep_bloom(f: str) -> bool:
                    n, dv = stat_key(col, f)
                    if n is None:
                        # all-default file: NULL default never equals a
                        # non-null probe; otherwise decide via the
                        # degenerate range so un-comparable types stay
                        # CONSERVATIVE (review catch: raw == would
                        # false-negative a cross-type probe, the exact
                        # hazard _bloom_key's type tag exists to
                        # prevent)
                        if dv is None:
                            return False
                        return not self._provably_disjoint(
                            dv, dv, val, val
                        )
                    return self._bloom_maybe_contains(
                        blooms.get(f, {}).get(n), key
                    )

                files = [f for f in files if _keep_bloom(f)]
        return files, total

    @staticmethod
    def _norm_eq(eq) -> list[tuple]:
        """Normalize the equality-predicate argument: None -> [], one
        ``(column, value)`` pair -> [it], a list of pairs -> itself
        (a CONJUNCTION — all must hold)."""
        if eq is None:
            return []
        if (
            isinstance(eq, tuple)
            and len(eq) == 2
            and isinstance(eq[0], str)
        ):
            return [eq]
        return [tuple(e) for e in eq]

    @staticmethod
    def _norm_where(where) -> list[tuple]:
        """Normalize the range-predicate argument: None -> [], one
        ``(column, lo, hi)`` tuple -> [it], a list of such tuples ->
        itself (a CONJUNCTION — all must hold)."""
        if where is None:
            return []
        if (
            isinstance(where, tuple)
            and len(where) == 3
            and isinstance(where[0], str)
        ):
            return [where]
        return [tuple(w) for w in where]

    def files_info(self, as_of: int | None = None) -> list[dict]:
        """Iceberg's ``.files`` METADATA TABLE: one dict per data file
        of the snapshot — path, commit sequence (from the ``_snap=K``
        path), record count and per-column [min, max] (from the stats
        sidecar, captured at commit from the parquet footers). Pure
        metadata: no data file is opened at query time; a file written
        without stats recording reports ``n_records=None``. This is
        the operator a table administrator runs to see layout health
        (file sizes/counts per snapshot) before deciding to compact."""
        v = self._resolve_snapshot(as_of)
        stats = self._load_stats()
        out = []
        for rel in self._manifest(v):
            ent = stats.get(rel, {})
            out.append(
                {
                    "path": rel,
                    "seq": self._seq_of(rel),
                    "n_records": ent.get("::rows"),
                    "stats": {
                        c: ent[c]
                        for c in ent
                        if not c.startswith("::")
                    },
                }
            )
        return out

    def count_rows(
        self, spark: SparkSession, as_of: int | None = None
    ) -> tuple[int, int]:
        """Iceberg's ``count(*)`` pushdown: answer a bare row count
        from manifest metadata instead of scanning data. Returns
        ``(row_count, n_files_answered_from_metadata)``. Per-file
        record counts were captured into the stats sidecar at commit
        (``::rows``, from parquet footers); files without a recorded
        count — written before stats were configured, or imported —
        fall back to ONE multi-path Spark count over just those files,
        so the answer is always exact.

        Correctness guard: live DELETE files (equality or positional
        merge-on-read state) make per-file data counts overcounts, so
        their presence forces the full MoR read path — the same rule
        Iceberg's scan applies before serving count(*) from manifests.
        ``compact`` folds the deletes and re-enables the fast path.

        100 TB shape: a maintained table answers COUNT(*) from one
        manifest + one sidecar read — zero data IO, zero cluster work —
        where a plain parquet count schedules a task per file."""
        v = self._resolve_snapshot(as_of)
        if self._meta(v).get("delete_files"):
            return self.read(spark, as_of=v).count(), 0
        stats = self._load_stats()
        total = 0
        unknown: list[str] = []
        n_meta = 0
        for rel in self._manifest(v):
            n = stats.get(rel, {}).get("::rows")
            if n is None:
                unknown.append(rel)
            else:
                total += n
                n_meta += 1
        if unknown:
            total += spark.read.parquet(
                *[os.path.join(self.path, r) for r in unknown]
            ).count()
        return total, n_meta

    def min_max(
        self, spark: SparkSession, col: str, as_of: int | None = None
    ) -> tuple:
        """Iceberg's MIN/MAX pushdown: answer ``SELECT MIN(col), MAX(col)``
        from the manifest/sidecar footer stats — zero data IO on a
        maintained table (the 100 TB shape: one JSON read instead of a
        task per file). Returns ``(lo, hi, from_metadata)``.

        Exactness guards (each forces the real MoR read, never a wrong
        answer): live delete files (the extremal row may be deleted), a
        rename history on the column (sidecars key by write-time names),
        per-file schema-era overrides or files missing usable stats
        (pre-stats writes, era defaults, imported files). Files that are
        EMPTY or provably all-NULL contribute nothing and stay on the
        fast path, matching MIN/MAX's null-ignoring semantics. Footer
        min/max for float columns containing NaN are writer-dependent —
        keep NaN out of stats columns (the same caveat as range pruning).

        STRING/BINARY columns always take the real read: parquet writers
        may TRUNCATE long string/binary footer statistics (the stored max
        is an incremented prefix >= the real max — a valid bound, not a
        data value), and pyarrow < 17 exposes no
        is_min_value_exact/is_max_value_exact flags to tell. Truncated
        bounds stay perfectly safe for range PRUNING (conservative by
        construction) but would make this method return a synthetic
        value; only exact-by-construction stat types answer from
        metadata (advisor catch, r6).
        """
        v = self._resolve_snapshot(as_of)
        meta = self._meta(v)
        files = self._manifest(v)

        def slow():
            r = (
                self.read(spark, as_of=v)
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .collect()[0]
            )
            return r["lo"], r["hi"], False

        if not files:
            return None, None, True
        fmd = None
        for f in (meta.get("schema") or {}).get("fields", []):
            if f.get("name") == col:
                fmd = f.get("metadata") or {}
                break
        ddl_touched = fmd is None or (
            "iis_names" in fmd or "iis_added_v" in fmd
        )
        ftype0 = next(
            (
                f.get("type")
                for f in (meta.get("schema") or {}).get("fields", [])
                if f.get("name") == col
            ),
            None,
        )
        maybe_truncated = not isinstance(ftype0, str) or ftype0 in (
            "string",
            "binary",
        )
        if (
            meta.get("delete_files")
            or ddl_touched
            or meta.get("file_schema_v")
            or maybe_truncated
        ):
            return slow()
        stats = self._load_stats()
        los: list = []
        his: list = []
        for rel in files:
            ent = stats.get(rel, {})
            b = ent.get(col)
            if b is None:
                nrows = ent.get("::rows")
                nulls = ent.get("::nulls::" + col)
                if nrows == 0 or (nulls is not None and nulls == nrows):
                    continue  # empty / all-NULL file: nothing to contribute
                return slow()
            los.append(b[0])
            his.append(b[1])
        if not los:
            return None, None, True
        lo, hi = min(los), max(his)
        # Sidecars store date/timestamp stats as ISO STRINGS (ordering-
        # compatible, JSON-storable); the scan path returns native
        # date/datetime objects. Normalize the fast path to the column's
        # type so the same call returns the same TYPE whichever path
        # answered (review catch).
        ftype = ftype0
        if isinstance(ftype, str) and isinstance(lo, str):
            import datetime

            if ftype == "date":
                def _d(s):
                    try:
                        return datetime.date.fromisoformat(s)
                    except ValueError:
                        return datetime.datetime.fromisoformat(s).date()

                lo, hi = _d(lo), _d(hi)
            elif ftype.startswith("timestamp"):
                lo = datetime.datetime.fromisoformat(lo)
                hi = datetime.datetime.fromisoformat(hi)
        return lo, hi, True

    def partitions_info(self, as_of: int | None = None) -> list[dict]:
        """Iceberg's ``.partitions`` METADATA TABLE: one dict per live
        partition of the snapshot — the partition record, its file
        count, and its record count (summed from the stats sidecar's
        per-file footer counts). Pure metadata like ``files_info``: no
        data file is opened, so the 100 TB answer to 'how big is each
        partition / is the layout skewed?' costs one manifest + one
        sidecar read. A file written without stats recording makes its
        partition's ``n_records`` None (unknown) rather than silently
        undercounting; files without a partition record (pre-spec, or
        an unpartitioned table) group under the empty record."""
        v = self._resolve_snapshot(as_of)
        fparts = self._meta(v).get("file_partitions", {})
        agg: dict = {}
        for fi in self.files_info(v):
            key = frozenset(fparts.get(fi["path"], {}).items())
            e = agg.setdefault(
                key,
                {
                    "partition": dict(sorted(key)),
                    "n_files": 0,
                    "n_records": 0,
                },
            )
            e["n_files"] += 1
            n = fi["n_records"]
            e["n_records"] = (
                None
                if n is None or e["n_records"] is None
                else e["n_records"] + n
            )
        return sorted(agg.values(), key=lambda d: sorted(d["partition"].items()))

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

    def _meta(self, v: int) -> dict:
        with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
            return json.load(fh)

    def _manifest(self, v: int) -> list[str]:
        return self._meta(v)["files"]

    def _all_paths(self, v: int) -> list[str]:
        """Every file a snapshot references: data files plus equality-
        delete files — the reachability set expire() must respect."""
        m = self._meta(v)
        return list(m["files"]) + [
            d["path"] for d in m.get("delete_files", [])
        ]

    COMMIT_LOCK_STALE_SEC = 60.0

    @contextmanager
    def _commit_lock(self):
        """Short metadata critical section (Iceberg's metastore CAS /
        lock): version assignment, rebase, and the manifest swap happen
        under it, so concurrent commits land in version order and every
        append's manifest includes everything committed before it — the
        expensive data write (and the footer-stat recording) stays
        OUTSIDE and fully parallel, keeping hold times in milliseconds.

        Liveness protocol (review catches, all three):
          * the lock file carries its holder's identity, and release
            removes it only if STILL OURS — a breaker may have renamed
            our stale file away and a new holder's lock may sit at the
            path;
          * a stale lock (older than COMMIT_LOCK_STALE_SEC — crashed
            holder debris; live holders finish in ms) is broken by an
            atomic RENAME to a waiter-unique name, so exactly one of N
            simultaneous breakers wins; an unconditional remove lets
            the slow breaker delete the lock the fast one just
            re-acquired and admits two holders;
          * the waiter's patience resets whenever the lock CHANGES
            HANDS (observed mtime moves) — the timeout means 'one
            holder stuck too long', not 'queue too long', so healthy
            contention never aborts a commit whose data files are
            already written."""
        import threading
        import time

        os.makedirs(self._mdir, exist_ok=True)
        lock = os.path.join(self._mdir, "commit.lock")
        me = f"{os.getpid()}-{threading.get_ident()}-{id(object())}"
        last_mtime: float | None = None
        deadline = time.monotonic() + self.COMMIT_LOCK_STALE_SEC + 5
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, me.encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    mt = os.path.getmtime(lock)
                    with open(lock) as fh:
                        owner = fh.read()
                except FileNotFoundError:
                    continue
                if last_mtime is None or mt != last_mtime:
                    last_mtime = mt
                    deadline = (
                        time.monotonic() + self.COMMIT_LOCK_STALE_SEC + 5
                    )
                if time.time() - mt > self.COMMIT_LOCK_STALE_SEC:
                    # Break the stale lock — but the mtime/owner reads
                    # above are not atomic with the rename (review
                    # TOCTOU: the lock can change hands in between, and
                    # a displaced LIVE holder means two concurrent
                    # critical sections). Defense in depth:
                    #   1. CONFIRM staleness across a second read after
                    #      a beat: same owner, still stale — a handoff
                    #      in the window shows a changed owner or a
                    #      fresh mtime and aborts the break;
                    #   2. rename (atomic: one of N breakers wins);
                    #   3. judge the DISPLACED file by its own content
                    #      AND mtime — a wrong victim (fresh heartbeat
                    #      or different owner) is restored if the path
                    #      is still free.
                    # A live holder heartbeats at STALE/4, so it can
                    # only be mis-displaced if its process froze for
                    # the full staleness window AND woke inside this
                    # microsecond race — and then the restore puts its
                    # lock back.
                    time.sleep(0.05)
                    try:
                        mt2 = os.path.getmtime(lock)
                        with open(lock) as fh:
                            owner2 = fh.read()
                    except FileNotFoundError:
                        continue
                    if (
                        owner2 != owner
                        or time.time() - mt2
                        <= self.COMMIT_LOCK_STALE_SEC
                    ):
                        continue  # changed hands / fresh: not stale
                    stale = f"{lock}.stale-{me}"
                    try:
                        os.rename(lock, stale)
                    except FileNotFoundError:
                        continue  # another breaker won the rename
                    try:
                        with open(stale) as fh:
                            displaced = fh.read()
                        smt = os.path.getmtime(stale)
                    except FileNotFoundError:
                        continue
                    wrong_victim = (
                        displaced != owner2
                        or time.time() - smt
                        <= self.COMMIT_LOCK_STALE_SEC
                    )
                    if wrong_victim and not os.path.exists(lock):
                        # best-effort restore (rename is atomic; the
                        # exists() probe plus the double confirmation
                        # make a lost restore vanishingly rare, and the
                        # displaced holder's release check degrades
                        # safely to a no-op).
                        try:
                            os.rename(stale, lock)
                        except OSError:
                            pass
                        continue
                    try:
                        os.remove(stale)
                    except FileNotFoundError:
                        pass
                    continue
                if time.monotonic() > deadline:
                    raise RuntimeError(
                        f"commit lock at {lock} held too long by one "
                        "holder"
                    )
                time.sleep(0.01)
        # Heartbeat (round-5 advice): publish/expire do O(history)
        # manifest reads INSIDE the lock; on slow storage that can
        # exceed COMMIT_LOCK_STALE_SEC and get a LIVE holder's lock
        # broken — the exact lost-update the lock prevents. A daemon
        # thread refreshes the lock mtime while held, so waiters always
        # see a live holder as fresh; only a crashed/frozen holder goes
        # stale.
        stop = threading.Event()

        def _beat() -> None:
            while not stop.wait(self.COMMIT_LOCK_STALE_SEC / 4):
                try:
                    os.utime(lock)
                except OSError:
                    # transient (mid-break restore window, slow NFS):
                    # keep beating — a permanent exit would freeze the
                    # mtime of a live long holder and invite exactly
                    # the stale-break this thread exists to prevent
                    continue

        hb = threading.Thread(target=_beat, daemon=True)
        hb.start()
        try:
            yield
        finally:
            stop.set()
            hb.join(timeout=1.0)
            try:
                with open(lock) as fh:
                    mine = fh.read() == me
                if mine:
                    os.remove(lock)
            except FileNotFoundError:
                pass

    @staticmethod
    def _guard_constraints(df: DataFrame, cons: dict) -> DataFrame:
        """Fold CHECK constraints into the frame as raise_error guards:
        a row whose expr evaluates FALSE (NULL passes — SQL CHECK
        semantics) raises with the constraint name, its expression, and
        the offending row as JSON, failing the write job before any
        commit. Row-local, stays in whole-stage codegen; deterministic
        names order for reproducible first-failure messages."""
        # The whole build runs under one except: a constraint referencing
        # a column the incoming frame does not have (e.g. a direct
        # overwrite with a new shape on a constrained table) should fail
        # with THIS clean error — at plan-build time, before any write —
        # not an unresolved-column crash (review catch).
        try:
            out = df
            for cname in sorted(cons):
                cexpr = cons[cname]
                row_json = F.to_json(
                    F.struct(*[F.col(c) for c in df.columns])
                )
                msg = F.concat(
                    F.lit(
                        f"CHECK constraint '{cname}' ({cexpr}) "
                        "violated by row: "
                    ),
                    row_json,
                )
                out = out.filter(
                    F.when(
                        F.expr(cexpr) == False,  # noqa: E712
                        F.raise_error(msg),
                    ).otherwise(F.lit(True))
                )
            out.schema  # force analysis for lazy back-ends
        except Exception as ex:
            raise ValueError(
                "CHECK constraints "
                f"{sorted(cons)} cannot be evaluated against the incoming "
                "frame's schema — drop or re-declare them (RTAS clears "
                f"constraints; a handle with constraints={{}} clears them "
                f"explicitly): {str(ex)[:200]}"
            ) from ex
        return out

    def _next_version(self) -> int:
        """Next unused version number: above every committed manifest
        AND every _snap=N data dir — an orphaned dir (a writer that
        crashed between the dir rename and its manifest) burns its
        number, exactly like Iceberg's lost attempt ids, instead of
        colliding with the next commit."""
        vs = set(self.snapshots())
        if os.path.isdir(self.path):
            for name in os.listdir(self.path):
                if name.startswith("_snap="):
                    try:
                        vs.add(int(name.split("=", 1)[1]))
                    except ValueError:
                        pass
        return (max(vs) + 1) if vs else 1

    def _commit(
        self,
        df: DataFrame | None,
        inherit: bool,
        token: str | None = None,
        op: str | None = None,
        wap_id: str | None = None,
        expected_base: int | None = None,
        deletes_df: DataFrame | None = None,
        delete_key: str | None = None,
        replace_partitions: set | None = None,
        branch: str | None = None,
        drop_files: set | None = None,
        delete_kind: str = "eq",
    ) -> int:
        """Optimistic-concurrency commit, Iceberg's shape: the data
        files are written in PARALLEL into a private staging dir (the
        long part — minutes at scale, zero coordination), then the
        metadata commit — version assignment, staging rename, rebase
        against whatever landed meanwhile, conflict validation, and the
        atomic manifest swap — happens inside a millisecond critical
        section. Concurrent appends therefore MERGE (each manifest is
        built after every earlier commit is visible) instead of the
        stale-base lost-update a lock-free manifest write allows."""
        import shutil
        import tempfile

        os.makedirs(self.path, exist_ok=True)
        # Schema authority (Iceberg's model): the TABLE owns the schema;
        # append-type commits project their frame onto the current
        # published schema (missing columns -> typed NULL, widened
        # columns -> exact upcast) and never change it — only evolve()
        # DDL and replace-type commits do. The projection target is
        # captured BEFORE the (long) data write; the commit critical
        # section validates the schema didn't evolve meanwhile and
        # raises CommitConflict if it did — optimistic concurrency,
        # same as the compaction base check.
        # Materialized row-lineage columns ride through commits as
        # physical passthrough data, NEVER as schema: the engine's own
        # rewrites (compact, CoW delete/update) carry them; a user
        # frame may only carry them when lineage is ON (an explicit
        # id-preserving import), else the reserved prefix refuses.
        lin_cols = (
            [
                c
                for c in df.columns
                if c in (self._LIN_ROWID, self._LIN_LASTSEQ)
            ]
            if df is not None
            else []
        )
        if lin_cols and not self._lineage_on():
            raise ValueError(
                f"columns {lin_cols} use the reserved row-lineage "
                "names; enable row_lineage or rename them"
            )
        base0 = None
        if inherit:
            base0 = (
                self._branch_head(branch)
                if branch is not None
                else self._latest_published()
            )
            if df is not None and base0 is not None:
                tj = self._meta(base0).get("schema")
                if tj is not None:
                    from pyspark.sql import types as T

                    df = self._project_onto(
                        df,
                        T.StructType.fromJson(tj),
                        passthrough=tuple(lin_cols),
                    )
        # CHECK-constraint guard: folded into the write projection so a
        # violating batch dies in staging (head untouched, staging swept
        # by the finally) with zero extra passes over the data. Only
        # commits that can introduce new user values are guarded.
        eff_op = op or ("append" if inherit else "overwrite")
        if df is not None and eff_op not in ("replace", "publish", "delete"):
            cons = self.constraints
            if cons is None:
                lp = (
                    base0
                    if inherit and base0 is not None
                    else self._latest_published()
                )
                cons = (
                    self._meta(lp).get("constraints")
                    if lp is not None
                    else None
                )
            if cons:
                df = self._guard_constraints(df, cons)
        staging = tempfile.mkdtemp(prefix="_staging-", dir=self.path)
        if df is not None:
            schema_json = (
                df.drop(*lin_cols) if lin_cols else df
            ).schema.jsonValue()
        else:
            # metadata+delete-file-only commit (MoR positional DELETE):
            # no data is written, the schema carries over from the base
            schema_json = (
                self._meta(base0).get("schema")
                if base0 is not None
                else None
            )
        try:
            sdir = os.path.join(staging, "d")
            if df is None:
                pass  # no data files this commit
            elif self.partition_by:
                # split by SHADOW copies of the partition columns, so
                # the hive-style dirs carry the values while the real
                # columns stay inside the files — every manifest-listed
                # file is self-contained, no basePath inference needed.
                clash = [
                    c for c in df.columns if c.startswith("__part_")
                ]
                if clash:
                    raise ValueError(
                        f"columns {clash} use the reserved '__part_' "
                        "prefix of the partition shadow columns"
                    )
                pdf = df
                for c in self.partition_by:
                    pdf = pdf.withColumn(
                        f"__part_{c}", F.col(c).cast("string")
                    )
                shadows = [
                    F.col(f"__part_{c}") for c in self.partition_by
                ]
                # effective mode: explicit handle value, else the mode
                # the table recorded (Iceberg's table property) — the
                # replace path (inherit=False) looks at the latest
                # published manifest, since compaction must not revert
                # the table's layout policy
                mode = self.write_distribution
                if mode is None:
                    b = (
                        base0
                        if base0 is not None
                        else self._latest_published()
                    )
                    mode = (
                        self._meta(b).get("write_distribution", "none")
                        if b is not None
                        else "none"
                    )
                if mode == "hash":
                    # co-locate each partition value on one task: ONE
                    # file per value per commit instead of one per
                    # (task, value) pair
                    pdf = pdf.repartition(*shadows)
                elif mode == "range":
                    # Iceberg's range mode distributes by partition
                    # key PLUS the sort dimension (stats_cols here):
                    # files per value scale with data volume and each
                    # file's stats_cols footer range is DISJOINT — the
                    # sorted-compaction layout at write time, no
                    # rewrite needed (review catch: ranging over the
                    # shadow columns alone was observably identical to
                    # hash)
                    order = shadows + [
                        F.col(c)
                        for c in self.stats_cols
                        if c in df.columns
                    ]
                    pdf = pdf.repartitionByRange(
                        *order
                    ).sortWithinPartitions(*order)
                pdf.write.mode("error").partitionBy(
                    *[f"__part_{c}" for c in self.partition_by]
                ).parquet(sdir)
            else:
                df.write.mode("error").parquet(sdir)
            deldir = None
            if deletes_df is not None:
                # Equality-delete keys are dimension-sized (keys only);
                # written alongside the data files in the SAME staging
                # dir so both land — or neither lands — in one commit.
                deldir = os.path.join(staging, "del")
                deletes_df.write.mode("error").parquet(deldir)
            with self._commit_lock():
                # Token dedup DECIDED under the lock: two replays racing
                # the same batch token both pass append_once's advisory
                # probe, but only the first commits — the second finds
                # the token here and becomes the no-op.
                if token is not None:
                    dup = self._token_index().get(token)
                    if dup is not None and dup in self.snapshots():
                        return dup
                # Replace-type commits (compaction) planned their output
                # from a specific base; if main moved while the rewrite
                # ran, a blind replace would DROP the concurrent
                # commit's rows. Iceberg's validation: abort, caller
                # re-plans against the new state.
                if (
                    expected_base is not None
                    and self._latest_published() != expected_base
                ):
                    raise CommitConflict(
                        f"table advanced past snapshot {expected_base} "
                        "during the rewrite; re-run the operation "
                        "against the current state"
                    )
                if inherit:
                    # Schema conflict validation (review catches): the
                    # projection target was captured BEFORE the (long)
                    # data write — if the table schema is DIFFERENT by
                    # commit time (a concurrent evolve, or a first
                    # commit with another shape racing ours onto an
                    # empty table), our already-written files would
                    # silently diverge from the table schema on the
                    # fast read path. Abort; the caller's retry
                    # projects onto the current schema. Identical
                    # schemas (the common concurrent-append race) pass.
                    # Branch commits validate against the BRANCH head
                    # (their inherit base), not main — and re-resolve it
                    # under the lock so a concurrent branch commit or a
                    # drop_branch mid-write is caught here.
                    curb = (
                        self._branch_head(branch)
                        if branch is not None
                        else self._latest_published()
                    )
                    cur_schema = (
                        self._meta(curb).get("schema")
                        if curb is not None
                        else None
                    )
                    if (
                        cur_schema is not None
                        and schema_json is not None
                        and not (
                            self._schema_names_types(schema_json)
                            == self._schema_names_types(cur_schema)
                        )
                    ):
                        raise CommitConflict(
                            "table schema changed during the write "
                            "(concurrent evolve or create); re-run "
                            "the append against the current schema"
                        )
                v = self._next_version()
                d = os.path.join(self.path, f"_snap={v}")
                if df is None:
                    os.makedirs(d)
                else:
                    os.rename(sdir, d)
                if deldir is not None:
                    os.rename(deldir, os.path.join(d, "_deletes"))
                new_files = self._finish_commit(
                    v, d, inherit, token, op, wap_id, schema_json,
                    delete_key, replace_partitions, branch, drop_files,
                    delete_kind,
                )
            # Footer-stat recording OUTSIDE the lock (review catch:
            # thousands of footer reads inside it would overrun the
            # stale threshold and get a live holder's lock broken).
            # The sidecar merge is last-writer-wins, so two concurrent
            # recorders can drop each other's NEW entries — which only
            # means conservative 'must read' for those files, never a
            # wrong prune.
            if (self.stats_cols or self.bloom_cols) and new_files:
                self._record_stats(new_files)
            return v
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _finish_commit(
        self,
        v: int,
        d: str,
        inherit: bool,
        token: str | None,
        op: str | None,
        wap_id: str | None,
        schema_json: dict | None = None,
        delete_key: str | None = None,
        replace_partitions: set | None = None,
        branch: str | None = None,
        drop_files: set | None = None,
        delete_kind: str = "eq",
    ) -> list[str]:
        new_files = []
        for root, dirs, files in os.walk(d):
            dirs[:] = [x for x in dirs if x != "_deletes"]
            for f in files:
                if f.endswith(".parquet"):
                    new_files.append(
                        os.path.relpath(
                            os.path.join(root, f), self.path
                        )
                    )
        new_files.sort()
        # partition record per new file, parsed from the shadow-column
        # hive path segments (__part_<col>=<value>). Stored as a
        # {column: value} DICT — each file carries its OWN spec
        # (Iceberg's spec-id-per-file), so partition-spec evolution
        # never rewrites old files: they keep their old-spec record and
        # reads treat them conservatively.
        new_parts: dict[str, dict[str, str]] = {}
        if self.partition_by:
            from urllib.parse import unquote

            for rel in new_files:
                seg = {}
                for part in rel.split(os.sep):
                    if part.startswith("__part_") and "=" in part:
                        k, val = part.split("=", 1)
                        seg[k[len("__part_"):]] = unquote(val)
                # record what the PATH says, not a re-index by the
                # handle's current spec (review catch: a concurrent
                # evolve_partitioning mutating self.partition_by
                # mid-append would fabricate empty-string values for
                # columns the file was never partitioned by, and
                # pruning would wrongly drop it) — absent columns mean
                # conservative keep.
                new_parts[rel] = seg
        # Inherit from the latest PUBLISHED snapshot, never a staged one:
        # a main-branch append that inherited staged files would silently
        # publish unaudited data (caught by
        # test_wap_rejected_stage_is_expirable). Branch commits inherit
        # from the BRANCH head instead (re-read under the lock).
        if branch is not None:
            base = self._branch_head(branch)
        else:
            base = self._latest_published() if inherit else None
        base_meta = self._meta(base) if base is not None else {}
        inherited = base_meta.get("files", [])
        if drop_files:
            # Copy-on-write row-level DELETE/UPDATE: the rewritten
            # source files leave the manifest (their replacement rows
            # are this commit's new_files); every untouched base file
            # is carried forward verbatim — no data IO for them.
            unknown = drop_files - set(inherited)
            if unknown:
                raise CommitConflict(
                    "files planned for rewrite are no longer in the "
                    f"base manifest (concurrent replace?): "
                    f"{sorted(unknown)[:3]}"
                )
            inherited = [f for f in inherited if f not in drop_files]
        base_parts = base_meta.get("file_partitions", {})
        # Partition-spec consistency (review catches): a handle opened
        # with a DIFFERENT partition_by would record its own spec and
        # reinterpret the inherited files' records under the wrong
        # column names — mis-pruning reads silently. Refuse EVERY
        # commit type against the latest published spec: a replace-type
        # commit (compact/overwrite) from a stale handle would
        # otherwise silently revert a partition-spec evolution. Spec
        # changes go through evolve_partitioning only.
        pub = base if inherit else self._latest_published()
        pub_spec = (
            self._meta(pub).get("partition_by")
            if pub is not None
            else None
        )
        if pub_spec is not None and list(pub_spec) != self.partition_by:
            raise ValueError(
                f"table is partitioned by {pub_spec} but this handle "
                f"declares {self.partition_by}; open the table with "
                "the matching partition_by (or evolve_partitioning)"
            )
        if replace_partitions is not None:
            # DYNAMIC PARTITION OVERWRITE (Iceberg's replacePartitions /
            # partitionOverwriteMode=dynamic as ONE snapshot): inherit
            # only the base files whose partition record is NOT
            # replaced by this commit's data. The replaced set is
            # derived from the WRITTEN files' partition paths (review
            # catch: same hive encoding as the manifest records —
            # booleans/NULLs compare exactly, and the input frame runs
            # once). Base files without a record, or written under a
            # DIFFERENT spec (partition evolution), could logically
            # overlap a replaced partition — refuse rather than
            # silently duplicate; compact first to rewrite them under
            # the current spec.
            replaced = {
                frozenset(p.items()) for p in new_parts.values()
            }
            spec = set(self.partition_by)
            bad = [
                f
                for f in inherited
                if f not in base_parts
                or set(base_parts[f]) != spec
            ]
            if bad:
                raise ValueError(
                    "dynamic partition overwrite needs every base file "
                    "recorded under the CURRENT partition spec "
                    f"{sorted(spec)}; offending: {bad[:3]} — compact to "
                    "rewrite pre-spec files first"
                )
            inherited = [
                f
                for f in inherited
                if frozenset(base_parts[f].items()) not in replaced
            ]
        meta: dict = {
            "files": inherited + new_files,
            # This commit's OWN files (Iceberg's added-data-files summary):
            # publish() applies exactly these onto wherever main is THEN.
            "new_files": new_files,
            # Iceberg's snapshot `operation` summary field — the history /
            # snapshots metadata tables read this, never the data files.
            "op": op or ("append" if inherit else "overwrite"),
        }
        if new_parts or (inherit and base_parts):
            kept_parts = {
                f: base_parts[f] for f in inherited if f in base_parts
            }
            meta["file_partitions"] = {**kept_parts, **new_parts}
            meta["partition_by"] = self.partition_by or base_meta.get(
                "partition_by", []
            )
        # write.distribution-mode persists like an Iceberg table
        # property: an explicit handle value records itself; a default
        # handle carries the latest published manifest's mode forward
        # (replace commits included — compaction must not revert the
        # layout policy)
        wd = self.write_distribution
        if wd is None and pub is not None:
            wd = self._meta(pub).get("write_distribution")
        if wd and wd != "none":
            meta["write_distribution"] = wd
        rl = self.row_lineage
        if rl is None and pub is not None:
            rl = self._meta(pub).get("row_lineage")
        if rl:
            meta["row_lineage"] = True
        # CHECK constraints persist like a table property: an explicit
        # handle dict records itself ({} clears), a default handle
        # carries the latest published manifest's constraints forward.
        cs = self.constraints
        if cs is None and pub is not None:
            cs = self._meta(pub).get("constraints")
        if cs:
            meta["constraints"] = dict(cs)
        # Schema-era overrides (files cherry-picked/published after a
        # main-side evolve) follow their files: carried while the file
        # is inherited, gone when a replace/rewrite drops the file.
        # This commit's OWN files never need one — they are written at
        # this commit's era.
        base_eras = base_meta.get("file_schema_v", {})
        if inherit and base_eras:
            kept_eras = {
                f: base_eras[f] for f in inherited if f in base_eras
            }
            if kept_eras:
                meta["file_schema_v"] = kept_eras
        # Iceberg v2 delete files: each entry records its path, equality
        # key, and the sequence number it was committed at — a delete
        # applies only to data files with a LOWER sequence (data seq ==
        # the _snap=K dir), so a merge's own re-inserts survive its own
        # deletes. Appends inherit the base's delete files (older data
        # still needs them); overwrite/replace drop them (compaction
        # folds deletes back into data).
        ddir = os.path.join(d, "_deletes")
        new_dels = []
        if os.path.isdir(ddir):
            new_dels = [
                (
                    {
                        "path": os.path.join(
                            f"_snap={v}", "_deletes", f
                        ),
                        "kind": "pos",
                        "seq": v,
                    }
                    if delete_kind == "pos"
                    else {
                        "path": os.path.join(
                            f"_snap={v}", "_deletes", f
                        ),
                        "key": delete_key,
                        "seq": v,
                    }
                )
                for f in sorted(os.listdir(ddir))
                if f.endswith(".parquet")
            ]
        all_dels = (
            base_meta.get("delete_files", []) if inherit else []
        ) + new_dels
        if all_dels:
            meta["delete_files"] = all_dels
        if token is not None:
            meta["token"] = token
        if wap_id is not None:
            meta["wap_id"] = wap_id
        if branch is not None:
            # Iceberg's branch ref: the snapshot lives in the shared
            # version space but is OFF main — op "branch-append" keeps
            # every op-filtering consumer (_latest_published, streaming,
            # time-travel-by-timestamp) naturally blind to it.
            meta["branch"] = branch
        if schema_json is not None:
            # Iceberg records a schema-id per snapshot; the schema the
            # commit wrote is THE snapshot's read schema (time travel
            # resolves it, and zero-file snapshots stay readable).
            # ``schema_v`` = the snapshot at which this schema took
            # effect: files from seq >= schema_v are exactly-schema
            # (appends project onto it before writing), so a read whose
            # files all post-date the last evolve skips per-group
            # schema resolution entirely.
            # Prefer the PRIOR schema JSON whenever names+types are
            # unchanged: the commit's frame went through select()-style
            # projections that strip StructField metadata (the v3
            # initial_default lives there), and recording the stripped
            # copy would make later reads resolve pre-evolution files
            # — and later omitting appends — without the default.
            # Replace-type commits (inherit=False: overwrite/compact)
            # have no inherit base but still follow the table's schema
            # lineage — compare against the latest published (review
            # catch: compaction otherwise stripped the write-default).
            prior = base_meta
            if "schema" not in prior:
                lp = self._latest_published()
                prior = self._meta(lp) if lp is not None else {}
            if (
                "schema" in prior
                and self._schema_names_types(prior["schema"])
                == self._schema_names_types(schema_json)
            ):
                schema_json = prior["schema"]
            meta["schema"] = schema_json
            if inherit and "schema" in base_meta:
                meta["schema_v"] = base_meta.get("schema_v", 1)
            else:
                meta["schema_v"] = v
        # Token-index entry BEFORE the manifest (review catch): a crash
        # between the two leaves a DANGLING index entry — harmless, the
        # dedup probe checks membership in snapshots() — while the
        # reverse order leaves a committed manifest whose token is
        # missing from the index, so a stream-restart replay
        # double-appends. Both writes happen under the commit lock.
        if token is not None:
            idx = self._token_index()
            idx[token] = v
            self._atomic_json(self._tokens_path(), idx)
        # An orphaned _snap=N dir from a crash before this manifest
        # write burns its number via _next_version instead of bricking
        # commits; a missing stats entry (stats are recorded after the
        # lock) only ever means conservative 'must read'.
        self._write_manifest(v, meta)
        if branch is not None:
            # Advance the branch ref to this commit — still inside the
            # commit critical section, so ref and manifest move
            # together (a crash between the two leaves an unreferenced
            # branch snapshot, which expire/orphan cleanup reclaims —
            # never a ref pointing at a missing manifest).
            refs = self._refs()
            entry = refs.get(branch)
            if not isinstance(entry, dict) or entry.get("type") != "branch":
                raise ValueError(f"no such branch: {branch!r}")
            refs[branch] = {**entry, "snapshot": v}
            self._atomic_json(self._refs_path(), refs)
        return new_files

    @staticmethod
    def _atomic_json(path: str, obj) -> None:
        """Atomic metadata swap (Iceberg's commit contract): metadata must
        never be observable half-written, so write to a temp name and
        os.rename() into place — rename is atomic on POSIX, so readers see
        either no file or a complete one. The temp name is
        writer-unique (review catch: a shared '.tmp' lets two writers
        interleave bytes in one temp file and rename corrupt JSON into
        place). The ONE spelling of this contract; manifests, the
        token index, the stats sidecar, and expire's trims all go
        through it."""
        import threading

        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
        os.rename(tmp, path)

    def _write_manifest(self, v: int, meta: dict) -> None:
        # commit wall-clock (Iceberg's snapshot timestamp-ms): the
        # TIMESTAMP AS OF resolution key. Recorded for every commit
        # type at the single manifest-write choke point.
        meta.setdefault("ts", time_time())
        self._atomic_json(os.path.join(self._mdir, f"v{v}.json"), meta)

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
            mts = self._meta(v).get("ts", float("-inf"))
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
                own = f"_snap={v}/"
                foreign = any(
                    not f.startswith(own) for f in meta["files"]
                )
                op = (
                    "append" if (foreign or v == 1) else "overwrite"
                )
            out.append((v, op))
        return out

    def _token(self, v: int) -> str | None:
        with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
            return json.load(fh).get("token")

    def _tokens_path(self) -> str:
        return os.path.join(self._mdir, "tokens.json")

    def _token_index(self) -> dict:
        """token -> snapshot version, maintained at commit time under
        the lock — so append_once's dedup probe is ONE small JSON read
        per micro-batch instead of opening every manifest (O(N) per
        batch, O(N^2) across a streaming ingest's life). Tables written
        before the index existed fall back to a manifest scan; the scan
        result is NOT persisted here (review catch: this runs outside
        the lock on the probe path, and an unlocked write could clobber
        a concurrent commit's fresh entry) — the first tokened commit
        persists it from inside the critical section."""
        try:
            with open(self._tokens_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            idx = {}
            for v in self.snapshots():
                t = self._token(v)
                if t is not None:
                    idx[t] = v
            return idx

    def append_once(self, df: DataFrame, token: str) -> int:
        """IDEMPOTENT append: commit a snapshot tagged with ``token``
        unless one already carries it — Iceberg's commit-dedup idiom
        (write.spark.commit-id / WAP id) that turns foreachBatch's
        AT-LEAST-ONCE replay into exactly-once: a replayed micro-batch
        finds its batch-id token already committed and becomes a no-op
        instead of double-appending. Returns the (existing or new)
        snapshot version. The probe reads the token index (one small
        JSON), not the manifest history; the index is re-checked inside
        the commit critical section (via the manifest write path), so a
        racing duplicate loses there, not at this advisory check."""
        v = self._token_index().get(token)
        if v is not None and v in self.snapshots():
            return v
        return self._commit(df, inherit=True, token=token)

    def append(self, df: DataFrame) -> int:
        """Write a new snapshot: data files under ``_snap=N/`` plus a
        manifest listing every file visible at N (inherited + new)."""
        return self._commit(df, inherit=True)

    def overwrite(self, df: DataFrame, token: str | None = None) -> int:
        """REPLACE the table contents in a new snapshot: the manifest
        lists only the new files; prior files stay on disk, referenced
        only by OLDER manifests — so time travel still reaches them until
        ``expire`` reclaims them. This is the commit type (Iceberg
        overwrite / rewrite-compaction) that makes snapshot expiry
        actually delete data: an append-only history references every
        file from every surviving manifest forever. ``token`` makes the
        replace idempotent (append_once's contract), so a replayed full
        rebuild commits once."""
        return self._commit(df, inherit=False, token=token)

    def overwrite_partitions(self, df: DataFrame) -> int:
        """DYNAMIC PARTITION OVERWRITE as one atomic snapshot
        (Iceberg's ``replacePartitions`` / Spark's
        ``partitionOverwriteMode=dynamic``, snapshot-versioned): replace
        exactly the partitions PRESENT in ``df`` — the daily-reload /
        backfill shape — leaving every other partition's files
        inherited untouched (file identity preserved: no rewrite, no
        copy). The replaced partitions' old files stay referenced by
        older manifests (time-travelable) until ``expire``.

        The touched-partition set is derived from the WRITTEN files'
        partition paths inside the commit (review catch) — the same
        hive encoding the manifest tuples use, so booleans, NULLs, and
        any other value compare exactly, and the input frame is
        computed exactly once. Bounded by the number of partitions in
        the batch, never by rows. Note hive's convention: NULL and
        empty-string partition values both land in the
        ``__HIVE_DEFAULT_PARTITION__`` bucket. Use simple scalar
        partition columns."""
        if not self.partition_by:
            raise ValueError(
                "overwrite_partitions needs partition_by on the table"
            )
        # cheap metadata pre-flight (review catch): refuse BEFORE the
        # expensive data write if the base has files without partition
        # tuples — _finish_commit re-validates authoritatively under
        # the lock.
        base = self._latest_published()
        if base is not None:
            bmeta = self._meta(base)
            bparts = bmeta.get("file_partitions", {})
            spec = set(self.partition_by)
            bad = [
                f
                for f in bmeta["files"]
                if f not in bparts or set(bparts[f]) != spec
            ]
            if bad:
                raise ValueError(
                    "dynamic partition overwrite needs every base "
                    "file recorded under the CURRENT partition spec "
                    f"{sorted(spec)}; offending: {bad[:3]} — compact "
                    "to rewrite pre-spec files first"
                )
        return self._commit(
            df,
            inherit=True,
            op="dynamic_overwrite",
            replace_partitions="auto",
        )

    @staticmethod
    def _schema_names_types(schema_json: dict) -> list[tuple]:
        """(name, type) pairs of a schema-JSON — the schema identity the
        conflict check compares; nullability and field metadata are
        layout-irrelevant and excluded."""
        return [
            (f["name"], f["type"]) for f in schema_json["fields"]
        ]

    @staticmethod
    def _project_onto(df: DataFrame, target, passthrough=()) -> DataFrame:
        """Project a frame onto the table schema: identical schemas pass
        through untouched; missing columns become typed NULLs, type
        differences cast (appends of pre-widening frames upcast
        exactly); columns the table doesn't know are an error — data
        can't enter the table outside its schema (add_column first).
        ``passthrough`` names engine-internal columns (e.g. the CoW
        planner's file-path tag) carried alongside the projection."""
        have = {f.name: f.dataType for f in df.schema.fields}
        want = [(f.name, f.dataType) for f in target.fields]
        if [(f.name, f.dataType) for f in df.schema.fields] == want:
            return df
        extra = [
            c
            for c in df.columns
            if c not in {n for n, _ in want} and c not in passthrough
        ]
        if extra:
            raise ValueError(
                f"append frame has columns {extra} absent from the "
                "table schema; evolve the table first (add_column)"
            )
        def fill(fld) -> F.Column:
            # Iceberg v3 initial-default: a column added WITH a default
            # fills that value for rows/files that predate it (and for
            # appends that omit it — the write-default role); without
            # one, the classic typed NULL.
            dv = (fld.metadata or {}).get("initial_default")
            return F.lit(dv).cast(fld.dataType)

        return df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in have
                else fill(f).alias(f.name)
                for f in target.fields
            ],
            *[F.col(c) for c in passthrough if c in df.columns],
        )

    @staticmethod
    def _field_hist(md: dict | None, name: str) -> list[list]:
        """A field's name history ``[[effective_from_version, name],
        ...]`` (last entry = current name). Fields that were never
        renamed have no recorded history: they are synthesized as
        ``[[added_v, name]]`` with ``added_v`` defaulting to 1 (a field
        present since the first recorded schema). This history is the
        local stand-in for Iceberg's field IDs: it answers both "what
        was this field called at era E" and "did this field exist at
        era E"."""
        md = md or {}
        hist = md.get("iis_names")
        if hist:
            return [list(h) for h in hist]
        return [[md.get("iis_added_v", 1), name]]

    @classmethod
    def _era_name(cls, md: dict | None, name: str, era: int) -> str | None:
        """The name a CURRENT-schema field had at schema era ``era`` —
        or None if the field did not exist yet (files from era E can
        never feed a field added after E, even under a reused name)."""
        hist = cls._field_hist(md, name)
        if era < hist[0][0]:
            return None
        out = hist[0][1]
        for hv, hn in hist:
            if hv <= era:
                out = hn
        return out

    def _resolve_onto(
        self, df: DataFrame, target, era: int, passthrough=()
    ) -> DataFrame:
        """READ-TIME schema resolution for a pre-evolution file group
        (Iceberg's field-ID resolution, driven by the name history):
        for each field of the snapshot's schema, select the column
        under the name the field had at the group's era (renamed ->
        old name, widened -> exact upcast), or fill the v3
        initial-default / typed NULL when the field postdates the
        group. File columns OUTSIDE the current schema (dropped
        fields, other fields' pre-rename names) are ignored — never an
        error, exactly as an Iceberg reader skips unknown field IDs.
        All of this is row expressions fused into the scan stage; the
        surrounding unionByName is a metadata concat."""
        have = set(df.columns)
        cols = []
        for f in target.fields:
            md = dict(f.metadata or {})
            name_at = self._era_name(md, f.name, era)
            if name_at is not None and name_at in have:
                cols.append(
                    F.col(name_at).cast(f.dataType).alias(f.name)
                )
            else:
                dv = md.get("initial_default")
                cols.append(F.lit(dv).cast(f.dataType).alias(f.name))
        return df.select(
            *cols, *[F.col(c) for c in passthrough if c in df.columns]
        )

    def _evolve(self, mutate) -> int:
        """Shared DDL commit: metadata-only, same atomic manifest swap.
        The new snapshot copies the current file list (and delete
        files) and records the mutated schema with ``schema_v`` = its
        own version — from here on, files older than schema_v resolve
        at read time (missing -> NULL, widened -> upcast), exactly
        Iceberg's schema-id-per-snapshot resolution. Old files are
        NEVER rewritten."""
        from pyspark.sql import types as T

        with self._commit_lock():
            base = self._latest_published()
            if base is None:
                raise ValueError("nothing published to evolve")
            meta = self._meta(base)
            sj = meta.get("schema")
            if sj is None:
                raise ValueError(
                    "table predates schema-tracking manifests; "
                    "re-commit (append/overwrite) once to record a "
                    "schema before evolving"
                )
            v = self._next_version()
            new_schema = mutate(T.StructType.fromJson(sj), v, meta)
            emeta = {
                "files": meta["files"],
                "op": "evolve",
                "schema": new_schema.jsonValue(),
                "schema_v": v,
            }
            for carry in (
                "delete_files",
                "file_partitions",
                "partition_by",
                "file_schema_v",
                *SnapshotTable._PROP_CARRY,
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest(v, emeta)
        return v

    def evolve_partitioning(self, partition_by: list[str]) -> int:
        """PARTITION-SPEC EVOLUTION (Iceberg ALTER TABLE ... ADD/DROP
        PARTITION FIELD): a metadata-only commit that changes the spec
        for FUTURE writes — old files are never rewritten; they keep
        their own per-file partition record (spec-id-per-file) and
        reads treat them conservatively (kept by partition pruning,
        re-filtered by the residual). ``overwrite_partitions`` refuses
        while pre-evolution files remain (they could logically overlap
        a replaced partition) until a compact rewrites them under the
        current spec. Updates this handle's spec; other handles get
        the spec-mismatch refusal on their next commit and must
        reopen."""
        with self._commit_lock():
            base = self._latest_published()
            if base is None:
                raise ValueError("nothing published to evolve")
            meta = self._meta(base)
            v = self._next_version()
            emeta = {
                "files": meta["files"],
                "op": "evolve_spec",
                "partition_by": list(partition_by),
            }
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "file_partitions",
                "file_schema_v",
                *SnapshotTable._PROP_CARRY,
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest(v, emeta)
        self.partition_by = list(partition_by)
        return v

    def add_constraint(
        self,
        spark: SparkSession,
        name: str,
        expr: str,
        validate: bool = True,
    ) -> int:
        """ALTER TABLE ADD CONSTRAINT (Delta's shape): record a CHECK
        constraint as a metadata-only commit. With ``validate=True`` (the
        default, Delta's semantics) the CURRENT table contents are
        scanned ONCE first and the add is refused if any live row
        violates — otherwise existing data would silently claim a
        guarantee it does not meet. The scan runs OUTSIDE the commit
        lock (it is O(table)); the lock only covers the manifest write,
        and a concurrent violating append is caught by ITS OWN guard
        (it inherits the new constraints from the manifest it rebases
        onto, or commits first and fails our validation — either order
        is safe)."""
        if not name or not isinstance(expr, str) or not expr:
            raise ValueError("constraint needs a name and a SQL expr")
        scanned_base = None
        if validate:
            scanned_base = self._latest_published()
            bad = (
                self.read(spark)
                .filter(F.expr(expr) == False)  # noqa: E712
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"cannot add CHECK constraint {name!r} ({expr}): "
                    "existing rows violate it"
                )
        with self._commit_lock():
            base = self._latest_published()
            if base is None:
                raise ValueError("nothing published to constrain")
            # Optimistic validation (review catch — the TOCTOU third
            # order): the O(table) scan ran OUTSIDE the lock against
            # scanned_base; a write landing between scan and lock was
            # NOT guarded by this constraint and may violate it, so the
            # scan is stale. Abort with the house conflict, caller
            # retries against the current state (the expected_base
            # pattern of compact_with_retry).
            if validate and base != scanned_base:
                raise CommitConflict(
                    "table advanced during constraint validation; "
                    "re-run add_constraint against the current state"
                )
            meta = self._meta(base)
            cons = dict(meta.get("constraints") or {})
            if name in cons:
                raise ValueError(f"constraint {name!r} already exists")
            cons[name] = expr
            v = self._next_version()
            emeta = {
                "files": meta["files"],
                "op": "alter_constraints",
                "constraints": cons,
            }
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "file_partitions",
                "partition_by",
                "file_schema_v",
                # property carry MINUS constraints (set explicitly above)
                *(k for k in SnapshotTable._PROP_CARRY
                  if k != "constraints"),
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest(v, emeta)
        if self.constraints is not None:
            self.constraints = cons
        return v

    def drop_constraint(self, name: str) -> int:
        """ALTER TABLE DROP CONSTRAINT: metadata-only removal. Unknown
        names are refused (a typo'd drop silently succeeding would leave
        the caller believing enforcement stopped)."""
        with self._commit_lock():
            base = self._latest_published()
            if base is None:
                raise ValueError("nothing published")
            meta = self._meta(base)
            cons = dict(meta.get("constraints") or {})
            if name not in cons:
                raise ValueError(f"constraint {name!r} does not exist")
            del cons[name]
            v = self._next_version()
            emeta = {
                "files": meta["files"],
                "op": "alter_constraints",
            }
            if cons:
                emeta["constraints"] = cons
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "file_partitions",
                "partition_by",
                "file_schema_v",
                # property carry MINUS constraints (set explicitly above)
                *(k for k in SnapshotTable._PROP_CARRY
                  if k != "constraints"),
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest(v, emeta)
        if self.constraints is not None:
            self.constraints = cons
        return v

    def add_column(self, name: str, dtype, default=None) -> int:
        """Metadata-only ADD COLUMN (Iceberg ALTER TABLE): commits an
        ``evolve`` snapshot; pre-evolution files read as typed NULL for
        the new column — or as ``default`` (Iceberg v3's
        initial-default: the value is recorded in the schema metadata
        once at add time, pre-evolution rows resolve to it with zero
        rewrites, and appends that omit the column fill it too, the
        write-default role). Time travel to snapshots before the evolve
        still returns the OLD schema — the schema lives in the
        snapshot's manifest."""
        from pyspark.sql import types as T

        if default is not None:
            if not isinstance(default, (int, float, str, bool)):
                raise ValueError(
                    "default must be a JSON-scalar (int/float/str/bool) "
                    "— it is recorded in the schema metadata"
                )
            # Python-side type compatibility (review catch: an
            # incompatible default would silently cast to NULL at read
            # time — a declared default that never fires)
            tn = dtype.typeName()
            ok = {
                "long": lambda d: isinstance(d, int)
                and not isinstance(d, bool),
                "integer": lambda d: isinstance(d, int)
                and not isinstance(d, bool),
                "short": lambda d: isinstance(d, int)
                and not isinstance(d, bool),
                "double": lambda d: isinstance(d, (int, float))
                and not isinstance(d, bool),
                "float": lambda d: isinstance(d, (int, float))
                and not isinstance(d, bool),
                "string": lambda d: isinstance(d, str),
                "boolean": lambda d: isinstance(d, bool),
            }.get(tn)
            if ok is None:
                raise ValueError(
                    f"defaults are supported for scalar column types, "
                    f"not {tn}"
                )
            if not ok(default):
                raise ValueError(
                    f"default {default!r} is not a {tn} value — it "
                    "would silently read back as NULL"
                )

        def mutate(schema: T.StructType, v: int, _meta) -> T.StructType:
            if name in schema.fieldNames():
                raise ValueError(f"column {name} already exists")
            # ``iis_added_v`` = the evolve's own snapshot version: the
            # era guard for read resolution and stats pruning — a file
            # whose schema era predates it can NEVER feed this column,
            # even if the file carries a same-named column from a
            # dropped/renamed predecessor (the name-collision hazard
            # field IDs exist to prevent in Iceberg proper).
            md: dict = {"iis_added_v": v}
            if default is not None:
                md["initial_default"] = default
            return T.StructType(
                schema.fields
                + [T.StructField(name, dtype, True, metadata=md)]
            )

        return self._evolve(mutate)

    def widen_column(self, name: str, dtype) -> int:
        """Metadata-only type promotion; only Iceberg's value-exact
        widenings pass (int->long, float->double) — every old value is
        exactly representable in the new type, so the read-time upcast
        is lossless."""
        from pyspark.sql import types as T

        from .schema_evolution import _WIDENINGS, _type_name

        def mutate(schema: T.StructType, _v: int, _meta) -> T.StructType:
            if name not in schema.fieldNames():
                raise ValueError(f"no such column: {name}")
            old = schema[name].dataType
            if _type_name(dtype) not in _WIDENINGS.get(
                _type_name(old), set()
            ):
                raise ValueError(
                    f"illegal promotion {_type_name(old)} -> "
                    f"{_type_name(dtype)} (Iceberg allows int->long, "
                    "float->double only)"
                )
            return T.StructType(
                [
                    T.StructField(
                        f.name,
                        dtype if f.name == name else f.dataType,
                        f.nullable,
                        # metadata carries (review catch: rebuilding
                        # without it erased initial_default for every
                        # OTHER column on any widen)
                        metadata=f.metadata,
                    )
                    for f in schema.fields
                ]
            )

        return self._evolve(mutate)

    def _guard_column_ddl(self, name: str, meta: dict, verb: str) -> None:
        """Shared refusals for RENAME/DROP COLUMN. Iceberg proper
        resolves partition specs and equality-delete keys by field ID,
        so renames are free; this local twin's specs and delete files
        reference columns by NAME, so mutating a referenced name would
        silently break partition pruning or the MoR anti-join — refuse
        honestly instead, with compact (which folds delete files and
        rewrites old-spec files) as the documented unblock."""
        pby = meta.get("partition_by") or self.partition_by or []
        if name in pby:
            raise ValueError(
                f"cannot {verb} {name!r}: it is a partition column "
                f"({pby}); evolve_partitioning away from it first"
            )
        if any(
            name in p for p in meta.get("file_partitions", {}).values()
        ):
            raise ValueError(
                f"cannot {verb} {name!r}: live files carry partition "
                "records under that name (an old spec); compact to "
                "rewrite them under the current spec first"
            )
        live_keys = {
            d["key"]
            for d in meta.get("delete_files", [])
            if d.get("kind", "eq") != "pos"
        }
        if name in live_keys:
            raise ValueError(
                f"cannot {verb} {name!r}: live equality-delete files "
                "use it as their merge key; compact to fold them first"
            )

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only RENAME COLUMN (Iceberg ``ALTER TABLE ...
        RENAME COLUMN``): commits an ``evolve`` snapshot whose schema
        carries the field under its new name plus a NAME HISTORY
        (``iis_names`` = [[effective_from_version, name], ...]) in the
        field metadata — the local stand-in for Iceberg's field IDs.
        Old data files are NEVER rewritten: read-time resolution maps
        each file's schema era to the name the field had then, so
        pre-rename files read under the new name with their data
        intact, and time travel to a pre-rename snapshot still shows
        the old name (the schema lives in the snapshot's manifest).

        A later ``add_column`` may REUSE the old name: era guards keep
        the old files' column feeding the renamed field only — the
        re-added column reads as NULL/default for rows that predate it,
        never resurrecting the old data under the new field."""
        if new.startswith("__iis_") or new.startswith("__part_"):
            raise ValueError(f"{new!r} uses a reserved column prefix")

        from pyspark.sql import types as T

        def mutate(schema: T.StructType, v: int, meta) -> T.StructType:
            if old not in schema.fieldNames():
                raise ValueError(f"no such column: {old}")
            if new in schema.fieldNames():
                raise ValueError(f"column {new} already exists")
            self._guard_column_ddl(old, meta, "rename")
            out = []
            for f in schema.fields:
                if f.name != old:
                    out.append(f)
                    continue
                md = dict(f.metadata or {})
                hist = md.get("iis_names") or [
                    [md.get("iis_added_v", 1), old]
                ]
                md["iis_names"] = [list(h) for h in hist] + [[v, new]]
                out.append(
                    T.StructField(new, f.dataType, f.nullable, metadata=md)
                )
            return T.StructType(out)

        v = self._evolve(mutate)
        # keep the handle's stats/bloom column configs pointing at the
        # renamed field so FUTURE commits keep recording its stats
        # (sidecar entries for old files stay keyed by the old name;
        # plan_files consults them through the same era mapping)
        self.stats_cols = [
            new if c == old else c for c in self.stats_cols
        ]
        self.bloom_cols = [
            new if c == old else c for c in self.bloom_cols
        ]
        return v

    def drop_column(self, name: str) -> int:
        """Metadata-only DROP COLUMN (Iceberg ``ALTER TABLE ... DROP
        COLUMN``): the field leaves the schema; data files are NEVER
        rewritten — read resolution simply stops selecting the column
        (file columns outside the current schema are ignored, exactly
        how an Iceberg reader skips field IDs the schema no longer
        has). Time travel to pre-drop snapshots still reads it. A
        later ``add_column`` with the same name is a NEW field
        (``iis_added_v`` guard): old rows resolve to its default/NULL,
        never the dropped column's bytes."""
        from pyspark.sql import types as T

        def mutate(schema: T.StructType, _v: int, meta) -> T.StructType:
            if name not in schema.fieldNames():
                raise ValueError(f"no such column: {name}")
            if len(schema.fields) == 1:
                raise ValueError(
                    "cannot drop the only column of the table"
                )
            self._guard_column_ddl(name, meta, "drop")
            return T.StructType(
                [f for f in schema.fields if f.name != name]
            )

        v = self._evolve(mutate)
        self.stats_cols = [c for c in self.stats_cols if c != name]
        self.bloom_cols = [c for c in self.bloom_cols if c != name]
        return v

    def merge(
        self,
        spark: SparkSession,
        changelog: DataFrame,
        key: str,
        op_col: str = "_op",
        token: str | None = None,
    ) -> int:
        """MERGE INTO as ONE atomic snapshot — Iceberg v2's CDC write
        path (round-5 verdict item #2). The changelog carries an op
        column with 'I' (insert), 'U' (update), 'D' (delete) rows;
        applying it writes

          * an EQUALITY-DELETE file of the U∪D keys (dimension-sized —
            keys only, never rewritten data), and
          * data files of the I∪U rows (the new row images),

        committed together in a single manifest swap: a reader sees the
        whole changelog applied or none of it. Reads are merge-on-read
        (``_read_mor``): data rows anti-joined against the broadcast
        delete keys, sequence-scoped so the merge's own re-inserts
        survive its own deletes. ``compact`` folds the deletes back
        into data files (the replace commit drops ``delete_files``).

        100 TB shape: the write is O(|changelog|) — no read-modify-write
        of the fact table (copy-on-write MERGE rewrites every touched
        file; equality deletes defer that cost to reads, which pay one
        broadcast anti-join until compaction). This is exactly the
        write-amplification trade Iceberg v2 made for CDC; the
        reference can only blind-append (App.java:147-149).
        """
        if key not in changelog.columns:
            raise ValueError(f"changelog has no key column {key!r}")
        if op_col not in changelog.columns:
            raise ValueError(f"changelog has no op column {op_col!r}")
        # Unknown op codes (lowercase 'd', 'DELETE', NULL, typos) must
        # fail loudly, not silently drop changelog rows (review catch).
        # NULL-safe: isin() yields NULL for NULL ops, which ~ would
        # filter away.
        bad = changelog.filter(
            ~F.coalesce(
                F.col(op_col).isin("I", "U", "D"), F.lit(False)
            )
        ).limit(1)
        bad_row = bad.collect()
        if bad_row:
            raise ValueError(
                f"changelog op column {op_col!r} contains "
                f"{bad_row[0][op_col]!r}; expected 'I', 'U', or 'D'"
            )
        dels = (
            changelog.filter(F.col(op_col).isin("U", "D"))
            .select(key)
            .distinct()
        )
        upserts = changelog.filter(F.col(op_col).isin("I", "U")).drop(
            op_col
        )
        # Optional idempotency token (same contract as append_once): a
        # replayed merge of the same changelog batch becomes a no-op —
        # the primitive incremental view maintenance builds on.
        return self._commit(
            upserts,
            inherit=True,
            op="merge",
            deletes_df=dels,
            delete_key=key,
            token=token,
        )

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        key: str,
        matched: list[tuple] = (),
        not_matched: tuple | None = None,
        token: str | None = None,
    ) -> int:
        """Full MERGE INTO clause semantics (Spark SQL / Iceberg
        ``MERGE INTO t USING s ON ... WHEN ...``): the engine DERIVES
        the changelog from a source frame and conditional clauses, then
        commits it through :meth:`merge` as ONE atomic snapshot
        (equality-deletes + new data files in a single manifest swap).

        * ``matched``: ordered WHEN MATCHED clauses, FIRST-MATCH-WINS
          exactly like SQL — each is ``("delete", cond)`` or
          ``("update", cond, {col: sql_expr})``; ``cond`` is a SQL
          string over ``s.*`` (source) and ``t.*`` (target row), or
          None for always. UPDATE assignments follow SET semantics:
          unassigned columns keep the TARGET's value.
        * ``not_matched``: ``("insert", cond)`` (cond over ``s.*`` or
          None) — source rows matching no target key insert their
          column values, with table columns the source lacks filled by
          the schema's write-default/NULL. Matched rows hit by NO
          clause, and target rows never matched, survive untouched.
        * CARDINALITY: a target key matched by MORE THAN ONE source row
          is refused (Spark's MERGE_CARDINALITY_VIOLATION) — applying
          an ambiguous update would nondeterministically pick an image.

        Isolation: the target state is read once (snapshot-consistent,
        merge-on-read resolved), the changelog derives from it, and the
        commit applies onto the latest base — the same
        read-derive-commit contract as q_upsert's CDC apply; racing
        writers serialize at the commit lock.

        100 TB shape: two joins against the target — the clause join
        (source-sized probe; Catalyst broadcasts the CDC batch against
        the fact scan) and a column-pruned LEFT ANTI on the key for
        inserts — then everything downstream is O(|changelog|); no
        target file is rewritten (the v2 delete-file trade)."""
        matched = list(matched or [])
        for cl in matched:
            if not cl or cl[0] not in ("delete", "update"):
                raise ValueError(
                    f"matched clause must be ('delete', cond) or "
                    f"('update', cond, assignments); got {cl!r}"
                )
            if cl[0] == "update" and (
                len(cl) < 3 or not isinstance(cl[2], dict) or not cl[2]
            ):
                raise ValueError(
                    "update clause needs a non-empty {column: sql_expr} "
                    "assignment dict"
                )
        if not_matched is not None and (
            not_matched[0] != "insert" or len(not_matched) > 2
        ):
            raise ValueError(
                f"not_matched must be ('insert', cond); got {not_matched!r}"
            )
        if not matched and not_matched is None:
            raise ValueError("merge_into needs at least one clause")
        if key not in source.columns:
            raise ValueError(f"source has no key column {key!r}")
        base = self._latest_published()
        if base is None:
            raise ValueError(
                "merge_into needs a published table (append first)"
            )
        sj = self._meta(base).get("schema")
        if sj is None:
            raise ValueError(
                "table predates schema-tracking manifests; re-commit "
                "once to record a schema before merge_into"
            )
        from pyspark.sql import types as T

        tschema = T.StructType.fromJson(sj)
        tcols = [f.name for f in tschema.fields]
        for cl in matched:
            if cl[0] == "update":
                unknown = sorted(set(cl[2]) - set(tcols))
                if unknown:
                    raise ValueError(
                        f"update assigns unknown column(s) {unknown}"
                    )
                if key in cl[2]:
                    # review catch (silent corruption): merge() derives
                    # its equality-delete keys from the changelog's NEW
                    # key values, so a key rewrite would delete an
                    # UNRELATED row holding the new value and leave the
                    # original untouched. Iceberg/Delta refuse this
                    # too; model it as delete + insert instead.
                    raise ValueError(
                        f"update may not assign the merge key {key!r}; "
                        "express a key change as delete + insert"
                    )
        tgt = self.read(spark)
        s = source.alias("s")
        t = tgt.alias("t")
        on = F.col(f"s.{key}") == F.col(f"t.{key}")
        m = s.join(t, on, "inner")
        # Cardinality violation: >1 SOURCE rows per MATCHED key — only
        # when a matched clause exists (review catch: Spark raises only
        # when an update/delete would apply to a multiply-matched row;
        # insert-only merges with duplicate source keys are valid and
        # insert both rows). Cost shape: one aggregate over the
        # batch-sized SOURCE, its (usually empty) duplicate-key set
        # BROADCAST against the column-pruned target key scan — never
        # an aggregate over the table (review catch: a .distinct() on
        # the target keys was a full-table shuffle).
        if matched:
            dupkeys = (
                source.groupBy(key)
                .agg(F.count(F.lit(1)).alias("__iis_c"))
                .filter(F.col("__iis_c") > 1)
                .select(key)
            )
            dup = (
                tgt.select(key)
                .join(F.broadcast(dupkeys), key)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"MERGE cardinality violation: source has multiple "
                    f"rows for matched key {dup[0][key]!r}"
                )
        # First-match-wins clause routing, exactly SQL's evaluation
        # order: one chained CASE tags each matched pair with the index
        # of the first clause whose condition holds (NULL = no clause
        # -> the target row survives untouched).
        route = None
        for i, cl in enumerate(matched):
            cond = F.expr(cl[1]) if cl[1] else F.lit(True)
            route = (
                F.when(cond, F.lit(i))
                if route is None
                else route.when(cond, F.lit(i))
            )
        parts: list[DataFrame] = []
        if matched:
            routed = m.withColumn("__iis_clause", route)
            for i, cl in enumerate(matched):
                hit = routed.filter(F.col("__iis_clause") == i)
                if cl[0] == "delete":
                    parts.append(
                        hit.select(
                            *[
                                F.col(f"t.{c}").alias(c)
                                if c == key
                                else F.lit(None)
                                .cast(tschema[c].dataType)
                                .alias(c)
                                for c in tcols
                            ],
                            F.lit("D").alias("_op"),
                        )
                    )
                else:
                    assigns = cl[2]
                    parts.append(
                        hit.select(
                            *[
                                F.expr(assigns[c]).cast(
                                    tschema[c].dataType
                                ).alias(c)
                                if c in assigns
                                else F.col(f"t.{c}").alias(c)
                                for c in tcols
                            ],
                            F.lit("U").alias("_op"),
                        )
                    )
        if not_matched is not None:
            ins = source.alias("s").join(
                tgt.select(key), key, "left_anti"
            )
            cond = (
                F.expr(not_matched[1])
                if len(not_matched) > 1 and not_matched[1]
                else F.lit(True)
            )
            ins = ins.filter(cond)
            # project onto the table schema: source columns by name,
            # absent columns via the write-default/NULL fill
            ins = self._project_onto(
                ins.select(
                    *[c for c in ins.columns if c in set(tcols)]
                ),
                tschema,
            )
            parts.append(ins.withColumn("_op", F.lit("I")))
        from functools import reduce

        changelog = reduce(DataFrame.unionByName, parts)
        return self.merge(spark, changelog, key, token=token)

    def add_files(
        self,
        spark: SparkSession,
        paths: list[str],
        partitions: dict | None = None,
        token: str | None = None,
    ) -> int:
        """Iceberg ``add_files`` / ``migrate``: register EXISTING
        parquet files into the table as one append snapshot WITHOUT
        reading or rewriting their rows — adoption of a pre-existing
        warehouse is a metadata commit, not a data copy. Files are
        hard-linked into the table's ``_snap=K`` layout (copy only
        across filesystems), so the import is O(files) syscalls and
        zero data IO; row visibility, time travel, expire reachability
        and streaming (the snapshot records op='append', like Iceberg's
        add_files summary) all behave as if the rows were appended.

        The files' footer schema must MATCH the table schema
        (names+types) — an import can't be projected at write time
        because nothing is rewritten; mismatches are a clean error
        (evolve the table or rewrite the data first). For a partitioned
        table, ``partitions`` gives the partition record applied to
        every file of this call (import one source partition per call,
        Iceberg's usage); the record must cover the current spec.
        ``token`` gives the same idempotent-replay contract as
        ``append_once``. On a table with CHECK constraints the imported
        rows are VALIDATED in one guarded scan before the commit — an
        import is a commit that introduces user values, so it gets the
        same write-time guarantee as append (the one data read this
        otherwise-metadata-only operation ever performs)."""
        import shutil
        import tempfile

        if not paths:
            raise ValueError("add_files needs at least one path")
        if len(set(paths)) != len(paths):
            dups = sorted({p for p in paths if paths.count(p) > 1})
            raise ValueError(
                f"duplicate paths in add_files call: {dups[:3]} — each "
                "file registers its rows once"
            )
        for p in paths:
            if not os.path.isfile(p):
                raise ValueError(f"no such data file: {p!r}")
        # Tokened replay resolves BEFORE the duplicate-inode guard
        # (the replayed files ARE live — that is the point); advisory
        # probe here, authoritative re-check under the lock. A
        # concurrent same-token race that slips past both probes ends
        # at the inode guard with a clean error, never doubled rows.
        if token is not None:
            dup = self._token_index().get(token)
            if dup is not None and dup in self.snapshots():
                return dup
        # Iceberg's check_duplicate_files: a file already LIVE in the
        # table (same inode — imports are links) must not register its
        # rows twice. O(live files) stat probes, metadata-scale.
        cur = self._latest_published()
        if cur is not None:
            live_inodes = {}
            for rel in self._manifest(cur):
                try:
                    live_inodes[
                        os.stat(os.path.join(self.path, rel)).st_ino
                    ] = rel
                except FileNotFoundError:
                    pass
            clash = [
                (p, live_inodes[os.stat(p).st_ino])
                for p in paths
                if os.stat(p).st_ino in live_inodes
            ]
            if clash:
                raise ValueError(
                    f"file(s) already registered in the table: "
                    f"{clash[:3]} — re-importing would double their "
                    "rows (use a token for idempotent replays)"
                )
        file_schema = spark.read.parquet(*paths).schema.jsonValue()
        # CHECK constraints guard EVERY commit that introduces user
        # values — add_files bypasses _commit (nothing is rewritten), so
        # it validates the imported rows itself: one guarded pass over
        # the files, raising on the first violating row BEFORE anything
        # is linked or committed (advisor catch, r6: an import silently
        # adopted violating rows). Optimistic like add_constraint's
        # scan: validated outside the lock against the current effective
        # set; the lock body re-resolves the set and raises
        # CommitConflict if a concurrent DDL changed it mid-import.
        cons0 = self.constraints
        if cons0 is None and cur is not None:
            cons0 = self._meta(cur).get("constraints")
        cons0 = dict(cons0) if cons0 else {}
        if cons0:
            self._guard_constraints(
                spark.read.parquet(*paths), cons0
            ).count()
        if self.partition_by:
            if partitions is None or set(partitions) != set(
                self.partition_by
            ):
                raise ValueError(
                    "table is partitioned by "
                    f"{self.partition_by}; add_files needs a "
                    "partitions record covering exactly that spec"
                )
            # The record becomes PROOF for partition pruning (a pruned
            # file never reaches the residual filter), so a wrong
            # record silently drops rows on pruned reads — validate the
            # files actually hold exactly the declared tuple, like
            # Iceberg's add_files source-partition check.
            want = {
                c: self._part_str(v) for c, v in partitions.items()
            }
            got = (
                spark.read.parquet(*paths)
                .select(*self.partition_by)
                .distinct()
                .collect()
            )
            actual = {
                tuple(
                    self._part_str(r[c]) for c in self.partition_by
                )
                for r in got
            }
            declared = tuple(want[c] for c in self.partition_by)
            if actual != {declared}:
                raise ValueError(
                    f"declared partition record {partitions} does not "
                    f"match the files' values {sorted(actual)[:3]}; a "
                    "wrong record corrupts partition-pruned reads"
                )
        elif partitions:
            raise ValueError("partitions given for an unpartitioned table")
        os.makedirs(self.path, exist_ok=True)
        staging = tempfile.mkdtemp(prefix="_staging-", dir=self.path)
        try:
            sdir = os.path.join(staging, "d")
            if partitions:
                # hive-style shadow segments, same spelling the writer
                # produces — _finish_commit parses the records from
                # these path segments
                from urllib.parse import quote

                # canonical value spelling via _part_str (NOT Python
                # str(): 'True' vs the 'true' every comparison path
                # uses would make pruning silently drop the file)
                sdir = os.path.join(
                    sdir,
                    *[
                        f"__part_{c}="
                        f"{quote(self._part_str(partitions[c]), safe='')}"
                        for c in self.partition_by
                    ],
                )
            os.makedirs(sdir)
            for i, src in enumerate(sorted(paths)):
                dst = os.path.join(sdir, f"import-{i:05d}.parquet")
                try:
                    os.link(src, dst)  # zero-copy adoption
                except OSError:
                    shutil.copy2(src, dst)  # cross-device fallback
            with self._commit_lock():
                if token is not None:
                    dup = self._token_index().get(token)
                    if dup is not None and dup in self.snapshots():
                        return dup
                base = self._latest_published()
                cons1 = self.constraints
                if cons1 is None and base is not None:
                    cons1 = self._meta(base).get("constraints")
                if (dict(cons1) if cons1 else {}) != cons0:
                    raise CommitConflict(
                        "table constraints changed while add_files was "
                        "validating the imported rows — retry the import "
                        "so the scan covers the current constraint set"
                    )
                if base is not None:
                    tj = self._meta(base).get("schema")
                    if tj is not None and self._schema_names_types(
                        tj
                    ) != self._schema_names_types(file_schema):
                        raise ValueError(
                            "imported files' schema does not match the "
                            "table schema; add_files cannot project "
                            "(nothing is rewritten) — evolve the table "
                            "or rewrite the data first"
                        )
                v = self._next_version()
                d = os.path.join(self.path, f"_snap={v}")
                os.rename(os.path.join(staging, "d"), d)
                new_files = self._finish_commit(
                    v, d, True, token, "append", None, file_schema
                )
            if (self.stats_cols or self.bloom_cols) and new_files:
                self._record_stats(new_files)
            return v
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _rel_of_uri(self, uri: str) -> str:
        """Map a scan-reported file URI (``F.input_file_name()``) back
        to its manifest-relative path."""
        from urllib.parse import unquote, urlparse

        p = urlparse(uri).path or uri
        p = unquote(p)
        root = os.path.abspath(self.path) + os.sep
        if not p.startswith(root):
            raise ValueError(
                f"scanned file {uri!r} is outside the table at "
                f"{self.path!r}"
            )
        return p[len(root):]

    def _rewrite_where(
        self,
        spark: SparkSession,
        condition: str,
        transform,
        op: str,
        stats_hint: tuple | None,
        partitions: dict | None = None,
    ) -> int:
        """Copy-on-write row-level mutation (Iceberg's
        ``RewriteStrategy=copy-on-write`` DELETE/UPDATE plan):

          1. PLAN — ``plan_files(stats_hint)`` prunes to the files whose
             [min, max] stats can overlap the predicate (metadata only),
             then ONE scan of those candidates narrows to the files that
             actually CONTAIN a matching row (``input_file_name()`` of
             the post-MoR matches — a row already masked by an equality
             delete can't re-match). The collect is file *names* only,
             bounded by the file count, never row data.
          2. REWRITE — the touched files are re-read (MoR + schema
             resolution applied, so the rewrite folds any pending
             equality deletes for those files) and ``transform`` maps
             them to their replacement rows, written as new data files.
          3. COMMIT — one snapshot whose manifest = (base - touched) +
             new files, validated against ``expected_base`` so a
             concurrent commit aborts the swap instead of being
             silently dropped.

        Untouched files are never opened; at 100 TB a well-clustered
        predicate (see ``compact(sort_by=...)``) turns a DELETE into a
        rewrite of a handful of files. The op name is excluded from
        ``_validate_range``'s allow-list, so CDC/changelog/incremental
        consumers refuse to stream across the rewrite rather than
        replaying it as inserts."""
        base = self._resolve_snapshot(None)
        candidates, _ = self.plan_files(
            where=stats_hint, as_of=base, partitions=partitions
        )
        if not candidates:
            return base
        matched = (
            F.coalesce(F.expr(condition).cast("boolean"), F.lit(False))
        )
        if partitions:
            # partition pruning is manifest PROOF for the SKIPPED
            # files, but conservative-kept candidates (no record / old
            # spec) still contain other partitions' rows — fold the
            # partition equality into the match predicate itself
            # (null-safe, typed Columns, no SQL splicing) so pruning
            # and matching can never disagree.
            for c, val in partitions.items():
                matched = matched & F.col(c).eqNullSafe(F.lit(val))
        cand_df = self._read_files(
            spark, base, candidates, file_col="__iis_file"
        )
        touched_uris = [
            r[0]
            for r in cand_df.filter(matched)
            .select("__iis_file")
            .distinct()
            .collect()
        ]
        if not touched_uris:
            return base
        touched = {self._rel_of_uri(u) for u in touched_uris}
        lineage = self._lineage_on()
        src = self._read_files(
            spark,
            base,
            sorted(touched),
            lineage_cols=(
                (self._LIN_ROWID, self._LIN_LASTSEQ)
                if lineage
                else None
            ),
        )
        if lineage and op == "update":
            # evaluate the match over the OLD images, before transform
            # rewrites the values: updated rows NULL their materialized
            # last-seq so it falls back to this commit's sequence at
            # read time (the version isn't assigned yet); untouched
            # rows in the rewritten files KEEP theirs — Iceberg v3's
            # lineage rule for copy-on-write UPDATE.
            src = src.withColumn("__iis_upd", matched)
        rewritten = transform(src, matched)
        if lineage and op == "update":
            rewritten = rewritten.withColumn(
                self._LIN_LASTSEQ,
                F.when(
                    F.col("__iis_upd"), F.lit(None).cast("long")
                ).otherwise(F.col(self._LIN_LASTSEQ)),
            ).drop("__iis_upd")
        return self._commit(
            rewritten,
            inherit=True,
            op=op,
            expected_base=base,
            drop_files=touched,
        )

    def _delete_where_mor(
        self,
        spark: SparkSession,
        condition: str,
        stats_hint: tuple | None,
        partitions: dict | None,
    ) -> int:
        """MERGE-ON-READ positional DELETE (Iceberg v2's position
        delete files): instead of rewriting touched files (CoW), write
        a delete file of exact (data file, row position) entries and
        commit it as pure metadata + one match-sized file — write cost
        O(matches), zero data rewritten. Reads pay a broadcast
        anti-join on (file, pos) until ``compact`` folds the deletes.
        Like Iceberg's position deletes, entries reference data files
        by their absolute scan path — relocating the table directory
        invalidates them (compact first).
        """
        base = self._resolve_snapshot(None)
        candidates, _ = self.plan_files(
            where=stats_hint, as_of=base, partitions=partitions
        )
        if not candidates:
            return base
        matched = (
            F.coalesce(F.expr(condition).cast("boolean"), F.lit(False))
        )
        if partitions:
            for c, val in partitions.items():
                matched = matched & F.col(c).eqNullSafe(F.lit(val))
        scan = self._read_files(
            spark,
            base,
            candidates,
            file_col="__iis_dfile",
            pos_col="__iis_dpos",
        )
        hits = scan.filter(matched).select("__iis_dfile", "__iis_dpos")
        if not hits.limit(1).collect():  # bounded no-match probe
            return base
        return self._commit(
            None,
            inherit=True,
            op="delete",
            expected_base=base,
            deletes_df=hits,
            delete_kind="pos",
        )

    def _update_where_mor(
        self,
        spark: SparkSession,
        condition: str,
        set_exprs: dict,
        stats_hint: tuple | None,
        partitions: dict | None,
    ) -> int:
        """MERGE-ON-READ UPDATE (Iceberg v2's MoR update plan): ONE
        commit carrying a position-delete file of the matching rows'
        (data file, row position) old images PLUS data files of their
        updated images — write cost O(matches), no untouched row
        rewritten. The new images live in this commit's own files,
        which the position entries (naming only pre-existing files)
        can never kill. Reads apply the anti-join; ``compact`` folds.
        """
        base = self._resolve_snapshot(None)
        candidates, _ = self.plan_files(
            where=stats_hint, as_of=base, partitions=partitions
        )
        if not candidates:
            return base
        matched = (
            F.coalesce(F.expr(condition).cast("boolean"), F.lit(False))
        )
        if partitions:
            for c, val in partitions.items():
                matched = matched & F.col(c).eqNullSafe(F.lit(val))
        scan = self._read_files(
            spark,
            base,
            candidates,
            file_col="__iis_dfile",
            pos_col="__iis_dpos",
        )
        hit_rows = scan.filter(matched)
        if not hit_rows.limit(1).collect():
            return base
        # checkpoint-free single source: Spark recomputes hit_rows for
        # both outputs; the scan is candidate-bounded either way
        dels = hit_rows.select("__iis_dfile", "__iis_dpos")
        data_cols = [
            c
            for c in scan.columns
            if c not in ("__iis_dfile", "__iis_dpos")
        ]
        sj = self._meta(base).get("schema")
        types = {}
        if sj is not None:
            from pyspark.sql import types as T

            types = {
                f.name: f.dataType
                for f in T.StructType.fromJson(sj).fields
            }
        news = {
            c: F.expr(e) for c, e in set_exprs.items()
        }
        new_images = hit_rows.select(
            *[
                (
                    news[c].cast(types[c]).alias(c)
                    if c in news and c in types
                    else news[c].alias(c) if c in news
                    else F.col(c)
                )
                for c in data_cols
            ]
        )
        return self._commit(
            new_images,
            inherit=True,
            op="update",
            expected_base=base,
            deletes_df=dels,
            delete_kind="pos",
        )

    def delete_where(
        self,
        spark: SparkSession,
        condition: str,
        stats_hint: tuple | None = None,
        partitions: dict | None = None,
        strategy: str = "cow",
    ) -> int:
        """``DELETE FROM t WHERE condition`` as ONE copy-on-write
        snapshot: rows where the SQL ``condition`` evaluates to TRUE
        are removed (NULL keeps the row, SQL semantics); only files
        that contain a matching row are rewritten, everything else is
        carried in the manifest untouched. ``stats_hint`` =
        ``(column, lo, hi)`` feeds the manifest [min, max] pruner so
        the planning scan itself skips provably-disjoint files;
        ``partitions`` = ``{col: value}`` additionally scopes the
        delete to one partition (the retention-sweep shape: drop one
        day) — the planning scan prunes to that partition's files from
        the manifest records alone, and the partition equality is
        folded null-safely into the match predicate so
        conservative-kept cross-spec files can never lose other
        partitions' rows. Returns the new snapshot (or the current one
        if nothing matched — a no-op DELETE commits nothing, like
        Iceberg).

        ``strategy`` picks Iceberg v2's delete trade: ``"cow"``
        (default) rewrites the touched files — write amplification
        once, reads stay clean; ``"mor"`` writes a POSITION-delete
        file of exact (data file, row) entries — O(matches) write,
        zero rewrite, reads pay a broadcast anti-join until
        ``compact`` folds it. Equality deletes (the third kind) come
        from ``merge``'s CDC path; all three compose on one table."""
        if strategy == "mor":
            return self._delete_where_mor(
                spark, condition, stats_hint, partitions
            )
        if strategy != "cow":
            raise ValueError(
                f"unknown DELETE strategy {strategy!r}; use 'cow' "
                "(rewrite touched files) or 'mor' (position deletes)"
            )
        return self._rewrite_where(
            spark,
            condition,
            lambda df, matched: df.filter(~matched),
            "delete",
            stats_hint,
            partitions,
        )

    def update_where(
        self,
        spark: SparkSession,
        condition: str,
        set_exprs: dict,
        stats_hint: tuple | None = None,
        partitions: dict | None = None,
        strategy: str = "cow",
    ) -> int:
        """``UPDATE t SET col = expr, ... WHERE condition`` as ONE
        snapshot. ``set_exprs`` maps column name -> SQL expression
        (evaluated against the OLD row image, all assignments
        simultaneous like SQL UPDATE); each assigned expression is
        cast back to the column's existing type so the table schema
        never drifts through an UPDATE. ``strategy="cow"`` (default)
        rewrites touched files with non-matching rows byte-identical;
        ``strategy="mor"`` writes a position-delete of the old images
        plus data files of the new images — O(matches) write, reads
        pay the anti-join until ``compact``."""
        if strategy not in ("cow", "mor"):
            raise ValueError(
                f"unknown UPDATE strategy {strategy!r}; use 'cow' or "
                "'mor'"
            )
        if not set_exprs:
            raise ValueError(
                "UPDATE with no assignments — refusing a full rewrite "
                "that changes nothing"
            )
        base = self._resolve_snapshot(None)
        sj = self._meta(base).get("schema")
        types = {}
        if sj is not None:
            from pyspark.sql import types as T

            types = {
                f.name: f.dataType
                for f in T.StructType.fromJson(sj).fields
            }
            # validate EAGERLY: a typo'd column in a no-match UPDATE
            # would otherwise return a clean snapshot id (the planner
            # short-circuits before the transform ever runs)
            missing = [c for c in set_exprs if c not in types]
            if missing:
                raise ValueError(
                    f"UPDATE assigns unknown columns {missing} "
                    f"(have {sorted(types)})"
                )
        if strategy == "mor":
            return self._update_where_mor(
                spark, condition, set_exprs, stats_hint, partitions
            )

        def apply_set(df: DataFrame, matched) -> DataFrame:
            missing = [c for c in set_exprs if c not in df.columns]
            if missing:
                raise ValueError(
                    f"UPDATE assigns unknown columns {missing} "
                    f"(have {df.columns})"
                )
            # all assignments read the OLD images: build every new
            # value before any column is replaced
            news = {
                c: F.when(matched, F.expr(e)).otherwise(F.col(c))
                for c, e in set_exprs.items()
            }
            return df.select(
                *[
                    (
                        news[c].cast(types[c]).alias(c)
                        if c in news and c in types
                        else news[c].alias(c) if c in news
                        else F.col(c)
                    )
                    for c in df.columns
                ]
            )

        return self._rewrite_where(
            spark, condition, apply_set, "update", stats_hint, partitions
        )

    def _read_files(
        self,
        spark: SparkSession,
        v: int,
        rels: list[str],
        file_col: str | None = None,
        pos_col: str | None = None,
        lineage_cols: tuple[str, str] | None = None,
    ) -> DataFrame:
        """Scan a snapshot's (possibly pruned) file list. Fast path: one
        multi-path parquet scan. Two metadata conditions force a
        per-commit-group scan instead (files group by their ``_snap=K``
        sequence — a path literal, no data inspection):

          * SCHEMA RESOLUTION — files older than the schema's effective
            version (``schema_v``) are projected onto the snapshot's
            schema (missing -> typed NULL, widened -> exact upcast),
            Iceberg's read-time schema-id resolution; the projections
            are row expressions fused into each scan stage and
            unionByName is a metadata concat — no extra shuffle;
          * MERGE-ON-READ — equality-delete files anti-join (broadcast)
            against the data with the sequence visibility rule
            ``data_seq < delete_seq`` — the plan an Iceberg Spark
            reader produces for an equality-delete MoR scan."""
        from functools import reduce

        meta = self._meta(v)
        dels = meta.get("delete_files") or []
        sj = meta.get("schema")
        schema_v = meta.get("schema_v", 1)
        # Schema ERA per file: normally the commit sequence from the
        # ``_snap=K`` path, but cherry-picked/published files carry a
        # ``file_schema_v`` override — they were WRITTEN under their
        # source branch's schema, yet land at a sequence NEWER than
        # main evolves that happened in between, so the path alone
        # would mis-resolve them. Grouping key is (seq, era): seq
        # drives MoR delete visibility, era drives resolution.
        eras = meta.get("file_schema_v", {})
        by_seq: dict[tuple[int, int], list[str]] = {}
        for r in rels:
            s = self._seq_of(r)
            by_seq.setdefault((s, int(eras.get(r, s))), []).append(r)
        needs_resolve = sj is not None and any(
            e < schema_v for _, e in by_seq
        )
        eq_dels = [d for d in dels if d.get("kind", "eq") != "pos"]
        pos_dels = [d for d in dels if d.get("kind") == "pos"]
        # Per-row attribution captured at the SCAN (``_metadata`` is
        # only resolvable there) so it survives the MoR joins and
        # schema-resolution unions that break input_file_name():
        #   * ``file_col`` / ``pos_col`` — the CoW/MoR delete planner's
        #     (file, position) of each row;
        #   * positional deletes need the same pair internally to
        #     anti-join against the delete files' (file, pos) entries.
        # ROW LINEAGE (Iceberg v3): a lineage table's scan must split
        # per commit group even on the fast path — the virtual id is
        # seq-dependent (seq * 2^40 + row position) and rewritten files
        # carry MATERIALIZED physical columns that plain reads must
        # hide and lineage reads must prefer over the virtual form.
        lineage_table = bool(meta.get("row_lineage")) or (
            self.row_lineage is True
        )
        want_cols: list[tuple[str, str]] = []
        if file_col is not None or pos_dels:
            want_cols.append(
                (file_col or "__iis_fp", "_metadata.file_path")
            )
        if pos_col is not None or pos_dels or lineage_cols:
            want_cols.append(
                (pos_col or "__iis_rp", "_metadata.row_index")
            )

        def tag(df: DataFrame) -> DataFrame:
            if not want_cols:
                return df
            clash = [n for n, _ in want_cols if n in df.columns]
            if clash:
                raise ValueError(
                    f"data files contain the reserved internal "
                    f"column(s) {clash}"
                )
            return df.select(
                "*", *[F.col(src).alias(n) for n, src in want_cols]
            )

        internal = [n for n, _ in want_cols]
        # names used for the positional anti-join (the requested
        # file_col/pos_col double as them when present)
        fp_name = file_col or "__iis_fp"
        rp_name = pos_col or "__iis_rp"

        def strip(df: DataFrame) -> DataFrame:
            # drop ONLY the internally-added columns the caller did
            # not ask for
            for n in internal:
                if n not in (file_col, pos_col):
                    df = df.drop(n)
            return df

        if not dels and not needs_resolve and not lineage_table:
            return tag(
                spark.read.parquet(
                    *[os.path.join(self.path, f) for f in rels]
                )
            )
        target = None
        if needs_resolve:
            from pyspark.sql import types as T

            target = T.StructType.fromJson(sj)
        lin_phys = (self._LIN_ROWID, self._LIN_LASTSEQ)
        parts = []
        for (s, e), fs in sorted(by_seq.items()):
            df = tag(
                spark.read.parquet(
                    *[os.path.join(self.path, f) for f in fs]
                )
            )
            if target is not None:
                df = self._resolve_onto(
                    df,
                    target,
                    e,
                    passthrough=tuple(internal) + lin_phys,
                )
            if lineage_cols is not None:
                rid_out, seq_out = lineage_cols
                rid = F.lit(s).cast("long") * F.lit(
                    1 << 40
                ).cast("long") + F.col(rp_name).cast("long")
                if self._LIN_ROWID in df.columns:
                    rid = F.coalesce(F.col(self._LIN_ROWID), rid)
                lseq = F.lit(s).cast("long")
                if self._LIN_LASTSEQ in df.columns:
                    lseq = F.coalesce(
                        F.col(self._LIN_LASTSEQ), F.lit(s).cast("long")
                    )
                df = df.withColumn(rid_out, rid).withColumn(
                    seq_out, lseq
                )
            # physical lineage columns never leave the scan under
            # their own names: plain reads HIDE them, lineage reads
            # have folded them into the output columns above
            for c in lin_phys:
                if c in df.columns and c not in (lineage_cols or ()):
                    df = df.drop(c)
            if "__iis_seq" in df.columns:
                raise ValueError(
                    "data files contain the reserved internal column "
                    "'__iis_seq'"
                )
            parts.append(df.withColumn("__iis_seq", F.lit(s).cast("long")))
        data = reduce(lambda a, b: a.unionByName(b), parts)
        if eq_dels:
            keys = {d["key"] for d in eq_dels}
            if len(keys) != 1:
                raise ValueError(
                    f"mixed equality-delete keys {sorted(keys)}; "
                    "one merge key per table is supported"
                )
            key = keys.pop()
            dparts = [
                spark.read.parquet(os.path.join(self.path, d["path"]))
                .select(
                    F.col(d["key"]).alias("__iis_dkey"),
                    F.lit(d["seq"]).cast("long").alias("__iis_dseq"),
                )
                for d in eq_dels
            ]
            delkeys = reduce(DataFrame.unionAll, dparts)
            data = data.join(
                F.broadcast(delkeys),
                on=(data[key] == delkeys["__iis_dkey"])
                & (F.col("__iis_seq") < F.col("__iis_dseq")),
                how="left_anti",
            )
        if pos_dels:
            # POSITION deletes (Iceberg v2's second delete-file kind):
            # each entry names (data file, row position) exactly, so
            # the anti-join needs no sequence rule — a delete file can
            # only reference files that existed when it was written.
            # Delete files are match-sized (two columns), broadcast.
            pparts = [
                spark.read.parquet(os.path.join(self.path, d["path"]))
                for d in pos_dels
            ]
            delpos = reduce(DataFrame.unionAll, pparts)
            data = data.join(
                F.broadcast(delpos),
                on=(data[fp_name] == delpos["__iis_dfile"])
                & (data[rp_name] == delpos["__iis_dpos"]),
                how="left_anti",
            )
        return strip(data.drop("__iis_seq"))

    def stage_append(self, df: DataFrame, wap_id: str) -> int:
        """Write-audit-publish STAGE step (Iceberg's ``spark.wap.id``
        stage-only commit): the snapshot is written and fully readable
        by its version — the audit query reads it directly — but it is
        NOT on the main branch: ``read()`` (latest) skips staged
        snapshots, so downstream consumers never see unaudited data.
        The staged manifest inherits from the latest PUBLISHED snapshot,
        exactly like a branch forked from main."""
        return self._commit(df, inherit=True, op="stage", wap_id=wap_id)

    def publish(self, wap_id: str) -> int:
        """Write-audit-publish PUBLISH step (Iceberg's
        ``cherrypick_snapshot``): apply the audited staged snapshot's
        OWN data files onto wherever main is NOW — pure metadata, zero
        data IO, the same atomic swap. Cherry-picking (not copying the
        staged manifest frozen at stage time) means main-branch commits
        landing between stage and publish survive: stage(B) → append(C)
        → publish yields A+C+B, not A+B. (If main was OVERWRITTEN in
        between, the staged rows are applied onto the new contents —
        Iceberg's append-cherry-pick semantics; stage a fresh batch if
        the overwrite invalidated the audit.) Idempotent on ``wap_id``
        (the commit-dedup idiom): re-publishing an already published
        wap_id returns the existing publish commit — the
        already-published check runs INSIDE the critical section
        (review catch: resolved outside it, two concurrent publishes
        of one wap_id both pass and the second lists every staged file
        twice, doubling its rows on read). Publishes are rare and the
        scan is manifest-JSON-only, so the in-lock cost is bounded by
        history length in KBs."""
        with self._commit_lock():
            staged = pub = None
            for v in self.snapshots():
                with open(
                    os.path.join(self._mdir, f"v{v}.json")
                ) as fh:
                    m = json.load(fh)
                if m.get("wap_id") == wap_id:
                    if m.get("op") == "stage":
                        staged = (v, m)
                    else:
                        pub = v
            if pub is not None:
                return pub
            if staged is None:
                raise ValueError(
                    f"no staged snapshot carries wap_id {wap_id!r}"
                )
            sv, smeta = staged
            return self._apply_onto_main(
                smeta, op="publish", extra={"wap_id": wap_id}
            )

    def cherrypick(self, snapshot: int) -> int:
        """Iceberg's ``cherrypick_snapshot`` for BRANCH commits: apply
        the given snapshot's OWN added files onto wherever main is NOW —
        pure metadata, zero data IO, same rebase semantics as WAP
        ``publish`` (which is this operation keyed by wap_id instead of
        snapshot id). The hotfix-branch flow: branch, commit the fix,
        audit the branch read, cherry-pick the fix onto main without
        replaying the whole branch.

        Only ADDITIVE sources can be cherry-picked (append /
        branch-append / stage): an overwrite or delete expresses "the
        table IS this now" relative to ITS base — rebasing that onto a
        moved main silently resurrects or destroys other commits' rows,
        so Iceberg refuses, and so does this. Idempotent on the source
        snapshot id: re-picking returns the existing pick commit (the
        retry-safe shape — a client that times out and retries cannot
        double the rows)."""
        with self._commit_lock():
            try:
                smeta = self._meta(snapshot)
            except FileNotFoundError:
                raise ValueError(
                    f"snapshot {snapshot} does not exist — expired or "
                    "never committed"
                ) from None
            if smeta.get("op", "append") not in (
                "append",
                "branch-append",
                "stage",
            ):
                raise ValueError(
                    f"snapshot {snapshot} is op="
                    f"{smeta.get('op')!r}; only additive snapshots "
                    "(append/branch-append/stage) can be cherry-picked"
                )
            for v in self.snapshots():
                m = self._meta(v)
                if (
                    m.get("op") == "cherry-pick"
                    and m.get("source_snapshot") == snapshot
                ):
                    return v
            return self._apply_onto_main(
                smeta,
                op="cherry-pick",
                extra={"source_snapshot": snapshot},
            )

    def _apply_onto_main(self, smeta: dict, op: str, extra: dict) -> int:
        """Shared publish/cherrypick tail — MUST run inside the commit
        lock: rebase ``smeta``'s new_files onto the CURRENT main head
        and commit. A concurrent commit landing before ours is rebased
        under; none can land between our rebase and our manifest swap."""
        base = self._latest_published()
        base_meta = self._meta(base) if base is not None else {}
        inherited = base_meta.get("files", [])
        # Already-applied guard (review catch, silent-duplication
        # grade): a pick whose files are ALREADY on main — a main-
        # ancestor append, or a staged snapshot someone published —
        # would list those files twice in the new manifest and every
        # read would double-count their rows. publish()'s wap_id scan
        # catches the publish-retry case before reaching here; this
        # catches everything else, exactly as Iceberg refuses to
        # cherry-pick an already-published snapshot.
        dup = set(smeta["new_files"]) & set(inherited)
        if dup:
            raise ValueError(
                f"cannot {op}: {len(dup)} of the snapshot's files are "
                "already present on main (main-ancestor or already "
                "applied) — applying again would duplicate their rows"
            )
        v = self._next_version()
        pmeta = {
            "files": inherited + smeta["new_files"],
            "new_files": smeta["new_files"],
            "op": op,
            **extra,
        }
        # The pick applies the source files onto CURRENT main, so
        # main's metadata wins (review catches, both shipped-bug
        # grade): (a) main's delete_files must carry — dropping them
        # would resurrect merge-deleted rows the moment a publish or
        # cherry-pick lands; (b) main's schema/schema_v must carry, not
        # the source snapshot's — an evolve between stage/branch-commit
        # and pick would otherwise be silently reverted, and the
        # source files (seq < schema_v) resolve onto the evolved
        # schema at read time like any other pre-evolution files.
        for carry in (
            "schema",
            "schema_v",
            "delete_files",
            *SnapshotTable._PROP_CARRY,
        ):
            if carry in base_meta:
                pmeta[carry] = base_meta[carry]
            elif carry in smeta and carry != "delete_files":
                pmeta[carry] = smeta[carry]
        # Schema-era override for the picked files: they were WRITTEN
        # under the SOURCE snapshot's schema (smeta's schema_v), but
        # land at a sequence NEWER than any main-side evolve between
        # fork and pick — without the override, read resolution would
        # take their ``_snap=K`` path as the era and mis-resolve them
        # against the evolved schema (a pre-rename column would
        # silently read NULL). Inherited files keep the base's
        # overrides; the source's own inherited overrides are
        # irrelevant (only its new_files move).
        eras = {
            f: e
            for f, e in base_meta.get("file_schema_v", {}).items()
            if f in set(inherited)
        }
        src_era = smeta.get("schema_v")
        if src_era is not None and src_era != pmeta.get("schema_v"):
            eras.update({f: src_era for f in smeta["new_files"]})
        if eras:
            pmeta["file_schema_v"] = eras
        sparts = smeta.get("file_partitions", {})
        bparts = base_meta.get("file_partitions", {})
        if bparts or sparts:
            inh = set(inherited)
            pmeta["file_partitions"] = {
                **{f: p for f, p in bparts.items() if f in inh},
                **{f: sparts[f] for f in smeta["new_files"] if f in sparts},
            }
            pmeta["partition_by"] = base_meta.get(
                "partition_by"
            ) or smeta.get("partition_by", [])
        self._write_manifest(v, pmeta)
        return v

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
            tmeta = self._meta(to)
            rmeta = {"files": tmeta["files"], "op": "rollback"}
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "file_partitions",
                "partition_by",
                "file_schema_v",
                *SnapshotTable._PROP_CARRY,
            ):
                if carry in tmeta:
                    rmeta[carry] = tmeta[carry]
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
        rels = self._manifest(base)
        if self._lineage_on() and rels:
            # MATERIALIZE row lineage into the rewritten files: a
            # compaction is layout-only, so every row keeps its id AND
            # its last-updated sequence (Iceberg v3's rewrite rule —
            # without this, moving a row would mint it a new identity)
            df = self._read_files(
                spark,
                base,
                rels,
                lineage_cols=(self._LIN_ROWID, self._LIN_LASTSEQ),
            )
        else:
            df = self.read(spark, as_of=base)
        if sort_by:
            df = df.repartitionByRange(
                target_files, *sort_by
            ).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(target_files)
        return self._commit(
            df,
            inherit=False,
            op="replace",
            expected_base=base,
        )

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
        from ..operators.partitions import zorder_layout

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

    def read(
        self,
        spark: SparkSession,
        as_of: int | None = None,
        where: tuple | None = None,
        plan: list[str] | None = None,
        partitions: dict | None = None,
        as_of_ts: float | None = None,
        eq: tuple | None = None,
        not_null: list[str] | None = None,
        lineage: bool = False,
    ) -> DataFrame:
        """Read the table as of snapshot ``as_of`` (default: latest). The
        file list comes from the manifest, never a directory walk.

        ``where = (column, lo, hi)`` plans the scan from metadata first
        (``plan_files`` prunes stats-disjoint files), then applies the
        predicate as a residual filter on the surviving files — the
        result is identical to an unpruned filtered read; only the IO
        changes. Exactly an engine consuming Iceberg manifests.
        Date/timestamp stats are stored as ISO strings, so bounds for
        those columns are ISO strings too (lexicographic ==
        chronological; the residual filter still compares natively).
        A caller that already ran ``plan_files`` (e.g. to report the
        counters) passes the kept list via ``plan`` so the metadata
        pass isn't paid twice."""
        if as_of_ts is not None:
            # TIMESTAMP AS OF: resolve to the newest published snapshot
            # committed at or before the timestamp, then proceed as a
            # VERSION AS OF read.
            if as_of is not None:
                raise ValueError("pass as_of OR as_of_ts, not both")
            as_of = self.resolve_as_of_ts(as_of_ts)
        snaps = self.snapshots()
        if not snaps:
            raise ValueError(
                f"table at {self.path!r} has no snapshots — append() first"
            )
        # "latest" means latest PUBLISHED: staged (write-audit-publish)
        # snapshots are readable by explicit version — that IS the audit
        # read — but never the default downstream consumers get.
        if as_of is None:
            latest = self._latest_published()
            if latest is None:
                raise ValueError(
                    f"table at {self.path!r} has only staged snapshots — "
                    "publish() one or read(as_of=version)"
                )
            v = latest
        else:
            v = as_of
        if v not in snaps:
            raise ValueError(
                f"snapshot {v} does not exist (have {snaps}) — expired or "
                "never committed"
            )
        def _lin_empty(df0: DataFrame) -> DataFrame:
            if not lineage:
                return df0
            return df0.withColumn(
                "_row_id", F.lit(None).cast("long")
            ).withColumn("_last_updated_seq", F.lit(None).cast("long"))

        if (
            where is None
            and partitions is None
            and eq is None
            and not_null is None
        ):
            rels = self._manifest(v)
            if not rels:
                return _lin_empty(self._empty_frame(spark, v))
        else:
            rels = (
                list(plan)
                if plan is not None
                else self.plan_files(
                    where=where,
                    as_of=v,
                    partitions=partitions,
                    eq=eq,
                    not_null=not_null,
                )[0]
            )
            if not rels:
                # every file pruned: an empty frame with the table
                # schema, recovered from metadata (manifests record the
                # snapshot schema — also right across schema evolution,
                # where an arbitrary file's footer could be stale) or,
                # for pre-schema manifests, from ONE file — handing
                # Spark the whole manifest here would pay full planning
                # IO on exactly the path pruning proved needs none.
                if self._meta(v).get("schema") is not None:
                    return _lin_empty(self._empty_frame(spark, v))
                rels = self._manifest(v)[:1]
                if not rels:
                    return _lin_empty(self._empty_frame(spark, v))
                df = spark.read.parquet(
                    *[os.path.join(self.path, f) for f in rels]
                )
                return df.limit(0)
        df = self._read_files(
            spark,
            v,
            rels,
            lineage_cols=(
                ("_row_id", "_last_updated_seq") if lineage else None
            ),
        )
        if partitions:
            # residual partition filter: pruning only removed files
            # whose recorded tuple mismatches; conservatively-kept
            # files re-filter here, so the result is identical to an
            # unpruned filtered read. NULL filters need isNull (no
            # string form compares equal to NULL).
            for c, val in partitions.items():
                if val is None:
                    df = df.filter(F.col(c).isNull())
                else:
                    df = df.filter(
                        F.col(c).cast("string") == self._part_str(val)
                    )
        for col, lo, hi in self._norm_where(where):
            df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        for col, val in self._norm_eq(eq):
            # residual equality filter — bloom pruning only removed
            # files the key is provably absent from; false positives
            # and bloom-less files re-filter here, so the result is
            # identical to an unpruned filtered read
            df = (
                df.filter(F.col(col).isNull())
                if val is None
                else df.filter(F.col(col) == F.lit(val))
            )
        for col in not_null or []:
            df = df.filter(F.col(col).isNotNull())
        return df

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
                if self._meta(v).get("op", "append")
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
            hm = self._meta(head)
            v = self._next_version()
            meta = {
                k: val
                for k, val in hm.items()
                if k not in ("branch", "ts", "token", "wap_id", "op")
            }
            main_files = (
                set(self._meta(main).get("files", []))
                if main is not None
                else set()
            )
            # added-files summary relative to MAIN (what the streaming
            # source delivers for this commit).
            meta["new_files"] = sorted(set(hm["files"]) - main_files)
            meta["op"] = "fast_forward"
            self._write_manifest(v, meta)
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
          * ``orphan_stats`` / ``orphan_blooms`` — sidecar entries
            (range/null stats, bloom sketches) for files no live
            manifest references (crash-window leftovers expire's trim
            missed; conservative, never wrong reads).

        Metadata-only: O(live files) existence probes, no data IO."""
        snaps = self.snapshots()
        live_paths = {p for v in snaps for p in self._all_paths(v)}
        report: dict[str, list] = {
            "missing_files": [],
            "dangling_tokens": [],
            "dangling_refs": [],
            "orphan_stats": [],
            "orphan_blooms": [],
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
            if self._meta(v).get("ts", float("-inf")) >= ts
        ]
        if latest is not None:
            keep.append(latest)
        if not keep:
            raise ValueError("expire_older_than would delete every snapshot")
        return self.expire(keep_from=min(keep))

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
            tgt = SnapshotTable(
                target_path,
                stats_cols=list(self.stats_cols),
                bloom_cols=list(self.bloom_cols),
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
            new_files, fparts = [], {}
            tstats, tblooms = {}, {}
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
        for carry in SnapshotTable._PROP_CARRY:
            if carry in meta and carry not in (
                "row_lineage",  # refused above
            ):
                tmeta[carry] = meta[carry]
        tgt._write_manifest(1, tmeta)
        if tstats:
            tgt._atomic_json(tgt._stats_path(), tstats)
        if tblooms:
            tgt._atomic_json(tgt._bloom_sidecar_path(), tblooms)
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
            if self._meta(v).get("op") in ("stage",)
        ]
        if staged:
            raise ValueError(
                f"forget refused: staged (WAP) snapshots {staged} may "
                "hold matching rows — publish or expire them first"
            )
        head = self._latest_published()
        if head is None:
            raise ValueError("nothing published to forget from")
        if self._meta(head).get("delete_files"):
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
                and self._meta(s).get("op", "append")
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


@query(
    "q_time_travel",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    WHERE o_orderkey % 3 < 2
    GROUP BY o_orderstatus
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel, DuckDB-oracled end-to-end: orders land in
    three append snapshots (keys %3 = 0, then 1, then 2); the query reads
    VERSION AS OF snapshot 2 and aggregates — so the result must equal the
    oracle's reconstruction over keys %3 < 2, and must NOT see the third
    append even though its files are on disk when the read plans. The
    history/expire machinery is pinned in tests/test_snapshots.py.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "time_travel")

    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    return (
        tbl.read(spark, as_of=2)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


def _validate_range(
    tbl: SnapshotTable,
    from_v: int,
    to_v: int,
    allowed: tuple,
    what: str,
) -> None:
    """Shared guard for the two CDC readers (review catch: duplicated
    guards diverge): both snapshots must exist, the range must be
    forward (swapped bounds would silently read as 'no changes'), and
    every commit inside it must be one of ``allowed`` — manifest
    set-difference math is only meaningful over append-shaped history
    (overwrite/replace/rollback rewrite visibility wholesale; evolve
    changes the schema mid-range; merge deltas are changelogs, which
    only ``read_changelog`` understands). Legacy-manifest ops are
    inferred by ``history()``."""
    snaps = tbl.snapshots()
    for v in (from_v, to_v):
        if v not in snaps:
            raise ValueError(
                f"snapshot {v} does not exist (have {snaps})"
            )
    if from_v >= to_v:
        raise ValueError(
            f"{what} needs from_v < to_v (got {from_v} >= {to_v})"
        )
    ops = dict(tbl.history())
    for w in snaps:
        if from_v < w <= to_v:
            op = ops.get(w, "append")
            if op not in allowed:
                raise ValueError(
                    f"{what} crosses a {op!r} commit (snapshot {w}); "
                    "read full snapshots instead"
                )


def _read_incremental(
    tbl: SnapshotTable, spark: SparkSession, from_v: int, to_v: int
) -> DataFrame:
    """Iceberg INCREMENTAL APPEND SCAN (the CDC-read primitive behind
    `incremental-from-snapshot` / changelog reads): the rows added after
    snapshot ``from_v`` up to ``to_v`` are exactly the files in
    manifest(to_v) minus manifest(from_v) — pure manifest arithmetic,
    no data diffing, valid because append commits never rewrite files.
    At 100 TB an incremental consumer (downstream ETL, streaming
    backfill) reads only the delta files instead of rescanning the
    table."""
    # branch-append snapshots are off-main (their files never enter a
    # main manifest, so the set-difference is untouched); fast_forward
    # is append-shaped by its own precondition (main cannot have moved
    # between the fork and the merge, so earlier main manifests are
    # subsets of the merged one).
    _validate_range(
        tbl, from_v, to_v,
        allowed=("append", "publish", "stage", "branch-append",
                 "fast_forward"),
        what="incremental append scan",
    )
    new_files = sorted(
        set(tbl._manifest(to_v)) - set(tbl._manifest(from_v))
    )
    if not new_files:
        return tbl.read(spark, as_of=to_v).limit(0)
    return spark.read.parquet(
        *[os.path.join(tbl.path, f) for f in new_files]
    )


@query(
    "q_snapshot_incremental",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    WHERE o_orderkey % 3 >= 1
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan, DuckDB-oracled end-to-end: orders land in
    three append snapshots (keys %3 = 0, then 1, then 2); the query reads
    the DELTA between snapshot 1 and snapshot 3 — which must equal the
    oracle's reconstruction over keys %3 >= 1, proving the manifest
    set-difference yields exactly the appended rows (and nothing from the
    base snapshot). The q_time_travel sibling reads a historic VERSION;
    this reads a version RANGE — together they cover Iceberg's two
    metadata-driven read modes.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_incremental")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    return (
        _read_incremental(tbl, spark, 1, 3)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_history",
    oracle="""
    SELECT CAST(1 AS BIGINT) AS snapshot_id, 'append' AS operation,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'append', COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0
    FROM orders WHERE o_orderkey % 3 < 2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'append', COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0
    FROM orders
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'overwrite', COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0
    FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT CAST(5 AS BIGINT), 'rollback', COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0
    FROM orders
    """,
)
def q_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``table.history`` / ``table.snapshots`` metadata tables,
    DuckDB-oracled end-to-end: orders land in three append snapshots
    (keys %3 = 0, 1, 2), then an OVERWRITE (keys %5 = 0), then a
    ROLLBACK to snapshot 3 (undoing the overwrite — full visibility
    again, metadata-only); the query emits one row per surviving
    snapshot — id, operation (from manifest metadata, never the data),
    and the summary counters
    Iceberg keeps in each snapshot's `summary` map (total-records,
    total line value) — which must equal the oracle's per-visibility-set
    reconstruction. This was the round-5 parked item: per-FILE metadata
    (file counts/sizes) depends on writer parallelism and can't be
    oracled bit-stably, so the summary counters are spelled from the
    DATA each snapshot's manifest makes visible — identical however
    many part-files each commit wrote.

    Scale shape: the history itself is manifest-JSON-only (metadata
    planning, like Iceberg's — KBs per thousand files); the summary
    aggregates are one manifest-pruned scan per snapshot, each a partial
    agg to a single row before the union. In production Iceberg the
    counters are maintained AT COMMIT TIME (the writer already knows
    what it added) — the read-side spelling here is the verification
    twin, not the maintenance path.
    """
    from functools import reduce

    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_history")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    tbl.overwrite(o.filter(F.col("o_orderkey") % 5 == 0))
    tbl.rollback(to=3)
    # One summary row per snapshot: the loop is over the 5-entry manifest
    # list (metadata), not data; each read plans exactly the files its
    # manifest names.
    parts = [
        tbl.read(spark, as_of=v).agg(
            F.lit(v).cast("bigint").alias("snapshot_id"),
            F.lit(op).alias("operation"),
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        for v, op in tbl.history()
    ]
    return reduce(DataFrame.unionAll, parts)


@query(
    "q_snapshot_rollback",
    oracle="""
    SELECT 'rollback' AS operation, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``rollback_to_snapshot``, DuckDB-oracled end-to-end:
    orders land in three appends (all rows visible at v3), a BAD
    overwrite (v4) drops to the %5 slice, and the rollback commits v5
    pointing back at v3's file list — so the latest read must equal the
    FULL orders aggregate again (the oracle), not the bad slice, and the
    `operation` column (from manifest metadata via ``history()``) must
    say 'rollback'. History is append-only: v4 stays time-travelable
    for audit until expire (pinned in tests/test_snapshots.py).

    Scale shape: the rollback commit reads and writes ZERO data files —
    one manifest JSON copy + atomic rename, identical cost at 100 TB.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_rollback")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    tbl.overwrite(o.filter(F.col("o_orderkey") % 5 == 0))  # bad commit
    tbl.rollback(to=3)
    _, last_op = tbl.history()[-1]
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(last_op).alias("operation"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .select("operation", "o_orderstatus", "n_orders", "sum_price")
    )


@query(
    "q_snapshot_compact",
    oracle="""
    SELECT CAST(1 AS BIGINT) AS n_files, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-pack compaction (Iceberg ``rewriteDataFiles``), DuckDB-oracled
    end-to-end: three appends each written 4-way (12 small files visible
    — the small-file accretion streaming ingest causes), then
    ``compact`` rewrites them into ONE file as a `replace` snapshot. The
    result must show BOTH invariants: `n_files` = 1 from the
    post-compaction manifest (deterministic — coalesce(1) writes exactly
    one file, however the appends were parallelized) and the per-status
    aggregate equal to the full orders reconstruction (compaction
    changes layout, never rows). Pre-compaction snapshots stay
    time-travelable until expire (pinned in tests/test_snapshots.py).
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_compact")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r).repartition(4))
    v = tbl.compact(spark)
    n_files = len(tbl._manifest(v))
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(n_files).cast("bigint").alias("n_files"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .select("n_files", "o_orderstatus", "n_orders", "sum_price")
    )


@query(
    "q_snapshot_wap",
    oracle="""
    SELECT 'pre_publish' AS phase, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders WHERE o_orderkey % 3 < 2
    UNION ALL
    SELECT 'staged_audit', COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0
    FROM orders
    UNION ALL
    SELECT 'post_publish', COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0
    FROM orders
    """,
)
def q_snapshot_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish (Iceberg's spark.wap.id + cherrypick),
    DuckDB-oracled end-to-end: main holds two appends (keys %3 < 2); the
    %3 = 2 batch is STAGED — the 'pre_publish' row proves the main read
    still excludes it while its files sit on disk; the 'staged_audit'
    row is the audit query reading the staged snapshot by version (it
    inherits main, so it sees ALL orders); after publish() fast-forwards
    main, 'post_publish' sees the same full set. The oracle reconstructs
    each phase's visibility from the same parquet. Publish is a pure
    metadata cherry-pick (manifest copy), idempotent on wap_id — the
    isolation/idempotence/expiry corners are pinned in
    tests/test_snapshots.py.

    Scale shape: this is THE production pattern for gated ingestion at
    100 TB — the expensive data write happens once into the staged
    branch, audits run against it with full parallelism, and the
    go-live decision costs one atomic manifest rename, never a rewrite.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_wap")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(2):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    staged = tbl.stage_append(
        o.filter(F.col("o_orderkey") % 3 == 2), wap_id="w1"
    )

    def phase_agg(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )

    pre = phase_agg(tbl.read(spark), "pre_publish")
    audit = phase_agg(tbl.read(spark, as_of=staged), "staged_audit")
    tbl.publish("w1")
    post = phase_agg(tbl.read(spark), "post_publish")
    return pre.unionAll(audit).unionAll(post)


@query(
    "q_snapshot_pruned_read",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n_files_total,
           CAST(1 AS BIGINT) AS n_files_scanned,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    WHERE o_orderkey >  (SELECT MAX(o_orderkey) FROM orders) // 3
      AND o_orderkey <= 2 * (SELECT MAX(o_orderkey) FROM orders) // 3
    """,
)
def q_snapshot_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats scan planning (Iceberg's metadata file pruning),
    DuckDB-oracled end-to-end: orders land in three appends covering
    disjoint o_orderkey tertiles, each written as ONE file with per-file
    [min, max] stats recorded at commit (footer-read, metadata-only);
    a read predicated on the middle tertile must (a) prune to exactly 1
    of the 3 files BEFORE touching data — `n_files_scanned` comes from
    `plan_files`, which opens no data file — and (b) return the same
    rows as the oracle's plain WHERE over the full table, because
    pruning only ever removes provably-disjoint files and the predicate
    is re-applied as a residual filter on the survivors.

    Tertile boundaries are integer-division of MAX(o_orderkey), computed
    identically here (Python //) and in the oracle (DuckDB //) — both
    floor positive operands — so the file layout and the predicate are
    the same deterministic function of the data at every SF.

    Scale shape: this is the core Iceberg read-path win — planning cost
    is manifest + sidecar JSON (KBs), pruning happens on the driver
    against stats, and the cluster only ever sees the surviving file
    list. At 100 TB with time-partitioned appends, a day-range query
    opens a day's files, not the table.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_pruned_read (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_pruned")
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]  # one scalar
    b1, b2 = mx // 3, 2 * mx // 3
    tbl = SnapshotTable(path, stats_cols=["o_orderkey"])
    k = F.col("o_orderkey")
    tbl.append(o.filter(k <= b1).coalesce(1))
    tbl.append(o.filter((k > b1) & (k <= b2)).coalesce(1))
    tbl.append(o.filter(k > b2).coalesce(1))
    where = ("o_orderkey", b1 + 1, b2)
    kept, total = tbl.plan_files(where=where)
    return tbl.read(spark, where=where, plan=kept).agg(
        F.lit(total).cast("bigint").alias("n_files_total"),
        F.lit(len(kept)).cast("bigint").alias("n_files_scanned"),
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q_snapshot_bloom_read",
    oracle="""
    WITH ck AS (
        SELECT o_custkey AS v FROM orders
        GROUP BY o_custkey ORDER BY COUNT(*), o_custkey LIMIT 1
    )
    SELECT CAST(6 AS BIGINT) AS n_files_total,
           CAST(COUNT(DISTINCT o_orderkey % 6) AS BIGINT)
               AS n_files_scanned,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders WHERE o_custkey = (SELECT v FROM ck)
    """,
)
def q_snapshot_bloom_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom-index point-lookup pruning (Iceberg's
    puffin-blob / parquet-bloom idea), DuckDB-oracled end-to-end:
    orders land in six appends split by ``o_orderkey % 6`` — a
    HASH-SCATTERED layout where every file's [min, max] range on any
    column spans the whole domain, so range-stats pruning keeps all 6
    files and the bloom is the ONLY pruner with leverage. Each commit
    records a per-file bloom over ``o_custkey``; a point lookup for
    the fewest-orders customer (smallest-custkey tie-break — a
    deterministic, genuinely-sparse probe key) must (a) prune to
    exactly the residue-class files that customer's orders actually
    occupy — the oracle computes that same count as
    ``COUNT(DISTINCT o_orderkey % 6)``, so a bloom FALSE NEGATIVE
    (dropped rows) or an unexpected false positive (extra file) both
    hash-mismatch — and (b) return the same aggregate as the oracle's
    plain WHERE over the full table, because pruning only removes
    provably-absent files and the equality is re-applied as a residual
    filter.

    Scale shape: this is the lookup class range stats can't serve —
    point reads on a high-cardinality non-clustered key (find one
    document id / customer across a month of time-partitioned
    appends). The bloom costs one column-pruned Arrow read per
    freshly-written immutable file at commit (outside the commit
    lock), sized 16 bits per distinct key; planning stays
    metadata-only (manifest + sidecar), and at 100 TB the cluster
    sees only the handful of files whose bloom admits the key.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_bloom_read (bloom index)")
    path = scratch_dir(spark, sf_dir, "snapshot_bloom")
    o = load_table(spark, sf_dir, "orders")
    ck = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("n", "o_custkey")
        .limit(1)
        .collect()
    )[0][0]  # one scalar: the probe key
    tbl = SnapshotTable(path, bloom_cols=["o_custkey"])
    for r in range(6):
        tbl.append(o.filter(F.col("o_orderkey") % 6 == r).coalesce(1))
    kept, total = tbl.plan_files(eq=("o_custkey", ck))
    return tbl.read(spark, eq=("o_custkey", ck), plan=kept).agg(
        F.lit(total).cast("bigint").alias("n_files_total"),
        F.lit(len(kept)).cast("bigint").alias("n_files_scanned"),
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q_snapshot_null_scan",
    oracle="""
    SELECT CAST(5 AS BIGINT) AS n_files_total,
           CAST(1 AS BIGINT) AS n_files_scanned,
           COUNT(*) AS n_null_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders WHERE o_orderkey % 5 = 0
    """,
)
def q_snapshot_null_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-count pruning (Iceberg's ``null_value_counts`` manifest
    stats), DuckDB-oracled end-to-end: orders gain a ``note`` column
    that is NULL exactly on the %5 == 0 keys, and land in five appends
    split by ``o_orderkey % 5`` — so ONE file holds every NULL and the
    other four provably hold none. Each commit records per-file null
    counts from the parquet footers (the same footer read as the
    [min,max] stats — zero extra IO, and recorded even for the
    all-NULL file that HAS no bounds). An ``IS NULL`` read
    (``eq=(col, None)``) must prune to exactly the one file whose
    recorded null count is nonzero and return the same rows as the
    oracle's %5 == 0 filter — a file pruned with a wrong count, or a
    kept file miscounted, hash-mismatches on either the file counter
    or the aggregate.

    Scale shape: IS NULL / IS NOT NULL quality-gate scans (find the
    rows missing an embedding, a language tag, a parse) are routine
    over training corpora; with per-file null counts they plan from
    the sidecar to only the files that can contain offenders — on a
    mostly-clean 100 TB table that is a handful of files, not a full
    scan.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_null_scan (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_nulls")
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = o.withColumn(
        "note",
        F.when(k % 5 == 0, F.lit(None).cast("string")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    tbl = SnapshotTable(path, stats_cols=["note"])
    for r in range(5):
        tbl.append(src.filter(k % 5 == r).coalesce(1))
    kept, total = tbl.plan_files(eq=("note", None))
    return tbl.read(spark, eq=("note", None), plan=kept).agg(
        F.lit(total).cast("bigint").alias("n_files_total"),
        F.lit(len(kept)).cast("bigint").alias("n_files_scanned"),
        F.count(F.lit(1)).alias("n_null_rows"),
        exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q_snapshot_count",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(3 AS BIGINT) AS n_files_metadata,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey % 4 = 3)
               AS n_rows_scanned
    FROM orders
    """,
)
def q_snapshot_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT(*) (Iceberg's count pushdown from manifest
    record counts), DuckDB-oracled end-to-end: orders land in four
    appends — three through a stats-recording handle (per-file
    ``::rows`` captured from parquet footers at commit) and one
    through a PLAIN handle with no stats configured. ``count_rows``
    must answer the three recorded files from the sidecar alone and
    fall back to one Spark count over exactly the stats-less file;
    the oracle pins the split: total row count, 3 files answered from
    metadata, and the scanned remainder equal to the %4==3 residue
    class by construction. A wrong sidecar count, a double-counted
    file, or a fallback over the wrong file set all hash-mismatch.
    The delete-file guard (live MoR state forces the full read) and
    compaction re-enabling the fast path are pinned in
    tests/test_snapshots.py.

    Scale shape: COUNT(*) on a maintained 100 TB table is one manifest
    + one sidecar JSON read on the driver — zero cluster tasks — while
    the oracle's full-scan COUNT is what a plain parquet reader pays.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_count (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_count")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, stats_cols=["o_orderkey"])
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 4 == r).coalesce(1))
    plain = SnapshotTable(path)  # no stats_cols: no ::rows recorded
    plain.append(o.filter(F.col("o_orderkey") % 4 == 3).coalesce(1))
    n, n_meta = tbl.count_rows(spark)
    stats = tbl._load_stats()
    rels = tbl._manifest(tbl._latest_published())
    scanned = [
        r for r in rels if stats.get(r, {}).get("::rows") is None
    ]
    if len(scanned) != 1:  # not assert: must survive python -O
        raise RuntimeError(
            f"expected exactly the plain-handle file to lack ::rows, "
            f"got {scanned}"
        )
    # report the fallback volume the scanned file actually held, so
    # the oracle cross-checks WHICH file lacked metadata
    n_scanned_rows = n - sum(
        stats[r]["::rows"] for r in rels if r not in scanned
    )
    return spark.range(1).select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.lit(n_meta).cast("bigint").alias("n_files_metadata"),
        F.lit(n_scanned_rows).cast("bigint").alias("n_rows_scanned"),
    )


@query(
    "q_snapshot_merge_into",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    s AS (
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
        SELECT t.o_orderkey, t.o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL
                         AND t.o_orderstatus <> 'F'
                    THEN s.o_totalprice + 1
                    ELSE t.o_totalprice END AS o_totalprice
        FROM t LEFT JOIN s ON s.o_orderkey = t.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND t.o_orderstatus = 'F')
        UNION ALL
        SELECT s.o_orderkey, NULL AS o_orderstatus, s.o_totalprice
        FROM s LEFT JOIN t ON t.o_orderkey = s.o_orderkey
        WHERE t.o_orderkey IS NULL AND s.o_totalprice > 50000
    )
    SELECT COALESCE(o_orderstatus, '<inserted>') AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM merged GROUP BY 1
    """,
)
def q_snapshot_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO clause semantics (Spark SQL / Iceberg
    ``WHEN MATCHED [AND cond] THEN DELETE / UPDATE SET ... WHEN NOT
    MATCHED [AND cond] THEN INSERT``), DuckDB-oracled: target = even
    order keys; source = keys %3==0. Clauses, first-match-wins exactly
    like SQL: matched rows with status 'F' are DELETED; remaining
    matched rows UPDATE o_totalprice to the source value + 1 while the
    UNASSIGNED status column keeps the TARGET's value (SET semantics);
    unmatched source rows INSERT only when their price clears 50000,
    with the status column they don't carry filled NULL. The engine
    derives the I/U/D changelog from two joins and commits it through
    ``merge`` as ONE snapshot (equality-deletes + data files in a
    single manifest swap); the oracle reconstructs the final state
    with plain LEFT JOIN algebra. Ambiguous merges (a target key hit
    by two source rows) are refused — Spark's
    MERGE_CARDINALITY_VIOLATION — pinned in tests/test_snapshots.py.

    Scale shape: the clause join probes the target with the
    CDC-batch-sized source (broadcast), the insert anti-join reads a
    column-pruned key scan, and the commit is O(|changelog|) — no
    target file rewritten, the Iceberg v2 delete-file trade.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_merge_into")
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path)
    tbl.append(
        o.filter(k % 2 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    src = o.filter(k % 3 == 0).select("o_orderkey", "o_totalprice")
    tbl.merge_into(
        spark,
        src,
        key="o_orderkey",
        matched=[
            ("delete", "t.o_orderstatus = 'F'"),
            ("update", None, {"o_totalprice": "s.o_totalprice + 1"}),
        ],
        not_matched=("insert", "s.o_totalprice > 50000"),
    )
    return (
        tbl.read(spark)
        .groupBy(
            F.coalesce("o_orderstatus", F.lit("<inserted>")).alias(
                "status"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("cents"),
        )
    )


@query(
    "q_snapshot_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 < 2
    ),
    merged AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM base
        WHERE o_orderkey % 7 NOT IN (1, 3)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 FROM base
        WHERE o_orderkey % 7 = 1
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 2
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def q_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as one atomic snapshot (Iceberg v2's CDC write path),
    DuckDB-oracled end-to-end: base = orders keys with %3 < 2; a CDC
    changelog then DELETEs base keys with %7 == 3, UPDATEs base keys
    with %7 == 1 to doubled totalprice, and INSERTs the held-out
    %3 == 2 keys — applied by ``SnapshotTable.merge`` as ONE commit
    writing an equality-delete file (U∪D keys) plus data files (I∪U
    row images). The latest read is merge-on-read (broadcast anti-join
    with the seq-visibility rule: deletes apply only to older data, so
    the merge's own re-inserts survive), and must equal the oracle's
    full rebuild of the same changelog. The doubled price is exact IEEE
    in both engines. Multi-merge chains, compaction folding the delete
    files, and expire reclaiming them are pinned in
    tests/test_snapshots.py.

    100 TB shape: the merge writes O(|changelog|) bytes — no
    copy-on-write rewrite of touched data files; readers pay one
    broadcast hash anti-join (delete keys are dimension-sized) until
    ``compact`` folds the deletes back into data. The reference can
    only blind-append (App.java:147-149).
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_merge")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path)
    base = o.filter(k % 3 < 2)
    tbl.append(base)
    changelog = (
        base.filter(k % 7 == 3)
        .withColumn("_op", F.lit("D"))
        .unionByName(
            base.filter(k % 7 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("U"))
        )
        .unionByName(
            o.filter(k % 3 == 2).withColumn("_op", F.lit("I"))
        )
    )
    tbl.merge(spark, changelog, key="o_orderkey")
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_schema_evolution",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
    ), v2 AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    ), unioned AS (
        SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT COALESCE(o_orderpriority, '<pre-evolution>') AS priority,
           COUNT(*) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM unioned
    GROUP BY 1
    """,
)
def q_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-AWARE schema evolution (round-5 verdict item #3),
    DuckDB-oracled end-to-end: snapshot 1 appends half of orders under
    (o_orderkey INT, o_totalprice FLOAT); the table then evolves — widen
    o_orderkey -> BIGINT, o_totalprice -> DOUBLE, add o_orderpriority
    STRING — via ``evolve`` commits whose manifests version the SCHEMA
    with the snapshot (Iceberg's schema-id-per-snapshot), and the other
    half appends under the new schema. The latest read resolves
    snapshot-1 files at scan time (exact float->double upcast, NULL
    priority) and must equal the oracle's REAL-round-trip
    reconstruction; money stays exact via floor-cents (the same
    half-step tie rationale as q_schema_evolution, the sink-side
    sibling this upgrades: EvolvingTable versions schemas in a sidecar,
    this folds them into the SNAPSHOT manifests, so time travel crosses
    schema changes — ``read(as_of=1)`` returns snapshot 1's own INT/
    FLOAT schema, pinned in tests/test_snapshots.py).

    Scale shape: evolution is metadata-only (no file rewrites ever);
    the resolution casts are row expressions fused into each scan
    stage, unionByName is a metadata concat — the read plan is the same
    N parallel parquet scans it would be without evolution.
    """
    from pyspark.sql import types as T

    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_schema_evolution")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    tbl.append(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            F.col("o_orderkey").cast("int").alias("o_orderkey"),
            F.col("o_totalprice").cast("float").alias("o_totalprice"),
        )
    )
    tbl.widen_column("o_orderkey", T.LongType())
    tbl.widen_column("o_totalprice", T.DoubleType())
    tbl.add_column("o_orderpriority", T.StringType())
    tbl.append(
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
    )
    return (
        tbl.read(spark)
        .groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias(
                "priority"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("bigint"))
            .cast("bigint")
            .alias("sum_price_cents"),
        )
    )


@query(
    "q_snapshot_rename_column",
    oracle="""
    WITH s1 AS (
        SELECT o_orderkey, o_totalprice AS price, 'legacy' AS flag
        FROM orders WHERE o_orderkey % 3 = 0
    ), s2 AS (
        SELECT o_orderkey, o_totalprice AS price, 'legacy' AS flag
        FROM orders WHERE o_orderkey % 3 = 1
    ), s3 AS (
        SELECT o_orderkey, o_totalprice AS price, 'new' AS flag
        FROM orders WHERE o_orderkey % 3 = 2
    ), unioned AS (
        SELECT * FROM s1 UNION ALL SELECT * FROM s2
        UNION ALL SELECT * FROM s3
    )
    SELECT flag,
           COUNT(*) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(SUM(CAST(FLOOR(price * 100.0) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM unioned
    GROUP BY 1
    """,
)
def q_snapshot_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only RENAME/DROP COLUMN (Iceberg ``ALTER TABLE ...
    RENAME COLUMN`` / ``DROP COLUMN``), DuckDB-oracled end-to-end:
    snapshot 1 appends a third of orders under (o_orderkey,
    o_totalprice, o_orderstatus); the table then renames o_totalprice ->
    price and DROPS o_orderstatus — both pure ``evolve`` commits, zero
    file rewrites — and the second third appends under the new
    two-column schema. A later ``add_column(flag, default='legacy')``
    (Iceberg v3 initial-default) precedes the final third, which
    writes flag='new' explicitly. The latest read must resolve THREE
    schema eras in one scan — pre-rename files read their physical
    ``o_totalprice`` bytes under the name ``price`` via the field
    NAME HISTORY (the local twin of Iceberg's field-ID resolution),
    the dropped ``o_orderstatus`` stops resolving without touching its
    bytes, and pre-add rows fill the flag default — and equal the
    oracle's plain reconstruction. Time travel still returns each
    era's OWN schema, and a re-added name can never resurrect dropped
    bytes (era guards; pinned in tests/test_column_ddl.py).

    Scale shape: every DDL here is one manifest write, however many
    petabytes the files hold; resolution is row expressions fused into
    each era's scan stage, and stats/bloom pruning keeps working on
    pre-rename files by consulting the file-era column name.
    """
    from pyspark.sql import types as T

    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_rename_column")
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path)
    tbl.append(o.filter(k % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ))
    tbl.rename_column("o_totalprice", "price")
    tbl.drop_column("o_orderstatus")
    tbl.append(
        o.filter(k % 3 == 1).select(
            "o_orderkey", F.col("o_totalprice").alias("price")
        )
    )
    tbl.add_column("flag", T.StringType(), default="legacy")
    tbl.append(
        o.filter(k % 3 == 2).select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.lit("new").alias("flag"),
        )
    )
    return (
        tbl.read(spark)
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.sum(F.floor(F.col("price") * 100.0).cast("bigint"))
            .cast("bigint")
            .alias("sum_price_cents"),
        )
    )


@query(
    "q_snapshot_compact_sorted",
    oracle="""
    SELECT TRUE AS pruning_improved,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    WHERE o_orderkey >= 5 * (SELECT MAX(o_orderkey) FROM orders) // 6 + 1
    """,
)
def q_snapshot_compact_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORT-based compaction feeding the stats pruner (round-5 verdict
    item #6), DuckDB-oracled end-to-end: three appends each written
    2-way ROUND-ROBIN, so every one of the 6 files spans the whole
    o_orderkey range and the [min, max] manifest stats can prune
    NOTHING for a range predicate (kept == 6). ``compact(sort_by=
    ['o_orderkey'], target_files=3)`` re-clusters the rows into 3
    range-disjoint files; re-planning the same top-sixth predicate must
    then scan strictly FEWER files (`pruning_improved`, asserted as a
    value so the oracle pins it) while the pruned read returns rows
    identical to the oracle's plain WHERE — pruning only ever removes
    provably-disjoint files and the predicate re-applies as a residual
    filter. Exact per-file counts after a range rewrite depend on
    repartitionByRange's boundary sampling, so the query pins the
    strict IMPROVEMENT (the invariant that matters) and the pytest pins
    the pre-compaction kept==total.

    Scale shape: the sorted rewrite is ONE range shuffle at maintenance
    time; every later range-predicated read plans from manifest+sidecar
    JSON and opens only the files whose range intersects — the
    clustering investment Iceberg's sort-strategy rewriteDataFiles
    makes for exactly this reason.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_compact_sorted (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_compact_sorted")
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]  # one scalar
    lo = 5 * mx // 6 + 1
    tbl = SnapshotTable(path, stats_cols=["o_orderkey"])
    k = F.col("o_orderkey")
    for r in range(3):
        # round-robin split: every file spans the full key range
        tbl.append(o.filter(k % 3 == r).repartition(2))
    where = ("o_orderkey", lo, mx)
    kept_before, total_before = tbl.plan_files(where=where)
    tbl.compact(spark, target_files=3, sort_by=["o_orderkey"])
    kept_after, total_after = tbl.plan_files(where=where)
    improved = len(kept_after) < len(kept_before)
    return tbl.read(spark, where=where, plan=kept_after).agg(
        F.lit(improved).alias("pruning_improved"),
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q_snapshot_overwrite_partitions",
    oracle="""
    WITH final AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderstatus <> 'F'
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT TRUE AS partition_pruned, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM final GROUP BY o_orderstatus
    """,
)
def q_snapshot_overwrite_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE as one atomic snapshot (Iceberg's
    ``replacePartitions`` — the daily-reload/backfill shape),
    DuckDB-oracled end-to-end: the table is partitioned by
    o_orderstatus; snapshot 1 loads all orders (files split per
    partition, tuples recorded in the manifest); a corrected 'F' batch
    (doubled totalprice) then replaces EXACTLY the 'F' partition —
    ``overwrite_partitions`` inherits every other partition's files
    untouched (no rewrite, no copy) and swaps in the new 'F' files in
    one manifest commit. The latest read must equal the oracle's
    rebuild (non-F unchanged + F doubled; doubling is exact IEEE both
    engines). `partition_pruned` additionally pins MANIFEST partition
    pruning: planning a single-partition read keeps strictly fewer
    files than the snapshot total without opening any data file. File
    identity of untouched partitions, time travel to the pre-reload
    state, and expiry of the replaced files are pinned in
    tests/test_snapshots.py.

    100 TB shape: the reload writes O(|batch|) and commits metadata —
    the other 10,000 partitions are inherited by reference; a
    partition-predicated read plans from the manifest's partition
    tuples alone. This is the bread-and-butter warehouse operation
    (idempotent daily re-load) the reference's blind append
    (App.java:147-149) turns into duplicate data.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_dyn_overwrite")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tbl = SnapshotTable(path, partition_by=["o_orderstatus"])
    tbl.append(o)
    reload_f = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    tbl.overwrite_partitions(reload_f)
    kept, total = tbl.plan_files(partitions={"o_orderstatus": "O"})
    pruned = len(kept) < total
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(pruned).alias("partition_pruned"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .select("partition_pruned", "o_orderstatus", "n_orders", "sum_price")
    )


def read_changelog(
    tbl: SnapshotTable, spark: SparkSession, from_v: int, to_v: int
) -> DataFrame:
    """CDC CHANGELOG READ (Iceberg's ``create_changelog_view``) — the
    inverse of ``merge``: the row-level changes between two snapshots as
    '(row image, _change_type)' rows, where an update appears as its
    DELETE (old image) + INSERT (new image) pair, exactly Iceberg's
    changelog semantics.

    Pure manifest arithmetic plus two bounded scans:

      * INSERTS = the range's new data files, read through ``to_v``'s
        merge-on-read machinery restricted to those files — so a row
        appended AND deleted inside the range is correctly suppressed
        (its data seq < the delete's seq), while a merge's own
        re-inserts survive (seq equality);
      * DELETES = the range's delete-file keys (broadcast) joined
        against the ``from_v`` state for the OLD images — a key that
        never existed at ``from_v`` (added and removed inside the
        range) produces no delete row.

    The range must contain only append/publish/merge commits
    (overwrite/rollback/replace rewrite visibility wholesale and evolve
    changes the schema mid-range — both refuse, like the incremental
    append scan). At 100 TB a downstream consumer pays O(delta files) +
    one broadcast join against the old state's matching keys — never a
    diff of two full table scans.
    """
    _validate_range(
        tbl, from_v, to_v,
        allowed=("append", "publish", "merge", "stage", "branch-append",
                 "fast_forward"),
        what="changelog read",
    )
    ct = F.lit("insert").alias("_change_type")
    new_files = sorted(
        set(tbl._manifest(to_v)) - set(tbl._manifest(from_v))
    )
    if new_files:
        ins = tbl._read_files(spark, to_v, new_files).select(
            "*", ct
        )
    else:
        ins = tbl.read(spark, as_of=to_v).select("*", ct).limit(0)
    range_dels = [
        d
        for d in tbl._meta(to_v).get("delete_files", [])
        if from_v < d["seq"] <= to_v
    ]
    if not range_dels:
        return ins
    keys = {d["key"] for d in range_dels}
    if len(keys) != 1:
        raise ValueError(f"mixed equality-delete keys {sorted(keys)}")
    key = keys.pop()
    from functools import reduce

    delkeys = reduce(
        DataFrame.unionAll,
        [
            spark.read.parquet(os.path.join(tbl.path, d["path"])).select(
                key
            )
            for d in range_dels
        ],
    ).distinct()
    old = tbl.read(spark, as_of=from_v)
    del_rows = old.join(F.broadcast(delkeys), key, "left_semi").select(
        "*", F.lit("delete").alias("_change_type")
    )
    return ins.unionByName(del_rows)


@query(
    "q_snapshot_changelog",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 < 2
    ),
    changes AS (
        SELECT 'delete' AS change_type, o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 7 IN (1, 3)
        UNION ALL
        SELECT 'insert', o_orderstatus, o_totalprice * 2
        FROM base WHERE o_orderkey % 7 = 1
        UNION ALL
        SELECT 'insert', o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 2
    )
    SELECT change_type, o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM changes GROUP BY change_type, o_orderstatus
    """,
)
def q_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog READ over a merge commit (Iceberg's
    ``create_changelog_view``), DuckDB-oracled end-to-end: the same
    base + changelog as q_snapshot_merge (base = keys %3 < 2; DELETE
    %7==3, UPDATE %7==1 to doubled price, INSERT %3==2), then
    ``read_changelog(1, 2)`` must emit exactly the update's
    delete(old image)+insert(new image) pair, the delete's old image,
    and the inserts — which the oracle reconstructs directly from the
    changelog definition. Proves the merge write path and the changelog
    read path are inverses on the manifest metadata alone. Intra-range
    add-then-delete suppression is pinned in tests/test_snapshots.py.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_changelog")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path)
    base = o.filter(k % 3 < 2)
    tbl.append(base)
    changelog = (
        base.filter(k % 7 == 3)
        .withColumn("_op", F.lit("D"))
        .unionByName(
            base.filter(k % 7 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("U"))
        )
        .unionByName(
            o.filter(k % 3 == 2).withColumn("_op", F.lit("I"))
        )
    )
    tbl.merge(spark, changelog, key="o_orderkey")
    return (
        read_changelog(tbl, spark, 1, 2)
        .groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_files",
    oracle="""
    SELECT CAST(1 AS BIGINT) AS snapshot_seq, COUNT(*) AS n_records,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT CAST(2 AS BIGINT), COUNT(*),
           CAST(MIN(o_orderkey) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT CAST(3 AS BIGINT), COUNT(*),
           CAST(MIN(o_orderkey) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 2
    """,
)
def q_snapshot_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``.files`` metadata table, DuckDB-oracled end-to-end:
    three appends (keys %3 = 0/1/2, each ONE file) with stats recording
    on o_orderkey; ``files_info`` must report, per file, the commit
    sequence, the record count, and the [min, max] key range — all from
    the stats sidecar captured at commit time (parquet footers read
    once by the writer, like Iceberg manifests carrying record_count
    and column bounds), with ZERO data IO at query time. The oracle
    recomputes each slice's count and key range from the data, so a
    wrong footer capture, a mis-keyed sidecar entry, or a seq-parse bug
    all hash-mismatch. Completes the metadata-table family:
    q_snapshot_history (snapshots), this (.files), plan_files
    (scan planning).

    Scale shape: the admin query every compaction decision starts from
    — file counts/sizes per snapshot — costs one JSON sidecar read
    however large the table; the 100 TB failure mode (listing a
    million files or opening their footers per inspection) never
    happens because the writer recorded the numbers once.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_files (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_files")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, stats_cols=["o_orderkey"])
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r).coalesce(1))
    rows = [
        (
            fi["seq"],
            fi["n_records"],
            fi["stats"]["o_orderkey"][0],
            fi["stats"]["o_orderkey"][1],
        )
        for fi in sorted(tbl.files_info(), key=lambda d: d["path"])
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_seq long, n_records long, min_key long, max_key long",
    )


@query(
    "q_snapshot_branch",
    oracle="""
    WITH pre AS (
        SELECT 'main_during_branch' AS phase,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price
        FROM orders WHERE o_orderkey % 4 = 0
    ),
    brh AS (
        SELECT 'branch_head' AS phase,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price
        FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
    ),
    post AS (
        SELECT 'main_after_ff' AS phase,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price
        FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
    )
    SELECT * FROM pre
    UNION ALL SELECT * FROM brh
    UNION ALL SELECT * FROM post
    """,
)
def q_snapshot_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg BRANCHES (named mutable refs + fast-forward merge),
    DuckDB-oracled end-to-end: main holds the %4 == 0 orders; a branch
    forked from it takes TWO further appends (%4 == 1, then %4 == 2) —
    the 'main_during_branch' row proves main still reads only its own
    batch while both branch commits sit on disk; 'branch_head' is the
    branch read (fork base + both appends); after ``fast_forward``
    merges the branch back as one metadata-only commit,
    'main_after_ff' must equal the branch head. The oracle reconstructs
    each phase's visibility from the same parquet, so a leak of branch
    files into main, a lost branch commit, or a wrong fast-forward
    manifest all hash-mismatch. Divergence refusal, ref retention
    through expire, and streaming-source invisibility are pinned in
    tests/test_snapshots.py.

    Scale shape: the multi-commit generalization of WAP — a backfill
    or re-audit pipeline writes N expensive batches into the branch
    with full parallelism, validation reads the branch head, and
    go-live is one atomic manifest copy; main readers never see a
    half-merged state, and a concurrent main commit is a detected
    conflict, not a lost update.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_branch")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 0))
    tbl.create_branch("backfill")
    tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 1), "backfill")
    tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 2), "backfill")

    def phase_agg(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )

    pre = phase_agg(tbl.read(spark), "main_during_branch")
    head = phase_agg(tbl.read_branch(spark, "backfill"), "branch_head")
    tbl.fast_forward("backfill")
    post = phase_agg(tbl.read(spark), "main_after_ff")
    return pre.unionAll(head).unionAll(post)


@query(
    "q_snapshot_tag",
    oracle="""
    WITH pinned AS (
        SELECT 'tagged_v1' AS phase,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    head AS (
        SELECT 'latest' AS phase,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price
        FROM orders
    )
    SELECT * FROM pinned
    UNION ALL SELECT * FROM head
    """,
)
def q_snapshot_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg TAGS (named immutable refs) with retention, DuckDB-oracled
    end-to-end: snapshot 1 holds the %3 == 0 orders and is tagged
    ``corpus-v1``; two more appends advance the table; ``expire`` is then
    asked to keep only the latest snapshot — which would reclaim
    snapshot 1's manifest and files were it not tag-pinned. The
    'tagged_v1' row reads THROUGH the tag AFTER that expire, so a
    dropped pin, an expire that ignores refs, or a tag resolving to the
    wrong snapshot all hash-mismatch against the oracle's
    reconstruction of the first batch; 'latest' pins the live head.
    Tag CRUD edge cases (duplicate names, untag-then-reclaim, missing
    snapshot) are covered in tests/test_snapshots.py.

    Scale shape: a training run tags the corpus snapshot it read;
    routine retention (expire) can then run on any schedule without
    pulling data out from under the run — reproducibility becomes a
    metadata pin, not a data copy. The expire decision reads one
    refs.json + the manifest list; no data IO scales with table size.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_tag")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    v1 = tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.tag("corpus-v1", v1)
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))
    v3 = tbl.append(o.filter(F.col("o_orderkey") % 3 == 2))
    tbl.expire(keep_from=v3)  # v1 survives only via the tag pin

    def phase_agg(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )

    pinned = phase_agg(tbl.read_tag(spark, "corpus-v1"), "tagged_v1")
    head = phase_agg(tbl.read(spark), "latest")
    return pinned.unionAll(head)


@query(
    "q_snapshot_delete_where",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    WHERE NOT (o_orderkey BETWEEN 1000 AND 4000
               AND o_orderstatus = 'F')
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level ``DELETE FROM ... WHERE`` as one copy-on-write
    snapshot, DuckDB-oracled end-to-end: the table is laid out in three
    files covering DISJOINT o_orderkey ranges (the sorted-compaction
    layout), so the delete's ``stats_hint`` range [1000, 4000] prunes
    the higher-range files from the planning scan entirely — they are
    carried into the new manifest without being opened, which
    tests/test_snapshots.py pins by path identity. The oracle rebuilds
    the post-delete state with ``WHERE NOT (...)`` over the same
    parquet, so a lost row, a row deleted twice, a NULL-condition row
    wrongly dropped, or a kept file leaking deleted rows all
    hash-mismatch.

    Scale shape: DELETE cost is O(files containing matches), not
    O(table) — the manifest stats bound the planning scan and
    ``input_file_name()`` narrows to truly-touched files, so a
    retention sweep over a date-clustered 100 TB table rewrites only
    the expiring date range's files.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_delete_where (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_delete_where")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, stats_cols=["o_orderkey"])
    tbl.append(o.filter(F.col("o_orderkey") < 5000).coalesce(1))
    tbl.append(
        o.filter(
            (F.col("o_orderkey") >= 5000) & (F.col("o_orderkey") < 10000)
        ).coalesce(1)
    )
    tbl.append(o.filter(F.col("o_orderkey") >= 10000).coalesce(1))
    tbl.delete_where(
        spark,
        "o_orderkey BETWEEN 1000 AND 4000 AND o_orderstatus = 'F'",
        stats_hint=("o_orderkey", 1000, 4000),
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_update_where",
    oracle="""
    SELECT CASE WHEN o_orderkey % 7 = 0
                THEN 'R:' || o_orderpriority
                ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_snapshot_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level ``UPDATE ... SET ... WHERE`` as one copy-on-write
    snapshot: every seventh order is re-prioritized (the SET expression
    reads the OLD row image), all other rows in touched files are
    rewritten byte-identical, and the oracle recomputes the same
    mutation with a CASE over the raw parquet — so a row updated twice,
    a non-matching row mutated, or a dropped row all hash-mismatch. The
    per-status money sum proves the untouched columns survive the
    rewrite exactly.

    Scale shape: same CoW plan as DELETE — plan from manifest stats,
    narrow by input_file_name, rewrite only touched files; a
    backfill-style UPDATE over a clustered predicate is O(matching
    files), and readers see the whole UPDATE or none of it (one
    manifest swap).
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_update_where")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    tbl.append(o)
    tbl.update_where(
        spark,
        "o_orderkey % 7 = 0",
        {"o_orderpriority": "concat('R:', o_orderpriority)"},
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_partitions",
    oracle="""
    SELECT o_orderstatus,
           3 AS n_files,
           COUNT(*) AS n_records
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg's ``.partitions`` metadata table, DuckDB-oracled: a
    table partitioned by o_orderstatus takes three appends (each a
    single writer task, so each lays down exactly ONE file per status —
    the deterministic n_files=3 the oracle pins), and the metadata-side
    per-partition record counts must equal a full groupBy scan of the
    same rows. The counts come from manifest partition records + the
    stats sidecar's footer counts — no data file is opened at query
    time, which is the operator's point: partition-size / skew triage
    on a 100 TB table from two metadata reads. A missed file, a file
    recorded under the wrong partition, or a stale sidecar count all
    hash-mismatch.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_partitions (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_partitions")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(
        path, partition_by=["o_orderstatus"], stats_cols=["o_orderkey"]
    )
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r).coalesce(1))
    rows = [
        (p["partition"]["o_orderstatus"], p["n_files"], p["n_records"])
        for p in tbl.partitions_info()
    ]
    return spark.createDataFrame(
        rows, "o_orderstatus string, n_files int, n_records long"
    )


@query(
    "q_snapshot_add_files",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_add_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``add_files`` / ``migrate`` — adopting an EXISTING
    parquet warehouse into the snapshot table as a metadata commit,
    DuckDB-oracled: the raw ``orders.parquet`` driver file is
    registered without reading or rewriting a row (hard-link into the
    table layout; tests pin inode identity), and the snapshot read
    must reproduce the source exactly — a dropped file, a double
    registration, or a schema mix-up all hash-mismatch against the
    oracle's direct scan of the same parquet.

    Scale shape: migrating a 100 TB hive warehouse into the table
    format costs O(files) metadata operations and ZERO data movement —
    the operation every adoption story starts with; after import the
    files participate in time travel, expire reachability, CoW
    deletes, and streaming like natively-written data.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_add_files")
    tbl = SnapshotTable(path)
    tbl.add_files(spark, [os.path.join(sf_dir, "orders.parquet")])
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_fsck",
    oracle="""
    SELECT phase, bucket, CAST(n AS BIGINT) AS n
    FROM (VALUES
        ('healthy', 'missing_files', 0),
        ('healthy', 'dangling_tokens', 0),
        ('healthy', 'dangling_refs', 0),
        ('healthy', 'orphan_stats', 0),
        ('healthy', 'orphan_blooms', 0),
        ('injected', 'missing_files', 1),
        ('injected', 'dangling_tokens', 1),
        ('injected', 'dangling_refs', 1),
        ('injected', 'orphan_stats', 1),
        ('injected', 'orphan_blooms', 1)
    ) AS t(phase, bucket, n)
    """,
)
def q_snapshot_fsck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table FSCK (``verify()``) with DETERMINISTIC planted
    inconsistencies, the q_quality_constraints pattern: a freshly built
    two-commit table must report every bucket EMPTY ('healthy' rows),
    then exactly one inconsistency of each class is injected — a live
    data file deleted externally, an exactly-once token pointing at a
    snapshot that no longer exists, a tag pinning a removed snapshot,
    and a stats-sidecar entry plus a bloom-sidecar entry for
    unreferenced files — and each must land in exactly its own bucket
    ('injected' rows). A miscount, a
    miss, or cross-bucket bleed hash-mismatches the constant oracle;
    the per-bucket payload details are pinned in
    tests/test_snapshots.py.

    Scale shape: fsck is O(live files) existence probes + three sidecar
    reads — no data IO — so a 100 TB table audits in metadata time;
    it is the routine health gate before trusting expire/compact
    automation on a table restored from backup or shared with external
    writers.
    """
    from ..tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_fsck (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_fsck")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, stats_cols=["o_orderkey"])
    tbl.append_once(o.filter(F.col("o_orderkey") % 2 == 0), token="t1")
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 1))

    def report(phase: str):
        return [
            (phase, bucket, len(items))
            for bucket, items in sorted(tbl.verify().items())
        ]

    rows = report("healthy")
    os.remove(os.path.join(tbl.path, tbl._manifest(2)[0]))
    idx = tbl._token_index()
    idx["ghost"] = 99
    tbl._atomic_json(tbl._tokens_path(), idx)
    tbl._atomic_json(tbl._refs_path(), {"old": 98})
    st = tbl._load_stats()
    st["_snap=9/ghost.parquet"] = {"::rows": 1}
    tbl._atomic_json(tbl._stats_path(), st)
    tbl._atomic_json(
        tbl._bloom_sidecar_path(),
        {"_snap=9/ghost.parquet": {"o_orderkey": {"m": 256, "k": 4}}},
    )
    rows += report("injected")
    return spark.createDataFrame(
        rows, "phase string, bucket string, n long"
    )


@query(
    "q_snapshot_stream",
    oracle="""
    SELECT CAST(o_orderkey % 3 + 1 AS BIGINT) AS snapshot,
           COUNT(*) AS n_rows
    FROM orders
    GROUP BY 1
    """,
)
def q_snapshot_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot table as a STREAMING SOURCE, DuckDB-oracled: three
    appends (the %3 classes of orders) must arrive as exactly three
    micro-batches — one per snapshot, each carrying exactly that
    commit's delta — and a RESTART of the loop against the same durable
    checkpoint must deliver NOTHING more. The returned rows are the
    consumed (snapshot, n_rows) pairs across BOTH runs, so a missed
    snapshot, a wrong delta (full-table re-read instead of new files),
    a split/merged batch, or any post-restart re-delivery all
    hash-mismatch against the oracle's per-class counts. Crash-replay
    at-least-once + downstream token dedup are pinned in
    tests/test_streaming.py.

    Scale shape: each micro-batch plans from the commit's ``new_files``
    summary — one manifest read, scan bounded by the delta — so a
    downstream training-data consumer tails a 100 TB table at the cost
    of its increments, never re-scanning history; the checkpoint is one
    atomic-rename JSON.
    """
    from ..tables import scratch_dir
    from ..streaming.file_stream import snapshot_stream_available_now

    base = scratch_dir(spark, sf_dir, "snapshot_stream")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(f"{base}/t")
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    got: list[tuple[int, int]] = []

    def sink(batch: DataFrame, v: int) -> None:
        got.append((v, batch.count()))

    ckpt = f"{base}/ckpt"
    snapshot_stream_available_now(spark, tbl, ckpt, sink)
    snapshot_stream_available_now(spark, tbl, ckpt, sink)  # restart: no-op
    return spark.createDataFrame(got, "snapshot long, n_rows long")


@query(
    "q_snapshot_changelog_stream",
    oracle="""
    SELECT 1 AS snapshot, 'insert' AS change_type,
           COUNT(*) AS n_rows
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 2, 'delete', COUNT(*)
    FROM orders WHERE o_orderkey % 9 IN (0, 3)
    UNION ALL
    SELECT 2, 'insert', COUNT(*)
    FROM orders WHERE o_orderkey % 9 = 3
    UNION ALL
    SELECT 3, 'insert', COUNT(*)
    FROM orders WHERE o_orderkey % 3 = 1
    """,
)
def q_snapshot_changelog_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC STREAMING READ, DuckDB-oracled: an append, a MERGE (delete
    the %9==0 keys, double-price the %9==3 keys), and a second append
    must arrive as exactly three CHANGELOG micro-batches — the
    bootstrap as pure inserts, the merge as its delete old-images
    (U∪D keys) plus insert new-images (U rows), the append as inserts
    — and a checkpoint RESTART delivers nothing more. The returned
    rows are per-(batch, change_type) counts across BOTH runs, so a
    dropped delete, an update not split into its delete+insert pair,
    a full-table re-read, or post-restart re-delivery all
    hash-mismatch against the oracle's modulo-class reconstruction.
    This is the subscription primitive the append-only stream
    (q_snapshot_stream) correctly refuses to serve for merge commits.

    Scale shape: each batch reads the commit's own delta files plus a
    broadcast of its delete keys joined to the prior state — a CDC
    consumer (replica, index, incremental MV) tails a 100 TB table at
    the cost of its changes.
    """
    from ..streaming.file_stream import changelog_stream_available_now
    from ..tables import scratch_dir

    base = scratch_dir(spark, sf_dir, "snapshot_changelog_stream")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tbl = SnapshotTable(f"{base}/t")
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    chg = (
        o.filter(F.col("o_orderkey") % 9 == 0)
        .withColumn("_op", F.lit("D"))
        .unionByName(
            o.filter(F.col("o_orderkey") % 9 == 3)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("U"))
        )
    )
    tbl.merge(spark, chg, key="o_orderkey")
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))

    got: list[tuple[int, str, int]] = []

    def sink(batch: DataFrame, v: int) -> None:
        for r in (
            batch.groupBy("_change_type").count().collect()
        ):
            got.append((v, r["_change_type"], r["count"]))

    ckpt = f"{base}/ckpt"
    changelog_stream_available_now(spark, tbl, ckpt, sink)
    changelog_stream_available_now(spark, tbl, ckpt, sink)  # restart
    return spark.createDataFrame(
        got, "snapshot long, change_type string, n_rows long"
    )


@query(
    "q_snapshot_delete_mor",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 10 IN (3, 7) AND o_orderstatus <> 'O')
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read positional DELETE (Iceberg v2 position-delete
    files), DuckDB-oracled end-to-end: the same ``DELETE WHERE``
    semantics as the CoW path, but the commit writes ONLY a
    (data file, row position) delete file — zero data rewritten (the
    manifest's data files are identical before and after, pinned by
    path in tests/test_snapshots.py) — and the read's broadcast
    (file, pos) anti-join must reproduce exactly the oracle's
    ``WHERE NOT (...)`` over the same parquet. A position off by one,
    a row deleted from the wrong file, or an anti-join key mismatch
    all hash-mismatch.

    Scale shape: write cost is O(matching rows) — two columns per hit
    — regardless of file sizes; the read-side anti-join is
    delete-file-sized and broadcast until ``compact`` folds it. This
    is the delete trade CDC-heavy tables take between compactions;
    CoW (q_snapshot_delete_where) is the read-optimized alternative,
    and both compose with merge()'s equality deletes on one table.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_delete_mor")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(2):
        tbl.append(o.filter(F.col("o_orderkey") % 2 == r))
    tbl.delete_where(
        spark,
        "o_orderkey % 10 IN (3, 7) AND o_orderstatus <> 'O'",
        strategy="mor",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_update_mor",
    oracle="""
    SELECT CASE WHEN o_orderkey % 11 = 0
                THEN 'M:' || o_orderpriority
                ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_snapshot_update_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE, DuckDB-oracled: the same simultaneous
    old-image UPDATE semantics as q_snapshot_update_where, through the
    POSITION-DELETE + new-image-files physical path — one commit whose
    position entries kill exactly the old copies while its own data
    files carry the updated rows (a double-visible row, a lost old
    image, or a new image killed by its own commit's entries all
    hash-mismatch the CASE rebuild). Zero untouched rows rewritten
    (path identity pinned in tests/test_snapshots.py).

    Scale shape: write cost O(matching rows) both sides (two columns
    per position entry + the new images), the CDC-friendly half of the
    UPDATE trade; reads pay the broadcast (file, pos) anti-join until
    ``compact`` folds it.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_update_mor")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(2):
        tbl.append(o.filter(F.col("o_orderkey") % 2 == r))
    tbl.update_where(
        spark,
        "o_orderkey % 11 = 0",
        {"o_orderpriority": "concat('M:', o_orderpriority)"},
        strategy="mor",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_refs",
    oracle="""
    SELECT name, type, CAST(snapshot AS BIGINT) AS snapshot
    FROM (VALUES
        ('corpus-v1', 'tag', 1),
        ('corpus-v2', 'tag', 2),
        ('main', 'branch', 3),
        ('backfill', 'branch', 3)
    ) AS t(name, type, snapshot)
    """,
)
def q_snapshot_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg's ``.refs`` METADATA TABLE: every named ref — the
    implicit ``main`` branch at the current head, explicit branches at
    their heads, tags at their pins — from one metadata read, no data
    IO. Deterministic construction (append → tag v1 → append → tag v2
    → append → branch at head) makes the expected rows exact constants:
    a tag drifting with the head, a branch forked at the wrong
    snapshot, or a ref lost through the commit path all hash-mismatch.
    Ref lifecycle edges (expire retention, untag reclaim, fast-forward)
    are pinned in tests/test_snapshots.py.

    Scale shape: the operator an administrator runs to audit what
    retention must preserve — one refs.json + one manifest-list read
    regardless of table size.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_refs")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    v1 = tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.tag("corpus-v1", v1)
    v2 = tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))
    tbl.tag("corpus-v2", v2)
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 2))
    tbl.create_branch("backfill")
    rows = [("main", "branch", tbl._latest_published())]
    rows += [
        (n, "tag", s) for n, s in sorted(tbl.tags().items())
    ]
    rows += [
        (n, "branch", b["snapshot"])
        for n, b in sorted(tbl.branches().items())
    ]
    return spark.createDataFrame(
        rows, "name string, type string, snapshot long"
    )


@query(
    "q_snapshot_expire",
    oracle="""
    WITH final AS (
        SELECT * FROM orders
        WHERE o_orderkey % 3 < 2 AND o_orderkey % 5 <> 0
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
               AS tagged_rows,
           CAST(2 AS BIGINT) AS n_live_snapshots,
           CAST(1 AS BIGINT) AS n_expired_snapshots,
           CAST(0 AS BIGINT) AS n_leftover_files
    FROM final
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``expire_snapshots`` as a driver-checked query (the
    maintenance twin the reference cannot express — App.java:147-149
    only ever appends; history grows forever). Deterministic lifecycle:
    append %3 = 0 (v1, TAGGED 'audit'), append %3 = 1 (v2), CoW DELETE
    of the %5 = 0 keys (v3), then ``expire(keep_from=v3)``. The oracle
    pins every consequence at once:

      * the final read equals the %3 < 2 minus %5 = 0 aggregate
        (expire never changes visible data);
      * ``tagged_rows`` — a time-travel read AT THE TAG after expiry —
        equals the %3 = 0 count: the ref-pinned snapshot survived the
        cutoff (Iceberg's retention rule), while untagged v2 did not
        (``n_live_snapshots`` = 2, ``n_expired_snapshots`` = 1);
      * ``n_leftover_files`` = 0: every file the expiry returned as
        unreferenced is physically gone — metadata AND storage
        reclaimed, none of it still referenced by v1/v3 (a file the
        delete carried forward must NOT be deleted; one it rewrote
        must be).

    Scale shape: reachability is manifest-set arithmetic under the
    commit lock (KBs of JSON); the storage reclaim runs OUTSIDE the
    lock, O(|doomed files|) with no data reads — the same split
    Iceberg's expire action uses so a 100 TB table's expiry never
    blocks writers on file deletion.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_expire")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    v1 = tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.tag("audit", v1)
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))
    v3 = tbl.delete_where(spark, "o_orderkey % 5 = 0")
    before = set(tbl.snapshots())
    doomed = tbl.expire(keep_from=v3)
    live = tbl.snapshots()
    leftover = sum(
        1 for f in doomed if os.path.exists(os.path.join(tbl.path, f))
    )
    tagged_n = tbl.read(spark, as_of=tbl.tags()["audit"]).count()
    scalars = spark.createDataFrame(
        [(tagged_n, len(live), len(before) - len(live), leftover)],
        "tagged_rows long, n_live_snapshots long, "
        "n_expired_snapshots long, n_leftover_files long",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .crossJoin(F.broadcast(scalars))
    )


@query(
    "q_snapshot_cherrypick",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 < 2)
               AS branch_rows,
           'cherry-pick' AS head_op,
           CAST(1 AS BIGINT) AS idempotent
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_cherrypick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch-to-main ``cherrypick_snapshot``, DuckDB-oracled end to
    end — the hotfix flow the reference's blind append can't express:
    main lands %3 = 0, a 'hotfix' branch forks and commits %3 = 1
    OFF-main, main advances independently with %3 = 2, then the branch
    commit is cherry-picked onto main. The oracle pins the rebase
    semantics: main must now hold ALL of orders (the pick applied the
    branch's files onto the MOVED head, not its fork point),
    ``branch_rows`` proves the branch itself is untouched (%3 < 2 —
    picks don't fast-forward the source ref), ``head_op`` comes from
    the history metadata, and ``idempotent`` re-picks the same source
    and must land on the SAME commit (retry safety).

    Scale shape: the pick is one manifest rebase under the commit lock
    — zero data IO at any table size; the idempotency scan is
    manifest-JSON-only, bounded by history length in KBs.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_cherrypick")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.create_branch("hotfix")
    bv = tbl.append_to_branch(
        o.filter(F.col("o_orderkey") % 3 == 1), "hotfix"
    )
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 2))
    pick = tbl.cherrypick(bv)
    idem = 1 if tbl.cherrypick(bv) == pick else 0
    head_op = tbl.history()[-1][1]
    branch_n = tbl.read_branch(spark, "hotfix").count()
    scalars = spark.createDataFrame(
        [(branch_n, head_op, idem)],
        "branch_rows long, head_op string, idempotent long",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .crossJoin(F.broadcast(scalars))
    )


@query(
    "q_snapshot_maintain",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price,
           CAST(6 AS BIGINT) AS files_before,
           CAST(1 AS BIGINT) AS files_after,
           CAST(6 AS BIGINT) AS n_expired,
           CAST(6 AS BIGINT) AS n_reclaimed,
           CAST(1 AS BIGINT) AS n_orphans,
           CAST(1 AS BIGINT) AS second_run_noop
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance policy runner, DuckDB-oracled end to end: six
    single-file appends accrete a fragmented table plus planted
    crashed-writer debris; ONE ``maintain()`` call compacts 6 files to
    1, expires all six pre-compaction snapshots (reclaiming their six
    small files — the replace is the sole survivor), and sweeps the
    debris; the oracled aggregation over the maintained table must
    equal DuckDB over the source rows (maintenance changed LAYOUT,
    never content), with the report's exact action counts riding along
    as oracled constants — including that an immediate second run under
    the same policy is a complete no-op.

    Scale shape: this is the nightly table-service job — the compaction
    is the only data IO and runs once per threshold crossing; retention
    and the orphan sweep are manifest-metadata reachability plus
    unlink, never scans.
    """
    import os as _os
    import time as _time

    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_maintain")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(_os.path.join(path, "t"))
    for m in range(6):
        tbl.append(o.filter(F.col("o_orderkey") % 6 == m).coalesce(1))
    debris = _os.path.join(path, "t", "_staging-crashed")
    _os.makedirs(debris)
    old = _time.time() - 7200
    _os.utime(debris, (old, old))

    rep = tbl.maintain(
        spark, max_live_files=3, keep_last=1, orphan_grace_sec=3600
    )
    rep2 = tbl.maintain(
        spark, max_live_files=3, keep_last=1, orphan_grace_sec=3600
    )
    noop = int(
        rep2["compacted_to"] is None
        and not rep2["expired_snapshots"]
        and not rep2["reclaimed_files"]
        and not rep2["orphans_removed"]
    )
    scalars = spark.createDataFrame(
        [
            (
                rep["files_before"],
                rep["files_after"],
                len(rep["expired_snapshots"]),
                len(rep["reclaimed_files"]),
                len(rep["orphans_removed"]),
                noop,
            )
        ],
        "files_before long, files_after long, n_expired long, "
        "n_reclaimed long, n_orphans long, second_run_noop long",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .crossJoin(F.broadcast(scalars))
    )


@query(
    "q_snapshot_write_distribution",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(1 AS BIGINT) AS one_file_per_partition,
           CAST(1 AS BIGINT) AS none_mode_wrote_more
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_write_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg's ``write.distribution-mode`` — the small-files control
    for partitioned writes, DuckDB-oracled: the SAME 8-task input
    commits into two tables partitioned by o_orderstatus, one with
    ``write_distribution='none'`` (every task emits a file per status
    it holds — at least 8 files, the small-file explosion pattern) and
    one with ``'hash'`` (a pre-write shuffle co-locates each status on
    one task — EXACTLY one file per status). The read back from the
    hash table must equal the oracle over all of orders (distribution
    changes layout, never content), and the two layout claims ride
    along as oracled constants.

    100 TB shape: mode 'none' on a 1000-task streaming write into a
    1000-partition table can emit 10^6 files PER COMMIT — the
    metadata-death pattern; 'hash' pays ONE shuffle to write exactly
    |partitions| files, and 'range' additionally clusters rows so the
    footer [min, max] stats start disjoint (the sorted-compaction
    layout at write time, no rewrite needed). This is why Iceberg
    defaults distribution-mode to hash for partitioned tables.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_write_dist")
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartition(8)
    )
    none_t = SnapshotTable(
        os.path.join(path, "none"),
        partition_by=["o_orderstatus"],
        write_distribution="none",
    )
    none_t.append(o)
    hash_t = SnapshotTable(
        os.path.join(path, "hash"),
        partition_by=["o_orderstatus"],
        write_distribution="hash",
    )
    hash_t.append(o)
    n_status = (
        o.select("o_orderstatus").distinct().count()
    )  # one scalar
    none_files = len(none_t._manifest(none_t._latest_published()))
    hash_files = len(hash_t._manifest(hash_t._latest_published()))
    scalars = spark.createDataFrame(
        [
            (
                int(hash_files == n_status),
                int(none_files > hash_files),
            )
        ],
        "one_file_per_partition long, none_mode_wrote_more long",
    )
    return (
        hash_t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("cents"),
        )
        .crossJoin(F.broadcast(scalars))
    )


@query(
    "q_snapshot_row_lineage",
    oracle="""
    WITH b1 AS (
        SELECT o_orderkey,
               1099511627776 + ROW_NUMBER() OVER (ORDER BY o_orderkey)
                   - 1 AS rid
        FROM orders WHERE o_orderkey % 2 = 0
    ), b2 AS (
        SELECT o_orderkey,
               2199023255552 + ROW_NUMBER() OVER (ORDER BY o_orderkey)
                   - 1 AS rid
        FROM orders WHERE o_orderkey % 2 = 1
    ), ids AS (
        SELECT * FROM b1 UNION ALL SELECT * FROM b2
    )
    SELECT CAST(o_orderkey % 7 = 3 AS BIGINT) AS updated,
           COUNT(*) AS n_rows,
           CAST(SUM(rid) AS BIGINT) AS id_checksum,
           CAST(CASE WHEN o_orderkey % 7 = 3 THEN 3 ELSE 1 END
                AS BIGINT) AS min_seq,
           CAST(CASE WHEN o_orderkey % 7 = 3 THEN 3 ELSE 2 END
                AS BIGINT) AS max_seq
    FROM ids
    GROUP BY 1, 4, 5
    """,
)
def q_snapshot_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 ROW LINEAGE, DuckDB-oracled end-to-end: two sorted
    single-file appends mint deterministic row ids (seq * 2^40 +
    position — the oracle recomputes them with ROW_NUMBER), a
    copy-on-write UPDATE bumps ``_last_updated_seq`` to its own commit
    sequence for EXACTLY the matched rows while every identity
    survives the rewrite, and a full compaction then moves every row
    into one file — after which the id checksum and per-group
    min/max sequences must still equal the oracle's reconstruction,
    proving the materialization carried both lineage columns through
    two physical rewrites byte-exactly.

    100 TB shape: lineage is metadata + row expressions — untouched
    files pay a per-scan projection (seq literal + row position),
    rewritten files pay two extra int64 columns; no global id
    authority, no shuffle, no id-assignment coordination between
    concurrent writers (the commit sequence IS the namespace).
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_row_lineage")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path, row_lineage=True)
    tbl.append(
        o.filter(k % 2 == 0)
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    tbl.append(
        o.filter(k % 2 == 1)
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    tbl.update_where(
        spark, "o_orderkey % 7 = 3", {"o_totalprice": "o_totalprice + 1"}
    )
    tbl.compact(spark)
    return (
        tbl.read(spark, lineage=True)
        .groupBy(
            (k % 7 == 3).cast("long").alias("updated"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_row_id").cast("bigint").alias("id_checksum"),
            F.min("_last_updated_seq").cast("bigint").alias("min_seq"),
            F.max("_last_updated_seq").cast("bigint").alias("max_seq"),
        )
    )


@query(
    "q_snapshot_check_constraint",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(1 AS BIGINT) AS refused_batches
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_check_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time CHECK constraints, DuckDB-oracled end-to-end: a table
    declaring ``o_totalprice > 0`` takes a clean half of orders, REFUSES a
    batch with planted negative prices (the violating write dies in
    staging — the head never moves, proven by the final content), then
    takes the clean second half. The final aggregate must equal the
    oracle over ALL of orders — i.e. the refusal dropped the whole dirty
    batch and nothing else — with the refusal count riding as a constant.

    This is Delta's table-constraint model on the snapshot commit (the
    quality gate q_quality_constraints runs as a QUERY, enforced at the
    WRITE): the guard folds into the write projection as a row-local
    raise_error — one pass, whole-stage codegen, no validation scan —
    so at 100 TB it costs an expression per row, not a job.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_check_constraint")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, constraints={"positive_price": "o_totalprice > 0"})
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 0))
    dirty = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, -F.col("o_totalprice")
        ).otherwise(F.col("o_totalprice")),
    )
    refused = 0
    try:
        tbl.append(dirty)
    except Exception:
        refused = 1
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 1))
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
        .withColumn("refused_batches", F.lit(refused).cast("bigint"))
    )


@query(
    "q_snapshot_minmax",
    oracle="""
    SELECT ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           CAST(1 AS BIGINT) AS price_from_meta,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           CAST(0 AS BIGINT) AS key_from_meta
    FROM orders
    """,
)
def q_snapshot_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX pushdown from manifest footer stats, DuckDB-oracled:
    orders land in three appends on a table maintaining o_totalprice
    stats; MIN/MAX(o_totalprice) is then answered from ONE sidecar read
    (zero data IO — `from_meta` rides as an oracled constant proving the
    fast path actually fired), while the un-maintained o_orderkey column
    falls back to the real scan and is exact anyway. The metadata answer
    must equal DuckDB's MIN/MAX over the raw data — footer bounds are
    exact extrema, not estimates.

    Completes the metadata-answerable aggregate family with count_rows
    (COUNT(*)): at 100 TB both are one JSON read on a maintained table.
    The guards (delete files, renames, era defaults, missing stats) all
    fall back to the MoR read — never a wrong answer.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_minmax")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, stats_cols=["o_totalprice"])
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    plo, phi, pmeta = tbl.min_max(spark, "o_totalprice")
    klo, khi, kmeta = tbl.min_max(spark, "o_orderkey")
    return spark.range(1).select(
        F.lit(round(plo, 2)).alias("min_price"),
        F.lit(round(phi, 2)).alias("max_price"),
        F.lit(int(pmeta)).cast("bigint").alias("price_from_meta"),
        F.lit(klo).cast("bigint").alias("min_key"),
        F.lit(khi).cast("bigint").alias("max_key"),
        F.lit(int(kmeta)).cast("bigint").alias("key_from_meta"),
    )


@query(
    "q_snapshot_forget",
    oracle="""
    WITH kept AS (
        SELECT * FROM orders WHERE o_orderkey % 10 <> 7
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 7)
               AS n_forgotten,
           CAST(0 AS BIGINT) AS residual,
           CAST(1 AS BIGINT) AS n_snapshots
    FROM kept
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure, DuckDB-oracled end-to-end: orders land in three
    snapshots, one key slice is FORGOTTEN (compact-if-MoR -> CoW delete
    -> history expire -> raw-byte verification), and the result carries
    the erasure report as oracled constants — matched count, zero
    residual matches in surviving bytes, and the single surviving
    snapshot (time travel to the pre-erasure world destroyed BY DESIGN).
    The final aggregate must equal the oracle over orders-minus-slice.

    This is the operation privacy law demands of a lakehouse and the
    one the reference's append-only usage can never express: deletion
    that is provable at the BYTE level, not visibility masking.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_forget")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    rep = tbl.forget(spark, "o_orderkey % 10 = 7")
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
        .withColumn(
            "n_forgotten", F.lit(rep["matched"]).cast("bigint")
        )
        .withColumn(
            "residual", F.lit(rep["residual_matches"]).cast("bigint")
        )
        .withColumn(
            "n_snapshots", F.lit(len(tbl.snapshots())).cast("bigint")
        )
    )


@query(
    "q_snapshot_clone",
    oracle="""
    WITH src_final AS (
        SELECT * FROM orders WHERE o_orderkey % 4 <> 1
    )
    SELECT o_orderstatus,
           COUNT(*) AS clone_n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS clone_cents,
           (SELECT COUNT(*) FROM src_final) AS src_n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE, DuckDB-oracled end-to-end: orders land in a source
    table (two appends), `clone_to` re-homes the live files with zero
    byte copy, and the two tables then DIVERGE — a CoW delete hits only
    the source. The result aggregates the CLONE (must equal the oracle
    over ALL of orders — the clone froze the pre-delete state) with the
    source's post-delete count riding as an oracled constant proving
    independence. Zero-copy and inode-survival claims are pytest-pinned
    (test_shallow_clone_zero_copy_and_divergence).

    At 100 TB this is the dev/test-environment verb: a writable copy of
    a petabyte table in O(files) metadata + hardlink operations, no data
    IO — and expire's unlink semantics give the shared bytes exactly the
    ref-counted lifetime manifest-sharing clones need.
    """
    from ..tables import scratch_dir

    base = scratch_dir(spark, sf_dir, "snap_clone")
    o = load_table(spark, sf_dir, "orders")
    src = SnapshotTable(f"{base}/src")
    src.append(o.filter(F.col("o_orderkey") % 2 == 0))
    src.append(o.filter(F.col("o_orderkey") % 2 == 1))
    clone = src.clone_to(f"{base}/clone")
    src.delete_where(spark, "o_orderkey % 4 = 1")
    src_n = src.read(spark).count()
    return (
        clone.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("clone_n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("clone_cents"),
        )
        .withColumn("src_n", F.lit(src_n).cast("bigint"))
    )


@query(
    "q_snapshot_skew_report",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1
    ), t AS (SELECT SUM(n) AS s FROM c)
    SELECT c.o_orderstatus,
           CAST(1 AS BIGINT) AS n_files,
           c.n AS n_records,
           CAST(c.n * 1000000 // t.s AS BIGINT) AS share_ppm,
           CAST(c.n * (SELECT COUNT(*) FROM c) * 1000000 // t.s
                AS BIGINT) AS skew_ppm
    FROM c CROSS JOIN t
    """,
)
def q_snapshot_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew report from PURE METADATA: per live partition of a
    partitioned snapshot table — file count, footer record count, mass
    share, and a skew index (share x |partitions|, ppm: 1,000,000 =
    perfectly even; the number that decides salting and distribution
    mode). One manifest + one sidecar read, zero data IO at any table
    size (`.partitions` metadata-table economics) — yet every count is
    EXACT, so the whole report is DuckDB-oracled against the raw data.
    The `n_files = 1` per value is itself an oracled claim: the table
    writes under distribution mode 'hash', and a skew report is exactly
    the tool that would catch 'none' mode's per-task file explosion.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_skew")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(
        path,
        partition_by=["o_orderstatus"],
        write_distribution="hash",
        stats_cols=["o_orderkey"],
    )
    tbl.append(o)
    parts = tbl.partitions_info()
    total = sum(p["n_records"] for p in parts)
    k = len(parts)
    rows = [
        (
            p["partition"]["o_orderstatus"],
            p["n_files"],
            p["n_records"],
            p["n_records"] * 1_000_000 // total,
            p["n_records"] * k * 1_000_000 // total,
        )
        for p in parts
    ]
    return spark.createDataFrame(
        rows,
        "o_orderstatus string, n_files long, n_records long, "
        "share_ppm long, skew_ppm long",
    )
