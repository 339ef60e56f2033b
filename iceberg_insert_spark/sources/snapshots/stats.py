"""Scan planning, per-file statistics/Bloom sidecars, and the read path.

Split out of the original sources/snapshots.py (r7): methods are
verbatim; the class is assembled in .core with an unchanged public
API.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _schema_sans_metadata(sj: dict) -> dict:
    """Recursively drop StructField ``metadata`` from a schema JSON
    before handing it to ``spark.read.schema()``. Two reasons (r12):
    the JVM-side parse rejects array-valued metadata ("Do not support
    array of type class org.json4s.JArray" — the evolve/rename history
    some fields carry), and footer-inferred schemas — what this
    explicit schema replaces — never carried metadata, so stripping it
    keeps the read result byte-identical to the inferred path."""

    def clean_type(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                return {
                    "type": "struct",
                    "fields": [
                        {
                            "name": f["name"],
                            "type": clean_type(f["type"]),
                            "nullable": f.get("nullable", True),
                            "metadata": {},
                        }
                        for f in t.get("fields", [])
                    ],
                }
            if t.get("type") == "array":
                return {
                    **t,
                    "elementType": clean_type(t["elementType"]),
                }
            if t.get("type") == "map":
                return {
                    **t,
                    "keyType": clean_type(t["keyType"]),
                    "valueType": clean_type(t["valueType"]),
                }
        return t

    return clean_type(sj)


class SnapshotStatsMixin:

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

    def _ndv_sidecar_path(self) -> str:
        # NDV sketches get their own sidecar for the same reason blooms
        # do: ~5.5 KB per (file, column) where ranges are bytes, and
        # only ndv() ever reads them.
        return os.path.join(self._mdir, "ndv.json")

    def _load_ndvs(self) -> dict:
        try:
            with open(self._ndv_sidecar_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    def _ndv_for_file(
        self, rel: str, col: str, values: list | None = None
    ) -> str | None:
        """HyperLogLog sketch for one freshly written file (see
        _unique_nonnull for the read contract), hashed through the
        same canonical encoding the Bloom sidecar uses. Returns None
        (no sketch, ndv() falls back to the exact scan) for a missing
        column or un-encodable values."""
        from .hll import hll_add_keys, hll_empty, hll_encode

        if values is None:
            values = self._unique_nonnull(rel, col)
        if values is None:
            return None
        keys = []
        for v in values:
            key = self._bloom_key(v)
            if key is None:
                return None  # un-encodable: conservative, no sketch
            keys.append(key)
        regs = hll_empty()
        # one vectorized fold — register-identical to the per-key loop
        # (max is order-independent; r13, guide §4.2)
        hll_add_keys(regs, keys)
        return hll_encode(regs)

    def ndv(
        self, spark: SparkSession, col: str, as_of: int | None = None
    ) -> tuple:
        """Iceberg's puffin NDV read: estimate ``COUNT(DISTINCT col)``
        by MERGING the live files' HyperLogLog sketches — zero data IO
        on a maintained table, the input a cost-based planner needs
        for broadcast-vs-shuffle decisions at 100 TB (ranges and null
        counts say nothing about cardinality). Returns
        ``(ndv, from_metadata)``: a register-max merge of per-file
        sketches (~1.6% standard error at p=12) when every live file
        has one, else the EXACT distinct scan (from_metadata=False).

        Exactness guards mirror ``min_max``: live delete files (the
        sketch still counts deleted rows), a rename history or schema
        eras (sidecars key by write-time names), or any live file
        missing a sketch all force the exact read — the estimate is
        only ever served when it covers exactly the live bytes.
        Empty / all-NULL files contribute an empty sketch and stay on
        the fast path (NDV ignores NULLs)."""
        from .hll import hll_decode, hll_empty, hll_estimate, hll_merge

        v = self._resolve_snapshot(as_of)
        meta = self._meta(v)
        files = self._manifest(v)

        def slow():
            n = (
                self.read(spark, as_of=v)
                .agg(F.countDistinct(col).alias("n"))
                .collect()[0]["n"]
            )
            return int(n), False

        if not files:
            return 0, True
        fmd = None
        for f in (meta.get("schema") or {}).get("fields", []):
            if f.get("name") == col:
                fmd = f.get("metadata") or {}
                break
        ddl_touched = fmd is None or (
            "iis_names" in fmd or "iis_added_v" in fmd
        )
        if (
            meta.get("delete_files")
            or ddl_touched
            or meta.get("file_schema_v")
        ):
            return slow()
        ndvs = self._load_ndvs()
        stats = self._load_stats()
        merged = bytes(hll_empty())
        for rel in files:
            ent = ndvs.get(rel, {})
            sk = ent.get(col)
            if sk is None:
                sent = stats.get(rel, {})
                nrows = sent.get("::rows")
                nulls = sent.get("::nulls::" + col)
                if nrows == 0 or (
                    nulls is not None and nulls == nrows
                ):
                    continue  # provably contributes no values
                return slow()
            merged = hll_merge(merged, hll_decode(sk))
        return hll_estimate(merged), True

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
        # Vectorized bit-set, BIT-IDENTICAL to the per-key
        # _bloom_hashes loop (r13, guide §4.2): the k positions are
        # (h1 + i*h2) mod m over one blake2b digest per key; m is a
        # power of two, so computing the sum in wrapping uint64 and
        # then mod m equals the unbounded-int mod — verified
        # byte-equal on int/str/date keys at every m tier.
        bits = bytearray(m // 8)
        if keys:
            import hashlib

            import numpy as np

            b2 = hashlib.blake2b
            buf = b"".join(
                b2(k, digest_size=16).digest() for k in keys
            )
            hh = (
                np.frombuffer(buf, dtype=">u8")
                .reshape(-1, 2)
                .astype(np.uint64)
            )
            h1 = hh[:, 0]
            h2 = hh[:, 1] | np.uint64(1)
            arr = np.zeros(m // 8, dtype=np.uint8)
            for i in range(cls.BLOOM_K):
                pos = (
                    (h1 + np.uint64(i) * h2) % np.uint64(m)
                ).astype(np.int64)
                np.bitwise_or.at(
                    arr,
                    pos >> 3,
                    np.left_shift(
                        np.uint8(1), (pos & 7).astype(np.uint8)
                    ),
                )
            bits = bytearray(arr.tobytes())
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
                if not (ok and mins) and not nulls_ok:
                    # explicit "attempted, footer can't say" marker so
                    # a BACKFILL converges instead of re-reading this
                    # footer forever (review catch); readers treat the
                    # column as absent — conservative 'must read'
                    ent["::nostat::" + c] = True
            if ent:
                # MERGE into any existing entry (review catch: plain
                # replacement was only safe for freshly written files;
                # a backfill from a narrower handle wiped previously
                # recorded columns and their pruning forever)
                stats[rel] = {**stats.get(rel, {}), **ent}
        self._atomic_json(self._stats_path(), stats)
        if self.bloom_cols or self.ndv_cols:
            # one column read per (file, column) feeds BOTH value-level
            # sketches — a column in bloom_cols AND ndv_cols must not
            # pay the Arrow read twice (review catch)
            blooms = self._load_blooms() if self.bloom_cols else None
            ndvs = self._load_ndvs() if self.ndv_cols else None
            for rel in new_files:
                bent: dict = {}
                nent: dict = {}
                for c in sorted(set(self.bloom_cols) | set(self.ndv_cols)):
                    vals = self._unique_nonnull(rel, c)
                    # an unreadable/missing column or an un-encodable
                    # value records an explicit None — "attempted, no
                    # sketch" — so backfills converge (review catch);
                    # every consumer treats None as sketch-absent
                    # (conservative keep / exact fallback)
                    if c in self.bloom_cols:
                        bent[c] = (
                            self._bloom_for_file(rel, c, values=vals)
                            if vals is not None
                            else None
                        )
                    if c in self.ndv_cols:
                        nent[c] = (
                            self._ndv_for_file(rel, c, values=vals)
                            if vals is not None
                            else None
                        )
                if bent:
                    blooms[rel] = {**blooms.get(rel, {}), **bent}
                if nent:
                    ndvs[rel] = {**ndvs.get(rel, {}), **nent}
            if blooms is not None:
                self._atomic_json(self._bloom_sidecar_path(), blooms)
            if ndvs is not None:
                self._atomic_json(self._ndv_sidecar_path(), ndvs)

    def _unique_nonnull(self, rel: str, col: str) -> list | None:
        """Distinct non-NULL values of one column of one file: a
        column-pruned Arrow read deduped Arrow-side before any Python
        objects exist. The ONE data read value-level sketches cost
        (footers don't carry distinct values) — shared by the bloom
        and the NDV builders so a column listed in both reads once
        (review catch: two near-verbatim copies each paid the read).
        Runs once per immutable file, at commit, OUTSIDE the commit
        lock, exactly where Iceberg writers compute puffin blobs.
        None = unreadable/missing column (both sketches skip,
        conservative)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        try:
            t = pq.read_table(
                os.path.join(self.path, rel), columns=[col]
            )
        except Exception:
            return None
        return [
            v
            for v in pc.unique(t.column(0)).to_pylist()
            if v is not None
        ]

    def _bloom_for_file(
        self, rel: str, col: str, values: list | None = None
    ) -> dict | None:
        """Bloom entry for one freshly written file (see
        _unique_nonnull for the read contract). Returns None for a
        missing column or un-encodable values — no bloom, conservative
        keeps."""
        if values is None:
            values = self._unique_nonnull(rel, col)
        if values is None:
            return None
        return self._bloom_build(values)

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
        keep the file — pruning must never drop a matching row).
        OPEN-ENDED bounds pass None (r9: ``col > v`` plans as
        (col, v, None), ``col < v`` as (col, None, v)) — an absent
        side never excludes anything."""
        a, b = cls._norm_bound(stat_lo), cls._norm_bound(stat_hi)
        x, y = cls._norm_bound(lo), cls._norm_bound(hi)
        try:
            return bool(
                (x is not None and b < x) or (y is not None and a > y)
            )
        except TypeError:
            return False

    def _mf_skippable(self, mref: dict, partitions: dict) -> bool:
        """Manifest-level partition pruning (Iceberg's manifest-list
        partition summaries): True when the reference's [min, max]
        value summary PROVABLY excludes some equality probe — the
        whole manifest is skipped without reading a single file entry.
        Sound for equality whatever the column's numeric semantics
        (a value outside the lexicographic bounds of a string set is
        not in the set); columns without a summary (recorded by only
        some entries) keep conservatively."""
        parts = mref.get("parts")
        if not parts:
            return False
        for c, val in partitions.items():
            b = parts.get(c)
            if b is not None:
                vs = self._part_str(val)
                if vs < b[0] or vs > b[1]:
                    return True
        return False

    def plan_manifests(
        self,
        partitions: dict | None = None,
        as_of: int | None = None,
    ) -> dict:
        """Manifest-level planning report: how many manifest FILES the
        snapshot's list carries, how many a partition probe prunes
        from the list's summaries alone, and the file counts on each
        side — the tier ABOVE file pruning (at 100 TB with ~10⁶ file
        entries sharded over manifests, this decides which manifest
        JSONs are even read). Flat legacy snapshots report one
        implicit manifest, never pruned."""
        v = self._resolve_snapshot(as_of)
        raw = self._raw_meta(v)
        if partitions:
            # same validity contract as plan_files (review catch: a
            # typo'd column silently reported 0 pruned here while
            # plan_files raised) — current spec, else any file record
            pby = raw.get("partition_by", [])
            for c in partitions:
                if c not in pby and c not in self._live_pt_columns(
                    raw
                ):
                    raise ValueError(
                        f"{c!r} is not a partition column (have {pby})"
                    )
        mlist = raw.get("manifest_list")
        if mlist is None:
            n = len(raw.get("files", []))
            return {
                "manifests_total": 1,
                "manifests_pruned": 0,
                "files_total": n,
                "files_after_manifest_prune": n,
            }
        skipped = [
            m
            for m in mlist
            if partitions and self._mf_skippable(m, partitions)
        ]
        return {
            "manifests_total": len(mlist),
            "manifests_pruned": len(skipped),
            "files_total": sum(m["n"] for m in mlist),
            "files_after_manifest_prune": sum(m["n"] for m in mlist)
            - sum(m["n"] for m in skipped),
        }

    # keys a disjunction branch may carry (everything except
    # `partitions`: partition probes compose at the top level; a
    # per-branch partition OR adds nothing the stats tiers don't
    # already decide, since partition columns stay in the data files
    # and can be ranged/eq'd/IN'd like any other column)
    _ANY_OF_KEYS = frozenset(("where", "eq", "isin", "not_null", "any_of"))

    def plan_files(
        self,
        where: tuple | None = None,
        as_of: int | None = None,
        partitions: dict | None = None,
        eq: tuple | None = None,
        not_null: list[str] | None = None,
        isin: tuple | None = None,
        any_of: list[dict] | None = None,
    ) -> tuple[list[str], int]:
        """Metadata-only scan planning: the manifest's file list, pruned
        by (a) PARTITION values — ``partitions = {col: value}`` keeps
        only files whose manifest-recorded partition tuple matches
        (Iceberg's partition pruning: decided from the manifest alone,
        no footer ever read) — and (b) the sidecar [min, max] stats
        against ``where = (column, lo, hi)``: a file survives unless
        its recorded range is provably disjoint; files without
        stats/partition records are conservatively kept. Either bound
        may be None — the open-ended ``>`` / ``<`` shapes plan as
        half-ranges (r8 verdict missing #3). ``isin = (column,
        [values])`` is SQL ``IN``: a single-column DISJUNCTION — a
        file survives iff SOME value could be present (range stats
        and blooms both prune it, value by value). ``any_of`` is an
        OR-TREE (r9): a list of branch dicts (keys: where / eq / isin
        / not_null / nested any_of), each an AND of its entries — a
        file is pruned only when EVERY branch provably excludes it
        (union of over-approximations: sound because each branch's
        keep-set over-approximates its matches). Top-level arguments
        AND with the disjunction, so arbitrary AND-of-OR-of-AND trees
        compose. Cost is one metadata pass per branch — O(branches x
        entries) driver work, the same order as the base pass.
        Returns (files to scan, total files in the snapshot) — no
        data file is opened."""
        as_of = self._resolve_snapshot(as_of)
        anykeep: set | None = None
        if any_of is not None:
            if not any_of:
                # SQL has no empty disjunction; an empty list is a
                # caller bug, not "matches nothing" — refuse loudly
                raise ValueError("any_of needs at least one branch")
            anykeep = set()
            for br in any_of:
                bad = set(br) - self._ANY_OF_KEYS
                if bad:
                    raise ValueError(
                        f"any_of branch has unknown keys {sorted(bad)}; "
                        f"allowed: {sorted(self._ANY_OF_KEYS)}"
                    )
                anykeep |= set(self.plan_files(as_of=as_of, **br)[0])
        raw = self._raw_meta(as_of)
        mlist = raw.get("manifest_list")
        if mlist is None:
            # flat legacy manifest: everything is already in raw
            files = list(raw["files"])
            total = len(files)
            fparts = raw.get("file_partitions", {})
            f_eras = raw.get("file_schema_v", {})
        else:
            # two-level: prune whole manifests from the list's
            # partition summaries BEFORE reading any file entries —
            # the read-side half of the O(delta) metadata design
            # (write-side: _write_manifest's manifest reuse)
            total = sum(m["n"] for m in mlist)
            files = []
            fparts = {}
            f_eras = {}
            for mref in mlist:
                if partitions and self._mf_skippable(mref, partitions):
                    continue
                for e in self._load_mf(mref["path"]):
                    files.append(e["p"])
                    if "pt" in e:
                        fparts[e["p"]] = e["pt"]
                    if "sv" in e:
                        f_eras[e["p"]] = e["sv"]
        if partitions:
            pby = raw.get("partition_by", [])
            for c in partitions:
                # valid if in the CURRENT spec or recorded by any file
                # (an old spec after partition evolution) — a column no
                # spec ever had is a caller error. The kept manifests'
                # records decide; a column recorded ONLY in manifests
                # the summary pruning skipped is still valid — fall
                # back to the full expansion before refusing (rare:
                # multi-column probes across a partition evolution).
                if c not in pby and not any(
                    c in p for p in fparts.values()
                ):
                    if (
                        mlist is None
                        or c not in self._live_pt_columns(raw)
                    ):
                        raise ValueError(
                            f"{c!r} is not a partition column "
                            f"(have {pby})"
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
        ins = self._norm_isin(isin)
        if anykeep is not None:
            # intersect the disjunction's union-of-keeps with the
            # top-level conjunction (order-preserving)
            files = [f for f in files if f in anykeep]
        if not conds and not eqs and not not_null and not ins:
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
        sjson = raw.get("schema")
        # f_eras was collected above (flat: from raw; two-level: from
        # the kept manifests' entries — pruned files never reach here)
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
        # IN-list pruning (r9): a per-column DISJUNCTION of equality
        # probes — a file is pruned only when EVERY value is provably
        # absent. Range stats decide first (each value as a degenerate
        # range, era-default files exactly from the default); the
        # bloom tier then drops files whose sketch admits none of the
        # values. Conservative everywhere stats/sketches are missing.
        ib = None
        for col, vals in ins:
            vals = [x for x in vals if x is not None]
            if not vals:
                # SQL ``IN ()`` / IN (NULL): matches nothing
                files = []
                break

            def _keep_in_rng(f: str) -> bool:
                n, dv = stat_key(col, f)
                if n is None:
                    return dv is not None and any(
                        not self._provably_disjoint(dv, dv, x, x)
                        for x in vals
                    )
                s = stats.get(f, {}).get(n)
                return s is None or any(
                    not self._provably_disjoint(s[0], s[1], x, x)
                    for x in vals
                )

            files = [f for f in files if _keep_in_rng(f)]
            keys = [self._bloom_key(x) for x in vals]
            if any(k is None for k in keys):
                continue  # some value has no canonical form: no bloom
            if ib is None:
                ib = self._load_blooms()

            def _keep_in_bloom(f: str) -> bool:
                n, _dv = stat_key(col, f)
                if n is None:
                    return True  # decided exactly by the range tier
                b = ib.get(f, {}).get(n)
                return any(
                    self._bloom_maybe_contains(b, k) for k in keys
                )

            files = [f for f in files if _keep_in_bloom(f)]
        return files, total

    def manifests_info(self, as_of: int | None = None) -> list[dict]:
        """Iceberg's ``.manifests`` METADATA TABLE: one dict per
        manifest FILE referenced by the snapshot's manifest list —
        path, entry count, and the per-partition-column [min, max]
        value summary the list-level pruner decides from. Raw list
        read only: no manifest entries are opened, no data IO — the
        admin view for 'is my metadata layout healthy / is
        rewrite_manifests due' (many tiny manifests = slow planning,
        exactly like many tiny data files = slow scans). Flat legacy
        snapshots report one synthetic inline manifest."""
        v = self._resolve_snapshot(as_of)
        raw = self._raw_meta(v)
        mlist = raw.get("manifest_list")
        if mlist is None:
            return [
                {
                    "path": "(inline)",
                    "n_entries": len(raw.get("files", [])),
                    "partition_summary": {},
                }
            ]
        return [
            {
                "path": m["path"],
                "n_entries": m["n"],
                "partition_summary": dict(m.get("parts", {})),
            }
            for m in mlist
        ]

    def plan_row_groups(
        self,
        where: tuple,
        as_of: int | None = None,
        partitions: dict | None = None,
    ) -> dict:
        """ROW-GROUP-granularity scan planning report (r7 verdict #5):
        the tier between file pruning and the scan. Runs ``plan_files``
        first (manifest summaries -> file stats -> blooms, all
        sidecar-metadata-only), then opens ONLY the surviving files'
        parquet FOOTERS and scores each row group's [min, max] against
        the range predicate — on a large sorted file whose file-level
        range spans the predicate, most groups are provably disjoint
        and an engine reads a handful of group's pages instead of the
        file. Same conservative rule everywhere: groups without usable
        stats must be read; ISO date/timestamp bounds compare through
        the granularity-safe normalizer. Returns file- and group-tier
        counters; read() itself is unchanged (Spark's own parquet
        reader applies group-level filters when given the residual
        predicate — this is the report that makes the saving a
        checkable number, the file_skipping_report pattern one level
        down)."""
        import pyarrow.parquet as pq

        col, lo, hi = where
        v = self._resolve_snapshot(as_of)
        kept, total = self.plan_files(
            where=where, as_of=v, partitions=partitions
        )
        rep = {
            "files_total": total,
            "files_pruned": total - len(kept),
            "n_groups": 0,
            "groups_skipped": 0,
            "rows_in_kept_files": 0,
            "rows_must_read": 0,
        }
        for rel in kept:
            md = pq.ParquetFile(
                os.path.join(self.path, rel)
            ).metadata
            # locate by path_in_schema on the parquet LEAF columns —
            # the arrow top-level field index is a DIFFERENT index
            # space once nested columns exist (review catch, the same
            # hazard _record_stats already guards: a struct before the
            # stats column scored the wrong leaf's range and reported
            # skippable groups that hold matching rows)
            idx = -1
            if md.num_row_groups:
                rg0 = md.row_group(0)
                for i in range(rg0.num_columns):
                    if rg0.column(i).path_in_schema == col:
                        idx = i
                        break
            rep["rows_in_kept_files"] += md.num_rows
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                rep["n_groups"] += 1
                st = g.column(idx).statistics if idx >= 0 else None
                glo = (
                    self._stat_value(st.min)
                    if st is not None and st.has_min_max
                    else None
                )
                ghi = (
                    self._stat_value(st.max)
                    if st is not None and st.has_min_max
                    else None
                )
                if (
                    glo is not None
                    and ghi is not None
                    and self._provably_disjoint(glo, ghi, lo, hi)
                ):
                    rep["groups_skipped"] += 1
                else:
                    rep["rows_must_read"] += g.num_rows
        return rep

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
    def _norm_isin(isin) -> list[tuple]:
        """Normalize the IN-list argument: None -> [], one ``(column,
        values)`` pair -> [it], a list of pairs -> itself (a
        CONJUNCTION of per-column IN lists)."""
        def vals(vs) -> list:
            # a bare string would silently explode into characters
            # (review catch: isin=("name", "bob") pruned against
            # IN ('b','o','b')) — the values side must be a collection
            if isinstance(vs, (str, bytes)):
                raise TypeError(
                    "isin values must be a list/tuple of values, got "
                    f"a bare {type(vs).__name__}: {vs!r}"
                )
            return list(vs)

        if isin is None:
            return []
        if (
            isinstance(isin, tuple)
            and len(isin) == 2
            and isinstance(isin[0], str)
        ):
            return [(isin[0], vals(isin[1]))]
        return [(c, vals(vs)) for c, vs in isin]

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
        if self._raw_meta(v).get("delete_files"):
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

    def plan_topk(
        self,
        col: str,
        k: int,
        desc: bool = True,
        as_of: int | None = None,
    ) -> tuple[list[str], int, object]:
        """TOP-K scan planning from metadata (the ORDER BY col
        DESC|ASC LIMIT k shape — ClickHouse PK skipping / Snowflake
        pruning's trick, absent from plain Spark): per-file [min, max]
        + footer row/null counts prove a BOUND on the k-th extreme
        value, and every file provably outside the bound cannot
        contribute a top-k row.

        Soundness (desc case): walk files by recorded ``min``
        descending, accumulating NON-NULL row counts (``::rows`` minus
        the recorded null count — files with unknown nulls or missing
        stats contribute zero to the accumulation, never to a bound).
        Every accumulated row is >= its file's min, so once the running
        total reaches k there provably exist >= k non-NULL values >= L
        (that file's min) — any file whose recorded max < L can be
        pruned; files without usable stats keep conservatively. The
        read path orders NULLS LAST explicitly (Spark's bare ``asc()``
        is NULLS FIRST), so NULLs never enter the top-k while >= k
        non-null values exist — exactly what the accumulation
        established. ``asc`` mirrors
        with max ascending / min > U. Returns ``(files_to_scan,
        total_files, bound)`` — bound None when metadata could not
        prove one (every file kept). The caller re-applies the real
        ORDER BY ... LIMIT k on survivors (``read_topk``): pruning
        changes IO, never the result.

        100 TB shape: 'latest 1000 events' / 'top spenders' on a
        time-ordered or range-distributed layout reads ONE file's
        worth of data instead of scheduling a scan task per file —
        the layout sorted compaction / range write-distribution
        already produces."""
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        v = self._resolve_snapshot(as_of)
        files = self._manifest(v)
        # live delete files: a top-k row may be deleted — the counts
        # are overcounts, so no bound is provable (the same guard as
        # count_rows); all files keep, the MoR read stays exact
        if self._raw_meta(v).get("delete_files"):
            return list(files), len(files), None
        stats = self._load_stats()
        meta = self._meta(v)
        fmd = None
        for f in (meta.get("schema") or {}).get("fields", []):
            if f.get("name") == col:
                fmd = f.get("metadata") or {}
        # rename/add DDL history or per-file schema eras: sidecars key
        # by write-time names — conservative full keep (the min_max
        # guard, minus its string-truncation concern: a truncated max
        # is still an UPPER bound and a truncated min a LOWER bound,
        # which is all pruning needs)
        if (fmd is not None and ("iis_names" in fmd or "iis_added_v" in fmd)) or meta.get(
            "file_schema_v"
        ):
            return list(files), len(files), None
        entries = []
        for rel in files:
            ent = stats.get(rel, {})
            b = ent.get(col)
            nrows = ent.get("::rows")
            nulls = ent.get("::nulls::" + col)
            nonnull = (
                nrows - nulls
                if nrows is not None and nulls is not None
                else None
            )
            entries.append((rel, b, nonnull))
        # sort under the SAME normalized ordering _provably_disjoint
        # compares with (mixed-granularity ISO date/datetime strings
        # sort chronologically, not lexicographically) — the bound's
        # soundness claim 'every accumulated row >= the last
        # accumulated file's min' is about THAT ordering. Un-sortable
        # mixed types: no bound, conservative full keep.
        try:
            ordered = sorted(
                (e for e in entries if e[1] is not None and e[2]),
                key=(
                    (lambda e: self._norm_bound(e[1][0]))
                    if desc
                    else (lambda e: self._norm_bound(e[1][1]))
                ),
                reverse=desc,
            )
        except TypeError:
            return list(files), len(files), None
        bound = None
        acc = 0
        for _rel, b, nonnull in ordered:
            acc += nonnull
            bound = b[0] if desc else b[1]
            if acc >= k:
                break
        if acc < k:
            return list(files), len(files), None  # no provable bound
        kept = []
        for rel, b, _nn in entries:
            if b is None:
                kept.append(rel)  # no stats: must read
            elif desc:
                if not self._provably_disjoint(
                    b[0], b[1], bound, None
                ):
                    kept.append(rel)
            else:
                if not self._provably_disjoint(
                    b[0], b[1], None, bound
                ):
                    kept.append(rel)
        return kept, len(files), bound

    def read_topk(
        self,
        spark: SparkSession,
        col: str,
        k: int,
        desc: bool = True,
        as_of: int | None = None,
    ) -> DataFrame:
        """``SELECT * ORDER BY col DESC|ASC LIMIT k`` with the scan
        planned by :meth:`plan_topk` — identical rows to the unpruned
        query (the exact ORDER BY ... LIMIT re-applies on survivors;
        Spark's TakeOrderedAndProject does the per-partition top-k +
        driver merge), only the IO changes."""
        kept, _total, _bound = self.plan_topk(col, k, desc, as_of)
        df = self.read(spark, as_of=as_of, plan=kept)
        # NULLS LAST explicitly on BOTH directions: Spark's bare asc()
        # defaults to NULLS FIRST (review catch — NULL keys would have
        # entered an ascending top-k on the unpruned path while the
        # bound proof assumed they never surface, so pruning would
        # have CHANGED the result), and plan_topk's soundness argument
        # is stated for nulls-last semantics.
        order = (
            F.col(col).desc_nulls_last()
            if desc
            else F.col(col).asc_nulls_last()
        )
        return df.orderBy(order).limit(k)

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

    def delete_files_info(self, as_of: int | None = None) -> list[dict]:
        """Iceberg's ``.delete_files`` METADATA TABLE: one dict per
        live delete file of the snapshot — path, kind (eq / pos / dv),
        commit seq, entry count, plus per-kind payload facts: the
        equality key for eq files, and for DELETION VECTORS the total
        dead-row cardinality and covered-file count WITHOUT decoding a
        bitmap (the ``__iis_dcard`` column and the manifest coverage
        list carry them). The administrator's MoR-health view: how much
        delete state a read folds, and whether compaction is due —
        footer-read-only, no data IO, KB-scale however large the
        table."""
        import pyarrow.parquet as pq

        v = self._resolve_snapshot(as_of)
        out = []
        for d in self._meta(v).get("delete_files", []):
            ent = {
                "path": d["path"],
                "kind": d.get("kind", "eq"),
                "seq": d["seq"],
            }
            p = os.path.join(self.path, d["path"])
            if ent["kind"] == "dv":
                # one footer+column read serves both facts
                t = pq.read_table(p, columns=["__iis_dcard"])
                ent["n_entries"] = t.num_rows
                ent["n_dead_rows"] = int(
                    sum(t.column(0).to_pylist())
                )
                ent["files_covered"] = len(d.get("files", []))
            else:
                ent["n_entries"] = pq.ParquetFile(p).metadata.num_rows
            if "key" in d:
                ent["key"] = d["key"]
            out.append(ent)
        return sorted(out, key=lambda e: (e["seq"], e["path"]))

    def compute_stats(
        self,
        stats_cols: list[str] | tuple = (),
        bloom_cols: list[str] | tuple = (),
        ndv_cols: list[str] | tuple = (),
    ) -> dict:
        """Iceberg's ``compute_table_stats`` / SQL ``ANALYZE TABLE``:
        BACKFILL the sidecars for live files missing entries, so a
        table created without maintenance (or with a narrower column
        set) adopts footer stats / Bloom / NDV sketches after the
        fact — from then on ``count_rows``/``min_max``/``ndv``/point
        pruning answer from metadata. The requested columns are ADDED
        to this handle's recorded sets (future commits through this
        handle keep recording them; the catalog's ANALYZE verb also
        persists the sets for future handles).

        Cost: one footer read per missing file, plus one column-pruned
        Arrow read per missing (file, sketch column) — files already
        covered for every requested column are untouched (immutable
        files make recomputation idempotent, so a crash mid-backfill
        just re-runs; columns a file CANNOT serve record explicit
        markers so they never re-process). Unknown columns are a clean
        error — silently persisting a typo would re-probe it at every
        future commit (review catch). Returns
        ``{"files_analyzed": n}``."""
        sj = self._raw_meta(self._resolve_snapshot(None)).get("schema")
        if sj is not None:
            known = {f["name"] for f in sj.get("fields", [])}
            unknown = sorted(
                (set(stats_cols) | set(bloom_cols) | set(ndv_cols))
                - known
            )
            if unknown:
                raise ValueError(
                    f"cannot ANALYZE unknown column(s) {unknown}; "
                    f"table columns: {sorted(known)}"
                )
        self.stats_cols = sorted(set(self.stats_cols) | set(stats_cols))
        self.bloom_cols = sorted(set(self.bloom_cols) | set(bloom_cols))
        self.ndv_cols = sorted(set(self.ndv_cols) | set(ndv_cols))
        v = self._resolve_snapshot(None)
        files = self._manifest(v)
        stats = self._load_stats()
        blooms = self._load_blooms()
        ndvs = self._load_ndvs()
        need = [
            rel
            for rel in files
            if rel not in stats
            or any(
                c not in blooms.get(rel, {}) for c in self.bloom_cols
            )
            or any(c not in ndvs.get(rel, {}) for c in self.ndv_cols)
            or any(
                c not in stats.get(rel, {})
                and "::nulls::" + c not in stats.get(rel, {})
                and "::nostat::" + c not in stats.get(rel, {})
                for c in self.stats_cols
            )
        ]
        if need:
            self._record_stats(need)
        return {"files_analyzed": len(need)}

    def _live_dvs(self, dv_dels: list[dict]) -> dict[str, bytes]:
        """Newest live deletion-vector blob per data file, resolved in
        two metadata-scale steps (Iceberg's manifest-level DV
        reference): (1) each DV entry's recorded coverage list decides
        the per-file winner from the MANIFEST alone; (2) only the
        winning delete files are opened — superseded DV parquet is
        never read, so plan cost stays O(live files) however many
        delete commits have stacked since the last compaction. Entries
        without a coverage list (none are written today) are opened
        and compete by seq — conservative, never wrong."""
        import pyarrow.parquet as pq

        best: dict[str, int] = {}
        for d in dv_dels:
            for f in d.get("files", ()):
                if d["seq"] > best.get(f, -1):
                    best[f] = d["seq"]
        need = [
            d
            for d in dv_dels
            if "files" not in d
            or any(best.get(f) == d["seq"] for f in d["files"])
        ]
        out: dict[str, bytes] = {}
        seqs: dict[str, int] = {}
        for d in need:
            t = pq.read_table(os.path.join(self.path, d["path"]))
            for f, blob in zip(
                t.column("__iis_dfile").to_pylist(),
                t.column("__iis_dv").to_pylist(),
            ):
                if d["seq"] > seqs.get(f, -1):
                    out[f] = blob
                    seqs[f] = d["seq"]
        return out

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
        eq_dels = [
            d for d in dels if d.get("kind", "eq") not in ("pos", "dv")
        ]
        pos_dels = [d for d in dels if d.get("kind") == "pos"]
        dv_dels = [d for d in dels if d.get("kind") == "dv"]
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
        if file_col is not None or pos_dels or dv_dels:
            want_cols.append(
                (file_col or "__iis_fp", "_metadata.file_path")
            )
        if pos_col is not None or pos_dels or dv_dels or lineage_cols:
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

        # Scan schema comes from the MANIFEST, not from parquet footers
        # (r12 optimization): a schema-less spark.read.parquet() runs a
        # footer-inference job (one driver-blocking Spark job per read
        # call) before planning; the manifest already records the exact
        # schema every current-era file was written with, so handing it
        # to spark.read.schema() removes that job — exactly how an
        # Iceberg reader plans (schema-id from metadata). Only
        # current-era groups qualify (older-era files are projected by
        # _resolve_onto from their OWN footer shape), and lineage
        # tables keep inference (rewritten files carry materialized
        # physical lineage columns the logical schema must not hide).
        cur_st = None
        if sj is not None and not lineage_table:
            from pyspark.sql import types as T

            cur_st = T.StructType.fromJson(
                _schema_sans_metadata(sj)
            )

        def _era_schema(era: int):
            # Older-era files were WRITTEN projected onto the schema
            # their own commit recorded (v{era}.json "schema" — the
            # written frame's exact shape), so that recorded schema IS
            # the group's footer schema and the inference job is as
            # redundant as the current-era one (r13, extending the r12
            # manifest-schema read). Conservative fallbacks keep
            # inference: a pre-schema-tracking manifest, an expired
            # era manifest (reachable files can outlive their writer's
            # manifest), or any parse surprise.
            try:
                esj = self._raw_meta(era).get("schema")
                if esj is None:
                    return None
                from pyspark.sql import types as T

                return T.StructType.fromJson(
                    _schema_sans_metadata(esj)
                )
            except (OSError, ValueError, KeyError):
                return None

        def rdr(era: int | None = None):
            if cur_st is not None and (era is None or era >= schema_v):
                return spark.read.schema(cur_st)
            if era is not None and not lineage_table:
                est = _era_schema(era)
                if est is not None:
                    return spark.read.schema(est)
            return spark.read

        if not dels and not needs_resolve and not lineage_table:
            return tag(
                rdr(min(e for _, e in by_seq) if by_seq else None)
                .parquet(*[os.path.join(self.path, f) for f in rels])
            )
        target = None
        if needs_resolve:
            from pyspark.sql import types as T

            target = T.StructType.fromJson(sj)
        lin_phys = (self._LIN_ROWID, self._LIN_LASTSEQ)
        parts = []
        for (s, e), fs in sorted(by_seq.items()):
            df = tag(
                rdr(e).parquet(
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
        def _del_rdr(d: dict):
            # delete entries record their file's exact schema at
            # commit time ("sch"); pre-recording entries infer
            sch = d.get("sch")
            if sch is not None:
                from pyspark.sql import types as T

                return spark.read.schema(
                    T.StructType.fromJson(_schema_sans_metadata(sch))
                )
            return spark.read

        if eq_dels:
            keys = {d["key"] for d in eq_dels}
            if len(keys) != 1:
                raise ValueError(
                    f"mixed equality-delete keys {sorted(keys)}; "
                    "one merge key per table is supported"
                )
            key = keys.pop()
            dparts = [
                _del_rdr(d)
                .parquet(os.path.join(self.path, d["path"]))
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
                _del_rdr(d).parquet(os.path.join(self.path, d["path"]))
                for d in pos_dels
            ]
            delpos = reduce(DataFrame.unionAll, pparts)
            data = data.join(
                F.broadcast(delpos),
                on=(data[fp_name] == delpos["__iis_dfile"])
                & (data[rp_name] == delpos["__iis_dpos"]),
                how="left_anti",
            )
        if dv_dels:
            # DELETION VECTORS (Iceberg v3): one compressed bitmap per
            # data file, NEWEST superseding (the writer unions the
            # prior DV, so the max-seq entry is each file's complete
            # delete state). The fold is a ROW-LOCAL Arrow-batched
            # filter — position-in-bitmap — not a join: no delete-side
            # frame rides the exchange, no broadcast grows with delete
            # history, and files without a DV pay nothing. This is the
            # v3 answer to the v2 row-list scale limit: read-side state
            # is O(live files), not O(delete commits), exactly how an
            # Iceberg v3 scan applies puffin DVs per task.
            from .dv import dv_contains, dv_packed

            dvmap = self._live_dvs(dv_dels)

            @F.pandas_udf("boolean")
            def _dv_keep(fp, rp):
                import numpy as np
                import pandas as pd

                # blobs ship compressed in the closure; each worker
                # decodes a file's DV ONCE and memoizes the packed form
                # across its batches (review catch: per-batch decode
                # re-inflated the same bitmap for every Arrow batch)
                cache = _dv_keep.__dict__.setdefault("_dv_cache", {})
                out = np.ones(len(fp), dtype=bool)
                for f in fp.unique():
                    blob = dvmap.get(f)
                    if blob is None:
                        continue  # file has no DV: every row survives
                    ent = cache.get(f)
                    if ent is None:
                        ent = cache[f] = dv_packed(blob)
                    packed, nbits = ent
                    m = (fp.values == f)
                    out[m] = ~dv_contains(
                        packed, nbits, rp.values[m].astype("int64")
                    )
                return pd.Series(out)

            # "files without a DV pay nothing" is enforced, not hoped
            # (review follow-up): the frame splits JVM-side on the DV'd
            # files' paths — the clean side never leaves whole-stage
            # codegen, only rows of files that actually carry deletes
            # cross the Arrow boundary. dvmap keys are the writer's
            # scan-reported URIs, the same spelling fp_name carries.
            affected = sorted(dvmap)
            data = data.filter(
                ~F.col(fp_name).isin(affected)
            ).unionByName(
                data.filter(F.col(fp_name).isin(affected)).filter(
                    _dv_keep(F.col(fp_name), F.col(rp_name))
                )
            )
        return strip(data.drop("__iis_seq"))

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
        isin: tuple | None = None,
        any_of: list[dict] | None = None,
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
            and isin is None
            and any_of is None
            and plan is None
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
                    isin=isin,
                    any_of=any_of,
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
                if self._raw_meta(v).get("schema") is not None:
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
            # open-ended bounds (None) skip their side — a residual
            # `col >= NULL` would silently drop every row
            if lo is not None:
                df = df.filter(F.col(col) >= lo)
            if hi is not None:
                df = df.filter(F.col(col) <= hi)
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
        for col, vals in self._norm_isin(isin):
            # residual IN filter — pruning only removed files where
            # every value is provably absent
            df = df.filter(
                F.col(col).isin([x for x in vals if x is not None])
            )
        for col in not_null or []:
            df = df.filter(F.col(col).isNotNull())
        if any_of:
            # residual OR filter: pruning only removed files EVERY
            # branch provably excludes; conservatively-kept files
            # re-filter here, so the result equals an unpruned
            # filtered read (the same contract as every tier above)
            df = df.filter(self._any_of_expr(any_of))
        return df

    @classmethod
    def _branch_expr(cls, br: dict):
        """Residual Column for ONE any_of branch: the AND of its
        entries, each spelled exactly like the top-level residual
        filters in ``read`` (open-ended ranges skip the absent side;
        eq None = IS NULL; IN drops NULLs — SQL IN never matches
        NULL; empty IN matches nothing)."""
        import functools

        exprs = []
        for col, lo, hi in cls._norm_where(br.get("where")):
            if lo is not None:
                exprs.append(F.col(col) >= lo)
            if hi is not None:
                exprs.append(F.col(col) <= hi)
        for col, val in cls._norm_eq(br.get("eq")):
            exprs.append(
                F.col(col).isNull()
                if val is None
                else F.col(col) == F.lit(val)
            )
        for col, vals in cls._norm_isin(br.get("isin")):
            nn = [x for x in vals if x is not None]
            exprs.append(
                F.col(col).isin(nn) if nn else F.lit(False)
            )
        for col in br.get("not_null") or []:
            exprs.append(F.col(col).isNotNull())
        if br.get("any_of"):
            exprs.append(cls._any_of_expr(br["any_of"]))
        if not exprs:
            return F.lit(True)
        return functools.reduce(lambda a, b: a & b, exprs)

    @classmethod
    def _any_of_expr(cls, any_of: list[dict]):
        """Residual Column for a disjunction: OR over branch ANDs."""
        import functools

        return functools.reduce(
            lambda a, b: a | b,
            [cls._branch_expr(br) for br in any_of],
        )
