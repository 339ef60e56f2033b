"""Schema / partition-spec / constraint DDL with era resolution.

Split out of the original sources/snapshots.py (r7): methods are
verbatim; the class is assembled in .core with an unchanged public
API.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import CommitConflict


class SnapshotDdlMixin:

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
            # metadata-only commit: the base's manifests carry BY
            # REFERENCE (r9: O(#manifests), never the flat file list);
            # mutate callbacks see the RAW summary fields and answer
            # file-level questions through the manifest-tier helpers
            # (_guard_column_ddl / _live_pt_columns).
            meta = self._raw_meta(base)
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
                "op": "evolve",
                "schema": new_schema.jsonValue(),
                "schema_v": v,
            }
            for carry in (
                "delete_files",
                "partition_by",
                *self._PROP_CARRY,
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest_delta(
                v, emeta, base=base, base_raw=meta
            )
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
            meta = self._raw_meta(base)
            v = self._next_version()
            emeta = {
                "op": "evolve_spec",
                "partition_by": list(partition_by),
            }
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                *self._PROP_CARRY,
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest_delta(
                v, emeta, base=base, base_raw=meta
            )
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
            meta = self._raw_meta(base)
            cons = dict(meta.get("constraints") or {})
            if name in cons:
                raise ValueError(f"constraint {name!r} already exists")
            cons[name] = expr
            v = self._next_version()
            emeta = {
                "op": "alter_constraints",
                "constraints": cons,
            }
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "partition_by",
                # property carry MINUS constraints (set explicitly above)
                *(k for k in self._PROP_CARRY
                  if k != "constraints"),
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest_delta(
                v, emeta, base=base, base_raw=meta
            )
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
            meta = self._raw_meta(base)
            cons = dict(meta.get("constraints") or {})
            if name not in cons:
                raise ValueError(f"constraint {name!r} does not exist")
            del cons[name]
            v = self._next_version()
            emeta = {
                "op": "alter_constraints",
            }
            if cons:
                emeta["constraints"] = cons
            for carry in (
                "schema",
                "schema_v",
                "delete_files",
                "partition_by",
                # property carry MINUS constraints (set explicitly above)
                *(k for k in self._PROP_CARRY
                  if k != "constraints"),
            ):
                if carry in meta:
                    emeta[carry] = meta[carry]
            self._write_manifest_delta(
                v, emeta, base=base, base_raw=meta
            )
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

        from ..schema_evolution import _WIDENINGS, _type_name

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

    def _live_pt_columns(self, raw: dict) -> set:
        """Union of partition-record column names across a snapshot's
        live files — manifest-tier via the list's ``pk`` key-set
        summaries; only manifests whose summaries predate the field
        are loaded (cached). The RENAME/DROP COLUMN guard's input."""
        if "manifest_list" not in raw:
            return {
                c
                for p in (
                    self._expand_meta(raw).get("file_partitions") or {}
                ).values()
                for c in p
            }
        cols: set = set()
        for mref in raw["manifest_list"]:
            pk = mref.get("pk")
            if pk is None:
                for e in self._load_mf(mref["path"]):
                    cols.update(e.get("pt") or ())
            else:
                for ks in pk:
                    cols.update(ks)
        return cols

    def _guard_column_ddl(self, name: str, meta: dict, verb: str) -> None:
        """Shared refusals for RENAME/DROP COLUMN (``meta`` is the base
        snapshot's RAW manifest). Iceberg proper resolves partition
        specs and equality-delete keys by field ID, so renames are
        free; this local twin's specs and delete files reference
        columns by NAME, so mutating a referenced name would silently
        break partition pruning or the MoR anti-join — refuse honestly
        instead, with compact (which folds delete files and rewrites
        old-spec files) as the documented unblock."""
        pby = meta.get("partition_by") or self.partition_by or []
        if name in pby:
            raise ValueError(
                f"cannot {verb} {name!r}: it is a partition column "
                f"({pby}); evolve_partitioning away from it first"
            )
        if name in self._live_pt_columns(meta):
            raise ValueError(
                f"cannot {verb} {name!r}: live files carry partition "
                "records under that name (an old spec); compact to "
                "rewrite them under the current spec first"
            )
        live_keys = {
            d["key"]
            for d in meta.get("delete_files", [])
            if d.get("kind", "eq") not in ("pos", "dv")
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
