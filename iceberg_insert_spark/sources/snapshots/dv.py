"""Deletion vectors (Iceberg v3's replacement for position-delete files).

Iceberg v2 MoR writes a parquet row per deleted (data file, position);
a hot table accumulates one row-list PER DELETE COMMIT, and every read
carries their union through an anti-join. V3 replaces the lists with ONE
compressed bitmap per data file ("deletion vector", stored in puffin):
a new delete against a file READS the file's current DV, unions the new
positions in, and writes one superseding DV — so read-side delete state
is bounded by live files, never by delete-commit history, and the scan
folds each file's DV as a row-local filter instead of a join.

This module is the codec + builders for the local SnapshotTable twin:

  * wire form: ``b"IISDV1" + nbits(uint64 BE) + zlib(packbits(bitmap))``
    — dense-bitmap-with-compression rather than roaring (no roaring lib
    in the environment; zlib over the packed bitmap gets
    run-length-grade compression on the sparse and the dense ends
    alike, and the decoded PACKED form is what the Arrow-batched scan
    filter bit-indexes directly — never a byte-per-bit expansion);
  * a DV delete FILE is still parquet (one row per data file:
    ``__iis_dfile``, ``__iis_dv``, ``__iis_dcard``) so the commit
    protocol, fsck, and expire treat it like any other delete file;
    only the read fold and the write-side union know the payload.

Reference parity: the reference (App.java) has no delete surface at
all; the semantics here follow the Iceberg v3 spec's DV rules —
one live DV per data file (newest supersedes), DVs name only
pre-existing files, compaction folds them away.
"""

from __future__ import annotations

import zlib

from ...tables import tiny_df

_MAGIC = b"IISDV1"
_HDR = len(_MAGIC) + 8


def dv_encode(positions) -> bytes:
    """Serialize an iterable of row positions into a DV blob. Builds
    the PACKED form directly (one bit per row — np.bitwise_or.at into
    a bytes-long buffer), never a byte-per-bit temporary (review
    catch: the unpacked intermediate cost 8x the bitmap at every
    encode)."""
    import numpy as np

    pos = np.unique(np.asarray(list(positions), dtype=np.int64))
    if pos.size == 0:
        raise ValueError("a deletion vector needs at least one position")
    if int(pos[0]) < 0:
        raise ValueError(f"negative row position {int(pos[0])}")
    nbits = int(pos[-1]) + 1
    packed = np.zeros((nbits + 7) >> 3, dtype=np.uint8)
    np.bitwise_or.at(
        packed, pos >> 3, np.uint8(1) << (7 - (pos & 7)).astype(np.uint8)
    )
    return (
        _MAGIC
        + nbits.to_bytes(8, "big")
        + zlib.compress(packed.tobytes(), 6)
    )


def dv_packed(blob: bytes):
    """Decode a DV blob to its PACKED form: ``(uint8 array of
    ceil(nbits/8) bytes, nbits)``. Membership tests index the packed
    bytes directly — the hot read path never materializes a
    byte-per-bit array (review catch: an unpacked decode allocated 8x
    the bitmap per file per Arrow batch)."""
    import numpy as np

    if blob[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a deletion vector (bad magic)")
    nbits = int.from_bytes(blob[len(_MAGIC) : _HDR], "big")
    packed = np.frombuffer(zlib.decompress(blob[_HDR:]), dtype=np.uint8)
    return packed, nbits


def dv_contains(packed, nbits: int, positions):
    """Vectorized membership: a bool array, True where the position is
    deleted. Positions at/past nbits are alive (the DV was written when
    the file had at least nbits rows and files are immutable, so only
    defensive range handling is needed)."""
    import numpy as np

    pos = np.asarray(positions, dtype=np.int64)
    out = np.zeros(pos.size, dtype=bool)
    inr = (pos >= 0) & (pos < nbits)
    p = pos[inr]
    out[inr] = (
        (packed[p >> 3] >> (7 - (p & 7)).astype(np.uint8)) & 1
    ).astype(bool)
    return out


def dv_bits(blob: bytes):
    """Decode a DV blob to a uint8 0/1 array of length ``nbits`` —
    diagnostics/cardinality form; the scan filter uses dv_packed."""
    import numpy as np

    packed, nbits = dv_packed(blob)
    return np.unpackbits(packed)[:nbits]


def dv_positions(blob: bytes):
    """Deleted row positions recorded in a DV blob (sorted int64)."""
    import numpy as np

    return np.flatnonzero(dv_bits(blob)).astype(np.int64)


def dv_cardinality(blob: bytes) -> int:
    """Number of deleted rows a DV records."""
    return int(dv_bits(blob).sum())


def dv_union(a: bytes, b: bytes) -> bytes:
    """Union two DV blobs (the write-side supersede fold) — an OR over
    the packed forms, no byte-per-bit temporary."""
    import numpy as np

    pa, na = dv_packed(a)
    pb, nb = dv_packed(b)
    n = max(na, nb)
    out = np.zeros((n + 7) >> 3, dtype=np.uint8)
    out[: pa.size] |= pa
    out[: pb.size] |= pb
    return _MAGIC + n.to_bytes(8, "big") + zlib.compress(out.tobytes(), 6)


DV_SCHEMA = "__iis_dfile string, __iis_dv binary, __iis_dcard long"


def build_dv_frame(spark, hits, prior: dict[str, bytes]):
    """Turn a (``__iis_dfile``, ``__iis_dpos``) hit frame into the
    COMPLETE deletion-vector state after this delete: one DV row per
    data file that has any delete — touched files union their PRIOR
    live DV (Iceberg v3's supersede-on-write rule), and untouched
    files' prior DVs are CARRIED into the same delete file. Writing
    the full consolidated state each commit is what lets the manifest
    drop every older DV entry: ``delete_files`` holds exactly ONE live
    DV generation however many deletes stack (Iceberg needs a separate
    rewrite-position-deletes maintenance pass for this; here the state
    is bitmap-small, so the commit does it inline), and expire
    reclaims superseded DV files as their snapshots age out.

    Two-stage, shuffle-light (review catch: a groupBy over the raw hit
    frame shuffled O(matches) rows): stage one builds PARTIAL DVs
    map-side — the scan already co-locates a file's rows, so each task
    folds its hits into one bitmap per file it saw, and only these
    one-row-per-(file, task) partials reach the exchange; stage two
    OR-merges partials per file (a file split across scan tasks yields
    several, and the prior state arrives as one more partial each).
    Shuffle volume is O(files with deletes), never O(deleted rows)."""

    def _partial(batches):
        import numpy as np
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            for f, grp in pdf.groupby("__iis_dfile", sort=False):
                acc.setdefault(f, []).append(
                    grp["__iis_dpos"].values.astype("int64")
                )
        for f, chunks in acc.items():
            blob = dv_encode(np.concatenate(chunks))
            yield pd.DataFrame(
                {
                    "__iis_dfile": [f],
                    "__iis_dv": [blob],
                    "__iis_dcard": [dv_cardinality(blob)],
                }
            )

    def _merge(pdf):
        import pandas as pd

        f = pdf["__iis_dfile"].iloc[0]
        blob = None
        for b in pdf["__iis_dv"]:
            blob = bytes(b) if blob is None else dv_union(blob, bytes(b))
        return pd.DataFrame(
            {
                "__iis_dfile": [f],
                "__iis_dv": [blob],
                "__iis_dcard": [dv_cardinality(blob)],
            }
        )

    partials = hits.mapInPandas(_partial, DV_SCHEMA)
    if prior:
        prior_rows = tiny_df(spark, 
            [
                (f, bytearray(b), dv_cardinality(b))
                for f, b in sorted(prior.items())
            ],
            DV_SCHEMA,
        )
        partials = partials.unionByName(prior_rows)
    return partials.groupBy("__iis_dfile").applyInPandas(_merge, DV_SCHEMA)
