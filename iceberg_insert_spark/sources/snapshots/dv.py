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
    in the environment; zlib over packbits gets run-length-grade
    compression on the sparse and the dense ends alike, and the decoded
    form is a numpy bit array, which is exactly what the Arrow-batched
    scan filter wants to index);
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

_MAGIC = b"IISDV1"
_HDR = len(_MAGIC) + 8


def dv_encode(positions) -> bytes:
    """Serialize an iterable of row positions into a DV blob."""
    import numpy as np

    pos = np.unique(np.asarray(list(positions), dtype=np.int64))
    if pos.size == 0:
        raise ValueError("a deletion vector needs at least one position")
    if int(pos[0]) < 0:
        raise ValueError(f"negative row position {int(pos[0])}")
    nbits = int(pos[-1]) + 1
    bits = np.zeros(nbits, dtype=np.uint8)
    bits[pos] = 1
    return (
        _MAGIC
        + nbits.to_bytes(8, "big")
        + zlib.compress(np.packbits(bits).tobytes(), 6)
    )


def dv_bits(blob: bytes):
    """Decode a DV blob to a uint8 0/1 array of length ``nbits``."""
    import numpy as np

    if blob[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a deletion vector (bad magic)")
    nbits = int.from_bytes(blob[len(_MAGIC) : _HDR], "big")
    packed = np.frombuffer(zlib.decompress(blob[_HDR:]), dtype=np.uint8)
    return np.unpackbits(packed)[:nbits]


def dv_positions(blob: bytes):
    """Deleted row positions recorded in a DV blob (sorted int64)."""
    import numpy as np

    return np.flatnonzero(dv_bits(blob)).astype(np.int64)


def dv_cardinality(blob: bytes) -> int:
    """Number of deleted rows a DV records."""
    return int(dv_bits(blob).sum())


def dv_union(a: bytes, b: bytes) -> bytes:
    """Union two DV blobs (the write-side supersede fold)."""
    import numpy as np

    ba, bb = dv_bits(a), dv_bits(b)
    n = max(ba.size, bb.size)
    out = np.zeros(n, dtype=np.uint8)
    out[: ba.size] |= ba
    out[: bb.size] |= bb
    return dv_encode(np.flatnonzero(out))


DV_SCHEMA = "__iis_dfile string, __iis_dv binary, __iis_dcard long"


def build_dv_frame(hits, prior: dict[str, bytes]):
    """Turn a (``__iis_dfile``, ``__iis_dpos``) hit frame into one DV
    row per touched data file, unioned with each file's PRIOR live DV
    (Iceberg v3's supersede-on-write rule) so the newest DV per file is
    always the complete delete state. One Arrow-batched task per
    touched file — the bitmap build never leaves the executors; only
    ``prior`` (the touched files' existing blobs, KB-scale) rides the
    closure."""

    def _build(pdf):
        import pandas as pd

        f = pdf["__iis_dfile"].iloc[0]
        blob = dv_encode(pdf["__iis_dpos"].values)
        old = prior.get(f)
        if old is not None:
            blob = dv_union(old, blob)
        return pd.DataFrame(
            {
                "__iis_dfile": [f],
                "__iis_dv": [blob],
                "__iis_dcard": [dv_cardinality(blob)],
            }
        )

    return hits.groupBy("__iis_dfile").applyInPandas(_build, DV_SCHEMA)
