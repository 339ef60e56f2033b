"""Per-file NDV sketches (HyperLogLog) for the stats sidecar.

Iceberg records distinct-value sketches per column in puffin files
(Apache DataSketches theta); engines read the MERGED sketch to make
cost decisions — above all broadcast-vs-shuffle join planning, where
[min,max]/null counts say nothing about cardinality. This module is
the local twin: a classic HyperLogLog (Flajolet et al. 2007, with the
small-range linear-counting correction) recorded per (file, column) at
commit time, merged by register-max at read time — the merge is why a
sketch and not an exact count is stored: per-file exact NDVs cannot be
combined, HLL registers can, and compaction just re-records sketches
for the rewritten files.

p = 12 → 4096 one-byte registers (≈5.5 KB base64 in the JSON sidecar),
standard error 1.04/sqrt(4096) ≈ 1.6%. Hashing is md5 over the same
canonical value encoding the Bloom sidecar uses (`_bloom_key`), so the
two sketches agree on type coercions and both void conservatively on
un-encodable values. Everything is deterministic — same data, same
sketch, same estimate — which is what lets q_snapshot_ndv pin the
estimate against an exact oracle with a fixed error bound.
"""

from __future__ import annotations

import base64
import hashlib
import math

HLL_P = 12
HLL_M = 1 << HLL_P
# bias constant for m >= 128 (Flajolet et al., Fig. 3)
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_empty() -> bytearray:
    return bytearray(HLL_M)


def hll_add_key(regs: bytearray, key: bytes) -> None:
    """Fold one canonical value encoding into the register array."""
    h = int.from_bytes(hashlib.md5(key).digest()[:8], "big")
    idx = h >> (64 - HLL_P)
    w = (h << HLL_P) & ((1 << 64) - 1)
    # rank = leading zeros of the remaining bits + 1, capped at the
    # width left after the index takes its p bits
    if w == 0:
        rank = 64 - HLL_P + 1
    else:
        rank = 64 - w.bit_length() + 1
        rank = min(rank, 64 - HLL_P + 1)
    if rank > regs[idx]:
        regs[idx] = rank


_POP8 = None  # 256-entry popcount LUT, built lazily with numpy


def hll_add_keys(regs: bytearray, keys: list[bytes]) -> None:
    """Fold MANY canonical value encodings into the register array —
    byte-identical to calling :func:`hll_add_key` per key (verified:
    the per-key register write is a max, which is order-independent),
    with the index/rank bit arithmetic vectorized over the md5
    digests (r13 optimization, guide §4.2 — the per-value python loop
    was ~40% of a stats-maintained commit's driver gap)."""
    import numpy as np

    global _POP8
    if _POP8 is None:
        _POP8 = np.array(
            [bin(i).count("1") for i in range(256)], dtype=np.uint8
        )
    if not keys:
        return
    md5 = hashlib.md5
    buf = b"".join(md5(k).digest()[:8] for k in keys)
    h = np.frombuffer(buf, dtype=">u8").astype(np.uint64)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h << np.uint64(HLL_P)  # uint64 wrap == the & (2^64 - 1) mask
    # bit_length(w) = popcount of the bit-smeared value
    s = w.copy()
    for sh in (1, 2, 4, 8, 16, 32):
        s |= s >> np.uint64(sh)
    bl = _POP8[s.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(
        np.int64
    )
    cap = 64 - HLL_P + 1
    rank = np.where(
        w == np.uint64(0), cap, np.minimum(64 - bl + 1, cap)
    ).astype(np.uint8)
    cur = np.frombuffer(regs, dtype=np.uint8).copy()
    np.maximum.at(cur, idx, rank)
    regs[:] = cur.tobytes()


def hll_merge(a: bytes, b: bytes) -> bytes:
    """Register-wise max — the lossless HLL union."""
    if len(a) != HLL_M or len(b) != HLL_M:
        raise ValueError("register width mismatch")
    return bytes(max(x, y) for x, y in zip(a, b))


def hll_estimate(regs: bytes) -> int:
    """Cardinality estimate with the small-range correction."""
    inv = 0.0
    zeros = 0
    for r in regs:
        inv += 2.0 ** (-r)
        if r == 0:
            zeros += 1
    est = _ALPHA * HLL_M * HLL_M / inv
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * math.log(HLL_M / zeros)
    return int(round(est))


def hll_encode(regs: bytes) -> str:
    return base64.b64encode(bytes(regs)).decode("ascii")


def hll_decode(s: str) -> bytes:
    regs = base64.b64decode(s.encode("ascii"))
    if len(regs) != HLL_M:
        raise ValueError("corrupt NDV sketch (register width)")
    return regs
