"""Fixed-width HyperLogLog sketch for bounded distinct-count state.

The stateful running-stats operator's exact mode stores the distinct
value SET per key — O(distinct values) state, fine for enum-like
columns (event_type, turn_idx), a bug for high-cardinality ones. This
sketch caps the state row at ``2**p`` bytes per key (4 KiB at the
default p=12, ~1.6% relative standard error = 1.04/sqrt(2**p))
regardless of cardinality, the classic Flajolet et al. HLL with
linear-counting small-range correction.

Everything is numpy-vectorized over an Arrow batch of values — one
hash pass + one scatter-max per batch, no per-row Python. Hashing is
blake2b (stable across processes and machines, unlike Python's seeded
``hash``), so sketches built on different executors merge correctly.
"""

from __future__ import annotations

import hashlib

import numpy as np


def empty_sketch(p: int = 12) -> bytes:
    """All-zero register array: 2**p one-byte registers."""
    return bytes(1 << p)


def _hash64(values) -> np.ndarray:
    """Stable 64-bit hashes for a sequence of values (stringified)."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                "little",
            )
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def add_values(sketch: bytes, values, p: int = 12) -> bytes:
    """Fold a batch of values into the sketch; returns the new bytes.
    Register update is a vectorized scatter-max (np.maximum.at)."""
    if len(values) == 0:
        return sketch
    regs = np.frombuffer(sketch, dtype=np.uint8).copy()
    q = 64 - p
    h = _hash64(values)
    idx = (h >> np.uint64(q)).astype(np.int64)
    rem = h & np.uint64((1 << q) - 1)
    # exact floor(log2(rem)) via 6 vectorized halving steps (float log2
    # rounds at power-of-two boundaries above 2^53)
    hb = np.zeros_like(rem, dtype=np.int64)
    v = rem.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >> np.uint64(s)
        has = m > 0
        hb[has] += s
        v[has] = m[has]
    rank = np.where(rem > 0, q - hb, q + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs.tobytes()


def merge(a: bytes, b: bytes) -> bytes:
    """Union of two sketches = elementwise register max."""
    return np.maximum(
        np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
    ).tobytes()


def estimate(sketch: bytes, p: int = 12) -> int:
    """Cardinality estimate with linear-counting small-range correction."""
    regs = np.frombuffer(sketch, dtype=np.uint8)
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            e = m * np.log(m / zeros)
    return int(round(e))
