"""Sha1 shard filter — reference `-shard.count` / `-shard.current`
(`J/index/IndexCollection.java:185-191`, args `J/index/IndexArgs.java:213-219`):

    int hash = Hashing.sha1().hashString(d.id(), UTF_8).asInt() % shardCount;
    if (hash != shardCurrent) skip;

Guava's `asInt()` is the FIRST FOUR BYTES of the sha1 digest in LITTLE-ENDIAN
order, as a signed 32-bit int, and Java's `%` truncates toward zero — so a
docid whose hash int is negative yields a negative remainder and matches NO
shard in [0, count). That quirk is mirrored deliberately: cross-engine shard
parity means a user can build shard k here and shard j with the reference and
get the same partition of the corpus.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def sha1_shard_int(docid: str) -> int:
    """Guava Hashing.sha1().hashString(id, UTF_8).asInt() — signed int32."""
    return struct.unpack("<i", hashlib.sha1(docid.encode()).digest()[:4])[0]


def _java_mod(a: int, n: int) -> int:
    r = abs(a) % abs(n)
    return -r if a < 0 else r


def shard_of(docid: str, shard_count: int) -> int:
    """Java `hash % shardCount` (truncated division — may be NEGATIVE)."""
    return _java_mod(sha1_shard_int(docid), shard_count)


def shard_mask(docids: list[str], shard_count: int, shard_current: int) -> np.ndarray:
    """Boolean keep-mask: True where the docid belongs to shard_current."""
    return np.fromiter(
        (_java_mod(sha1_shard_int(d), shard_count) == shard_current
         for d in docids),
        dtype=bool,
        count=len(docids),
    )
