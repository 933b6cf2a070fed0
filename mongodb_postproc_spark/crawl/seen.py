"""Partitioned Bloom-filter URL-seen set.

North-rule component: dedup at 10^10 URLs cannot anti-join every candidate
against the full seen table — the Bloom prunes the shuffle. Semantics are
kept EXACT (the fixtures demand the exact set, SURVEY.md §7 "What's hard"):

  - might_contain == False  ->  definitely unseen: pass through, no shuffle.
  - might_contain == True   ->  maybe seen: exact anti-join against the seen
                                table confirms (Bloom false positives would
                                otherwise DROP real URLs).

State layout (FIXTURES.md `seen_state`): one row per build partition —
(partition_id, epoch, bloom_bytes, n_items) — persisted through the table
catalog, merged by bitwise OR into a broadcast filter for querying. Epochs
are crawl rounds; a resume reloads every epoch's rows and ORs them.

The filter itself is pure numpy (no JVM dependency): double hashing
h_i = (h1 + i*h2) mod m over two independent 60-bit md5-derived hashes
(functions/hashes.py) — deterministic across processes and engines.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pandas as pd

from ..functions.hashes import h60


class Bloom:
    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "Bloom":
        n_items = max(n_items, 64)
        n_bits = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
        n_hashes = max(1, round(n_bits / n_items * math.log(2)))
        return cls(n_bits, n_hashes)

    def _positions(self, urls: pd.Series) -> np.ndarray:
        h1 = urls.map(lambda u: h60("b1|" + u)).to_numpy(dtype=np.uint64)
        h2 = urls.map(lambda u: h60("b2|" + u)).to_numpy(dtype=np.uint64)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, urls: pd.Series) -> None:
        if len(urls) == 0:
            return
        pos = self._positions(urls).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, urls: pd.Series) -> np.ndarray:
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(urls)  # (k, n)
        hit = (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return hit.all(axis=0)

    # ------------------------------------------------------------ serde
    def to_bytes(self) -> bytes:
        header = np.array([self.n_bits, self.n_hashes], dtype=np.int64).tobytes()
        return header + zlib.compress(self.bits.tobytes(), 3)

    @classmethod
    def from_bytes(cls, data: bytes) -> "Bloom":
        n_bits, n_hashes = np.frombuffer(data[:16], dtype=np.int64)
        bits = np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8).copy()
        return cls(int(n_bits), int(n_hashes), bits)

    def merge(self, other: "Bloom") -> "Bloom":
        assert (self.n_bits, self.n_hashes) == (other.n_bits, other.n_hashes)
        return Bloom(self.n_bits, self.n_hashes, np.bitwise_or(self.bits, other.bits))


def build_state_rows(urls_pdf_iter, epoch: int, n_bits: int, n_hashes: int):
    """applyInPandas-shaped builder: one partition of new-seen URLs ->
    one (partition_id, epoch, bloom_bytes, n_items) state row."""
    for pdf in urls_pdf_iter:
        b = Bloom(n_bits, n_hashes)
        b.add(pdf["url_canon"])
        pid = int(pdf["__pid"].iloc[0]) if len(pdf) else -1
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "epoch": [epoch],
                "bloom_bytes": [b.to_bytes()],
                "n_items": [len(pdf)],
            }
        )


def merge_state(rows: list[dict]) -> Bloom | None:
    """OR all persisted per-partition blooms into one queryable filter."""
    merged: Bloom | None = None
    for r in rows:
        b = Bloom.from_bytes(r["bloom_bytes"])
        merged = b if merged is None else merged.merge(b)
    return merged
