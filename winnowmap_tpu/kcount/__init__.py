"""meryl-equivalent k-mer counting (reference ext/meryl).

TPU-first redesign: instead of meryl's prefix-bucketed bit-packed counting
arrays with a sweatShop thread pipeline (reference
ext/meryl/src/meryl/merylOp-countThreads.C), counting is sort-based --
2-bit-pack, canonicalize, sort, run-length-encode -- which vectorizes
cleanly on TPU (jnp.sort / segment reductions) and trivially shards across
devices (local count + global merge of sorted runs).

Encoding parity: meryl packs bases as (ch>>1)&3 (A=0,C=1,T=2,G=3) with
complement = code^2 (reference kmers-tiny.H:86-87), and its canonical k-mer
is min(fwd, rev) under *that* ordering; output order is ascending code.
We reproduce both so `print` output is byte-identical.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

# meryl base encoding table: (ch>>1)&3 for ACGT, 255 for anything else
MERYL_CODE = np.full(256, 255, dtype=np.uint8)
for _c in b"ACGTacgt":
    MERYL_CODE[_c] = (_c >> 1) & 3
_DECODE = {0: "A", 1: "C", 2: "T", 3: "G"}
MERYL_DECODE = np.frombuffer(
    bytes(ord(_DECODE[i]) for i in range(4)), dtype=np.uint8
)


def seq_to_kmers(seq: bytes, k: int) -> np.ndarray:
    """All valid canonical k-mer codes of one sequence (uint64)."""
    codes = MERYL_CODE[np.frombuffer(seq, dtype=np.uint8)]
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    valid = codes != 255
    ok = np.ones(n, dtype=bool)
    fwd = np.zeros(n, dtype=np.uint64)
    rev = np.zeros(n, dtype=np.uint64)
    c64 = codes.astype(np.uint64)
    for j in range(k):
        fwd = (fwd << np.uint64(2)) | c64[j : j + n]
        rev |= ((c64[j : j + n] ^ np.uint64(2)) << np.uint64(2 * j))
        ok &= valid[j : j + n]
    canon = np.minimum(fwd, rev)
    return canon[ok]


@dataclass
class KmerCounts:
    """Counted k-mer set: sorted unique canonical codes + counts."""

    k: int
    kmers: np.ndarray  # uint64, ascending
    counts: np.ndarray  # int64

    @property
    def n_distinct(self) -> int:
        return len(self.kmers)

    @property
    def n_total(self) -> int:
        return int(self.counts.sum())

    def histogram(self) -> tuple[np.ndarray, np.ndarray]:
        """(count value ascending, #distinct kmers with that count)."""
        vals, occ = np.unique(self.counts, return_counts=True)
        return vals, occ

    def threshold_distinct(self, frac: float) -> int:
        """Count threshold covering `frac` of distinct k-mers
        (reference merylOp-nextMer.C:103-115)."""
        vals, occ = self.histogram()
        target = int(frac * self.n_distinct)
        acc = np.cumsum(occ)
        idx = int(np.searchsorted(acc, target))
        if idx >= len(vals):
            idx = len(vals) - 1
        return int(vals[idx])

    def threshold_word_freq(self, frac: float) -> int:
        """(reference merylOp-nextMer.C:117-119)"""
        return int(frac * self.n_total)

    # ---- set filters (reference merylOp.H:32-74 subset) ----

    def greater_than(self, x: int) -> "KmerCounts":
        m = self.counts > x
        return KmerCounts(self.k, self.kmers[m], self.counts[m])

    def less_than(self, x: int) -> "KmerCounts":
        m = self.counts < x
        return KmerCounts(self.k, self.kmers[m], self.counts[m])

    def at_least(self, x: int) -> "KmerCounts":
        m = self.counts >= x
        return KmerCounts(self.k, self.kmers[m], self.counts[m])

    def at_most(self, x: int) -> "KmerCounts":
        m = self.counts <= x
        return KmerCounts(self.k, self.kmers[m], self.counts[m])

    def equal_to(self, x: int) -> "KmerCounts":
        m = self.counts == x
        return KmerCounts(self.k, self.kmers[m], self.counts[m])

    def not_equal_to(self, x: int) -> "KmerCounts":
        m = self.counts != x
        return KmerCounts(self.k, self.kmers[m], self.counts[m])

    def decode(self, code: int) -> str:
        out = []
        for j in range(self.k - 1, -1, -1):
            out.append(_DECODE[(code >> (2 * j)) & 3])
        return "".join(out)

    def print_lines(self):
        """meryl `print` text form: 'KMER<TAB>count', ascending code order."""
        for code, cnt in zip(self.kmers.tolist(), self.counts.tolist()):
            yield f"{self.decode(code)}\t{cnt}"

    # ---- persistence: the real meryl v1 on-disk DB container, readable
    # by (and from) the reference meryl tools; legacy .npz DBs still load.

    def save(self, path: str) -> None:
        from .meryldb import write_meryl_db

        write_meryl_db(path, self.k, self.kmers, self.counts)

    @staticmethod
    def load(path: str) -> "KmerCounts":
        from .meryldb import is_meryl_db, read_meryl_db

        if is_meryl_db(path):
            k, kmers, counts = read_meryl_db(path)
            order = np.argsort(kmers)
            return KmerCounts(k, kmers[order], counts[order])
        f = np.load(os.path.join(path, "counts.npz"))
        return KmerCounts(int(f["k"]), f["kmers"], f["counts"])

    # ---- streaming set algebra with other databases ----

    def union_sum(self, other: "KmerCounts") -> "KmerCounts":
        ks = np.concatenate([self.kmers, other.kmers])
        cs = np.concatenate([self.counts, other.counts])
        order = np.argsort(ks, kind="stable")
        ks, cs = ks[order], cs[order]
        uk, start = np.unique(ks, return_index=True)
        sums = np.add.reduceat(cs, start)
        return KmerCounts(self.k, uk, sums)

    def intersect_min(self, other: "KmerCounts") -> "KmerCounts":
        common, ia, ib = np.intersect1d(
            self.kmers, other.kmers, assume_unique=True, return_indices=True
        )
        return KmerCounts(self.k, common, np.minimum(self.counts[ia], other.counts[ib]))

    def subtract(self, other: "KmerCounts") -> "KmerCounts":
        """counts minus other's counts, dropping non-positive."""
        idx = np.searchsorted(other.kmers, self.kmers)
        idxc = np.minimum(idx, max(len(other.kmers) - 1, 0))
        if len(other.kmers):
            hit = (idx < len(other.kmers)) & (other.kmers[idxc] == self.kmers)
            sub = np.where(hit, other.counts[idxc], 0)
        else:
            sub = np.zeros(len(self.kmers), dtype=np.int64)
        c = self.counts - sub
        m = c > 0
        return KmerCounts(self.k, self.kmers[m], c[m])

    def difference(self, other: "KmerCounts") -> "KmerCounts":
        """kmers present here but absent from other."""
        if len(other.kmers) == 0:
            return KmerCounts(self.k, self.kmers.copy(), self.counts.copy())
        idx = np.searchsorted(other.kmers, self.kmers)
        idxc = np.minimum(idx, len(other.kmers) - 1)
        hit = (idx < len(other.kmers)) & (other.kmers[idxc] == self.kmers)
        return KmerCounts(self.k, self.kmers[~hit], self.counts[~hit])


def count_kmers(records, k: int, use_device: bool = False) -> KmerCounts:
    """Count canonical k-mers over sequence records."""
    if use_device:
        from .device import count_kmers_device

        return count_kmers_device(records, k)
    chunks = [seq_to_kmers(rec.seq, k) for rec in records]
    if chunks:
        allk = np.concatenate(chunks)
    else:
        allk = np.zeros(0, dtype=np.uint64)
    allk.sort(kind="stable")
    uk, counts = np.unique(allk, return_counts=True)
    return KmerCounts(k, uk, counts.astype(np.int64))


def lookup(counts: KmerCounts, seq: bytes) -> np.ndarray:
    """Per-k-mer counts of a query sequence (meryl-lookup equivalent,
    reference ext/meryl/src/meryl-lookup)."""
    codes = seq_to_kmers(seq, counts.k)
    idx = np.searchsorted(counts.kmers, codes)
    idxc = np.minimum(idx, max(len(counts.kmers) - 1, 0))
    if len(counts.kmers) == 0:
        return np.zeros(len(codes), dtype=np.int64)
    hit = (idx < len(counts.kmers)) & (counts.kmers[idxc] == codes)
    return np.where(hit, counts.counts[idxc], 0)
