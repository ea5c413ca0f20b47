"""Minimizer index: sorted-array design (TPU-first re-expression of the
reference two-level bucket/hash index, src/index.c:33-105,200-257).

Instead of 2^14 buckets each holding a khash, the index is three flat arrays:
  keys  : unique minimizer keys, sorted ascending (uint64)
  start : offset of each key's occurrence run in ``pos``
  pos   : occurrence records y = rid<<32|lastpos<<1|strand, sorted ascending
          within each run (matches reference radix_sort_64 of the p[] span,
          src/index.c:239)
Lookup is a batched binary search -- on device this is a vectorized
searchsorted over the whole anchor batch instead of per-key hash probes.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .. import native
from ..io.seqcode import encode
from ..utils.log import phase_log


@dataclass
class SeqMeta:
    name: str
    offset: int
    length: int


@dataclass
class MinimizerIndex:
    w: int
    k: int
    flag: int = 0
    seqs: list[SeqMeta] = field(default_factory=list)
    # flat sorted index arrays
    keys: np.ndarray = None  # uint64, unique minimizer keys (hash part, x>>8)
    start: np.ndarray = None  # int64 run starts into pos (len = len(keys)+1)
    pos: np.ndarray = None  # uint64 occurrence records (y layout)
    # packed reference: 0..4 codes concatenated over all sequences
    codes: np.ndarray = None  # uint8
    # exact down-weighted k-mer set (sorted canonical codes)
    wset: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint64))
    # --bloom-filter strict-parity mode: (table u8, table_bits, salt0,
    # salt1) emulating the reference's bloom membership incl. its false
    # positives (wm_bloom.cpp; reference src/index.c:410-437).  None =
    # exact-set membership (our default: no FPs, better weighting).
    bloom: tuple | None = None
    index_part: int = 0
    # per-rid splice-junction intervals (reference mm_idx_intv_t, loaded
    # from BED via read_bed): dict rid -> (st, en, strand) int64 arrays
    intervals: dict = field(default_factory=dict)

    @property
    def n_seq(self) -> int:
        return len(self.seqs)

    def name_to_rid(self) -> dict[str, int]:
        return {s.name: i for i, s in enumerate(self.seqs)}

    # ---- queries -------------------------------------------------------

    def get(self, key: int) -> np.ndarray:
        """All occurrences of one minimizer key (reference mm_idx_get,
        src/index.c:88-105)."""
        i = np.searchsorted(self.keys, np.uint64(key))
        if i >= len(self.keys) or self.keys[i] != np.uint64(key):
            return self.pos[0:0]
        return self.pos[self.start[i]:self.start[i + 1]]

    def get_batch(self, query_keys: np.ndarray):
        """Vectorized lookup; returns (found_mask, run_start, run_cnt)."""
        idx = np.searchsorted(self.keys, query_keys)
        idx_c = np.minimum(idx, len(self.keys) - 1) if len(self.keys) else idx
        found = (
            (idx < len(self.keys)) & (self.keys[idx_c] == query_keys)
            if len(self.keys)
            else np.zeros(len(query_keys), bool)
        )
        rs = np.where(found, self.start[idx_c], 0)
        rc = np.where(found, self.start[np.minimum(idx_c + 1, len(self.start) - 1)] - self.start[idx_c], 0)
        return found, rs, rc

    def getseq(self, rid: int, st: int, en: int) -> np.ndarray:
        """Reference segment as 0..4 codes (reference mm_idx_getseq,
        src/index.c:161-171)."""
        s = self.seqs[rid]
        en = min(en, s.length)
        return self.codes[s.offset + st : s.offset + en]

    def cal_max_occ(self, f: float) -> int:
        """Occurrence-count quantile (reference mm_idx_cal_max_occ,
        src/index.c:173-194): the ((1-f)*n)-th smallest count + 1."""
        if f <= 0.0:
            return 2**31 - 1
        cnt = np.diff(self.start).astype(np.uint32)
        if len(cnt) == 0:
            return 2**31 - 1
        kk = int((1.0 - f) * len(cnt))
        kk = min(max(kk, 0), len(cnt) - 1)
        return int(np.partition(cnt, kk)[kk]) + 1

    def stat_line(self) -> str:
        n = len(self.keys)
        if n == 0:
            return "empty index"
        cnt = np.diff(self.start)
        n1 = int((cnt == 1).sum())
        tot_len = sum(s.length for s in self.seqs)
        return (
            f"distinct minimizers: {n} ({100.0 * n1 / n:.2f}% are singletons); "
            f"average occurrences: {cnt.mean():.3f}; "
            f"average spacing: {tot_len / cnt.sum():.3f}"
        )


def read_bed(mi: MinimizerIndex, path: str, read_junc: bool = True) -> None:
    """Load splice junctions from BED6/BED12 (reference mm_idx_read_bed,
    src/index.c:690-777): BED12 blocks become the *introns* between blocks;
    simple BED lines are taken as intervals directly."""
    name2rid = mi.name_to_rid()
    per = {}
    with open(path) as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 3 or cols[0] not in name2rid:
                continue
            rid = name2rid[cols[0]]
            st, en = int(cols[1]), int(cols[2])
            if st < 0 or st >= en:
                continue
            strand = 0
            if len(cols) >= 6:
                strand = 1 if cols[5] == "+" else -1 if cols[5] == "-" else 0
            lst = per.setdefault(rid, [])
            if read_junc and len(cols) >= 12 and cols[9].isdigit():
                n_blk = int(cols[9])
                sizes = [int(x) for x in cols[10].rstrip(",").split(",")]
                starts = [int(x) for x in cols[11].rstrip(",").split(",")]
                en_b = st + starts[0] + sizes[0]
                for i in range(1, n_blk):
                    s_, e_ = en_b, st + starts[i]
                    en_b = st + starts[i] + sizes[i]
                    if e_ > s_:
                        lst.append((s_, e_, strand))
            else:
                lst.append((st, en, strand))
    for rid, lst in per.items():
        lst.sort(key=lambda t: t[0])
        a = np.array(lst, np.int64).reshape(-1, 3)
        mi.intervals[rid] = (a[:, 0], a[:, 1], a[:, 2])


def bed_junc(mi: MinimizerIndex, rid: int, st: int, en: int):
    """Per-base junction flags over [st, en) (reference mm_idx_bed_junc,
    src/index.c:780-803): donor/acceptor bits by annotated strand."""
    out = np.zeros(en - st, np.uint8)
    iv = mi.intervals.get(rid)
    if iv is None:
        return out
    ist, ien, istr = iv
    m = (ist >= st) & (ien <= en) & (istr != 0)
    for s_, e_, sd in zip(ist[m].tolist(), ien[m].tolist(),
                          istr[m].tolist()):
        if sd > 0:
            out[s_ - st] |= 1
            out[e_ - 1 - st] |= 2
        else:
            out[s_ - st] |= 8
            out[e_ - 1 - st] |= 4


    return out


def load_weight_bloom(path: str | None, k: int) -> tuple | None:
    """Load a meryl-style k-mer list into a reference-exact bloom filter
    (strict-parity mode; reference src/index.c:410-437: projected =
    max(n, 1000), p = 0.001, <= 2 hashes).  Returns (table u8 array,
    table_bits, salt0, salt1), or None for no list."""
    import ctypes

    if not path:
        return None
    codes = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            kmer = parts[0]
            if len(kmer) != k:
                raise ValueError(
                    f"k-mer list {path} has k={len(kmer)}, expected {k}")
            codes.append(native.encode_kmer(kmer.encode()))
    arr = np.array(codes, dtype=np.uint64)
    L = native.lib()
    bits = ctypes.c_uint64()
    s0 = ctypes.c_uint32()
    s1 = ctypes.c_uint32()
    L.wm_bloom_params(max(len(arr), 1), ctypes.byref(bits), ctypes.byref(s0),
                      ctypes.byref(s1))
    table = np.zeros(int(bits.value) // 8, np.uint8)
    if len(arr):
        L.wm_bloom_build(np.ascontiguousarray(arr), len(arr),
                         bits.value, s0.value, s1.value, table)
    return (table, int(bits.value), int(s0.value), int(s1.value))


def load_weight_set(path: str | None, k: int) -> np.ndarray:
    """Read a meryl-style 'KMER<TAB>count' list into a sorted canonical-code
    array (reference reads it into a bloom filter, src/index.c:388-437; we
    keep the exact set)."""
    if not path:
        return np.zeros(0, dtype=np.uint64)
    codes = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            kmer = parts[0]
            if len(kmer) != k:
                raise ValueError(
                    f"input list of k-mers (len {len(kmer)}) and parameter k={k} "
                    "are inconsistent"
                )
            codes.append(native.encode_kmer(kmer.encode()))
    return np.sort(np.array(codes, dtype=np.uint64))


def build_index(
    records,
    w: int,
    k: int,
    flag: int = 0,
    weight_set: np.ndarray | None = None,
    is_hpc: bool = False,
    weight_bloom: tuple | None = None,
) -> MinimizerIndex:
    """Build the flat sorted index from SeqRecords (reference mm_idx_gen +
    mm_idx_post, src/index.c:289-360,200-257).  weight_bloom selects the
    reference-exact bloom membership (load_weight_bloom)."""
    mi = MinimizerIndex(w=w, k=k, flag=flag)
    if weight_set is not None:
        mi.wset = weight_set
    mi.bloom = weight_bloom
    xs, ys = [], []
    total = 0
    for rid, rec in enumerate(records):
        mi.seqs.append(SeqMeta(rec.name, total, len(rec.seq)))
        total += len(rec.seq)
    import os

    from ..map.batch import _use_device

    # genome-scale sketching routes through the device kernel (murmur,
    # membership, k-mer roll on the TPU -- sketch/device.py) when a device
    # is present; the native oracle is the fallback and the differential
    # (identical output, tests/test_sketch.py::test_device_sketch_parity)
    use_dev = (_use_device()
               and os.environ.get("WM_NO_DEV_SKETCH", "") == ""
               and total >= 1_000_000)
    if use_dev:
        from ..sketch.device import sketch_device as _sketch
    else:
        _sketch = native.sketch
    codes = np.empty(total, dtype=np.uint8)
    for rid, rec in enumerate(records):
        s = mi.seqs[rid]
        codes[s.offset : s.offset + s.length] = encode(rec.seq)
        if s.length > 0:
            x, y = _sketch(rec.seq, w, k, rid, is_hpc, mi.wset,
                           bloom=mi.bloom)
            xs.append(x)
            ys.append(y)
    mi.codes = codes
    if xs:
        x = np.concatenate(xs)
        y = np.concatenate(ys)
    else:
        x = np.zeros(0, np.uint64)
        y = np.zeros(0, np.uint64)
    keys = x >> np.uint64(8)
    # group by key, occurrences sorted by y (stable two-key sort)
    order = np.lexsort((y, keys))
    keys = keys[order]
    y = y[order]
    uniq, start_idx = np.unique(keys, return_index=True)
    mi.keys = uniq
    mi.start = np.append(start_idx, len(keys)).astype(np.int64)
    mi.pos = y
    return mi
