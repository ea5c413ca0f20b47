"""Multi-chip / multi-host scaling (TPU-native replacement for the
reference's single-node parallelism and multi-part index machinery).

The reference scales by pthread work-stealing over reads
(src/kthread.c:30-72) and by splitting oversized references into index
parts whose per-part hits are merged by rank (src/map.c:1050-1105,
src/splitidx.c).  On TPU pods the natural equivalents are:

* data parallelism over reads: each process (host) maps a deterministic
  strided shard of the input; within a host, the batch scheduler keeps the
  local chip's DP pipeline full (map/batch.py).  Output order is restored
  by a rank-merge identical in spirit to the reference's --split-prefix
  merge.
* replicated or sharded index: the minimizer index is replicated per host
  (it is read-only); for indexes larger than HBM/host memory the bucket
  ranges are sharded and candidate hits all-gathered (future round).
* global statistics ride the ICI/DCN collectives: the occurrence-count
  quantile that sets mid_occ (reference mm_idx_cal_max_occ,
  src/index.c:173-194) needs the *global* histogram when the index is
  sharded -- psum over the mesh.
"""
from __future__ import annotations

import os

import numpy as np


def init_distributed() -> tuple[int, int]:
    """Initialize jax.distributed from the standard env (JAX_COORDINATOR /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) and return (process_id, n_processes).
    Single-process when unset."""
    import jax

    coord = os.environ.get("JAX_COORDINATOR")
    n = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if coord and n > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n, process_id=pid)
    return pid, n


def shard_reads(n_reads: int, process_id: int, n_processes: int) -> np.ndarray:
    """Deterministic strided read shard for one process (data parallelism
    over reads; the reference's analogue is kt_for task striding,
    src/kthread.c:38-45)."""
    return np.arange(process_id, n_reads, n_processes)


def merge_parts(out, part_paths: list[str]) -> None:
    """Rank-merge per-process output parts back into read order (reference
    --split-prefix merge, src/map.c:1278-1321 / src/splitidx.c).  Each part
    holds lines prefixed with the read rank as '<rank>\\t<line>'."""
    import heapq

    files = [open(p) for p in part_paths]

    def gen(f):
        for line in f:
            rank, _, rest = line.partition("\t")
            yield int(rank), rest

    for _, rest in heapq.merge(*(gen(f) for f in files)):
        out.write(rest)
    for f in files:
        f.close()


def global_occ_quantile(mi, f: float, axis_name: str | None = None) -> int:
    """mid_occ quantile over the *global* index when bucket-sharded across a
    mesh (reference mm_idx_cal_max_occ, src/index.c:173-194, computed from
    a psum'd occurrence histogram instead of a local partial sort)."""
    import jax
    import jax.numpy as jnp

    if f <= 0.0:
        return 2**31 - 1
    cnt = np.diff(mi.start).astype(np.int64)
    if len(cnt) == 0:
        return 2**31 - 1
    # histogram of occurrence counts: exact buckets below MAXC, log2-spaced
    # sub-buckets (8 per octave) for the tail so highly repetitive indexes
    # whose quantile exceeds MAXC-1 still resolve to within ~9%
    MAXC = 1 << 16
    N_TAIL = 8 * (31 - 16)  # octaves [2^16, 2^31), 8 sub-buckets each
    big = cnt >= MAXC
    bucketed = cnt.copy()
    if big.any():
        lg = np.log2(cnt[big].astype(np.float64) / MAXC)
        bucketed[big] = MAXC + np.minimum((lg * 8).astype(np.int64),
                                          N_TAIL - 1)
    local = np.bincount(bucketed, minlength=MAXC + N_TAIL)
    if axis_name is not None:
        hist = jax.lax.psum(jnp.asarray(local), axis_name)
        hist = np.asarray(hist)
        n = int(hist.sum())
    else:
        hist = local
        n = len(cnt)
    kk = int((1.0 - f) * n)
    kk = min(max(kk, 0), n - 1)
    if axis_name is None:
        # single-shard: exact, matching mm_idx_cal_max_occ's partial sort
        return int(np.partition(cnt, kk)[kk]) + 1
    csum = np.cumsum(hist)
    v = int(np.searchsorted(csum, kk + 1))
    if v >= MAXC:  # tail bucket: upper edge of the log2 sub-bucket
        v = int(MAXC * 2.0 ** ((v - MAXC + 1) / 8.0))
    return v + 1


def map_file_sharded(mi, opt, path: str, part_path: str, process_id: int,
                     n_processes: int, batched: bool = True) -> int:
    """Map this process's read shard, writing rank-prefixed lines to
    part_path for merge_parts.  Returns reads processed locally."""
    from ..io import paf as pafmod
    from ..io import sam as sammod
    from ..io.fastx import read_all
    from ..map.batch import map_batch
    from ..map.frag import map_one
    from ..map.pipeline import _write_read
    from ..options import MM_F_OUT_SAM

    records = read_all(path)
    order = shard_reads(len(records), process_id, n_processes)
    shard = [records[i] for i in order]
    for rank, rec in zip(order, shard):
        rec.rid = int(rank)
    if batched:
        results = map_batch(mi, opt, [r.seq for r in shard],
                            [r.name for r in shard])
    else:
        results = [map_one(mi, opt, r.seq, r.name) for r in shard]

    class _RankOut:
        def __init__(self, f, rank):
            self.f = f
            self.rank = rank

        def write(self, s):
            for line in s.splitlines():
                self.f.write(f"{self.rank}\t{line}\n")

    with open(part_path, "w") as f:
        for rank, rec, res in zip(order, shard, results):
            _write_read(mi, opt, rec, res, _RankOut(f, int(rank)))
    return len(shard)
