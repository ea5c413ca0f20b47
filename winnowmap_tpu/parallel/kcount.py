"""Multi-device k-mer counting: data-parallel device blocks + rank merge.

Block streaming (kcount/device.py) makes counting embarrassingly parallel:
every fixed-size base-code block is an independent roll->sort->RLE unit, so
blocks round-robin over the local device mesh and run concurrently (jax
dispatch is async; each device owns its compiled executable).  Per-device
sorted runs then reduce with the same chunked two-pointer merge the
out-of-core counter uses — the counting analogue of the mapper's shard +
rank-merge pattern (reference template: 64-way file-slice OpenMP loop,
ext/meryl/src/meryl/meryl.C:253-262, and the sort+dump+merge batching of
merylOp-count.C:577-644).

Output is byte-identical to the host counter for any device count
(tests/test_multidev.py::test_multidev_kcount_parity).
"""
from __future__ import annotations

import numpy as np

from ..kcount import KmerCounts
from ..kcount import device as _kdev
from ..kcount.device import _compiled_count_block, iter_code_blocks
from ..kcount.outofcore import _Run, _merge_two

_MERGE_CHUNK = 1 << 22


def _reduce_runs(runs: list[_Run]) -> KmerCounts | None:
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            nxt.append(_merge_two(runs[i], runs[i + 1], None, _MERGE_CHUNK))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return runs[0] if runs else None


def count_kmers_multidev(records, k: int, direction: str = "canonical",
                         devices=None) -> KmerCounts:
    """Count k-mers with blocks sharded round-robin over `devices`
    (default: all local JAX devices)."""
    import jax

    from .. import pin_jax_platforms

    pin_jax_platforms()  # hang-proof vs a down TPU tunnel
    if devices is None:
        devices = jax.devices()
    n_dev = max(1, len(devices))
    BLOCK = _kdev.BLOCK  # module attribute at call time (tests patch it)
    run_block = _compiled_count_block(k, BLOCK, direction)

    # pipeline: dispatch one block per device, collect in dispatch order
    # (device execution overlaps host streaming + collection)
    inflight: list[tuple] = []
    per_dev_runs: list[list[_Run]] = [[] for _ in range(n_dev)]

    def collect(slot):
        d, uniq, counts, n_seg = slot
        n = int(n_seg)
        if n:
            per_dev_runs[d].append(
                _Run(np.asarray(uniq)[:n],
                     np.asarray(counts, np.int64)[:n], None))

    d = 0
    for buf in iter_code_blocks(records, k):
        if len(buf) < k:
            continue
        if len(buf) < BLOCK:
            pad = np.full(BLOCK, 255, np.uint8)
            pad[:len(buf)] = buf
            buf = pad
        dev_buf = jax.device_put(buf, devices[d])
        uniq, counts, n_seg = run_block(dev_buf)
        inflight.append((d, uniq, counts, n_seg))
        if len(inflight) > 2 * n_dev:
            collect(inflight.pop(0))
        d = (d + 1) % n_dev
    for slot in inflight:
        collect(slot)

    # per-device partial reduce, then cross-device rank merge
    partials = [r for rs in per_dev_runs for r in ([_reduce_runs(rs)]
                                                   if rs else [])]
    total = _reduce_runs(partials)
    if total is None:
        return KmerCounts(k, np.zeros(0, np.uint64), np.zeros(0, np.int64))
    return KmerCounts(k, np.asarray(total.kmers), np.asarray(total.counts))
