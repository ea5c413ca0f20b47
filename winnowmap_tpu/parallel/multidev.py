"""Data-parallel mapping over the local device mesh.

The production multi-chip driver: a read batch is split into per-device
shards, each shard runs through its OWN native C++ map engine whose DP
jobs dispatch to that device's Pallas kernels (map/engine.py with pinned
PoolContext), and the per-shard results are rank-merged back into input
order.  This is the TPU-native equivalent of the reference's two scaling
mechanisms -- kt_for work-stealing over reads (src/kthread.c:30-72) and
the multi-part rank merge (src/map.c:1050-1105): here the "parts" are
device shards and the merge is the deterministic inverse of the strided
shard assignment, so output is byte-identical to a single-device run.

Driver threads are host-side only (one per device, pumping its engine's
job exchange); the per-read compute runs in the engine's own C++ threads
and on the device.  Multi-HOST scaling composes on top: each process maps
its process-level shard with this driver over its local devices
(parallel/__init__.py shard_reads + merge_parts).
"""
from __future__ import annotations

import threading

from ..map.frag import MapResult


def shard_indices(n_reads: int, n_shards: int) -> list[list[int]]:
    """Strided shard assignment (deterministic; matches shard_reads)."""
    return [list(range(d, n_reads, n_shards)) for d in range(n_shards)]


def map_batch_multidev(mi, opt, seqs, qnames, devices=None,
                       engine=True) -> list[MapResult]:
    """Map a read batch data-parallel over `devices` (default: all local
    JAX devices), one native engine + device kernel pipeline per device.
    Byte-identical to the single-device engine path by construction (each
    read's processing is independent and identical; only the grouping into
    device calls changes, and the kernels are bit-exact for any grouping).
    """
    import jax

    from ..map.engine import map_batch_engine

    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    n = len(seqs)
    if n_dev <= 1 or n < 2:
        return map_batch_engine(mi, opt, seqs, qnames)

    shards = shard_indices(n, n_dev)
    results: list[MapResult | None] = [None] * n
    errors: list[BaseException] = []

    def run_shard(d: int, idxs: list[int]) -> None:
        try:
            sub = map_batch_engine(
                mi, opt, [seqs[i] for i in idxs], [qnames[i] for i in idxs],
                device=devices[d])
            for i, r in zip(idxs, sub):
                results[i] = r
        except BaseException as e:  # surfaced after join
            errors.append(e)

    threads = [threading.Thread(target=run_shard, args=(d, idxs),
                                name=f"wm-dev{d}")
               for d, idxs in enumerate(shards) if idxs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return results  # type: ignore[return-value]
