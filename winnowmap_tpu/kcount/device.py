"""Device (TPU) k-mer counting: 2-bit pack -> canonical roll -> device sort
-> device run-length-encode, replacing meryl's threaded bucket machinery
with a sort-based formulation that XLA vectorizes (reference design target:
ext/meryl/src/meryl/merylOp-count*.C, merylCountArray.C).

Pipeline shape: base codes from ALL records stream into fixed-size blocks
(padded with sentinel codes so every call shares one compiled shape); each
block runs ONE jitted roll->sort->RLE on device and returns a sorted unique
(kmers, counts) run; runs merge host-side with the same chunked two-pointer
merge the out-of-core counter uses.  Multi-device: blocks are data-parallel
units — `count_kmers_multidev` (parallel/kcount.py) round-robins them over
the local device mesh and rank-merges the per-device runs.
"""
from __future__ import annotations

import functools

import numpy as np

from . import MERYL_CODE, KmerCounts

# codes per device block (two u64 rolls + sort scratch ~48 B/code transient)
BLOCK = 4 << 20
SENTINEL = 0xFFFFFFFFFFFFFFFF


@functools.lru_cache(maxsize=8)
def _compiled_count_block(k: int, n_block: int, direction: str):
    import jax
    import jax.numpy as jnp

    from .. import pin_jax_platforms

    pin_jax_platforms()  # hang-proof vs a down TPU tunnel (see helper)

    def block(codes):
        n = n_block - k + 1
        c = codes.astype(jnp.uint64)
        valid = codes != 255
        fwd = jnp.zeros(n, dtype=jnp.uint64)
        rev = jnp.zeros(n, dtype=jnp.uint64)
        ok = jnp.ones(n, dtype=bool)
        for j in range(k):
            if direction != "reverse":
                fwd = (fwd << 2) | c[j:j + n]
            if direction != "forward":
                rev = rev | ((c[j:j + n] ^ jnp.uint64(2))
                             << jnp.uint64(2 * j))
            ok = ok & valid[j:j + n]
        if direction == "forward":
            km = fwd
        elif direction == "reverse":
            km = rev
        else:
            km = jnp.minimum(fwd, rev)
        km = jnp.where(ok, km, jnp.uint64(SENTINEL))
        s = jnp.sort(km)
        # device run-length encode: boundary flags -> segment ids -> counts
        prev = jnp.concatenate([jnp.full(1, SENTINEL + 0, jnp.uint64) ^ s[:1],
                                s[:-1]])
        new = s != prev
        new = new.at[0].set(True)
        live = s != jnp.uint64(SENTINEL)
        seg = jnp.cumsum(new.astype(jnp.int32)) - 1
        n_seg = jnp.where(live, seg, -1).max() + 1
        counts = jax.ops.segment_sum(live.astype(jnp.int64), seg,
                                     num_segments=n)
        uniq = jnp.where(new, s, jnp.uint64(SENTINEL))
        uniq_sorted = jnp.sort(uniq)  # compact: uniques lead, sentinels tail
        # counts aligned to uniq_sorted: counts[i] belongs to the i'th
        # boundary in order, which is exactly ascending k-mer order
        return uniq_sorted, counts, n_seg

    jitted = jax.jit(block)

    def run(codes):
        # u64 k-mer math needs x64, but ONLY inside this scope: a global
        # jax_enable_x64 flip would leak weak-typed int64 into every later
        # trace (it broke the extd traceback kernel's i32 shifts when the
        # device counter ran first in a process)
        with jax.enable_x64():
            return jitted(codes)

    return run


def iter_code_blocks(records, k: int, n_block: int | None = None):
    """Fixed-size base-code blocks spanning record boundaries, with k-1
    sentinel separators between records (a separator is an invalid code, so
    no cross-record k-mers form)."""
    if n_block is None:
        n_block = BLOCK  # module attribute at call time (tests patch it)
    buf = np.full(n_block, 255, np.uint8)
    fill = 0
    sep = np.full(k - 1, 255, np.uint8)
    for ri, rec in enumerate(records):
        codes = MERYL_CODE[np.frombuffer(rec.seq, dtype=np.uint8)]
        if ri > 0:
            codes = np.concatenate([sep, codes])
        o = 0
        while o < len(codes):
            take = min(len(codes) - o, n_block - fill)
            buf[fill:fill + take] = codes[o:o + take]
            fill += take
            o += take
            if fill == n_block:
                yield buf
                # windows spanning block boundaries: carry k-1 tail codes
                buf = np.full(n_block, 255, np.uint8)
                buf[:k - 1] = codes[o - (k - 1):o] if o >= k - 1 else 255
                fill = k - 1 if o >= k - 1 else 0
    if fill:
        yield buf[:fill]


def count_kmers_device(records, k: int,
                       direction: str = "canonical") -> KmerCounts:
    """Batched device k-mer counting (one compiled shape, block streaming).

    Parity: byte-identical counted sets vs the host counter
    (tests/test_kcount.py::test_device_counter_parity)."""
    from .outofcore import _Run, _merge_two

    run_block = _compiled_count_block(k, BLOCK, direction)
    runs = []
    for buf in iter_code_blocks(records, k):
        if len(buf) < k:
            continue
        if len(buf) < BLOCK:
            pad = np.full(BLOCK, 255, np.uint8)
            pad[:len(buf)] = buf
            buf = pad
        uniq, counts, n_seg = run_block(buf)
        n = int(n_seg)
        if n == 0:
            continue
        runs.append(_Run(np.asarray(uniq[:n]),
                         np.asarray(counts[:n], np.int64), None))
    if not runs:
        return KmerCounts(k, np.zeros(0, np.uint64), np.zeros(0, np.int64))
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            nxt.append(_merge_two(runs[i], runs[i + 1], None, 1 << 22))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return KmerCounts(k, np.asarray(runs[0].kmers),
                      np.asarray(runs[0].counts))
