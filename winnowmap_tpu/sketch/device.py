"""Device weighted-minimizer sketch.

TPU re-expression of the weighted-minimizer scan (reference
src/sketch.c:128-219 + applyWeight src/sketch.c:70-89; host oracle
native/src/wm_sketch.cpp).  The per-base heavy lifting runs vectorized on
the device under a scoped x64 context: nt4 decode, HPC run compaction,
rolling forward/reverse k-mers (k shifted-term sums), and the MurmurHash3
finalizer.  The selection tail -- the (tiny) down-weight-set membership,
IEEE-double weight ordering, and the robust-winnowing window automaton,
which is inherently sequential and O(few ops)/base -- runs in numpy f64
(bit-identical to the C++ doubles) and a 40-line native automaton
(wm_winnow), so minimizer sets are byte-identical to the oracle
(asserted by tests/test_sketch.py::test_device_sketch_parity).

Production wiring: index construction (index/build.py) routes genome-scale
sketching through this path when a device is present.
"""
from __future__ import annotations

import functools

import numpy as np

_NT4 = np.full(256, 4, np.uint8)
for _b, _v in zip(b"AaCcGgTtUu", [0, 0, 1, 1, 2, 2, 3, 3, 3, 3]):
    _NT4[_b] = _v


@functools.lru_cache(maxsize=8)
def _compiled_transform(k: int, is_hpc: bool):
    import jax
    import jax.numpy as jnp

    def xform(codes):
        # codes: (n,) uint8 0..4 (already HPC-compacted when is_hpc; the
        # span/ambiguity bookkeeping is host-side)
        n = codes.shape[0]
        c = codes.astype(jnp.uint64)
        # rolling k-mers as k shifted-term sums: f_i = sum_j c[i-j] << 2j
        mask = jnp.uint64((1 << (2 * k)) - 1)
        f = jnp.zeros(n, jnp.uint64)
        r = jnp.zeros(n, jnp.uint64)
        cc = jnp.where(c < 4, c, 0)
        rc = jnp.where(c < 4, jnp.uint64(3) ^ cc, 0)
        for j in range(k):
            # c[i-j] contributes << 2j to f_i ; (3^c[i-j]) << 2(k-1-j) to r_i
            shifted = jnp.roll(cc, j)
            shifted = shifted.at[:j].set(0) if j else shifted
            f = f + (shifted << jnp.uint64(2 * j))
            sr = jnp.roll(rc, j)
            sr = sr.at[:j].set(0) if j else sr
            r = r + (sr << jnp.uint64(2 * (k - 1 - j)))
        f = f & mask
        r = r & mask
        sym = f == r
        z = jnp.where(f < r, 0, 1).astype(jnp.uint64)
        canon = jnp.where(f < r, f, r)
        # MurmurHash3 finalizer (reference sketch.c:43-51)
        h = canon
        h = h ^ (h >> jnp.uint64(33))
        h = h * jnp.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> jnp.uint64(33))
        h = h * jnp.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> jnp.uint64(33))
        # invertible mix for the stored key (reference sketch.c:53-63)
        key = canon
        key = (~key + (key << jnp.uint64(21))) & mask
        key = key ^ (key >> jnp.uint64(24))
        key = ((key + (key << jnp.uint64(3))) + (key << jnp.uint64(8))) & mask
        key = key ^ (key >> jnp.uint64(14))
        key = ((key + (key << jnp.uint64(2))) + (key << jnp.uint64(4))) & mask
        key = key ^ (key >> jnp.uint64(28))
        key = (key + (key << jnp.uint64(31))) & mask
        return key, h, z, sym, canon

    return jax.jit(xform)


def _transform_device(codes: np.ndarray, wset: np.ndarray, k: int,
                      is_hpc: bool, bloom=None):
    import jax

    with jax.enable_x64():
        fn = _compiled_transform(k, is_hpc)
        key, h, z, sym, canon = fn(codes)
        # membership against the (small) sorted down-weight set runs on the
        # host: TPU gathers over tens of millions of dynamic indices are
        # orders slower than a vectorized numpy searchsorted
        canon = np.asarray(canon)
        if bloom is not None:
            # --bloom-filter parity mode: vectorized AP-hash double probe
            # into the reference-exact bit table (wm_bloom.cpp semantics)
            table, bits, s0, s1 = bloom
            flagged = _bloom_contains_np(canon, table, bits, s0, s1)
        elif len(wset):
            ws = np.ascontiguousarray(wset, np.uint64)
            idx = np.searchsorted(ws, canon)
            idxc = np.minimum(idx, len(ws) - 1)
            flagged = ws[idxc] == canon
        else:
            flagged = np.zeros(len(canon), bool)
        return (np.asarray(key), np.asarray(h), np.asarray(z),
                np.asarray(sym), flagged)


def _bloom_contains_np(keys: np.ndarray, table: np.ndarray, bits: int,
                       s0: int, s1: int) -> np.ndarray:
    """Vectorized wm_bloom_contains (reference bloom_filter.hpp hash_ap +
    compute_indices over the 8 LE bytes of each canonical code)."""
    i1 = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    i2 = (keys >> np.uint64(32)).astype(np.uint32)
    out = np.ones(len(keys), bool)
    for salt in (np.uint32(s0), np.uint32(s1)):
        h = np.full(len(keys), salt, np.uint32)
        h ^= ((h << np.uint32(7)) ^ (i1 * (h >> np.uint32(3)))
              ^ (~((h << np.uint32(11)) + (i2 ^ (h >> np.uint32(5))))))
        b = h.astype(np.uint64) % np.uint64(bits)
        out &= (table[(b >> np.uint64(3)).astype(np.int64)]
                >> (b & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return out


def sketch_device(seq: bytes, w: int, k: int, rid: int, is_hpc: bool,
                  wset: np.ndarray, bloom=None):
    """Sketch one sequence with the device transform + native winnowing
    automaton.  Returns (x, y) uint64 arrays identical to native.sketch."""
    from .. import native

    n = len(seq)
    if n <= 0 or w <= 0 or w >= 256 or k <= 0 or k > 28:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    codes_full = _NT4[np.frombuffer(seq, np.uint8)]

    if is_hpc:
        # compact homopolymer runs of VALID bases; ambiguous bases stay
        # (they reset the window).  skip_len = run length of the kept base.
        prev = np.concatenate([[255], codes_full[:-1]])
        keep = (codes_full != prev) | (codes_full >= 4)
        pos_all = np.nonzero(keep)[0]
        codes = codes_full[pos_all]
        run_end = np.concatenate([pos_all[1:], [n]])
        skip_len = (run_end - pos_all).astype(np.int64)
        # reference reports the position of the run END (i after the jump)
        base_pos = (run_end - 1).astype(np.int64)
        # kmer_span = sliding sum of the last k skip_lens within a segment;
        # the native automaton recomputes it from skip_len (matching the
        # oracle's tiny ring queue), so just pass skip_len through
    else:
        codes = codes_full
        skip_len = np.ones(len(codes), np.int64)
        base_pos = np.arange(len(codes), dtype=np.int64)

    key, h, z, sym, flagged = _transform_device(codes, wset, k, is_hpc,
                                                bloom=bloom)

    # IEEE-double selection order, bit-identical to the oracle's
    # weight_order (numpy f64 ops == C doubles)
    x = h.astype(np.float64) / np.float64(np.uint64(0xFFFFFFFFFFFFFFFF))
    ordv = -x
    if flagged.any():
        xf = x[flagged]
        p2 = xf * xf
        p4 = p2 * p2
        ordv[flagged] = -(p4 * p4)

    return native.winnow(codes, key, z, sym, ordv, skip_len, base_pos,
                         w, k, rid, is_hpc)
