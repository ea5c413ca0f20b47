"""Unit tests for the exact extension kernels (wm_extz/wm_extd/wm_sw_i16)."""
import numpy as np
import pytest

import winnowmap_tpu.native as native
from winnowmap_tpu.map.align import gen_simple_mat

MAT = gen_simple_mat(2, 4, 1)


def brute_force_global(q, t, a, b, gapo, gape, gapo2=None, gape2=None):
    """O(n*m) reference global aligner with (dual) affine gaps, int scoring."""
    INF = 10**9
    n, m = len(t), len(q)
    gapo2 = gapo if gapo2 is None else gapo2
    gape2 = gape if gape2 is None else gape2

    def gapcost(l):
        return min(gapo + l * gape, gapo2 + l * gape2)

    H = [[-INF] * (m + 1) for _ in range(n + 1)]
    H[0][0] = 0
    for i in range(1, n + 1):
        H[i][0] = -gapcost(i)
    for j in range(1, m + 1):
        H[0][j] = -gapcost(j)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = a if t[i - 1] == q[j - 1] else -b
            best = H[i - 1][j - 1] + s
            for l in range(1, i + 1):
                best = max(best, H[i - l][j] - gapcost(l))
            for l in range(1, j + 1):
                best = max(best, H[i][j - l] - gapcost(l))
            H[i][j] = best
    return H[n][m]


@pytest.mark.parametrize("seed", range(6))
def test_extd_matches_bruteforce_global(seed):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, size=30).astype(np.uint8)
    t = q.copy()
    # a few edits
    for _ in range(4):
        p = rng.integers(0, len(t))
        t[p] = rng.integers(0, 4)
    r = native.extd(q, t, MAT, 4, 2, 24, 1, -1, -1, -1, 0)
    expect = brute_force_global(list(q), list(t), 2, 4, 4, 2, 24, 1)
    assert r.score == expect
    # CIGAR must consume both sequences fully
    ql = sum(c >> 4 for c in r.cigar if (c & 0xF) in (0, 1))
    tl = sum(c >> 4 for c in r.cigar if (c & 0xF) in (0, 2))
    assert ql == len(q) and tl == len(t)


@pytest.mark.parametrize("seed", range(4))
def test_extz_matches_bruteforce_global(seed):
    rng = np.random.default_rng(100 + seed)
    q = rng.integers(0, 4, size=25).astype(np.uint8)
    t = q.copy()
    for _ in range(3):
        p = rng.integers(0, len(t))
        t[p] = rng.integers(0, 4)
    r = native.extz(q, t, MAT, 4, 2, -1, -1, -1, 0)
    expect = brute_force_global(list(q), list(t), 2, 4, 4, 2)
    assert r.score == expect


def test_extension_only_mode():
    # query is a prefix of target + garbage: extension should stop at max
    q = np.array([0, 1, 2, 3] * 5, dtype=np.uint8)
    t = np.concatenate([q, np.array([3, 3, 3, 3, 3, 3] * 10, dtype=np.uint8)]).astype(np.uint8)
    r = native.extd(q, t, MAT, 4, 2, 24, 1, 500, 400, -1, 0x40)
    assert r.mqe == 2 * len(q)
    # end_bonus=-1: reach_end needs mqe + end_bonus > max (ties lose)
    assert not r.reach_end and r.max == 2 * len(q)
    r2 = native.extd(q, t, MAT, 4, 2, 24, 1, 500, 400, 5, 0x40)
    assert r2.reach_end


def test_zdrop_truncates():
    rng = np.random.default_rng(7)
    left = rng.integers(0, 4, 200).astype(np.uint8)
    q = np.concatenate([left, rng.integers(0, 4, 200).astype(np.uint8)]).astype(np.uint8)
    t = np.concatenate([left, rng.integers(0, 4, 200).astype(np.uint8)]).astype(np.uint8)
    r = native.extd(q, t, MAT, 4, 2, 24, 1, 500, 100, -1, 0x40)
    assert r.zdropped
    assert r.max_t < 250


def test_sw_score_basic():
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.uint8)
    t = np.array([3, 3, 0, 1, 2, 3, 0, 1, 2, 3, 3, 3], dtype=np.uint8)
    sc, qe, te = native.sw_score(q, t, MAT, 4, 2)
    assert sc == 16
    assert te == 9  # target end of the perfect 8-mer match
    assert qe == 7


def test_extd_fast_matches_oracle():
    """The AVX-512 host extd (wm_extd_fast) must be bit-identical to the
    scalar oracle across scoring profiles, flag modes, band widths, and
    N-base fringe cases (falls back to scalar on CPUs without AVX-512BW,
    where this degenerates to scalar==scalar)."""
    rng = np.random.default_rng(17)

    def mutate(t, sub, ind):
        out = []
        i = 0
        while i < len(t):
            r = rng.random()
            if r < ind / 2:
                i += 1
                continue
            if r < ind:
                out.append(rng.integers(0, 4))
                continue
            out.append((t[i] + 1 + rng.integers(0, 3)) % 4
                       if r < ind + sub else t[i])
            i += 1
        return np.array(out, np.uint8)

    # (q, e, q2, e2, mch, mis): map-ont, asm5 (int8-wrap heavy), asm20,
    # and a swapped-cost pair exercising the canonicalise branch
    profiles = [(4, 2, 24, 1, 2, -4), (39, 3, 81, 1, 1, -19),
                (6, 2, 26, 1, 1, -4), (24, 2, 4, 1, 2, -4)]
    flags = [0x0, 0x08 | 0x10, 0x02, 0x40 | 0x02 | 0x80, 0x01,
             0x18 | 0x01, 0x40 | 0x80, 0x18 | 0x02]
    n_case = 0
    for q, e, q2, e2, mch, mis in profiles:
        mat = np.zeros(25, np.int8)
        for a in range(4):
            for b in range(4):
                mat[a * 5 + b] = mch if a == b else mis
        for trial in range(4):
            n = int(rng.integers(30, 700))
            t = rng.integers(0, 4, n).astype(np.uint8)
            qv = mutate(t, 0.10, 0.10)
            if trial % 2:
                t = t.copy()
                t[rng.integers(0, len(t), 3)] = 4  # ambiguous bases
            for w in (-1, 50, 400):
                for flag in flags:
                    zd = 100 if flag & 0x10 else 200
                    h = native.extd(qv, t, mat, q, e, q2, e2, w, zd, 10, flag)
                    f = native.extd(qv, t, mat, q, e, q2, e2, w, zd, 10,
                                    flag, fast=True)
                    key = ("max", "zdropped", "max_q", "max_t", "mqe",
                           "mqe_t", "mte", "mte_q", "score", "reach_end")
                    for k in key:
                        assert getattr(h, k) == getattr(f, k), \
                            (k, (q, e, q2, e2), hex(flag), w, n)
                    assert np.array_equal(h.cigar, f.cigar), \
                        ((q, e, q2, e2), hex(flag), w, n)
                    n_case += 1
    assert n_case == 384


def test_exts_fast_matches_oracle():
    """The AVX-512 spliced host kernel (wm_exts_fast) must be bit-identical
    to the scalar oracle across splice flag modes, junction annotations, and
    intron-bearing cases (scalar fallback where AVX-512BW is absent)."""
    rng = np.random.default_rng(23)
    q_, e_, q2_, noncan, jb = 2, 1, 32, 9, 9
    mat = np.zeros(25, np.int8)
    for a in range(4):
        for b in range(4):
            mat[a * 5 + b] = 1 if a == b else -2

    def make_case(n_ex=3):
        exons = [rng.integers(0, 4, int(rng.integers(40, 160))).astype(
            np.uint8) for _ in range(n_ex)]
        introns = [rng.integers(0, 4, int(rng.integers(60, 300))).astype(
            np.uint8) for _ in range(n_ex - 1)]
        for it in introns:  # canonical GT..AG
            it[0], it[1] = 2, 3
            it[-2], it[-1] = 0, 2
        t_parts = []
        for i, ex in enumerate(exons):
            t_parts.append(ex)
            if i < len(introns):
                t_parts.append(introns[i])
        t = np.concatenate(t_parts)
        qv = np.concatenate(exons).copy()
        idx = rng.integers(0, len(qv), max(1, len(qv) // 20))
        qv[idx] = (qv[idx] + 1 + rng.integers(0, 3, len(idx))) % 4
        return qv, t

    flags = [0x100, 0x100 | 0x18, 0x200 | 0x400, 0x100 | 0x200 | 0x800,
             0x100 | 0x01, 0x100 | 0x02, 0x100 | 0x80 | 0x40,
             0x100 | 0x18 | 0x01]
    keys = ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
            "mte_q", "score", "reach_end")
    n_case = 0
    for trial in range(5):
        qv, t = make_case()
        junc = np.zeros(len(t), np.uint8)
        junc[rng.integers(0, len(t), 8)] = rng.integers(1, 16, 8).astype(
            np.uint8)
        for flag in flags:
            for jv in (None, junc):
                zd = 100 if flag & 0x10 else 200
                h = native.exts(qv, t, mat, q_, e_, q2_, noncan, zd, jb,
                                flag, junc=jv)
                f = native.exts(qv, t, mat, q_, e_, q2_, noncan, zd, jb,
                                flag, junc=jv, fast=True)
                for k in keys:
                    assert getattr(h, k) == getattr(f, k), \
                        (k, trial, hex(flag), jv is not None)
                assert np.array_equal(h.cigar, f.cigar), \
                    (trial, hex(flag), jv is not None)
                n_case += 1
    assert n_case == 80


def test_extz_fast_matches_oracle():
    """The AVX-512 single-cost host kernel (wm_extz_fast) must be
    bit-identical to the scalar oracle — including its mixed signed-compare
    / unsigned-max semantics — across profiles, flags and band widths."""
    rng = np.random.default_rng(31)

    def mutate(t, sub, ind):
        out = []
        i = 0
        while i < len(t):
            r = rng.random()
            if r < ind / 2:
                i += 1
                continue
            if r < ind:
                out.append(rng.integers(0, 4))
                continue
            out.append((t[i] + 1 + rng.integers(0, 3)) % 4
                       if r < ind + sub else t[i])
            i += 1
        return np.array(out, np.uint8)

    flags = [0x0, 0x08 | 0x10, 0x02, 0x40 | 0x02 | 0x80, 0x01,
             0x18 | 0x01, 0x40 | 0x80, 0x18 | 0x02]
    keys = ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
            "mte_q", "score", "reach_end")
    n_case = 0
    for q, e, mch, mis in [(4, 2, 2, -4), (12, 2, 1, -3), (6, 1, 1, -2)]:
        mat = np.zeros(25, np.int8)
        for a in range(4):
            for b in range(4):
                mat[a * 5 + b] = mch if a == b else mis
        for trial in range(4):
            n = int(rng.integers(30, 700))
            t = rng.integers(0, 4, n).astype(np.uint8)
            qv = mutate(t, 0.10, 0.10)
            if trial % 2:
                t = t.copy()
                t[rng.integers(0, len(t), 3)] = 4
            for w in (-1, 50, 400):
                for flag in flags:
                    zd = 100 if flag & 0x10 else 200
                    h = native.extz(qv, t, mat, q, e, w, zd, 10, flag)
                    f = native.extz(qv, t, mat, q, e, w, zd, 10, flag,
                                    fast=True)
                    for k in keys:
                        assert getattr(h, k) == getattr(f, k), \
                            (k, (q, e), hex(flag), w, n)
                    assert np.array_equal(h.cigar, f.cigar), \
                        ((q, e), hex(flag), w, n)
                    n_case += 1
    assert n_case == 288
