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
