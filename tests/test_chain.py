"""Chain DP unit tests."""
import numpy as np

import winnowmap_tpu.native as native


def _mk(anchors):
    ax = np.array([(rid << 32) | rpos for rid, rpos, _, _ in anchors], dtype=np.uint64)
    ay = np.array([(span << 32) | qpos for _, _, qpos, span in anchors], dtype=np.uint64)
    return ax, ay


def chain(ax, ay, **kw):
    args = dict(max_dist_x=5000, min_dist_x=1000, max_dist_y=5000, bw=500,
                max_skip=25, max_iter=5000, min_cnt=1, min_sc=10)
    args.update(kw)
    return native.chain_dp(ax, ay, **args)


def test_colinear_anchors_chain():
    ax, ay = _mk([(0, 100 + i * 100, 50 + i * 100, 15) for i in range(5)])
    u, cax, cay = chain(ax, ay)
    assert len(u) == 1
    assert int(u[0]) & 0xFFFFFFFF == 5


def test_two_far_groups_make_two_chains():
    g1 = [(0, 100 + i * 50, 50 + i * 50, 15) for i in range(4)]
    g2 = [(1, 100 + i * 50, 50 + i * 50, 15) for i in range(4)]  # other rid
    ax, ay = _mk(g1 + g2)
    u, cax, cay = chain(ax, ay)
    assert len(u) == 2


def test_bandwidth_breaks_chain():
    # second anchor with huge diagonal offset -> separate chains
    ax, ay = _mk([(0, 100, 50, 15), (0, 5000, 100, 15)])
    u, _, _ = chain(ax, ay, bw=100, min_cnt=1, min_sc=1)
    assert len(u) == 2


def test_output_sorted_by_ref_start():
    g1 = [(0, 9000 + i * 50, 50 + i * 50, 15) for i in range(4)]
    g2 = [(0, 100 + i * 50, 3000 + i * 50, 15) for i in range(4)]
    ax, ay = _mk(g1 + g2)
    u, cax, cay = chain(ax, ay)
    assert len(u) == 2
    # first chain in output starts at the smaller reference coordinate
    assert int(cax[0]) < int(cax[int(u[0]) & 0xFFFFFFFF])
