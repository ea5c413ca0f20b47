"""Device chaining kernel differentials: the XLA forward DP + shared
native tail (chain/device.py) must be bit-identical to the scalar oracle
(native wm_chain_dp; reference src/chain.c:22-167) on random and
repeat-heavy anchor sets.  WM_CHAIN_SWEEP=1 runs the full 10^4-set sweep."""
import os

import numpy as np
import pytest

import winnowmap_tpu.native as native


@pytest.fixture(scope="module", autouse=True)
def _cpu_backend():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _make_anchors(rng, n, repeat=False, n_clusters=4):
    xs, ys = [], []
    for _ in range(n_clusters):
        m = max(1, n // n_clusters)
        rx = rng.integers(0, 1 << 24)
        qy = rng.integers(0, 1 << 16)
        step = rng.integers(5, 60)
        x = rx + np.arange(m) * step + rng.integers(-20, 20, m)
        y = qy + np.arange(m) * step + rng.integers(-20, 20, m)
        if repeat:
            x = rx + (np.arange(m) % 50) * 7 + np.arange(m) // 50
        xs.append(np.maximum(x, 0))
        ys.append(np.maximum(y, 0))
    x = np.concatenate(xs).astype(np.uint64)
    y = np.concatenate(ys).astype(np.uint64)
    span = np.full(len(x), 15, np.uint64)
    rid = np.uint64(1) << np.uint64(32)
    ax = rid | (x & np.uint64(0xFFFFFFFF))
    ay = (span << np.uint64(32)) | (y & np.uint64(0xFFFFFFFF))
    o = np.argsort(ax, kind="stable")
    return ax[o], ay[o]


P = dict(max_dist_x=5000, min_dist_x=1000, max_dist_y=5000, bw=500,
         max_skip=25, max_iter=5000, min_cnt=3, min_sc=40, gap_scale=1.0,
         is_cdna=0)


def _run(jobs):
    from winnowmap_tpu.chain.device import chain_dp_device_batch

    res = chain_dp_device_batch(jobs, P["max_dist_x"], P["min_dist_x"],
                                P["max_dist_y"], P["bw"], P["max_skip"],
                                P["max_iter"], P["min_cnt"], P["min_sc"],
                                P["gap_scale"], P["is_cdna"])
    for t, (ax, ay) in enumerate(jobs):
        hu, hax, hay = native.chain_dp(ax, ay, n_segs=1, **P)
        du, dax, day = res[t]
        assert np.array_equal(hu, du), f"u mismatch, job {t} n={len(ax)}"
        assert np.array_equal(hax, dax), f"ax mismatch, job {t}"
        assert np.array_equal(hay, day), f"ay mismatch, job {t}"


def test_chain_device_parity_quick():
    rng = np.random.default_rng(3)
    jobs = [_make_anchors(rng, int(rng.integers(50, 3000)),
                          repeat=(t % 3 == 0)) for t in range(16)]
    _run(jobs)


def test_chain_device_low_coordinates():
    """Anchors within max_dist_x of position 0 on rid 0: the window-start
    searchsorted must saturate `ax - dist` at 0 instead of wrapping the
    unsigned subtraction (regression: every window start became n)."""
    rng = np.random.default_rng(21)
    jobs = []
    for _ in range(4):
        m = 60
        x = np.sort(rng.integers(0, 3000, m)).astype(np.uint64)  # rid 0
        y = (x - np.uint64(x.min())) + rng.integers(0, 9, m).astype(np.uint64)
        span = np.full(m, 15, np.uint64)
        ax = x  # rid 0, fwd strand: ax == low coordinates < max_dist_x
        ay = (span << np.uint64(32)) | (y & np.uint64(0xFFFFFFFF))
        o = np.argsort(ax, kind="stable")
        jobs.append((ax[o], ay[o]))
    _run(jobs)


def test_chain_device_stage2_params():
    """Stage-2 style parameters (wide band, bigger gaps)."""
    from winnowmap_tpu.chain.device import chain_dp_device_batch

    rng = np.random.default_rng(9)
    jobs = [_make_anchors(rng, 1500, repeat=True) for _ in range(4)]
    p2 = dict(P, bw=2000, max_dist_x=16000, max_dist_y=16000)
    res = chain_dp_device_batch(jobs, p2["max_dist_x"], p2["min_dist_x"],
                                p2["max_dist_y"], p2["bw"], p2["max_skip"],
                                p2["max_iter"], p2["min_cnt"], p2["min_sc"],
                                p2["gap_scale"], p2["is_cdna"])
    for t, (ax, ay) in enumerate(jobs):
        hu, hax, hay = native.chain_dp(ax, ay, n_segs=1, **p2)
        du, dax, day = res[t]
        assert np.array_equal(hu, du) and np.array_equal(hax, dax) \
            and np.array_equal(hay, day), t


@pytest.mark.skipif(not os.environ.get("WM_CHAIN_SWEEP"),
                    reason="full 10^4-set sweep is opt-in (WM_CHAIN_SWEEP=1)")
def test_chain_device_parity_sweep():
    rng = np.random.default_rng(11)
    done = 0
    while done < 10_000:
        jobs = [_make_anchors(rng, int(rng.integers(20, 2000)),
                              repeat=(t % 3 == 0)) for t in range(50)]
        _run(jobs)
        done += len(jobs)
