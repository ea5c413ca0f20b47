#!/usr/bin/env python3
"""Probe whether the toolchain lowers the i16-lane kernel core (the
WM_PALLAS_CD=i16 hook) on the attached chip, and whether it is bit-exact
vs the i32 formulation.  Diagnostic only.

Run TWICE: once normally (i32 reference results written to /tmp), once with
WM_PALLAS_CD=i16 (compares).  Or just run with WM_PALLAS_CD=i16 and compare
against the host oracle via native.extd.
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import winnowmap_tpu
    from winnowmap_tpu import native
    from winnowmap_tpu.extend.pallas_kernel import DevCallPooled, PoolContext
    from winnowmap_tpu.map.align import gen_simple_mat

    winnowmap_tpu.enable_compile_cache()
    cd = os.environ.get("WM_PALLAS_CD", "i32(default)")
    rng = np.random.default_rng(7)
    B, n, w = 256, 777, 400
    qpool = rng.integers(0, 4, B * n).astype(np.uint8)
    tpool = rng.integers(0, 4, B * n).astype(np.uint8)
    # sprinkle matches so alignments have structure
    tpool[: B * n // 2] = qpool[: B * n // 2]
    pools = PoolContext(qpool, tpool)
    mat = gen_simple_mat(2, 4, 1)
    jobs = np.zeros((B, 8), np.int64)
    jobs[:, 0] = np.arange(B) * n
    jobs[:, 1] = rng.integers(50, n, B)
    jobs[:, 3] = np.arange(B) * n
    jobs[:, 4] = rng.integers(50, n, B)
    jobs[:, 6] = w
    jobs[:, 7] = 400

    try:
        call = DevCallPooled(pools, jobs, mat, 4, 2, 24, 1, -1, 0x18, TB=64)
        call.start_fetch()
        res9, blob, off, ln, reach = call.collect_blob()
    except Exception as exc:
        print(f"CD={cd}: kernel FAILED: {type(exc).__name__}: {exc}")
        return 1
    print(f"CD={cd}: kernel ran")

    # host-oracle differential on every job
    L = native.lib()  # noqa: F841 (ensure lib loads)
    bad = 0
    for i in range(B):
        ql, tl = int(jobs[i, 1]), int(jobs[i, 4])
        qs = qpool[i * n: i * n + ql]
        ts = tpool[i * n: i * n + tl]
        ez = native.extd(qs, ts, mat, 4, 2, 24, 1, w, 400, -1, 0x18)
        got = tuple(int(v) for v in res9[i])
        want = (ez.max, int(ez.zdropped), ez.max_q, ez.max_t, ez.mqe,
                ez.mqe_t, ez.mte, ez.mte_q, ez.score)
        if got != want:
            bad += 1
            if bad <= 3:
                print(f"  job {i}: got {got} want {want}")
        cig = blob[off[i]: off[i] + ln[i]] if ln is not None else None
        if cig is not None and not np.array_equal(cig, ez.cigar):
            bad += 1
            if bad <= 3:
                print(f"  job {i}: cigar mismatch")
    print(f"CD={cd}: {B - bad}/{B} jobs bit-exact vs host oracle")

    # throughput
    def once():
        c = DevCallPooled(pools, jobs, mat, 4, 2, 24, 1, -1, 0x18, TB=64)
        c.start_fetch()
        return c.collect_blob()

    best = 1e9
    for _ in range(3):
        t0 = time.time()
        once()
        best = min(best, time.time() - t0)
    cells = int(((jobs[:, 1] + jobs[:, 4] - 1)
                 * np.minimum(np.minimum(jobs[:, 1], jobs[:, 4]), w + 1))
                .sum())
    print(f"CD={cd}: {cells / best / 1e9:.2f} Gcells/s live ({best*1e3:.0f} "
          f"ms/call)")
    return 0 if bad == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
