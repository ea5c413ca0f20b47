#!/usr/bin/env python3
"""Pipelined production-path kernel throughput: issue N DevCallPooled calls
back-to-back, then collect all — amortizes the ~24 ms tunnel round trip the
serial bench pays per call, matching the engine's in-flight scheduling.
Diagnostic; needs chip."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import winnowmap_tpu
    from winnowmap_tpu.extend.pallas_kernel import DevCallPooled, PoolContext
    from winnowmap_tpu.map.align import gen_simple_mat

    winnowmap_tpu.enable_compile_cache()
    rng = np.random.default_rng(0)
    B, n, w = 512, 1000, 500
    qpool = rng.integers(0, 4, B * n).astype(np.uint8)
    tpool = rng.integers(0, 4, B * n).astype(np.uint8)
    pools = PoolContext(qpool, tpool)
    jobs = [((0, i * n, n, False), (1, i * n, n, False), w, 400)
            for i in range(B)]
    mat = gen_simple_mat(2, 4, 1)

    def mk():
        c = DevCallPooled(pools, jobs, mat, 4, 2, 24, 1, -1, 0x18, TB=64)
        c.start_fetch()
        return c

    mk().collect()  # compile
    cells = B * (2 * n - 1) * min(n, w + 1)
    for depth in (1, 2, 4, 8):
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            calls = [mk() for _ in range(depth)]
            for c in calls:
                c.collect()
            best = min(best, (time.time() - t0) / depth)
        print(f"depth {depth}: {cells / best / 1e9:6.2f} Gcells/s "
              f"({best * 1e3:.0f} ms/call)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
