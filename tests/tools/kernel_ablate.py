#!/usr/bin/env python3
"""Kernel throughput ablation: time the production DevCallPooled path over a
grid of (flag, TB, shape) variants to locate where device cycles go.

Usage: python tests/tools/kernel_ablate.py [--quick]
Prints one line per variant: Gcells/s on the LIVE-cell basis of the shape.
Diagnostic only (not a test); needs the chip.
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def run_variant(pools, B, n, w, mat, flag, TB, reps=3, q=4, e=2, q2=24, e2=1):
    from winnowmap_tpu.extend.pallas_kernel import DevCallPooled

    jobs = np.zeros((B, 8), np.int64)
    jobs[:, 0] = np.arange(B) * n      # qoff
    jobs[:, 1] = n                     # qlen
    jobs[:, 3] = np.arange(B) * n      # toff
    jobs[:, 4] = n                     # tlen
    jobs[:, 6] = w
    jobs[:, 7] = 400                   # zdrop

    def once():
        call = DevCallPooled(pools, jobs, mat, q, e, q2, e2, -1, flag, TB=TB)
        call.start_fetch()
        return call.collect_blob()

    once()  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        once()
        best = min(best, time.time() - t0)
    cells = B * (2 * n - 1) * min(n, w + 1)
    return cells / best / 1e9, best


def main():
    import winnowmap_tpu
    from winnowmap_tpu.extend.pallas_kernel import PoolContext
    from winnowmap_tpu.map.align import gen_simple_mat

    winnowmap_tpu.enable_compile_cache()
    rng = np.random.default_rng(0)
    B, n = 512, 1000
    qpool = rng.integers(0, 4, B * max(n, 4096)).astype(np.uint8)
    tpool = rng.integers(0, 4, B * max(n, 4096)).astype(np.uint8)
    pools = PoolContext(qpool, tpool)
    mat = gen_simple_mat(2, 4, 1)

    quick = "--quick" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    # flag bits: 0x01 score-only(no cigar), 0x08 approx_max, 0x10 approx_drop
    variants = [
        ("base cigar+approx      ", dict(flag=0x18, TB=64, w=500)),
        ("score-only (no dirs)   ", dict(flag=0x19, TB=64, w=500)),
        ("exact-max path         ", dict(flag=0x00, TB=64, w=500)),
        ("TB=32                  ", dict(flag=0x18, TB=32, w=500)),
        ("TB=16                  ", dict(flag=0x18, TB=16, w=500)),
        ("TB=8                   ", dict(flag=0x18, TB=8, w=500)),
    ]
    if not quick:
        variants += [
            ("w=200 narrow band      ", dict(flag=0x18, TB=64, w=200)),
            ("n=300 short jobs       ", dict(flag=0x18, TB=64, w=500, n=300)),
        ]
    if only:
        variants = [(nm, kv) for nm, kv in variants if only in nm]
    for name, kv in variants:
        nn = kv.pop("n", n)
        try:
            g, t = run_variant(pools, B, nn, kv["w"], mat, kv["flag"],
                               kv["TB"])
            print(f"{name} n={nn:5d} w={kv['w']:4d}: {g:6.2f} Gcells/s"
                  f"  ({t*1e3:.0f} ms/call)")
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {exc}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
