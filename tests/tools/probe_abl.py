#!/usr/bin/env python3
"""Production-kernel timing ablation: re-trace the extd kernel with
WM_KERNEL_ABL pruning one block at a time and time the pooled call path
pipelined (depth 4, amortizing the ~24 ms tunnel round trip).  Each config
runs in a subprocess (the ablation env is read at trace time).
Diagnostic only; needs the chip.  Results are WRONG with any token set."""
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent


def worker():
    sys.path.insert(0, str(REPO))
    import numpy as np

    import winnowmap_tpu
    from winnowmap_tpu.extend.pallas_kernel import DevCallPooled, PoolContext
    from winnowmap_tpu.map.align import gen_simple_mat

    winnowmap_tpu.enable_compile_cache()
    rng = np.random.default_rng(0)
    B, n, w = 512, 1000, 500
    qpool = rng.integers(0, 4, B * n).astype(np.uint8)
    tpool = rng.integers(0, 4, B * n).astype(np.uint8)
    pools = PoolContext(qpool, tpool)
    # zdrop off: constant work per config (no early-done variance)
    jobs = [((0, i * n, n, False), (1, i * n, n, False), w, -1)
            for i in range(B)]
    mat = gen_simple_mat(2, 4, 1)
    flag = int(sys.argv[2], 0)

    def mk():
        c = DevCallPooled(pools, jobs, mat, 4, 2, 24, 1, -1, flag, TB=64)
        c.start_fetch()
        return c

    mk().collect()
    cells = B * (2 * n - 1) * min(n, w + 1)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        calls = [mk() for _ in range(4)]
        for c in calls:
            c.collect()
        best = min(best, (time.time() - t0) / 4)
    print(f"RESULT {cells / best / 1e9:.2f} Gcells/s {best * 1e3:.0f} ms",
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        return worker()
    cases = [
        ("full               ", "", "0x18"),
        ("score-only flag    ", "", "0x19"),
        ("nobound            ", "nobound", "0x18"),
        ("noscore            ", "noscore", "0x18"),
        ("noh0               ", "noh0", "0x18"),
        ("noqv               ", "noqv", "0x18"),
        ("nobound+noscore+noh0+noqv", "nobound,noscore,noh0,noqv", "0x18"),
    ]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    for name, abl, flag in cases:
        if only and only not in name:
            continue
        env = dict(os.environ)
        if abl:
            env["WM_KERNEL_ABL"] = abl
        r = subprocess.run(
            [sys.executable, __file__, "--worker", flag],
            env=env, capture_output=True, text=True, timeout=900)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT")), None)
        if line:
            print(f"{name}: {line[7:]}")
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            print(f"{name}: FAILED rc={r.returncode} "
                  f"{tail[-1][:120] if tail else ''}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
