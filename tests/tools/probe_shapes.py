#!/usr/bin/env python3
"""Per-shape device throughput for the production pooled call across the
scheduler's merged/big shape menu: measures Gcells/s (Wb-basis padded) so
the engine's cost model (engine.py DEV_GCPS + step overhead) can be
calibrated.  WM_EXTD_ROWS + TB variants probe the wide-band tiling choice.
Diagnostic only; needs the chip."""
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
    from winnowmap_tpu.extend.pallas_kernel import (DevCallPooled,
                                                    PoolContext, _EXTD_ROWS,
                                                    _round_up, extd_rows)
    from winnowmap_tpu.map.align import gen_simple_mat

    winnowmap_tpu.enable_compile_cache()
    B = int(sys.argv[2])
    n = int(sys.argv[3])      # per-job q/t len (jobs all this long)
    L = int(sys.argv[4])      # padded shape L (>= n)
    w = int(sys.argv[5])      # job band
    W = int(sys.argv[6])      # padded shape W (>= w)
    TB = int(sys.argv[7])
    rng = np.random.default_rng(0)
    qpool = rng.integers(0, 4, B * n).astype(np.uint8)
    tpool = rng.integers(0, 4, B * n).astype(np.uint8)
    tpool[:] = qpool  # similar: no early zdrop, full wavefront
    pools = PoolContext(qpool, tpool)
    jobs = np.zeros((B, 8), np.int64)
    jobs[:, 0] = np.arange(B) * n
    jobs[:, 1] = n
    jobs[:, 3] = np.arange(B) * n
    jobs[:, 4] = n
    jobs[:, 6] = w
    jobs[:, 7] = -1
    mat = gen_simple_mat(2, 4, 1)

    def mk():
        c = DevCallPooled(pools, jobs, mat, 4, 2, 24, 1, -1, 0x18, TB=TB,
                          shape_override=(L, L, W))
        c.start_fetch()
        return c

    mk().collect_blob()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        calls = [mk() for _ in range(2)]
        for c in calls:
            c.collect_blob()
        best = min(best, (time.time() - t0) / 2)
    ncol = min(L, W + 1)
    Wb = _round_up(((ncol + 15) // 16 + 1) * 16 + 32 + _EXTD_ROWS, 128)
    cells = B * (2 * n) * Wb
    print(f"RESULT {cells / best / 1e9:7.2f} GWb/s  {best*1e3:6.0f} ms"
          f"  Wb={Wb} ROWS={extd_rows(Wb)}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        return worker()
    #        name                B    n     L      w     W     TB  rows_env
    cases = [
        ("bench 1024/512 TB64 ", 512, 1000, 1024, 500, 512, 64, ""),
        ("mrg 1024/512 TB64   ", 512, 700, 1024, 400, 512, 64, ""),
        ("mrg 4096/512 TB64   ", 128, 3000, 4096, 400, 512, 64, ""),
        ("mrg 4096/2048 TB64  ", 64, 3000, 4096, 1800, 2048, 64, ""),
        ("mrg 4096/2048 TB16r32", 64, 3000, 4096, 1800, 2048, 16, "32"),
        ("mrg 16384/2048 TB64 ", 16, 12000, 16384, 1800, 2048, 64, ""),
        ("mrg 16384/2048 16r32", 16, 12000, 16384, 1800, 2048, 16, "32"),
        ("big 16384/16384 TB64", 8, 12000, 16384, 12000, 16384, 64, ""),
    ]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    for name, B, n, L, w, W, TB, rows in cases:
        if only and only not in name:
            continue
        env = dict(os.environ)
        if rows:
            env["WM_EXTD_ROWS"] = rows
        else:
            env.pop("WM_EXTD_ROWS", None)
        r = subprocess.run(
            [sys.executable, __file__, "--worker", str(B), str(n), str(L),
             str(w), str(W), str(TB)],
            env=env, capture_output=True, text=True, timeout=1500)
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
