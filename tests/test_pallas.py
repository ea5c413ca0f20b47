"""Pallas TPU kernel bit-exactness vs the native oracle (subprocess: the
in-process test session pins JAX to the CPU mesh).  Covers the DP wavefront
(exact + approx modes), device traceback, and the DevCall end-to-end path
with per-row band widths."""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import winnowmap_tpu
    winnowmap_tpu.enable_compile_cache()
    import numpy as np
    import winnowmap_tpu.native as native
    from winnowmap_tpu.extend.pallas_kernel import DevCall
    from winnowmap_tpu.map.align import gen_simple_mat

    MAT = gen_simple_mat(2, 4, 1)
    rng = np.random.default_rng(3)

    def mutate(q, sub, ind):
        out = []
        i = 0
        while i < len(q):
            r = rng.random()
            if r < ind / 2:
                i += 1
                continue
            if r < ind:
                out.append(rng.integers(0, 4))
                continue
            if r < ind + sub:
                out.append((q[i] + 1 + rng.integers(0, 3)) % 4)
            else:
                out.append(q[i])
            i += 1
        return np.array(out, dtype=np.uint8)

    qs, ts = [], []
    for _ in range(16):
        n = int(rng.integers(80, 600))
        t = rng.integers(0, 4, n).astype(np.uint8)
        qs.append(mutate(t, 0.06, 0.06))
        ts.append(t)
    # fully dissimilar pairs: u/v saturate at the gap-extend ladder, so the
    # approx walk hits d0 == d1 TIES every row — the tie rule (reference
    # takes d1 and advances) is invisible on similar pairs and a wrong rule
    # diverges the z-drop (caught 2026-08-20: extd had ties-stay)
    for _ in range(6):
        qs.append(rng.integers(0, 4, int(rng.integers(200, 700))
                               ).astype(np.uint8))
        ts.append(rng.integers(0, 4, int(rng.integers(200, 700))
                               ).astype(np.uint8))

    for flag, w, zd, eb in [(0x42 | 0x80, 751, 400, 10), (0x08, 500, 400, -1)]:
        ws = [w if i % 2 == 0 else max(64, w - 100) for i in range(len(qs))]
        ezs = DevCall(qs, ts, MAT, 4, 2, 24, 1, ws, zd, eb, flag).collect()
        for i in range(len(qs)):
            h = native.extd(qs[i], ts[i], MAT, 4, 2, 24, 1, ws[i], zd, eb,
                            flag)
            d = ezs[i]
            assert (h.max, int(h.zdropped), h.max_q, h.max_t, h.mqe, h.mqe_t,
                    h.score, int(h.reach_end)) == (
                d.max, int(d.zdropped), d.max_q, d.max_t, d.mqe, d.mqe_t,
                d.score, int(d.reach_end)), (flag, i)
            assert np.array_equal(d.cigar, h.cigar), (flag, i)
    print("PALLAS-ORACLE-OK")
""")


@pytest.mark.skipif(os.environ.get("WM_SKIP_TPU_TESTS") == "1",
                    reason="TPU tests disabled")
def test_pallas_kernels_match_oracle_tpu():
    from conftest import tpu_alive
    if not tpu_alive():
        pytest.skip("no TPU available (tunnel down or init timeout)")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    if proc.returncode != 0 and "No TPU" in proc.stderr:
        pytest.skip("no TPU available")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PALLAS-ORACLE-OK" in proc.stdout


FRINGE_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import winnowmap_tpu
    winnowmap_tpu.enable_compile_cache()
    import numpy as np
    import winnowmap_tpu.native as native
    from winnowmap_tpu.extend import pallas_kernel as pk
    from winnowmap_tpu.map.align import gen_simple_mat

    rng = np.random.default_rng(11)

    def mutate(t, err, indel=0.04):
        out = []
        i = 0
        while i < len(t):
            r = rng.random()
            if r < indel / 2:
                i += 1
                continue
            if r < indel:
                out.append(rng.integers(0, 4))
                continue
            if r < indel + err:
                out.append((t[i] + rng.integers(1, 4)) % 4)
            else:
                out.append(t[i])
            i += 1
        return np.array(out, np.uint8)

    profiles = [("ont", (2, 4, 4, 2, 24, 1)), ("asm20", (1, 4, 6, 2, 26, 1)),
                ("asm5", (1, 19, 39, 3, 81, 1))]
    fails = total = 0
    for prof, (a, b, q, e, q2, e2) in profiles:
        mat = gen_simple_mat(a, b, 1)
        for flag in (0x08, 0x18, 0x00, 0x42 | 0x80, 0x02 | 0x08):
            for wband in (50, 400):
                qs, ts = [], []
                for i in range(10):
                    n = int(rng.integers(100, 1500))
                    t = rng.integers(0, 4, n).astype(np.uint8)
                    qs.append(mutate(t, 0.10))
                    ts.append(t)
                ezs = pk.extd_cigar_device(qs, ts, mat, q, e, q2, e2,
                                           wband, 300, 10, flag)
                for i in range(10):
                    total += 1
                    h = native.extd(qs[i], ts[i], mat, q, e, q2, e2, wband,
                                    300, 10, flag)
                    d = ezs[i]
                    same = (h.max, int(h.zdropped), h.max_q, h.max_t,
                            h.mqe, h.mqe_t, h.mte, h.mte_q, h.score,
                            int(h.reach_end)) == (
                        d.max, int(d.zdropped), d.max_q, d.max_t, d.mqe,
                        d.mqe_t, d.mte, d.mte_q, d.score, int(d.reach_end))
                    same = same and np.array_equal(d.cigar, h.cigar)
                    if not same:
                        fails += 1
                        print("MISMATCH", prof, hex(flag), wband, i)
    print(f"parity {{total - fails}}/{{total}}")
    assert fails == 0
    print("FRINGE-OK")
""")


EXTS_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import winnowmap_tpu
    winnowmap_tpu.enable_compile_cache()
    import numpy as np
    import winnowmap_tpu.native as native
    from winnowmap_tpu.extend.pallas_kernel import exts_pallas
    from winnowmap_tpu.map.align import gen_simple_mat

    mat = gen_simple_mat(1, 2, 1)
    q, e, q2, noncan, jb = 2, 1, 32, 9, 9
    rng = np.random.default_rng(5)

    def mutate(t, err):
        t = t.copy()
        m = rng.random(len(t)) < err
        t[m] = (t[m] + rng.integers(1, 4, m.sum())) % 4
        return t

    cases = []
    for seed in range(8):
        r2 = np.random.default_rng(seed)
        qlen = int(r2.integers(100, 800))
        qsq = r2.integers(0, 4, qlen).astype(np.uint8)
        if seed % 2 == 0:
            half = qlen // 2
            ilen = int(r2.integers(60, 400))
            intron = r2.integers(0, 4, ilen).astype(np.uint8)
            intron[0], intron[1] = 2, 3
            intron[-2], intron[-1] = 0, 2
            tsq = np.concatenate([mutate(qsq[:half], 0.05), intron,
                                  mutate(qsq[half:], 0.05)]).astype(np.uint8)
        else:
            tsq = r2.integers(0, 4,
                              int(r2.integers(100, 900))).astype(np.uint8)
        jl = None
        if seed % 3 == 1:
            jl = ((r2.random(len(tsq)) < 0.03).astype(np.uint8)
                  * r2.integers(1, 16, len(tsq)).astype(np.uint8))
        cases.append((qsq, tsq, jl))

    for flag in (0x100, 0x100 | 0x18, 0x200 | 0x400,
                 0x100 | 0x40 | 0x02 | 0x80, 0x300, 0x100 | 0x01):
        zd = 100 if flag & 0x10 else 200
        devs = exts_pallas([c[0] for c in cases], [c[1] for c in cases],
                           mat, q, e, q2, noncan, zd, jb, flag,
                           juncs=[c[2] for c in cases])
        for i, (qsq, tsq, jl) in enumerate(cases):
            h = native.exts(qsq, tsq, mat, q, e, q2, noncan, zd, jb, flag,
                            junc=jl)
            d = devs[i]
            assert (h.max, int(h.zdropped), h.max_q, h.max_t, h.mqe,
                    h.mqe_t, h.mte, h.mte_q, h.score) == (
                d.max, int(d.zdropped), d.max_q, d.max_t, d.mqe,
                d.mqe_t, d.mte, d.mte_q, d.score), (hex(flag), i)
            if not (flag & 0x01):
                assert np.array_equal(h.cigar, d.cigar), (hex(flag), i)
    print("EXTS-TPU-OK")
""")


@pytest.mark.skipif(os.environ.get("WM_SKIP_TPU_TESTS") == "1",
                    reason="TPU tests disabled")
def test_exts_pallas_matches_oracle_tpu():
    """Spliced (exts) kernel on the real chip vs the wm_exts oracle
    (reference ksw2_exts2_sse.c semantics incl. intron CIGARs and junction
    bonuses)."""
    from conftest import tpu_alive
    if not tpu_alive():
        pytest.skip("no TPU available (tunnel down or init timeout)")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", EXTS_SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    if proc.returncode != 0 and "No TPU" in proc.stderr:
        pytest.skip("no TPU available")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "EXTS-TPU-OK" in proc.stdout


@pytest.mark.skipif(os.environ.get("WM_FRINGE_SWEEP") != "1",
                    reason="opt-in: WM_FRINGE_SWEEP=1 (runs ~300 cases on "
                           "the real chip; the claim '300/300 fringe-heavy "
                           "parity incl. asm5/asm20' reproduces from here)")
def test_pallas_fringe_sweep_tpu():
    from conftest import tpu_alive
    if not tpu_alive():
        pytest.skip("no TPU available (tunnel down or init timeout)")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", FRINGE_SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    if proc.returncode != 0 and "No TPU" in proc.stderr:
        pytest.skip("no TPU available")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FRINGE-OK" in proc.stdout
