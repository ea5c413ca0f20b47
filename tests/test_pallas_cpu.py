"""Chip-free Pallas kernel bit-exactness: the extd wavefront kernels run in
interpreter mode (WM_PALLAS_INTERPRET=1) on the CPU backend and must match
the native oracle field-for-field and CIGAR-for-CIGAR.

This is the always-on guard for the kernel semantics (the int8 core, window
machinery, traceback); the TPU-compiled variants are asserted by
tests/test_pallas.py on the real chip.  Subprocess-isolated because
interpret mode + monkeypatched ROWS must not leak into other tests'
compiled-call caches.
"""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = textwrap.dedent("""
    import os, sys
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['WM_PALLAS_INTERPRET'] = '1'
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import winnowmap_tpu.native as native
    import winnowmap_tpu.extend.pallas_kernel as PK
    # small shapes for interpreter-mode compile times; results are
    # ROWS/batch-quantization invariant by construction
    PK.quantize_batch = lambda n: n
    PK.extd_rows = lambda Wb: 4
    from winnowmap_tpu.map.align import gen_simple_mat

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
    for _ in range(4):
        n = int(rng.integers(60, 120))
        t = rng.integers(0, 4, n).astype(np.uint8)
        qs.append(mutate(t, 0.08, 0.08))
        ts.append(t)
    # a fully dissimilar pair: the approx walk's d0 == d1 ties happen every
    # row (u/v saturated), pinning the reference tie rule (take d1, advance)
    qs.append(rng.integers(0, 4, 150).astype(np.uint8))
    ts.append(rng.integers(0, 4, 140).astype(np.uint8))

    # map-ont and asm5: asm5's O2=81 drives the int8 wrap paths
    PROFILES = [(2, 4, 4, 2, 24, 1), (1, 19, 39, 3, 81, 1)]
    FLAGS = [0x08 | 0x10, 0x0, 0x42 | 0x80]
    for a, b, q, e, q2, e2 in PROFILES:
        MAT = gen_simple_mat(a, b, 1)
        for flag in FLAGS:
            ws = [97 if i % 2 == 0 else 64 for i in range(len(qs))]
            ezs = PK.DevCall(qs, ts, MAT, q, e, q2, e2, ws, 200, 10,
                             flag).collect()
            for i in range(len(qs)):
                h = native.extd(qs[i], ts[i], MAT, q, e, q2, e2, ws[i],
                                200, 10, flag)
                d = ezs[i]
                assert (h.max, int(h.zdropped), h.max_q, h.max_t, h.mqe,
                        h.mqe_t, h.mte, h.mte_q, h.score) == (
                    d.max, int(d.zdropped), d.max_q, d.max_t, d.mqe,
                    d.mqe_t, d.mte, d.mte_q, d.score), (a, flag, i)
                if not (flag & 0x01):
                    assert np.array_equal(h.cigar, d.cigar), (a, flag, i)
    print('PALLAS-CPU-OK')
""")


def test_pallas_interpret_matches_oracle_cpu():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=1100, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PALLAS-CPU-OK" in proc.stdout


EXTS_SCRIPT = textwrap.dedent("""
    import os, sys
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['WM_PALLAS_INTERPRET'] = '1'
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import winnowmap_tpu.native as native
    import winnowmap_tpu.extend.pallas_kernel as PK
    PK.quantize_batch = lambda n: n
    PK.extd_rows = lambda Wb: 4
    from winnowmap_tpu.map.align import gen_simple_mat

    mat = gen_simple_mat(1, 2, 1)
    q, e, q2, noncan, jb = 2, 1, 32, 9, 9
    rng = np.random.default_rng(11)

    def mutate(t, err):
        t = t.copy()
        m = rng.random(len(t)) < err
        t[m] = (t[m] + rng.integers(1, 4, m.sum())) % 4
        return t

    cases = []
    for seed in range(4):
        r2 = np.random.default_rng(seed)
        qlen = int(r2.integers(30, 90))
        qsq = r2.integers(0, 4, qlen).astype(np.uint8)
        if seed % 2 == 0:
            half = qlen // 2
            intron = r2.integers(0, 4, 40).astype(np.uint8)
            intron[0], intron[1] = 2, 3   # GT donor
            intron[-2], intron[-1] = 0, 2  # AG acceptor
            tsq = np.concatenate([mutate(qsq[:half], 0.05), intron,
                                  mutate(qsq[half:], 0.05)]).astype(np.uint8)
        else:
            tsq = r2.integers(0, 4, int(r2.integers(30, 150))).astype(np.uint8)
        jl = None
        if seed % 2 == 1:
            jl = ((r2.random(len(tsq)) < 0.05).astype(np.uint8)
                  * r2.integers(1, 16, len(tsq)).astype(np.uint8))
        cases.append((qsq, tsq, jl))

    # exact / approx+drop / rev-strand+flank / left-extension /
    # both-strands / score-only  (reference ksw2_exts2_sse flag modes)
    for flag in (0x100, 0x100 | 0x18, 0x200 | 0x400,
                 0x100 | 0x40 | 0x02 | 0x80, 0x300, 0x100 | 0x01):
        zd = 100 if flag & 0x10 else 200
        devs = PK.exts_pallas([c[0] for c in cases], [c[1] for c in cases],
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
    print('EXTS-CPU-OK')
""")


def test_exts_pallas_interpret_matches_oracle_cpu():
    """Spliced (exts) kernel bit-exactness vs the wm_exts oracle, chip-free:
    intron CIGARs ('N' ops + the min_intron leading-remainder rule), donor/
    acceptor site scoring incl. junction-annotation bonuses, both transcript
    strands, approx/exact max, left-extension (rev) jobs and score-only."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", EXTS_SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=2000, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "EXTS-CPU-OK" in proc.stdout
