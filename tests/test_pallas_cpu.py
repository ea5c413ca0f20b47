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
