#!/usr/bin/env python3
"""Isolate the L0 (state read/write + grid) cost of the step-window kernel:
empty kernel, per-array count, ROWS/TB scaling.  Diagnostic; needs chip."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def run(nstate=7, TB=64, Wb=640, ROWS=32, KR=63, B=512, touch=True,
        reps=3, read_acc=True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i8, i32 = jnp.int8, jnp.int32

    def kernel(qlen_ref, res_ref, *state):
        acc_s = state[-1]
        arrs = state[:-1]
        k = pl.program_id(1)
        r0 = k * ROWS

        @pl.when(r0 == 0)
        def _init():
            for ref in arrs:
                ref[:] = jnp.zeros((TB, Wb), i8)
            acc_s[:] = jnp.zeros((TB, 16), i32)

        if touch:
            vals = [ref[:].astype(i32) for ref in arrs]
            if read_acc:
                acc = acc_s[:]
                done = acc[:, 3:4]
                live = jnp.logical_not(jnp.all(done >= 1))
            else:
                live = r0 < 10**9
            if vals:
                vals[0] = vals[0] + 1
            for ref, v in zip(arrs, vals):
                ref[:] = v.astype(i8)
            if read_acc:
                acc_s[:] = acc + 1

        @pl.when(k == KR - 1)
        def _out():
            res_ref[:] = acc_s[:]

    nB = B // TB
    f = pl.pallas_call(
        kernel,
        grid=(nB, KR),
        in_specs=[pl.BlockSpec((TB, 1), lambda b, r: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, 16), lambda b, r: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 16), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TB, Wb), i8)] * nstate
        + [pltpu.VMEM((TB, 16), i32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    jf = jax.jit(f)
    qlen = np.full((B, 1), 1000, np.int32)

    def once():
        return np.asarray(jf(qlen))

    once()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        once()
        best = min(best, time.time() - t0)
    cells = B * KR * ROWS * Wb
    return cells / best / 1e9, best


def main():
    cases = [
        ("empty (no touch)        ", dict(touch=False)),
        ("acc only (0 state)      ", dict(nstate=0)),
        ("1 state array           ", dict(nstate=1)),
        ("3 state arrays          ", dict(nstate=3)),
        ("7 state arrays (=L0)    ", dict(nstate=7)),
        ("7 state no-acc-read     ", dict(nstate=7, read_acc=False)),
        ("7 state ROWS=64 KR=32   ", dict(nstate=7, ROWS=64, KR=32)),
        ("7 state ROWS=128 KR=16  ", dict(nstate=7, ROWS=128, KR=16)),
        ("7 state TB=128 B=512    ", dict(nstate=7, TB=128)),
        ("7 state TB=256 B=512    ", dict(nstate=7, TB=256)),
        ("7 state TB=512 B=512    ", dict(nstate=7, TB=512)),
        ("7 st TB=512 ROWS=64     ", dict(nstate=7, TB=512, ROWS=64, KR=32)),
    ]
    for name, kv in cases:
        try:
            g, t = run(**kv)
            print(f"{name}: {g:7.2f} Gcells/s padded ({t*1e3:.1f} ms)")
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:110]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
