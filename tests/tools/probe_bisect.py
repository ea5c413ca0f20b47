#!/usr/bin/env python3
"""Bisect the fixed per-(step, tile) cost of the step-window kernel shape:
tiny variants at KR=16 so each compile is fast.  Prints us per (step, tile).
Diagnostic only; needs the chip."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def run(tag, body, B=512, TB=64, Wb=640, ROWS=32, KR=16, n_scr=7,
        with_dirs=True, reps=3):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i8, i32 = jnp.int8, jnp.int32

    def kernel(qlen_ref, res_ref, *rest):
        rest = list(rest)
        dirs_ref = rest.pop(0) if with_dirs else None
        scr = rest[:-1]
        acc_s = rest[-1]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            for ref in scr:
                ref[:] = jnp.zeros((TB, Wb), i8)
            acc_s[:] = jnp.zeros((TB, 16), i32)

        body(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref)

        @pl.when(k == KR - 1)
        def _out():
            res_ref[:] = acc_s[:]

    nB = B // TB
    dirs_spec = ([pl.BlockSpec((ROWS, TB, Wb), lambda b, r: (r, b, 0),
                               memory_space=pltpu.VMEM)] if with_dirs else [])
    dirs_shape = ([jax.ShapeDtypeStruct((KR * ROWS, B, Wb), jnp.uint8)]
                  if with_dirs else [])
    f = pl.pallas_call(
        kernel,
        grid=(nB, KR),
        in_specs=[pl.BlockSpec((TB, 1), lambda b, r: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((TB, 16), lambda b, r: (b, 0),
                                memory_space=pltpu.VMEM), *dirs_spec),
        out_shape=(jax.ShapeDtypeStruct((B, 16), jnp.int32), *dirs_shape),
        scratch_shapes=[pltpu.VMEM((TB, Wb), jnp.int8)] * n_scr
        + [pltpu.VMEM((TB, 16), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    jf = jax.jit(f)
    qlen = np.full((B, 1), 1000, np.int32)

    def once():
        return np.asarray(jf(qlen)[0])

    once()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        once()
        best = min(best, time.time() - t0)
    per = best / (nB * KR) * 1e6
    print(f"{tag}: {per:7.2f} us/(step,tile)  ({best*1e3:.1f} ms/call)")
    sys.stdout.flush()


def main():
    def empty(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref):
        pass

    def rw_astype(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref):
        i32, i8 = jnp.int32, jnp.int8
        vals = [ref[:].astype(i32) for ref in scr]
        for i, ref in enumerate(scr):
            ref[:] = (vals[i] + 1).astype(i8)

    def rw_i8(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref):
        for ref in scr:
            ref[:] = ref[:] + jnp.int8(1)

    def rw_loop32(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref):
        i32, i8 = jnp.int32, jnp.int8
        vals = [ref[:].astype(i32) for ref in scr]
        for j in range(32):
            vals = [v + 1 for v in vals]
        for i, ref in enumerate(scr):
            ref[:] = vals[i].astype(i8)

    def dirs_store(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref):
        i32, u8 = jnp.int32, jnp.uint8
        v = scr[0][:].astype(i32)
        for j in range(32):
            dirs_ref[j, :, :] = (v + j).astype(u8)

    def rolls(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref):
        i32, i8 = jnp.int32, jnp.int8
        v = scr[0][:].astype(i32)
        for j in range(32):
            v = jnp.roll(v, 1, axis=1) + 1
        scr[0][:] = v.astype(i8)

    def reduces(jnp, pl, k, scr, acc_s, dirs_ref, qlen_ref):
        import jax
        i32, i8 = jnp.int32, jnp.int8
        v = scr[0][:].astype(i32)
        lanes = jax.lax.broadcasted_iota(i32, v.shape, 1)
        t = acc_s[:][:, 0:1]
        for j in range(32):
            t = t + jnp.max(jnp.where(lanes == t, v, -10**9), axis=1,
                            keepdims=True)
        acc_s[:, 0:1] = t

    variants = [
        ("empty body                 ", empty, {}),
        ("rw 7 scratch +astype       ", rw_astype, {}),
        ("rw 7 scratch pure i8       ", rw_i8, {}),
        ("rw 7 + 32x i32 adds        ", rw_loop32, {}),
        ("32x dirs row store         ", dirs_store, {}),
        ("32x lane roll (1 array)    ", rolls, {}),
        ("32x masked reduce (1 array)", reduces, {}),
        ("empty, no dirs out         ", empty, dict(with_dirs=False)),
    ]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    for tag, body, kv in variants:
        if only and only not in tag:
            continue
        try:
            run(tag, body, **kv)
        except Exception as exc:
            print(f"{tag}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:100]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
