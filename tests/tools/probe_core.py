#!/usr/bin/env python3
"""Locate where the extd kernel's cycles go: time a ladder of stripped-down
step-window kernels at the production shape (TB=64, Wb=640, ROWS=32, i32
lanes) from bare VMEM-roundtrip up to the full recurrence.

Levels:
  0 rw       : read the 7 state arrays to i32, write back (traffic floor)
  1 core     : + the 5-channel max recurrence (no masks/bounds/dirs)
  2 masks    : + per-row band masks and boundary writes
  3 dirs     : + direction assembly + per-row dirs store
  4 approx   : + approx-max/z-drop bookkeeping (2 masked lane reductions)
  5 slide    : + the between-step window roll
  6 qslide   : + the per-row unaligned query slice (static slice of qblk)

Diagnostic only; needs the chip.  Prints Gcells/s per level where a cell is
one (row, lane) position (TB * Wb * ROWS per step), i.e. PADDED cells — the
production kernel's live fraction at the bench shape is ~0.78.
"""
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def build(level, TB, Wb, ROWS, KR, dirs_mode="u8", s32=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i8, i32, u8 = jnp.int8, jnp.int32, jnp.uint8
    QR = Wb + 256

    def kernel(qbuf_ref, qlen_ref, res_ref, *rest):
        rest = list(rest)
        dirs_ref = rest.pop(0) if dirs_mode != "none" else None
        u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, acc_s = rest
        dpack = [None]  # i32 mode: 4 rows packed per lane
        k = pl.program_id(1)
        r0 = k * ROWS

        sdt = i32 if s32 else i8
        @pl.when(r0 == 0)
        def _init():
            for ref in (u_s, v_s, x_s, y_s, x2_s, y2_s, s_s):
                ref[:] = jnp.zeros((TB, Wb), sdt)
            acc_s[:] = jnp.zeros((TB, 16), i32)

        u = u_s[:].astype(i32)
        v = v_s[:].astype(i32)
        x = x_s[:].astype(i32)
        y = y_s[:].astype(i32)
        x2 = x2_s[:].astype(i32)
        y2 = y2_s[:].astype(i32)
        s = s_s[:].astype(i32)
        acc = acc_s[:]
        qlen = qlen_ref[:]
        lanes = jax.lax.broadcasted_iota(i32, (TB, Wb), 1)

        if level >= 5:
            @pl.when(r0 > 0)
            def _slide():
                hi = lanes >= Wb - 16
                for ref in (u_s, v_s, x_s, y_s, x2_s, y2_s, s_s):
                    ref[:] = jnp.where(hi, jnp.zeros((), sdt),
                                       jnp.roll(ref[:], -16, axis=1))

        if level >= 6:
            blk = qbuf_ref[:, pl.ds(pl.multiple_of(0, 128), QR)]
            qblk = pltpu.roll(blk.astype(i32), 7, axis=1)

        mx = acc[:, 0:1]
        H0 = acc[:, 1:2]
        lH0t = acc[:, 2:3]
        done = acc[:, 3:4]

        for j in range(ROWS):
            r = r0 + j
            if level == 0:
                u = u + 1  # keep arrays live
                continue
            if level >= 6:
                qv = qblk[:, ROWS - 1 - j:ROWS - 1 - j + Wb]
                sc = jnp.where(qv == s, i32(2), i32(-4))
            else:
                sc = s + 1
            if level >= 2:
                active = done == 0
                st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1),
                                  (r - 501 + 1) >> 1)
                en0 = jnp.minimum(jnp.minimum(qlen - 1, r), (r + 501) >> 1)
                st = st0 // 16 * 16
                en = (en0 + 16) // 16 * 16 - 1
                band = jnp.logical_and(active,
                                       jnp.logical_and(lanes >= st - 0,
                                                       lanes <= en - 0))
                onehot = jnp.logical_and(band, lanes == r - 0)
                uu = jnp.where(onehot, i32(-6), u)
            else:
                band = None
                uu = u
            lane0 = lanes == 0
            xt1 = jnp.where(lane0, i32(-6), jnp.roll(x, 1, axis=1))
            x2t1 = jnp.where(lane0, i32(-25), jnp.roll(x2, 1, axis=1))
            vt1 = jnp.where(lane0, i32(-6), jnp.roll(v, 1, axis=1))
            z = sc
            a_ = xt1 + vt1
            b_ = y + uu
            a2_ = x2t1 + vt1
            b2_ = y2 + uu
            if level >= 3:
                d = jnp.where(z > a_, i32(0), i32(1))
                z = jnp.maximum(z, a_)
                d = jnp.where(z > b_, d, i32(2))
                z = jnp.maximum(z, b_)
                d = jnp.where(z > a2_, d, i32(3))
                z = jnp.maximum(z, a2_)
                d = jnp.where(z > b2_, d, i32(4))
                z = jnp.maximum(z, b2_)
            else:
                z = jnp.maximum(jnp.maximum(z, a_),
                                jnp.maximum(b_, a2_))
                z = jnp.maximum(z, b2_)
                d = None
            z = jnp.minimum(z, i32(2))
            u_new = z - vt1
            v_new = z - uu
            zq = z - 6
            zq2 = z - 25
            an = a_ - zq
            bn = b_ - zq
            a2n = a2_ - zq2
            b2n = b2_ - zq2
            ax_, bx_ = an > 0, bn > 0
            a2x_, b2x_ = a2n > 0, b2n > 0
            x_new = jnp.where(ax_, an, 0) - 8
            y_new = jnp.where(bx_, bn, 0) - 8
            x2_new = jnp.where(a2x_, a2n, 0) - 26
            y2_new = jnp.where(b2x_, b2n, 0) - 26
            if level >= 3:
                d = d | jnp.where(ax_, i32(8), i32(0))
                d = d | jnp.where(bx_, i32(16), i32(0))
                d = d | jnp.where(a2x_, i32(32), i32(0))
                d = d | jnp.where(b2x_, i32(64), i32(0))
                dv = d if band is None else jnp.where(band, d, 0)
                if dirs_mode == "i32":
                    dpack[0] = (dv if j % 4 == 0
                                else dpack[0] | (dv << (8 * (j % 4))))
                    if j % 4 == 3:
                        dirs_ref[j // 4, :, :] = dpack[0]
                elif dirs_mode == "u8":
                    dirs_ref[j, :, :] = dv.astype(u8)
            if band is not None:
                u = jnp.where(band, u_new, uu)
                v = jnp.where(band, v_new, v)
                x = jnp.where(band, x_new, x)
                y = jnp.where(band, y_new, y)
                x2 = jnp.where(band, x2_new, x2)
                y2 = jnp.where(band, y2_new, y2)
                s = jnp.where(band, sc, s)
            else:
                u, v, x, y, x2, y2, s = (u_new, v_new, x_new, y_new,
                                         x2_new, y2_new, sc)
            if level >= 4:
                d0 = jnp.max(jnp.where(lanes == lH0t, v, -10**9),
                             axis=1, keepdims=True)
                d1 = jnp.max(jnp.where(lanes == lH0t + 1, u, -10**9),
                             axis=1, keepdims=True)
                adv = d1 > d0
                H0 = H0 + jnp.maximum(d0, d1)
                lH0t = jnp.where(adv, lH0t + 1, lH0t)
                better = H0 > mx
                mx = jnp.where(better, H0, mx)
                drop = jnp.logical_and(~better, mx - H0 > 400)
                done = jnp.where(drop, 1, done)

        u_s[:] = u.astype(sdt)
        v_s[:] = v.astype(sdt)
        x_s[:] = x.astype(sdt)
        y_s[:] = y.astype(sdt)
        x2_s[:] = x2.astype(sdt)
        y2_s[:] = y2.astype(sdt)
        s_s[:] = s.astype(sdt)
        acc_s[:] = jnp.concatenate(
            [mx, H0, lH0t, done, jnp.zeros((TB, 12), i32)], axis=1)

        @pl.when(k == KR - 1)
        def _out():
            res_ref[:] = acc_s[:]

    return kernel


def run_level(level, B=512, TB=64, Wb=640, ROWS=32, KR=63, reps=3,
              dirs_mode="u8", semantics=("arbitrary", "arbitrary"),
              s32=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    QR = Wb + 256
    kernel = build(level, TB, Wb, ROWS, KR, dirs_mode=dirs_mode, s32=s32)
    nB = B // TB
    if dirs_mode == "none":
        dirs_spec, dirs_shape = [], []
    elif dirs_mode == "i32":
        # 4 rows packed per i32 lane: one (TB, Wb) i32 write per 4 rows
        dirs_spec = [pl.BlockSpec((ROWS // 4, TB, Wb), lambda b, r: (r, b, 0),
                                  memory_space=pltpu.VMEM)]
        dirs_shape = [jax.ShapeDtypeStruct((KR * ROWS // 4, B, Wb),
                                           jnp.int32)]
    else:
        dirs_spec = [pl.BlockSpec((ROWS, TB, Wb), lambda b, r: (r, b, 0),
                                  memory_space=pltpu.VMEM)]
        dirs_shape = [jax.ShapeDtypeStruct((KR * ROWS, B, Wb), jnp.uint8)]
    f = pl.pallas_call(
        kernel,
        grid=(nB, KR),
        in_specs=[
            pl.BlockSpec((TB, QR + 128), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, 16), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            *dirs_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 16), jnp.int32),
            *dirs_shape,
        ),
        scratch_shapes=[pltpu.VMEM((TB, Wb),
                                   jnp.int32 if s32 else jnp.int8)] * 7
        + [pltpu.VMEM((TB, 16), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
    )
    jf = jax.jit(f)
    qbuf = np.zeros((B, QR + 128), np.uint8)
    qlen = np.full((B, 1), 1000, np.int32)

    def once():
        r = jf(qbuf, qlen)
        return np.asarray(r[0])

    once()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        once()
        best = min(best, time.time() - t0)
    cells = B * KR * ROWS * Wb
    return cells / best / 1e9, best


def main():
    levels = {
        0: "rw state only      ",
        1: "+core recurrence   ",
        2: "+band masks        ",
        3: "+dirs assembly+store",
        4: "+approx bookkeeping ",
        5: "+window slide      ",
        6: "+query slice       ",
    }
    variants = [
        ("L0 nodirs          ", dict(level=0, dirs_mode="none")),
        ("L3 nodirs          ", dict(level=3, dirs_mode="none")),
        ("L6 nodirs          ", dict(level=6, dirs_mode="none")),
        ("L0 dirs i32-packed ", dict(level=0, dirs_mode="i32")),
        ("L3 dirs i32-packed ", dict(level=3, dirs_mode="i32")),
        ("L6 dirs i32-packed ", dict(level=6, dirs_mode="i32")),
        ("L6 parallel-b      ", dict(level=6,
                                     semantics=("parallel", "arbitrary"))),
        ("L6 ROWS=64         ", dict(level=6, ROWS=64, KR=32)),
        ("L0 i32 scratch     ", dict(level=0, s32=True)),
        ("L6 i32 scratch     ", dict(level=6, s32=True)),
        ("L6 i32 ROWS=64     ", dict(level=6, s32=True, ROWS=64, KR=32)),
    ]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    if "--variants" in sys.argv:
        for name, kv in variants:
            if only and only not in name:
                continue
            try:
                g, t = run_level(**kv)
                print(f"{name}: {g:7.2f} Gcells/s padded "
                      f"({t*1e3:.0f} ms/call)")
            except Exception as exc:
                print(f"{name}: FAILED {type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:120]}")
            sys.stdout.flush()
        return
    for lv, name in levels.items():
        if only is not None and int(only) != lv:
            continue
        try:
            g, t = run_level(lv)
            print(f"L{lv} {name}: {g:7.2f} Gcells/s padded "
                  f"({t*1e3:.0f} ms/call)")
        except Exception as exc:
            print(f"L{lv} {name}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
