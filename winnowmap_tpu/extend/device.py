"""Batched banded affine-gap extension DP on device (JAX/XLA).

TPU-first re-expression of the reference anti-diagonal difference-form DP
(reference src/ksw2_extd2_sse.c, src/ksw2_extz2_sse.c): one jitted wavefront
loop advances a whole *batch* of alignments one anti-diagonal per step, with
the band held as a rolling window in on-chip memory.  Per-element state is
int8 with wrap-around, exactly like the SIMD kernels, so scores, z-drop
truncation points and direction bytes are bit-identical to the host oracle
(winnowmap_tpu/native wm_extd / wm_extz) -- including the 16-lane band
rounding and the 4-lane-strided row-max tie behaviour.

The direction-byte tensor is streamed out for host traceback (the path walk
is sequential and tiny compared to the DP).
"""
from __future__ import annotations

import ctypes
import functools
from dataclasses import dataclass

import numpy as np

from .. import native

NEG_INF = -0x40000000


@dataclass
class BatchExtResult:
    """Per-alignment results mirroring wm_ext_result (arrays of shape (B,))."""

    max: np.ndarray
    zdropped: np.ndarray
    max_q: np.ndarray
    max_t: np.ndarray
    mqe: np.ndarray
    mqe_t: np.ndarray
    mte: np.ndarray
    mte_q: np.ndarray
    score: np.ndarray
    reach_end: np.ndarray
    dirs: np.ndarray | None  # (B, R, Wb) uint8
    off: np.ndarray | None  # (B, R) int32 rounded band start per round
    off_end: np.ndarray | None  # (B, R) int32 rounded band end per round

    def cigar(self, b: int, i0: int, j0: int, rev_cigar: bool) -> np.ndarray:
        """Host traceback for alignment b ending at (t=i0, q=j0)."""
        L = native.lib()
        if not hasattr(L, "_bt_ready"):
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            L.wm_backtrack_band.argtypes = [
                u8p, i32p, i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
            ]
            L.wm_backtrack_band.restype = ctypes.c_int
            L._bt_ready = True
        out = ctypes.POINTER(ctypes.c_uint32)()
        p = np.ascontiguousarray(self.dirs[b])
        off = np.ascontiguousarray(self.off[b])
        off_end = np.ascontiguousarray(self.off_end[b])
        n = L.wm_backtrack_band(
            p, off, off_end, p.shape[1], i0, j0, int(rev_cigar),
            ctypes.byref(out),
        )
        if n == 0:
            return np.zeros(0, np.uint32)
        cig = np.ctypeslib.as_array(out, (n,)).copy()
        L.wm_free(out)
        return cig


def _build_extd_step(Lq, Lt, Wb, q, e, q2, e2, w, zdrop, approx_max,
                     right_gaps, with_cigar, approx_drop):
    """Construct the per-anti-diagonal update (closed over static params)."""
    import jax
    import jax.numpy as jnp

    i8 = jnp.int8
    i32 = jnp.int32
    qe = q + e
    init_xy = np.int8(-(q + e))
    init_xy2 = np.int8(-(q2 + e2))
    if e != e2:
        long_thres = (q2 - q) // (e - e2) - 1
    else:
        long_thres = 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = np.int8(long_thres * (e - e2) - (q2 - q) - e2)

    lanes = jnp.arange(Wb, dtype=i32)

    def ubound(r):
        # u[r]/v1 boundary value at t == r (reference ksw2_extd2_sse.c:150-155)
        return jnp.where(
            r == 0, jnp.int8(init_xy),
            jnp.where(r < long_thres, jnp.int8(-e),
                      jnp.where(r == long_thres, long_diff, jnp.int8(-e2))),
        )

    def step(r, carry):
        (u, v, x, y, x2, y2, s, H, H_left, base, last_st, last_en, done, res,
         qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N, dirs, offs, offs_end) = carry
        (mx, zdr, max_q, max_t, mqe, mqe_t, mte, mte_q, score, H0, lH0t) = res

        B = qlen.shape[0]
        active = (~done) & (r < qlen + tlen - 1)

        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
        collapse = active & (st0 > en0)
        zdr = jnp.where(collapse, 1, zdr)
        done = done | collapse
        active = active & ~collapse

        st = st0 // 16 * 16
        en = (en0 + 16) // 16 * 16 - 1

        # ---- boundary values from the pre-shift window ----
        # (comparisons of loop-derived ints vs literal 0 avoid the `> 0`
        # form: the axon TPU backend miscompiles gt(x, 0) in lax loops)
        shift16 = active & (st > base)
        x1_b = jnp.where(shift16, x[:, 15], init_xy)
        x21_b = jnp.where(shift16, x2[:, 15], init_xy2)
        v1_b = jnp.where(shift16, v[:, 15], init_xy)
        in_prev = (st - 1 >= last_st) & (st - 1 <= last_en)
        x1_b = jnp.where(in_prev, x1_b, init_xy)
        x21_b = jnp.where(in_prev, x21_b, init_xy2)
        v1_b = jnp.where(in_prev, v1_b, init_xy)
        at0 = st == 0
        x1 = jnp.where(at0, init_xy, x1_b)
        x21 = jnp.where(at0, init_xy2, x21_b)
        v1 = jnp.where(at0, ubound(r).astype(i8), v1_b.astype(i8))

        # ---- roll the window left by 16 when the band start advanced ----
        def roll16(a, fill):
            rolled = jnp.roll(a, -16, axis=1)
            rolled = jnp.where(lanes[None, :] >= Wb - 16, fill, rolled)
            return jnp.where(shift16[:, None], rolled, a)

        u = roll16(u, init_xy)
        v = roll16(v, init_xy)
        x = roll16(x, init_xy)
        y = roll16(y, init_xy)
        x2 = roll16(x2, init_xy2)
        y2 = roll16(y2, init_xy2)
        s = roll16(s, jnp.int8(0))
        # H at (new base - 1): last computed before the lane leaves the window
        H_left = jnp.where(shift16, H[:, 15], H_left)
        H = jnp.where(
            shift16[:, None],
            jnp.where(lanes[None, :] >= Wb - 16, NEG_INF, jnp.roll(H, -16, axis=1)),
            H,
        )
        base = jnp.where(active, st, base)

        # ---- u[r]/y[r] boundary cell (t == r inside the rounded band) ----
        r_lane = r - st
        has_r = active & (en >= r) & (r_lane >= 0) & (r_lane < Wb)
        onehot_r = has_r[:, None] & (lanes[None, :] == r_lane[:, None])
        y = jnp.where(onehot_r, init_xy, y)
        y2 = jnp.where(onehot_r, init_xy2, y2)
        u = jnp.where(onehot_r, ubound(r).astype(i8), u)

        # ---- score row: chunked coverage [st0, st0+16*floor((en0-st0)/16)+15]
        t_abs = st[:, None] + lanes[None, :]
        cover_last = st0 + (en0 - st0) // 16 * 16 + 15
        s_mask = active[:, None] & (t_abs >= st0[:, None]) & (t_abs <= cover_last[:, None])
        sfv = jnp.take_along_axis(sf, jnp.minimum(t_abs, Lt - 1), axis=1)
        sfv = jnp.where(t_abs < Lt, sfv, 0).astype(jnp.uint8)
        qidx = (qlen - 1 - r)[:, None] + t_abs
        qv = jnp.take_along_axis(qr, jnp.clip(qidx, 0, Lq - 1), axis=1)
        qv = jnp.where((qidx >= 0) & (qidx < Lq), qv, 0).astype(jnp.uint8)
        sc = jnp.where(
            (sfv == 4) | (qv == 4), sc_N[:, None],
            jnp.where(sfv == qv, sc_mch[:, None], sc_mis[:, None]),
        ).astype(i8)
        s = jnp.where(s_mask, sc, s)

        # ---- core recurrence over the rounded band [st, en] ----
        band_mask = active[:, None] & (t_abs <= en[:, None])

        def shl1(a, boundary):
            shifted = jnp.roll(a, 1, axis=1)
            return shifted.at[:, 0].set(boundary)

        xt1 = shl1(x, x1)
        x2t1 = shl1(x2, x21)
        vt1 = shl1(v, v1)
        z = s
        a_ = (xt1 + vt1).astype(i8)
        b_ = (y + u).astype(i8)
        a2_ = (x2t1 + vt1).astype(i8)
        b2_ = (y2 + u).astype(i8)
        if not right_gaps:
            d = jnp.where(a_ > z, 1, 0).astype(jnp.uint8)
            z = jnp.maximum(z, a_)
            d = jnp.where(b_ > z, 2, d)
            z = jnp.maximum(z, b_)
            d = jnp.where(a2_ > z, 3, d)
            z = jnp.maximum(z, a2_)
            d = jnp.where(b2_ > z, 4, d)
            z = jnp.maximum(z, b2_)
        else:
            d = jnp.where(z > a_, 0, 1).astype(jnp.uint8)
            z = jnp.maximum(z, a_)
            d = jnp.where(z > b_, d, 2)
            z = jnp.maximum(z, b_)
            d = jnp.where(z > a2_, d, 3)
            z = jnp.maximum(z, a2_)
            d = jnp.where(z > b2_, d, 4)
            z = jnp.maximum(z, b2_)
        z = jnp.minimum(z, sc_mch[:, None].astype(i8))
        u_new = (z - vt1).astype(i8)
        v_new = (z - u).astype(i8)
        zq = (z - q).astype(i8)
        zq2 = (z - q2).astype(i8)
        an = (a_ - zq).astype(i8)
        bn = (b_ - zq).astype(i8)
        a2n = (a2_ - zq2).astype(i8)
        b2n = (b2_ - zq2).astype(i8)
        if not right_gaps:
            ax_, bx_, a2x_, b2x_ = an > 0, bn > 0, a2n > 0, b2n > 0
        else:
            ax_, bx_ = ~(0 > an), ~(0 > bn)
            a2x_, b2x_ = ~(0 > a2n), ~(0 > b2n)
        x_new = (jnp.where(ax_, an, 0) - qe).astype(i8)
        y_new = (jnp.where(bx_, bn, 0) - qe).astype(i8)
        x2_new = (jnp.where(a2x_, a2n, 0) - (q2 + e2)).astype(i8)
        y2_new = (jnp.where(b2x_, b2n, 0) - (q2 + e2)).astype(i8)
        d = d | jnp.where(ax_, 0x08, 0).astype(jnp.uint8)
        d = d | jnp.where(bx_, 0x10, 0).astype(jnp.uint8)
        d = d | jnp.where(a2x_, 0x20, 0).astype(jnp.uint8)
        d = d | jnp.where(b2x_, 0x40, 0).astype(jnp.uint8)

        u = jnp.where(band_mask, u_new, u)
        v = jnp.where(band_mask, v_new, v)
        x = jnp.where(band_mask, x_new, x)
        y = jnp.where(band_mask, y_new, y)
        x2 = jnp.where(band_mask, x2_new, x2)
        y2 = jnp.where(band_mask, y2_new, y2)

        if with_cigar:
            dirs = jax.lax.dynamic_update_slice_in_dim(
                dirs, jnp.where(band_mask, d, 0).astype(jnp.uint8)[:, None, :],
                r, axis=1,
            )
            offs = jax.lax.dynamic_update_slice_in_dim(
                offs, jnp.where(active, st, 0).astype(i32)[:, None], r, axis=1
            )
            offs_end = jax.lax.dynamic_update_slice_in_dim(
                offs_end, jnp.where(active, en, 0).astype(i32)[:, None], r, axis=1
            )

        # ---- H phase ----
        if not approx_max:
            lane_en0 = en0 - st
            lane_st0 = st0 - st
            vi = v.astype(i32)
            ui = u.astype(i32)
            H_en0_prev = jnp.take_along_axis(H, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            H_en0m1_prev = jnp.take_along_axis(
                H, jnp.maximum(lane_en0 - 1, 0)[:, None], axis=1
            )[:, 0]
            H_en0m1_prev = jnp.where(lane_en0 - 1 < 0, H_left, H_en0m1_prev)
            u_en0 = jnp.take_along_axis(ui, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            v_en0 = jnp.take_along_axis(vi, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            Hen0_new = jnp.where(en0 >= 1, H_en0m1_prev + u_en0, H_en0_prev + v_en0)
            upd_mask = (t_abs >= st0[:, None]) & (t_abs < en0[:, None])
            H_upd = jnp.where(upd_mask, H + vi, H)
            H_upd = jnp.where(
                lanes[None, :] == lane_en0[:, None], Hen0_new[:, None], H_upd
            )
            H_r0 = jnp.where(
                lanes[None, :] == 0, (v.astype(i32)[:, 0] - qe)[:, None], H
            )
            H_new = jnp.where((r == 0), H_r0, H_upd)
            H = jnp.where(active[:, None], H_new, H)

            # row max with the reference's 4-lane-strided tie behaviour
            Hen0 = jnp.where(r == 0, H[:, 0], Hen0_new)
            max_H = Hen0
            max_tv = jnp.where(r == 0, 0, en0)
            en1 = st0 + (en0 - st0) // 4 * 4
            stride_mask = (t_abs >= st0[:, None]) & (t_abs < en1[:, None])
            lane_mod = (t_abs - st0[:, None]) % 4
            big = jnp.int32(NEG_INF)
            for l in range(4):
                ml = stride_mask & (lane_mod == l)
                Hl = jnp.where(ml, H, big)
                HH = Hl.max(axis=1)
                tt = jnp.where(
                    (Hl == HH[:, None]) & ml, t_abs, jnp.int32(0x7FFFFFFF)
                ).min(axis=1)
                upd = (r >= 1) & (HH > max_H)
                max_tv = jnp.where(upd, tt, max_tv)
                max_H = jnp.where(upd, HH, max_H)
            tail_mask = (t_abs >= en1[:, None]) & (t_abs < en0[:, None])
            Ht = jnp.where(tail_mask, H, big)
            HT = Ht.max(axis=1)
            ttail = jnp.where(
                (Ht == HT[:, None]) & tail_mask, t_abs, jnp.int32(0x7FFFFFFF)
            ).min(axis=1)
            upd = (r >= 1) & (HT > max_H)
            max_tv = jnp.where(upd, ttail, max_tv)
            max_H = jnp.where(upd, HT, max_H)

            H_en0_now = jnp.take_along_axis(H, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            H_st0_now = jnp.take_along_axis(H, jnp.maximum(lane_st0, 0)[:, None], axis=1)[:, 0]
            mte_upd = active & (en0 == tlen - 1) & (H_en0_now > mte)
            mte = jnp.where(mte_upd, H_en0_now, mte)
            mte_q = jnp.where(mte_upd, r - en, mte_q)
            mqe_upd = active & (r - st0 == qlen - 1) & (H_st0_now > mqe)
            mqe = jnp.where(mqe_upd, H_st0_now, mqe)
            mqe_t = jnp.where(mqe_upd, st0, mqe_t)

            # z-drop (reference ksw2.h:160-176, is_rot)
            better = max_H > mx
            mx_n = jnp.where(better, max_H, mx)
            max_t_n = jnp.where(better, max_tv, max_t)
            max_q_n = jnp.where(better, r - max_tv, max_q)
            inquad = (~better) & (max_tv >= max_t) & (r - max_tv >= max_q)
            tl_ = max_tv - max_t
            ql_ = (r - max_tv) - max_q
            ldiff = jnp.abs(tl_ - ql_)
            dropped = inquad & (zdrop >= 0) & (mx - max_H > zdrop + ldiff * e2)
            dropped = active & dropped
            zdr = jnp.where(dropped, 1, zdr)
            done = done | dropped
            mx = jnp.where(active, mx_n, mx)
            max_t = jnp.where(active, max_t_n, max_t)
            max_q = jnp.where(active, max_q_n, max_q)

            fin = active & (~dropped) & (r == qlen + tlen - 2) & (en0 == tlen - 1)
            score = jnp.where(fin, H_en0_now, score)
        else:
            vi = v.astype(i32)
            ui = u.astype(i32)
            d0 = jnp.take_along_axis(vi, jnp.clip(lH0t - st, 0, Wb - 1)[:, None], axis=1)[:, 0]
            d1 = jnp.take_along_axis(
                ui, jnp.clip(lH0t + 1 - st, 0, Wb - 1)[:, None], axis=1
            )[:, 0]
            both_in = (lH0t >= st0) & (lH0t <= en0) & (lH0t + 1 >= st0) & (lH0t + 1 <= en0)
            only_cur = (lH0t >= st0) & (lH0t <= en0)
            H0_new = jnp.where(
                both_in,
                H0 + jnp.maximum(d0, d1),
                jnp.where(only_cur, H0 + d0, H0 + d1),
            )
            lH0t_new = jnp.where(
                both_in & (d1 > d0), lH0t + 1, jnp.where(only_cur, lH0t, lH0t + 1)
            )
            H0_new = jnp.where(r == 0, vi[:, 0] - qe, H0_new)
            lH0t_new = jnp.where(r == 0, 0, lH0t_new)
            H0 = jnp.where(active, H0_new, H0)
            lH0t = jnp.where(active, lH0t_new, lH0t)
            if approx_drop:
                better = H0 > mx
                mx_n = jnp.where(better, H0, mx)
                mt_n = jnp.where(better, lH0t, max_t)
                mq_n = jnp.where(better, r - lH0t, max_q)
                inquad = (~better) & (lH0t >= max_t) & (r - lH0t >= max_q)
                ldiff = jnp.abs((lH0t - max_t) - ((r - lH0t) - max_q))
                dropped = active & inquad & (zdrop >= 0) & (mx - H0 > zdrop + ldiff * e2)
                zdr = jnp.where(dropped, 1, zdr)
                done = done | dropped
                mx = jnp.where(active, mx_n, mx)
                max_t = jnp.where(active, mt_n, max_t)
                max_q = jnp.where(active, mq_n, max_q)
            fin = active & (r == qlen + tlen - 2) & (en0 == tlen - 1)
            score = jnp.where(fin, H0, score)

        last_st = jnp.where(active, st, last_st)
        last_en = jnp.where(active, en, last_en)

        res = (mx, zdr, max_q, max_t, mqe, mqe_t, mte, mte_q, score, H0, lH0t)
        return (u, v, x, y, x2, y2, s, H, H_left, base, last_st, last_en, done,
                res, qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N, dirs, offs,
                offs_end)

    return step


@functools.lru_cache(maxsize=64)
def _compiled_extd(Lq, Lt, Wb, R, q, e, q2, e2, w, zdrop, approx_max,
                   right_gaps, with_cigar, approx_drop, backend):
    import jax
    import jax.numpy as jnp

    step = _build_extd_step(Lq, Lt, Wb, q, e, q2, e2, w, zdrop, approx_max,
                            right_gaps, with_cigar, approx_drop)

    def run(qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N):
        B = qr.shape[0]
        i8, i32 = jnp.int8, jnp.int32
        init_xy = jnp.full((B, Wb), -(q + e), i8)
        init_xy2 = jnp.full((B, Wb), -(q2 + e2), i8)
        u = init_xy
        v = init_xy
        x = init_xy
        y = init_xy
        x2 = init_xy2
        y2 = init_xy2
        s = jnp.zeros((B, Wb), i8)
        H = jnp.full((B, Wb), NEG_INF, i32)
        base = jnp.zeros(B, i32)
        last_st = jnp.full(B, -1, i32)
        last_en = jnp.full(B, -1, i32)
        done = jnp.zeros(B, bool)
        res = (
            jnp.zeros(B, i32),  # max
            jnp.zeros(B, i32),  # zdropped
            jnp.full(B, -1, i32),  # max_q
            jnp.full(B, -1, i32),  # max_t
            jnp.full(B, NEG_INF, i32),  # mqe
            jnp.full(B, -1, i32),  # mqe_t
            jnp.full(B, NEG_INF, i32),  # mte
            jnp.full(B, -1, i32),  # mte_q
            jnp.full(B, NEG_INF, i32),  # score
            jnp.zeros(B, i32),  # H0
            jnp.zeros(B, i32),  # last_H0_t
        )
        if with_cigar:
            dirs = jnp.zeros((B, R, Wb), jnp.uint8)
            offs = jnp.zeros((B, R), i32)
            offs_end = jnp.zeros((B, R), i32)
        else:
            dirs = jnp.zeros((1, 1, 1), jnp.uint8)
            offs = jnp.zeros((1, 1), i32)
            offs_end = jnp.zeros((1, 1), i32)
        H_left = jnp.full(B, NEG_INF, i32)
        carry = (u, v, x, y, x2, y2, s, H, H_left, base, last_st, last_en,
                 done, res, qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N, dirs,
                 offs, offs_end)
        carry = jax.lax.fori_loop(0, R, step, carry)
        res = carry[13]
        return res, carry[21], carry[22], carry[23]

    return jax.jit(run, backend=backend or None)


def extd_batch(qseqs, tseqs, mat, q, e, q2, e2, w, zdrop, end_bonus, flag,
               backend=None) -> BatchExtResult:
    """Batched wm_extd-equivalent.  qseqs/tseqs: lists of uint8 code arrays.

    `w` must be >= 0 (callers pass the banded width; full-matrix calls go to
    the host kernel).  All alignments in the batch share scoring params.
    """
    if q2 + e2 < q + e:
        q, q2 = q2, q
        e, e2 = e2, e
    B = len(qseqs)
    qlen = np.array([len(s) for s in qseqs], np.int32)
    tlen = np.array([len(s) for s in tseqs], np.int32)
    Lq = int(max(1, qlen.max()))
    Lt = int(max(1, tlen.max()))
    R = Lq + Lt - 1
    n_col = min(min(Lq, Lt), w + 1)
    Wb = ((n_col + 15) // 16 + 1) * 16
    Wb = max(Wb, 32)

    qr = np.zeros((B, Lq + 16), np.uint8)
    sf = np.zeros((B, Lt + 16), np.uint8)
    for i, (qs, ts) in enumerate(zip(qseqs, tseqs)):
        qr[i, : len(qs)] = qs[::-1]
        sf[i, : len(ts)] = ts
    mat = np.asarray(mat, np.int8)
    sc_mch = np.full(B, mat[0], np.int8)
    sc_mis = np.full(B, mat[1], np.int8)
    sc_N = np.full(B, -e2 if mat[24] == 0 else mat[24], np.int8)

    with_cigar = not (flag & 0x01)
    approx_max = bool(flag & 0x08)
    approx_drop = bool(flag & 0x10)
    right_gaps = bool(flag & 0x02)

    run = _compiled_extd(Lq + 16, Lt + 16, Wb, R, q, e, q2, e2, w, zdrop,
                         approx_max, right_gaps, with_cigar, approx_drop,
                         backend)
    res, dirs, offs, offs_end = run(qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N)
    (mx, zdr, max_q, max_t, mqe, mqe_t, mte, mte_q, score, H0, lH0t) = [
        np.asarray(a) for a in res
    ]
    reach = np.zeros(B, bool)
    out = BatchExtResult(
        max=mx, zdropped=zdr.astype(bool), max_q=max_q, max_t=max_t,
        mqe=mqe, mqe_t=mqe_t, mte=mte, mte_q=mte_q, score=score, reach_end=reach,
        dirs=np.asarray(dirs) if with_cigar else None,
        off=np.asarray(offs) if with_cigar else None,
        off_end=np.asarray(offs_end) if with_cigar else None,
    )
    return out


def _build_extz_step(Lq, Lt, Wb, q, e, w, zdrop, approx_max, right_gaps,
                     with_cigar, approx_drop):
    """Single-gap-cost variant (reference ksw2_extz2_sse.c): biased-unsigned
    uint8 state with the SIMD kernel's signed/unsigned comparison mix."""
    import jax
    import jax.numpy as jnp

    u8 = jnp.uint8
    i8 = jnp.int8
    i32 = jnp.int32
    qe = q + e
    qe2 = 2 * (q + e)
    lanes = jnp.arange(Wb, dtype=i32)

    def step(r, carry):
        (u, v, x, y, s, H, H_left, base, last_st, last_en, done, res, qr, sf,
         qlen, tlen, sc_mch, sc_mis, sc_N, max_sc, dirs, offs, offs_end) = carry
        (mx, zdr, max_q, max_t, mqe, mqe_t, mte, mte_q, score, H0, lH0t) = res

        active = (~done) & (r < qlen + tlen - 1)
        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
        collapse = active & (st0 > en0)
        zdr = jnp.where(collapse, 1, zdr)
        done = done | collapse
        active = active & ~collapse

        st = st0 // 16 * 16
        en = (en0 + 16) // 16 * 16 - 1

        shift16 = active & (st > base)
        in_prev = (st - 1 >= last_st) & (st - 1 <= last_en)
        x1 = jnp.where(shift16 & in_prev, x[:, 15], u8(0))
        v1 = jnp.where(shift16 & in_prev, v[:, 15], u8(0))
        at0 = st == 0
        x1 = jnp.where(at0, u8(0), x1)
        v1 = jnp.where(at0, jnp.where(r >= 1, u8(q), u8(0)), v1)

        def roll16(a, fill):
            rolled = jnp.roll(a, -16, axis=1)
            rolled = jnp.where(lanes[None, :] >= Wb - 16, fill, rolled)
            return jnp.where(shift16[:, None], rolled, a)

        u = roll16(u, u8(0))
        v = roll16(v, u8(0))
        x = roll16(x, u8(0))
        y = roll16(y, u8(0))
        s = roll16(s, u8(0))
        H_left = jnp.where(shift16, H[:, 15], H_left)
        H = jnp.where(
            shift16[:, None],
            jnp.where(lanes[None, :] >= Wb - 16, NEG_INF, jnp.roll(H, -16, axis=1)),
            H,
        )
        base = jnp.where(active, st, base)

        r_lane = r - st
        has_r = active & (en >= r) & (r_lane >= 0) & (r_lane < Wb)
        onehot_r = has_r[:, None] & (lanes[None, :] == r_lane[:, None])
        y = jnp.where(onehot_r, u8(0), y)
        u = jnp.where(onehot_r, jnp.where(r >= 1, u8(q), u8(0)), u)

        t_abs = st[:, None] + lanes[None, :]
        cover_last = st0 + (en0 - st0) // 16 * 16 + 15
        s_mask = active[:, None] & (t_abs >= st0[:, None]) & (t_abs <= cover_last[:, None])
        sfv = jnp.take_along_axis(sf, jnp.minimum(t_abs, Lt - 1), axis=1)
        sfv = jnp.where(t_abs < Lt, sfv, 0).astype(u8)
        qidx = (qlen - 1 - r)[:, None] + t_abs
        qv = jnp.take_along_axis(qr, jnp.clip(qidx, 0, Lq - 1), axis=1)
        qv = jnp.where((qidx >= 0) & (qidx < Lq), qv, 0).astype(u8)
        sc = jnp.where(
            (sfv == 4) | (qv == 4), sc_N[:, None],
            jnp.where(sfv == qv, sc_mch[:, None], sc_mis[:, None]),
        ).astype(u8)
        s = jnp.where(s_mask, sc, s)

        band_mask = active[:, None] & (t_abs <= en[:, None])

        def shl1(a, boundary):
            shifted = jnp.roll(a, 1, axis=1)
            return shifted.at[:, 0].set(boundary)

        xt1 = shl1(x, x1)
        vt1 = shl1(v, v1)
        z = (s + u8(qe2)).astype(u8)
        a_ = (xt1 + vt1).astype(u8)
        b_ = (y + u).astype(u8)
        zs = z.astype(i8)
        as_ = a_.astype(i8)
        bs = b_.astype(i8)
        if not right_gaps:
            d = jnp.where(as_ > zs, 1, 0).astype(u8)
            z = jnp.maximum(zs, as_).astype(u8)
            d = jnp.where(bs > z.astype(i8), 2, d)
        else:
            d = jnp.where(zs > as_, 0, 1).astype(u8)
            z = jnp.maximum(zs, as_).astype(u8)
            d = jnp.where(z.astype(i8) > bs, d, 2)
        z = jnp.maximum(z, b_)  # unsigned max (epu8)
        z = jnp.minimum(z, max_sc[:, None])  # unsigned min
        u_new = (z - vt1).astype(u8)
        v_new = (z - u).astype(u8)
        zq = (z - u8(q)).astype(u8)
        an = (a_ - zq).astype(u8)
        bn = (b_ - zq).astype(u8)
        ans = an.astype(i8)
        bns = bn.astype(i8)
        if not right_gaps:
            ax_, bx_ = ans > 0, bns > 0
        else:
            ax_, bx_ = ~(0 > ans), ~(0 > bns)
        x_new = jnp.where(ax_, an, u8(0))
        y_new = jnp.where(bx_, bn, u8(0))
        d = d | jnp.where(ax_, 0x08, 0).astype(u8)
        d = d | jnp.where(bx_, 0x10, 0).astype(u8)

        u = jnp.where(band_mask, u_new, u)
        v = jnp.where(band_mask, v_new, v)
        x = jnp.where(band_mask, x_new, x)
        y = jnp.where(band_mask, y_new, y)

        if with_cigar:
            dirs = jax.lax.dynamic_update_slice_in_dim(
                dirs, jnp.where(band_mask, d, 0).astype(u8)[:, None, :], r, axis=1
            )
            offs = jax.lax.dynamic_update_slice_in_dim(
                offs, jnp.where(active, st, 0).astype(i32)[:, None], r, axis=1
            )
            offs_end = jax.lax.dynamic_update_slice_in_dim(
                offs_end, jnp.where(active, en, 0).astype(i32)[:, None], r, axis=1
            )

        if not approx_max:
            lane_en0 = en0 - st
            lane_st0 = st0 - st
            vi = v.astype(i32)
            ui = u.astype(i32)
            H_en0_prev = jnp.take_along_axis(H, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            H_en0m1_prev = jnp.take_along_axis(
                H, jnp.maximum(lane_en0 - 1, 0)[:, None], axis=1
            )[:, 0]
            H_en0m1_prev = jnp.where(lane_en0 - 1 < 0, H_left, H_en0m1_prev)
            u_en0 = jnp.take_along_axis(ui, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            v_en0 = jnp.take_along_axis(vi, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            Hen0_new = jnp.where(
                en0 >= 1, H_en0m1_prev + u_en0 - qe, H_en0_prev + v_en0 - qe
            )
            upd_mask = (t_abs >= st0[:, None]) & (t_abs < en0[:, None])
            H_upd = jnp.where(upd_mask, H + vi - qe, H)
            H_upd = jnp.where(
                lanes[None, :] == lane_en0[:, None], Hen0_new[:, None], H_upd
            )
            H_r0 = jnp.where(
                lanes[None, :] == 0, (v.astype(i32)[:, 0] - qe - qe)[:, None], H
            )
            H_new = jnp.where((r == 0), H_r0, H_upd)
            H = jnp.where(active[:, None], H_new, H)

            Hen0 = jnp.where(r == 0, H[:, 0], Hen0_new)
            max_H = Hen0
            max_tv = jnp.where(r == 0, 0, en0)
            en1 = st0 + (en0 - st0) // 4 * 4
            stride_mask = (t_abs >= st0[:, None]) & (t_abs < en1[:, None])
            lane_mod = (t_abs - st0[:, None]) % 4
            big = jnp.int32(NEG_INF)
            for l in range(4):
                ml = stride_mask & (lane_mod == l)
                Hl = jnp.where(ml, H, big)
                HH = Hl.max(axis=1)
                tt = jnp.where(
                    (Hl == HH[:, None]) & ml, t_abs, jnp.int32(0x7FFFFFFF)
                ).min(axis=1)
                upd = (r >= 1) & (HH > max_H)
                max_tv = jnp.where(upd, tt, max_tv)
                max_H = jnp.where(upd, HH, max_H)
            tail_mask = (t_abs >= en1[:, None]) & (t_abs < en0[:, None])
            Ht = jnp.where(tail_mask, H, big)
            HT = Ht.max(axis=1)
            ttail = jnp.where(
                (Ht == HT[:, None]) & tail_mask, t_abs, jnp.int32(0x7FFFFFFF)
            ).min(axis=1)
            upd = (r >= 1) & (HT > max_H)
            max_tv = jnp.where(upd, ttail, max_tv)
            max_H = jnp.where(upd, HT, max_H)

            H_en0_now = jnp.take_along_axis(H, jnp.maximum(lane_en0, 0)[:, None], axis=1)[:, 0]
            H_st0_now = jnp.take_along_axis(H, jnp.maximum(lane_st0, 0)[:, None], axis=1)[:, 0]
            mte_upd = active & (en0 == tlen - 1) & (H_en0_now > mte)
            mte = jnp.where(mte_upd, H_en0_now, mte)
            mte_q = jnp.where(mte_upd, r - en, mte_q)
            mqe_upd = active & (r - st0 == qlen - 1) & (H_st0_now > mqe)
            mqe = jnp.where(mqe_upd, H_st0_now, mqe)
            mqe_t = jnp.where(mqe_upd, st0, mqe_t)

            better = max_H > mx
            mx_n = jnp.where(better, max_H, mx)
            max_t_n = jnp.where(better, max_tv, max_t)
            max_q_n = jnp.where(better, r - max_tv, max_q)
            inquad = (~better) & (max_tv >= max_t) & (r - max_tv >= max_q)
            ldiff = jnp.abs((max_tv - max_t) - ((r - max_tv) - max_q))
            dropped = active & inquad & (zdrop >= 0) & (mx - max_H > zdrop + ldiff * e)
            zdr = jnp.where(dropped, 1, zdr)
            done = done | dropped
            mx = jnp.where(active, mx_n, mx)
            max_t = jnp.where(active, max_t_n, max_t)
            max_q = jnp.where(active, max_q_n, max_q)
            fin = active & (~dropped) & (r == qlen + tlen - 2) & (en0 == tlen - 1)
            score = jnp.where(fin, H_en0_now, score)
        else:
            vi = v.astype(i32)
            ui = u.astype(i32)
            d0 = jnp.take_along_axis(vi, jnp.clip(lH0t - st, 0, Wb - 1)[:, None], axis=1)[:, 0] - qe
            d1 = jnp.take_along_axis(
                ui, jnp.clip(lH0t + 1 - st, 0, Wb - 1)[:, None], axis=1
            )[:, 0] - qe
            both_in = (lH0t >= st0) & (lH0t <= en0) & (lH0t + 1 >= st0) & (lH0t + 1 <= en0)
            only_cur = (lH0t >= st0) & (lH0t <= en0)
            H0_new = jnp.where(
                both_in, H0 + jnp.maximum(d0, d1),
                jnp.where(only_cur, H0 + d0, H0 + d1),
            )
            lH0t_new = jnp.where(
                both_in & (d1 > d0), lH0t + 1, jnp.where(only_cur, lH0t, lH0t + 1)
            )
            H0_new = jnp.where(r == 0, vi[:, 0] - qe - qe, H0_new)
            lH0t_new = jnp.where(r == 0, 0, lH0t_new)
            H0 = jnp.where(active, H0_new, H0)
            lH0t = jnp.where(active, lH0t_new, lH0t)
            if approx_drop:
                better = H0 > mx
                mx_n = jnp.where(better, H0, mx)
                mt_n = jnp.where(better, lH0t, max_t)
                mq_n = jnp.where(better, r - lH0t, max_q)
                inquad = (~better) & (lH0t >= max_t) & (r - lH0t >= max_q)
                ldiff = jnp.abs((lH0t - max_t) - ((r - lH0t) - max_q))
                dropped = active & inquad & (zdrop >= 0) & (mx - H0 > zdrop + ldiff * e)
                zdr = jnp.where(dropped, 1, zdr)
                done = done | dropped
                mx = jnp.where(active, mx_n, mx)
                max_t = jnp.where(active, mt_n, max_t)
                max_q = jnp.where(active, mq_n, max_q)
            fin = active & (r == qlen + tlen - 2) & (en0 == tlen - 1)
            score = jnp.where(fin, H0, score)

        last_st = jnp.where(active, st, last_st)
        last_en = jnp.where(active, en, last_en)
        res = (mx, zdr, max_q, max_t, mqe, mqe_t, mte, mte_q, score, H0, lH0t)
        return (u, v, x, y, s, H, H_left, base, last_st, last_en, done, res,
                qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N, max_sc, dirs, offs,
                offs_end)

    return step


@functools.lru_cache(maxsize=64)
def _compiled_extz(Lq, Lt, Wb, R, q, e, w, zdrop, approx_max, right_gaps,
                   with_cigar, approx_drop, backend):
    import jax
    import jax.numpy as jnp

    step = _build_extz_step(Lq, Lt, Wb, q, e, w, zdrop, approx_max,
                            right_gaps, with_cigar, approx_drop)

    def run(qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N, max_sc):
        B = qr.shape[0]
        u8, i32 = jnp.uint8, jnp.int32
        z8 = jnp.zeros((B, Wb), u8)
        H = jnp.full((B, Wb), NEG_INF, i32)
        res = (
            jnp.zeros(B, i32), jnp.zeros(B, i32), jnp.full(B, -1, i32),
            jnp.full(B, -1, i32), jnp.full(B, NEG_INF, i32),
            jnp.full(B, -1, i32), jnp.full(B, NEG_INF, i32),
            jnp.full(B, -1, i32), jnp.full(B, NEG_INF, i32),
            jnp.zeros(B, i32), jnp.zeros(B, i32),
        )
        if with_cigar:
            dirs = jnp.zeros((B, R, Wb), u8)
            offs = jnp.zeros((B, R), i32)
            offs_end = jnp.zeros((B, R), i32)
        else:
            dirs = jnp.zeros((1, 1, 1), u8)
            offs = jnp.zeros((1, 1), i32)
            offs_end = jnp.zeros((1, 1), i32)
        carry = (z8, z8, z8, z8, z8, H, jnp.full(B, NEG_INF, i32),
                 jnp.zeros(B, i32), jnp.full(B, -1, i32), jnp.full(B, -1, i32),
                 jnp.zeros(B, bool), res, qr, sf, qlen, tlen, sc_mch, sc_mis,
                 sc_N, max_sc, dirs, offs, offs_end)
        carry = jax.lax.fori_loop(0, R, step, carry)
        return carry[11], carry[20], carry[21], carry[22]

    return jax.jit(run, backend=backend or None)


def extz_batch(qseqs, tseqs, mat, q, e, w, zdrop, end_bonus, flag,
               backend=None) -> BatchExtResult:
    """Batched wm_extz-equivalent (single gap cost)."""
    B = len(qseqs)
    qlen = np.array([len(s) for s in qseqs], np.int32)
    tlen = np.array([len(s) for s in tseqs], np.int32)
    Lq = int(max(1, qlen.max()))
    Lt = int(max(1, tlen.max()))
    R = Lq + Lt - 1
    n_col = min(min(Lq, Lt), w + 1)
    Wb = max(((n_col + 15) // 16 + 1) * 16, 32)

    qr = np.zeros((B, Lq + 16), np.uint8)
    sf = np.zeros((B, Lt + 16), np.uint8)
    for i, (qs, ts) in enumerate(zip(qseqs, tseqs)):
        qr[i, : len(qs)] = qs[::-1]
        sf[i, : len(ts)] = ts
    mat = np.asarray(mat, np.int8)
    qe2 = 2 * (q + e)
    sc_mch = np.full(B, np.uint8(np.int8(mat[0])), np.uint8)
    sc_mis = np.full(B, np.uint8(np.int8(mat[1])), np.uint8)
    sc_N = np.full(B, np.uint8(np.int8(-e if mat[24] == 0 else mat[24])), np.uint8)
    max_sc = np.full(B, np.uint8(mat[0] + qe2), np.uint8)

    with_cigar = not (flag & 0x01)
    approx_max = bool(flag & 0x08)
    approx_drop = bool(flag & 0x10)
    right_gaps = bool(flag & 0x02)

    run = _compiled_extz(Lq + 16, Lt + 16, Wb, R, q, e, w, zdrop, approx_max,
                         right_gaps, with_cigar, approx_drop, backend)
    res, dirs, offs, offs_end = run(qr, sf, qlen, tlen, sc_mch, sc_mis, sc_N,
                                    max_sc)
    (mx, zdr, max_q, max_t, mqe, mqe_t, mte, mte_q, score, H0, lH0t) = [
        np.asarray(a) for a in res
    ]
    return BatchExtResult(
        max=mx, zdropped=zdr.astype(bool), max_q=max_q, max_t=max_t,
        mqe=mqe, mqe_t=mqe_t, mte=mte, mte_q=mte_q, score=score,
        reach_end=np.zeros(B, bool),
        dirs=np.asarray(dirs) if with_cigar else None,
        off=np.asarray(offs) if with_cigar else None,
        off_end=np.asarray(offs_end) if with_cigar else None,
    )
