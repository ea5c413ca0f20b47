"""Device colinear anchor chaining.

TPU re-expression of the reference chain DP forward pass (reference
src/chain.c:22-167 incl. the Winnowmap min_dist_x window rule
src/chain.c:51-55; scalar oracle native/src/wm_chain.cpp).  The O(n*h)
predecessor scan runs as an XLA fori_loop over anchors, each step
evaluating the whole lookback window as one vector row per read (batched
over TB reads):

* window bounds (incl. the max_iter / min_dist_x repeat rule) are
  precomputed on the host by vectorized searchsorted over the sorted
  anchor x-keys;
* the gap cost's double-precision terms run in (emulated) f64 on device,
  bit-identical to the oracle's C doubles;
* the oracle's sequential max/skip bookkeeping is re-expressed with
  prefix scans: the running max is an exclusive cummax, the max_skip
  counter (a floor-at-zero +/-1 automaton) is cumsum/cummin algebra, and
  the t[] marks (predecessor-of-scanned-anchor tags) become masked lane
  shifts (gap <= G) plus a rarely-taken scatter branch for far
  predecessors -- all exactly equivalent to the sequential scan because a
  mark's target lane always lies after its source lane and rows after the
  break never execute (see the derivation in the step function);
* chain-end discovery / backtrack / reordering reuse the oracle's own
  tail (native wm_chain_finish), so the full output is bit-identical
  (tests/test_chain_device.py, 10^4+ random anchor sets).

Production wiring: chain jobs with large anchor counts route here from
the batch paths (chain_dp_auto); small sets stay on the scalar host DP,
which wins below the device's call overhead.
"""
from __future__ import annotations

import ctypes
import functools

import numpy as np

from .. import native

MARK_G = 32  # static mark-shift radius; farther predecessors take the
             # scatter branch (rare: a predecessor is almost always nearby)

_W_STEPS = (128, 512, 2048, 8192)


def quantize_win(w: int) -> int:
    for s in _W_STEPS:
        if w <= s:
            return s
    return -1


@functools.lru_cache(maxsize=64)
def _compiled_chain_fwd(TB, N, W, max_dist_x, max_dist_y, bw, max_skip,
                        is_cdna, gap_scale):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    f64 = jnp.float64
    NEG = jnp.int32(-0x40000000)

    def _scan(x, op, ident):
        # inclusive scan along lanes via log-step doubling (XLA's native
        # cummax/cumsum lower to reduce-windows that blow scoped VMEM)
        s = 1
        Wn = x.shape[1]
        while s < Wn:
            fill = jnp.full((x.shape[0], s), ident, x.dtype)
            x = op(x, jnp.concatenate([fill, x[:, :-s]], axis=1))
            s *= 2
        return x

    def fwd(xlo, yq, span, st, n_anch, avgq):
        # xlo/yq/span: (TB, W + N) i32, anchor arrays left-padded by W
        # st: (TB, N) i32 window starts; n_anch: (TB, 1); avgq: (TB, 1) f64
        lanes = jax.lax.broadcasted_iota(i32, (TB, W), 1)

        def step(i, carry):
            f, pre, v = carry  # (TB, W + N) i32, left-padded by W
            # window lanes l -> anchor j = i-1-l; padded slice [i, i+W)
            # of the left-padded arrays reversed gives j = i-W .. i-1
            def win(a):
                return jnp.flip(
                    jax.lax.dynamic_slice(a, (0, i), (TB, W)), axis=1)

            xw = win(xlo)
            yw = win(yq)
            fw = win(f)
            prew = win(pre)
            x_i = jax.lax.dynamic_slice(xlo, (0, W + i), (TB, 1))
            y_i = jax.lax.dynamic_slice(yq, (0, W + i), (TB, 1))
            sp_i = jax.lax.dynamic_slice(span, (0, W + i), (TB, 1))
            st_i = jax.lax.dynamic_slice(st, (0, i), (TB, 1))
            j_lane = i - 1 - lanes
            valid = jnp.logical_and(j_lane >= st_i, j_lane >= 0)
            valid = jnp.logical_and(valid, i < n_anch)

            dr = x_i - xw
            dq = y_i - yw
            dd = jnp.abs(dr - dq)
            ok = jnp.logical_and(dr != 0, dq > 0)
            ok = jnp.logical_and(ok, dq <= max_dist_y)
            ok = jnp.logical_and(ok, dq <= max_dist_x)
            ok = jnp.logical_and(ok, dd <= bw)
            ok = jnp.logical_and(ok, valid)

            min_d = jnp.minimum(dq, dr)
            sc0 = jnp.minimum(min_d, sp_i)
            log_dd = jnp.where(dd > 0, 31 - jax.lax.clz(dd), 0)
            c_lin = (dd.astype(f64) * 0.01 * avgq).astype(i32)
            if is_cdna:
                gap = jnp.where(dr > dq, jnp.minimum(c_lin, log_dd),
                                c_lin + (log_dd >> 1))
            else:
                gap = c_lin + (log_dd >> 1)
            gterm = (gap.astype(f64) * gap_scale + 0.499).astype(i32)
            sc = jnp.where(ok, sc0 - gterm + fw, NEG)

            # running (exclusive) max seeded with q_span, ascending lanes
            run = _scan(jnp.maximum(sc, NEG), jnp.maximum, NEG)
            run_excl = jnp.concatenate(
                [jnp.broadcast_to(NEG, (TB, 1)), run[:, :-1]], axis=1)
            run_excl = jnp.maximum(run_excl, sp_i)
            better = jnp.logical_and(ok, sc > run_excl)

            # marks: a scanned passing lane l' tags lane of pre[j_{l'}],
            # which is l' + (j_{l'} - pre[j_{l'}]) -- always a later lane
            src = jnp.logical_and(ok, prew >= 0)
            gapl = j_lane - prew
            mark = jnp.zeros((TB, W), bool)
            for g in range(1, MARK_G + 1):
                m = jnp.logical_and(src, gapl == g)
                mark = jnp.logical_or(
                    mark, jnp.roll(m, g, axis=1).at[:, :g].set(False))
            far = jnp.logical_and(src, gapl > MARK_G)

            def with_far(mk):
                tgt = jnp.where(far, jnp.minimum(lanes + gapl, W), W)
                pad = jnp.zeros((TB, W + 1), bool)
                rows = jnp.arange(TB)[:, None]
                sc_pad = pad.at[rows, tgt].max(far)
                return jnp.logical_or(mk, sc_pad[:, :W])

            mark = jax.lax.cond(jnp.any(far), with_far, lambda mk: mk, mark)

            # floor-at-zero skip counter; crossing max_skip breaks the scan
            d = jnp.where(better, -1,
                          jnp.where(jnp.logical_and(ok, mark), 1, 0))
            d = d.astype(i32)
            P = _scan(d, jnp.add, jnp.int32(0))
            s_l = P - jnp.minimum(0, _scan(P, jnp.minimum,
                                           jnp.int32(0x3FFFFFFF)))
            crossed = s_l > max_skip
            ncross = _scan(crossed.astype(i32), jnp.add, jnp.int32(0))
            alive = (ncross - crossed.astype(i32)) == 0  # strictly-before

            scm = jnp.where(jnp.logical_and(ok, alive), sc, NEG)
            best = jnp.max(scm, axis=1, keepdims=True)
            l_best = jnp.argmax(scm, axis=1)[:, None]
            has = best > sp_i
            max_f = jnp.where(has, best, sp_i)
            max_j = jnp.where(has, i - 1 - l_best, -1)

            # v[i] = max(v[max_j], max_f) along the chain (oracle line 100)
            vw = win(v)
            v_at = jnp.take_along_axis(vw, l_best, axis=1)
            v_i = jnp.where(jnp.logical_and(has, v_at > max_f), v_at, max_f)

            act = i < n_anch
            max_f = jnp.where(act, max_f, 0).astype(i32)
            max_j = jnp.where(act, max_j, -1).astype(i32)
            v_i = jnp.where(act, v_i, 0).astype(i32)
            f = jax.lax.dynamic_update_slice(f, max_f, (0, W + i))
            pre = jax.lax.dynamic_update_slice(pre, max_j, (0, W + i))
            v = jax.lax.dynamic_update_slice(v, v_i, (0, W + i))
            return f, pre, v

        f0 = jnp.zeros((TB, W + N), i32)
        pre0 = jnp.full((TB, W + N), -1, i32)
        v0 = jnp.zeros((TB, W + N), i32)
        f, pre, v = jax.lax.fori_loop(0, N, step, (f0, pre0, v0))
        return f[:, W:], pre[:, W:], v[:, W:]

    return jax.jit(fwd)


def _window_starts(ax: np.ndarray, max_dist_x: int, min_dist_x: int,
                   max_iter: int) -> np.ndarray:
    """Per-anchor window starts (reference chain.c:45-55: max_dist_x
    advance plus the Winnowmap keep-iterating-inside-repeats rule).
    ax - dist saturates at 0 (anchors within dist of the reference start
    must not wrap the unsigned subtraction)."""
    n = len(ax)

    def below(dist):
        d = np.uint64(dist)
        tgt = np.where(ax >= d, ax - d, np.uint64(0))
        return np.searchsorted(ax, tgt, side="left")

    st0 = below(max_dist_x)
    idx = np.arange(n, dtype=np.int64)
    st = st0.astype(np.int64)
    over = idx - st > max_iter
    if over.any():
        J = below(min_dist_x)
        st_over = np.minimum(idx - max_iter, J.astype(np.int64))
        st = np.where(over, np.maximum(st0, st_over), st)
    return st.astype(np.int32)


def chain_dp_device_batch(jobs, max_dist_x, min_dist_x, max_dist_y, bw,
                          max_skip, max_iter, min_cnt, min_sc, gap_scale,
                          is_cdna):
    """Chain a batch of anchor sets on the device.  jobs: list of (ax, ay)
    uint64 arrays (sorted by ax).  Returns a list of (u, ax, ay) like
    native.chain_dp.  Jobs whose lookback window exceeds the device cap
    fall back to the scalar host DP."""
    import jax

    results = [None] * len(jobs)
    dev_idx = []
    wins = []
    sts = []
    for ji, (ax, ay) in enumerate(jobs):
        n = len(ax)
        if n == 0:
            results[ji] = (np.zeros(0, np.uint64), np.zeros(0, np.uint64),
                           np.zeros(0, np.uint64))
            continue
        st = _window_starts(ax, max_dist_x, min_dist_x, max_iter)
        wmax = int((np.arange(n) - st).max()) if n else 0
        Wq = quantize_win(max(1, wmax))
        if Wq < 0:
            u, oax, oay = native.chain_dp(
                ax, ay, max_dist_x=max_dist_x, min_dist_x=min_dist_x,
                max_dist_y=max_dist_y, bw=bw, max_skip=max_skip,
                max_iter=max_iter, min_cnt=min_cnt, min_sc=min_sc,
                gap_scale=gap_scale, is_cdna=is_cdna, n_segs=1)
            results[ji] = (u, oax, oay)
            continue
        dev_idx.append(ji)
        wins.append(Wq)
        sts.append(st)
    if not dev_idx:
        return results

    # group device jobs by (W, N) shape
    from collections import defaultdict

    groups = defaultdict(list)
    for pos, ji in enumerate(dev_idx):
        n = len(jobs[ji][0])
        N = 1 << max(7, int(np.ceil(np.log2(n))))
        groups[(wins[pos], N)].append((ji, sts[pos]))

    with jax.enable_x64():
        for (W, N), members in groups.items():
            TB = 8
            for lo in range(0, len(members), TB):
                chunk = members[lo:lo + TB]
                B = len(chunk)
                xlo = np.zeros((TB, W + N), np.int32)
                yqa = np.zeros((TB, W + N), np.int32)
                spa = np.zeros((TB, W + N), np.int32)
                sta = np.zeros((TB, N), np.int32)
                n_a = np.zeros((TB, 1), np.int32)
                avq = np.zeros((TB, 1), np.float64)
                for bi, (ji, st) in enumerate(chunk):
                    ax, ay = jobs[ji]
                    n = len(ax)
                    xlo[bi, W:W + n] = (ax & np.uint64(0xFFFFFFFF)).astype(
                        np.uint32).view(np.int32)
                    yqa[bi, W:W + n] = (ay & np.uint64(0xFFFFFFFF)).astype(
                        np.uint32).view(np.int32)
                    spa[bi, W:W + n] = ((ay >> np.uint64(32))
                                        & np.uint64(0xFF)).astype(np.int32)
                    sta[bi, :n] = st
                    n_a[bi, 0] = n
                    # float avg_qspan, then double (oracle wm_chain.cpp:46-48:
                    # (float)sum / n in f32, promoted to double at use)
                    s32 = np.float32(spa[bi, W:W + n].sum(dtype=np.uint64))
                    avq[bi, 0] = np.float64(s32 / np.float32(n))
                fwd = _compiled_chain_fwd(TB, N, W, max_dist_x, max_dist_y,
                                          bw, max_skip, bool(is_cdna),
                                          float(gap_scale))
                f, pre, v = fwd(xlo, yqa, spa, sta, n_a, avq)
                f = np.asarray(f)
                pre = np.asarray(pre)
                v = np.asarray(v)
                for bi, (ji, _) in enumerate(chunk):
                    ax, ay = jobs[ji]
                    n = len(ax)
                    results[ji] = native.chain_finish(
                        f[bi, :n], pre[bi, :n], v[bi, :n], min_cnt, min_sc,
                        ax, ay)
    return results


# anchor-count threshold above which the device forward DP beats the
# scalar host chain (lookback windows in repeat regions are where the
# O(n*h) scan explodes on the CPU)
DEVICE_CHAIN_MIN_ANCHORS = 50_000


def chain_dp_auto(ax, ay, *, max_dist_x, min_dist_x, max_dist_y, bw,
                  max_skip, max_iter, min_cnt, min_sc, gap_scale, is_cdna,
                  n_segs=1):
    """native.chain_dp signature-compatible wrapper that routes large
    anchor sets through the device forward kernel."""
    import os

    from ..map.batch import _use_device

    if (n_segs == 1 and len(ax) >= DEVICE_CHAIN_MIN_ANCHORS
            and _use_device()
            and not os.environ.get("WM_NO_DEV_CHAIN")):
        return chain_dp_device_batch(
            [(ax, ay)], max_dist_x, min_dist_x, max_dist_y, bw, max_skip,
            max_iter, min_cnt, min_sc, gap_scale, is_cdna)[0]
    return native.chain_dp(
        ax, ay, max_dist_x=max_dist_x, min_dist_x=min_dist_x,
        max_dist_y=max_dist_y, bw=bw, max_skip=max_skip, max_iter=max_iter,
        min_cnt=min_cnt, min_sc=min_sc, gap_scale=gap_scale,
        is_cdna=is_cdna, n_segs=n_segs)
