"""Pallas TPU wavefront kernels for banded affine-gap extension DP.

Production TPU re-expression of the reference anti-diagonal difference-form
DP (reference src/ksw2_extd2_sse.c, src/ksw2_extz2_sse.c): one pallas_call
advances a tile of alignments one anti-diagonal per grid step with all band
state resident in VMEM, bit-identical to the host oracle (winnowmap_tpu/
native wm_extd/wm_extz) including the 16-lane band rounding and the
4-lane-strided row-max tie behaviour.

Layout tricks that make this TPU-shaped (no per-row gathers at all):

* Common-trajectory window.  All alignments in a tile share the window
  [base_w(r), base_w(r)+Wb) where base_w(r) = floor16(max(0, r-Lq+1,
  (r-w+1)>>1)) - 16 depends only on the *bucket* maxima (Lq, w), never on
  the row.  Each row's true rounded band [st_i, en_i] (reference
  ksw2_extd2_sse.c:150-160 semantics) lives inside it; per-row lane masks
  reproduce exactly the reference's update pattern, so cells outside a
  row's rounded band freeze (or stay at init) precisely like the SIMD
  kernel's sliding window, including the boundary-value rules.

* Right-aligned reversed queries.  Storing each reversed query at buffer
  offset QOFF - qlen_i makes the per-diagonal score feed
  q[qlen_i-1-r+t] a single dynamic slice at offset QOFF-1-r+base_w(r),
  shared by every row in the tile.

* Rank-packed row max.  The reference's 4-lane-strided max tie order
  (stride-0 first, min-t within stride, tail last) is encoded into
  K = H*4096 + (4095 - rank) so one max-reduce + one masked reduce
  recover (max_H, max_t) with the exact SSE tie winner.

The direction bytes stream to HBM in the same banded layout the host
backtracker consumes (wm_backtrack_band2: per-row st/en plus the shared
base offset).
"""
from __future__ import annotations

import functools

import numpy as np

NEG_INF = -0x40000000
H_CLAMP = -(1 << 17)  # clamp for rank packing; real scores stay above this


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    """WM_PALLAS_INTERPRET=1 runs the Pallas kernels in interpreter mode so
    the CPU-only test mesh can assert kernel bit-exactness without a chip."""
    import os

    return os.environ.get("WM_PALLAS_INTERPRET") == "1"


def _splice_sites(jnp, sblk, jblk, t_abs, tlen, Wb, noncan, junc_bonus,
                  spl_for, spl_rev, spl_flank, rev_motifs, CD, w8):
    """Per-step donor/acceptor site scores from shifted target-block slices
    (reference ksw2_exts2_sse.c:114-166).  sblk holds target[t-16 .. t+Wb+240)
    as CD-lane codes (0-masked outside [0, tlen)); jblk the junction-
    annotation bytes in the same layout, or None.  Returns CD (TB, Wb)
    vectors with the reference's exact fill/override/junc-add semantics
    (int8 wrap on the junc_bonus add emulated via w8)."""
    cd = CD  # scalar constructor

    def sh(k):  # target[t + k] as a static slice of the block
        return sblk[:, 16 + k:16 + k + Wb]

    def jn(k):
        return jblk[:, 16 + k:16 + k + Wb]

    if not (spl_for or spl_rev):
        z = jnp.zeros(sh(0).shape, CD)
        return z, z
    semi = cd(-(noncan // 2) if spl_flank else 0)
    fill = cd(-noncan)
    f = jnp.zeros(sh(0).shape, jnp.bool_)
    if not rev_motifs:
        d_can = ((sh(1) == 2) & (sh(2) == 3)) if spl_for else f
        if spl_rev:
            d_can = d_can | ((sh(1) == 1) & (sh(2) == 3))
        d_can2 = d_can & ((sh(3) == 0) | (sh(3) == 2))
        a_can = ((sh(-1) == 0) & (sh(0) == 2)) if spl_for else f
        if spl_rev:
            a_can = a_can | ((sh(-1) == 0) & (sh(0) == 1))
        a_can2 = a_can & ((sh(-2) == 1) | (sh(-2) == 3))
        d_bits, a_bits = (1, 8), (2, 4)
    else:
        d_can = ((sh(1) == 2) & (sh(2) == 0)) if spl_for else f
        if spl_rev:
            d_can = d_can | ((sh(1) == 1) & (sh(2) == 0))
        d_can2 = d_can & ((sh(3) == 1) | (sh(3) == 3))
        a_can = ((sh(-1) == 3) & (sh(0) == 2)) if spl_for else f
        if spl_rev:
            a_can = a_can | ((sh(-1) == 3) & (sh(0) == 1))
        a_can2 = a_can & ((sh(-2) == 0) | (sh(-2) == 2))
        d_bits, a_bits = (2, 4), (1, 8)
    # site loops cover t in [0, tlen-4) for donors, [2, tlen) for acceptors
    d_can = d_can & (t_abs >= 0) & (t_abs < tlen - 4)
    d_can2 = d_can2 & d_can
    a_can = a_can & (t_abs >= 2) & (t_abs < tlen)
    a_can2 = a_can2 & a_can
    zero = cd(0)
    donor = jnp.where(d_can2, zero, jnp.where(d_can, semi, fill))
    acceptor = jnp.where(a_can2, zero, jnp.where(a_can, semi, fill))
    if jblk is not None:
        jd = jn(1)
        d_j = ((jd & d_bits[0]) != 0) if spl_for else f
        if spl_rev:
            d_j = d_j | ((jd & d_bits[1]) != 0)
        d_j = d_j & (t_abs >= 0) & (t_abs < tlen - 1)
        ja = jn(0)
        a_j = ((ja & a_bits[0]) != 0) if spl_for else f
        if spl_rev:
            a_j = a_j | ((ja & a_bits[1]) != 0)
        a_j = a_j & (t_abs >= 0) & (t_abs < tlen)
        jb = cd(junc_bonus)
        donor = jnp.where(d_j, w8(donor + jb), donor)
        acceptor = jnp.where(a_j, w8(acceptor + jb), acceptor)
    return donor, acceptor


def _build_extd_kernel(TB, Wb, WQ, WT, QOFF, SOFF, Lq, R, q, e, q2, e2,
                       W_MAX, approx_max, right_gaps, with_cigar, approx_drop,
                       sc_mch, sc_mis, sc_n, ROWS=32, splice=None):
    """Wavefront extd kernel, step-window formulation, int16-lane core.

    With `splice` set this becomes the exts (spliced) kernel (reference
    ksw_exts2_sse, src/ksw2_exts2_sse.c:26-409): the long-gap pair loses the
    y2 state, the x2 state becomes the intron channel (opened against a
    per-target-base donor score floor, closed with an acceptor score), the
    band is the full anti-diagonal (no w term), long_thres follows the exts
    formula and the z-drop gap penalty is 0.  Donor/acceptor site scores are
    computed per step from shifted slices of the target block (and the
    optional junction-annotation block) -- no host-side site tables.
    splice = (noncan, junc_bonus, has_junc, spl_for, spl_rev, spl_flank,
    rev_motifs).

    ROWS anti-diagonals are processed per grid step with ALL band state held
    in registers/values: scratch is read once and written once per step.
    The common window base is constant within a step (base(k) =
    floor16(st0c(k*ROWS)) - 16, a function of the bucket maxima only) and
    advances by a multiple of 16 between steps, when the state arrays are
    rolled left with init refill -- reproducing exactly the reference's
    sliding-window refill semantics (ksw2_extd2_sse.c:150-160).  Each row's
    true rounded band [st, en] lives inside the window; per-row lane masks
    freeze out-of-band lanes precisely like the SIMD kernel.

    The reference SSE kernel computes the whole recurrence in WRAPPING
    int8 lanes (_mm_add_epi8/_mm_sub_epi8/_mm_max_epi8,
    ksw2_extd2_sse.c:40-58,188-197).  Mosaic on this chip lowers only
    vector<i16>/vector<i32> arithmetic, so state stays int8 in VMEM but
    the core computes in int16 lanes (2x the VPU density of an i32 lift);
    for tightly bounded profiles (map-ont class) every intermediate
    provably fits int8 so the wrap points are identities, while wide-gap
    profiles (asm5/asm10, splice) reproduce the oracle's int8 wraps with
    an explicit i8 round-trip (w8).  Lane-index masks are built from int16
    iota against window-relative bounds (all bounds fit int16: Wb < 13000
    by the rank-packing assert).
    """
    import os

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i8 = jnp.int8
    i16 = jnp.int16
    i32 = jnp.int32
    u8 = jnp.uint8
    # compute dtype for the int8-state recurrence.  Probed on v5e Mosaic:
    # vector i8/i16 compare+max do NOT lower ("Target does not support this
    # comparison" / "failed to legalize arith.maxsi"), 16-bit iota is
    # unsupported, and i1 mask broadcasts relayout only in 32-bit tiling --
    # so the core computes in i32 lanes (the formulation the chip measured
    # at 4.7 Gcells/s in round 2).  WM_PALLAS_CD=i16 re-enables the denser
    # lanes for toolchains that learn to lower them.
    CD = i16 if os.environ.get("WM_PALLAS_CD") == "i16" else i32
    cd = CD  # scalar constructor
    # timing-ablation hooks (tests/tools/kernel_ablate.py): comma-separated
    # block names to PRUNE from the traced kernel.  Results are wrong with
    # any token set; production never sets WM_KERNEL_ABL.
    ABL = frozenset(os.environ.get("WM_KERNEL_ABL", "").split(","))
    if splice is None:
        # wrap-elision gate: int8 wraps only matter where an intermediate
        # can leave [-128, 127]; for these bounds none can (validated by
        # the fringe-heavy randomized parity suite, tests/test_pallas.py)
        W8_IDENTITY = (sc_mch <= 4 and -sc_mis <= 8 and q + e <= 8
                       and q2 + e2 <= 32
                       and (sc_n is None or -sc_n <= 8))
    else:
        W8_IDENTITY = False  # junc_bonus adds wrap by spec
    if W8_IDENTITY:
        def w8(a):
            return a
    else:
        def w8(a):
            return a.astype(i8).astype(CD)
    qe = q + e
    init_xy = np.int8(-(q + e))
    if splice is None:
        init_xy2 = np.int8(-(q2 + e2))
        if e != e2:
            long_thres = (q2 - q) // (e - e2) - 1
        else:
            long_thres = 0
        if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
            long_thres += 1
        long_diff = np.int8(long_thres * (e - e2) - (q2 - q) - e2)
        zdrop_e = e2  # gap-length penalty in the z-drop test
    else:
        # exts: x2 is the intron state, opened at cost q2 against the donor
        # floor; boundary ladder -e...long_diff...0 (reference
        # ksw2_exts2_sse.c:88-96)
        noncan, junc_bonus, has_junc, spl_for, spl_rev, spl_flank, \
            rev_motifs = splice
        init_xy2 = np.int8(-q2)
        long_thres = (q2 - q) // e - 1
        if q2 > q + e + long_thres * e:
            long_thres += 1
        long_diff = np.int8(long_thres * e - (q2 - q))
        zdrop_e = 0
    S_STRIDE = Wb // 4 + 2  # rank stride; rank fits 14 bits for Wb <= 6500
    assert 4 * S_STRIDE + Wb + 8 < 16384, "band too wide for rank packing"
    if splice is None:
        assert R * max(e, e2) + q + q2 < -H_CLAMP, \
            "score range vs rank packing"
    else:
        # exts H lower bound: per-row column drop <= q+e (insertion always
        # available) plus one intron entry path q + e*Lq + q2 + 2*noncan
        assert Lq * (q + 2 * e) + 2 * (q + q2 + 2 * abs(noncan)) + 1024 \
            < -H_CLAMP, "splice score range vs rank packing"
    # between-step window advance is bounded by ROWS + 16 (st0c moves at
    # most 1/row); the Wb formula in the callers budgets for it
    MAX_DELTA = (ROWS + 16 + 15) // 16 * 16
    # direction bytes are PACKED 4 rows per i32 lane (byte j%4 of word
    # j//4): a per-row u8 store costs Mosaic a 32->8 pack relayout per row
    # (~17 ms/call at the bench shape, tests/tools/probe_abl.py); packing
    # replaces it with shift+or in native i32 lanes and writes a quarter
    # of the vectors.  The traceback kernel unpacks by byte.
    assert ROWS % 4 == 0

    def stepbase(r0):
        st0c = jnp.maximum(jnp.maximum(0, r0 - Lq + 1),
                           (r0 - W_MAX + 1) >> 1)
        return (st0c // 16) * 16 - 16

    def ubound(r):
        # u[r]/v1 boundary value at t == r (reference ksw2_extd2_sse.c:150-155;
        # exts tail value is 0, reference ksw2_exts2_sse.c:88-96)
        tail = jnp.int32(0) if splice is not None else jnp.int32(-e2)
        return jnp.where(
            r == 0, jnp.int32(init_xy),
            jnp.where(r < long_thres, jnp.int32(-e),
                      jnp.where(r == long_thres, jnp.int32(long_diff),
                                tail)),
        ).astype(i32)

    # acc lanes: 0 mx, 1 zdr, 2 max_q, 3 max_t, 4 mqe, 5 mqe_t, 6 mte,
    # 7 mte_q, 8 score, 9 H0, 10 lH0t, 11 done
    IDX = {k: v for v, k in enumerate(
        "mx zdr max_q max_t mqe mqe_t mte mte_q score H0 lH0t done".split())}

    def kernel(qbuf_ref, sf_ref, qlen_ref, tlen_ref, w_ref, zdrop_ref,
               *rest):
        rest = list(rest)
        junc_ref = rest.pop(0) if (splice is not None and has_junc) else None
        res_ref = rest.pop(0)
        dirs_ref = rest.pop(0) if with_cigar else None
        if splice is None:
            u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, H_s, acc_s = rest
        else:
            u_s, v_s, x_s, y_s, x2_s, s_s, H_s, acc_s = rest
            y2_s = None
        k_step = pl.program_id(1)
        r0 = k_step * ROWS  # first anti-diagonal of this grid step

        @pl.when(r0 == 0)
        def _init():
            u_s[:] = jnp.full((TB, Wb), init_xy, i32)
            v_s[:] = jnp.full((TB, Wb), init_xy, i32)
            x_s[:] = jnp.full((TB, Wb), init_xy, i32)
            y_s[:] = jnp.full((TB, Wb), init_xy, i32)
            x2_s[:] = jnp.full((TB, Wb), init_xy2, i32)
            if y2_s is not None:
                y2_s[:] = jnp.full((TB, Wb), init_xy2, i32)
            s_s[:] = jnp.zeros((TB, Wb), i32)
            if not approx_max:
                H_s[:] = jnp.full((TB, Wb), NEG_INF, i32)
            col = jax.lax.broadcasted_iota(i32, (TB, 16), 1)
            neg1 = ((col == IDX["max_q"]) | (col == IDX["max_t"])
                    | (col == IDX["mqe_t"]) | (col == IDX["mte_q"]))
            ninf = ((col == IDX["mqe"]) | (col == IDX["mte"])
                    | (col == IDX["score"]))
            acc_s[:] = jnp.where(neg1, -1, jnp.where(ninf, NEG_INF, 0))

        qlen = qlen_ref[:]  # (TB, 1) i32
        tlen = tlen_ref[:]
        acc0 = acc_s[:]
        done0 = acc0[:, IDX["done"]:IDX["done"] + 1]
        step_live = jnp.logical_not(
            jnp.all(jnp.logical_or(done0 >= 1, r0 >= qlen + tlen - 1)))
        if R % ROWS != 0:
            step_live = jnp.logical_and(step_live, r0 < R)

        base = stepbase(r0)

        @pl.when(step_live)
        def _run_step():
            # ---- window slide between steps: roll state left, init refill
            prev = stepbase(r0 - ROWS)
            delta = jnp.where(r0 == 0, 0, base - prev)
            lanes = jax.lax.broadcasted_iota(i32, (TB, Wb), 1)
            for dl in range(16, MAX_DELTA + 1, 16):
                @pl.when(delta == dl)
                def _slide(dl=dl):
                    hi = lanes >= Wb - dl

                    def roll(ref, fill):
                        ref[:] = jnp.where(hi, fill,
                                           jnp.roll(ref[:], -dl, axis=1))

                    roll(u_s, init_xy)
                    roll(v_s, init_xy)
                    roll(x_s, init_xy)
                    roll(y_s, init_xy)
                    roll(x2_s, init_xy2)
                    if y2_s is not None:
                        roll(y2_s, init_xy2)
                    roll(s_s, jnp.int8(0))
                    if not approx_max:
                        roll(H_s, jnp.int32(NEG_INF))

            w = w_ref[:]
            zdrop = zdrop_ref[:]
            # window-relative i32 lane index (16-bit iota/compare do not
            # lower on this target); every per-row bound below is
            # window-relative and provably inside [0, Wb) (see docstring)
            lane_rel = lanes

            # ---- state into CD lanes (read scratch once per step) ----
            u = u_s[:].astype(CD)
            v = v_s[:].astype(CD)
            x = x_s[:].astype(CD)
            y = y_s[:].astype(CD)
            x2 = x2_s[:].astype(CD)
            y2 = y2_s[:].astype(CD) if y2_s is not None else None
            s = s_s[:].astype(CD)
            H = H_s[:] if not approx_max else None
            acc = acc_s[:]
            accv = {kk: acc[:, ii:ii + 1] for kk, ii in IDX.items()}
            done = accv["done"]
            zdr = accv["zdr"]

            # ---- per-step query/target rows (int8) ----
            # qv slides one lane per row.  Mosaic lowers an UNALIGNED static
            # lane slice of the step block as a full-width relayout (~15 us
            # per (step, tile) at Wb=640 — measured, tests/tools/
            # probe_core.py), so only row 0 slices the block; later rows
            # roll the live vector right by one lane and refill lane 0 from
            # a (TB, 1) column of the block (bit-identical values).
            QR = _round_up(Wb + ROWS + 128, 128)

            def dyn_blk(ref, off, width):
                o_al = off // 128 * 128
                rem = off - o_al
                blk = ref[:, pl.ds(pl.multiple_of(o_al, 128), width)]
                blk = blk.astype(i32)  # dynamic_rotate is 32-bit only
                blk = pltpu.roll(blk, width - rem, axis=1)
                return blk

            o_q0 = QOFF - 1 - r0 + base
            qblk = dyn_blk(qbuf_ref, o_q0 - (ROWS - 1), QR).astype(CD)
            if splice is None:
                sfv = dyn_blk(sf_ref, SOFF + base,
                              Wb + 128)[:, :Wb].astype(CD)
            else:
                # one block read covers target[t-2 .. t+3] as static slices
                # (SOFF >= 32 so SOFF + base - 16 >= 0)
                sblk = dyn_blk(sf_ref, SOFF + base - 16,
                               Wb + 256).astype(CD)
                sfv = sblk[:, 16:16 + Wb]
                jblk = (dyn_blk(junc_ref, SOFF + base - 16,
                                Wb + 256).astype(i32)
                        if junc_ref is not None else None)
                donor, acceptor = _splice_sites(
                    jnp, sblk, jblk, base + lanes, tlen_ref[:], Wb,
                    noncan, junc_bonus, spl_for, spl_rev, spl_flank,
                    rev_motifs, CD, w8)

            if not approx_max:
                t_abs = base + lanes

                def lane_val32(arr, pos):  # masked i32 reduce at t == pos
                    return jnp.sum(jnp.where(t_abs == pos, arr, 0), axis=1,
                                   keepdims=True)

            def lane_val8(arr, rel):
                # state value at window-relative lane rel (i32 masked
                # max-reduce: Mosaic has no sub-32-bit reductions here)
                return jnp.max(
                    jnp.where(lane_rel == rel, arr.astype(i32),
                              jnp.int32(NEG_INF)),
                    axis=1, keepdims=True)

            def rel16(pos32):
                return pos32  # masks stay i32 (no 16-bit compares on target)

            lane0_w = lane_rel == 0
            qv = qblk[:, ROWS - 1:ROWS - 1 + Wb]  # row 0: one slice per step
            for j in range(ROWS):
                r = r0 + j
                if j > 0 and "noqv" not in ABL:
                    # row j's query vector = row j-1's shifted right one
                    # lane, lane 0 refilled with qbuf[o_q0 - j] (the (TB, 1)
                    # column ROWS-1-j of the step block)
                    qv = jnp.where(lane0_w,
                                   qblk[:, ROWS - 1 - j:ROWS - j],
                                   jnp.roll(qv, 1, axis=1))

                active = jnp.logical_and(done == 0, r < qlen + tlen - 1)
                st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1),
                                  (r - w + 1) >> 1)
                en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
                collapse = jnp.logical_and(active, st0 > en0)
                zdr = jnp.where(collapse, 1, zdr)
                done = jnp.where(collapse, 1, done)
                active = jnp.logical_and(active, jnp.logical_not(collapse))

                st = st0 // 16 * 16
                en = (en0 + 16) // 16 * 16 - 1

                # row's own rounded start advanced this row (ref shift16)
                if "nobound" not in ABL:
                    st0p = jnp.maximum(jnp.maximum(0, (r - 1) - qlen + 1),
                                       ((r - 1) - w + 1) >> 1)
                    stp = st0p // 16 * 16
                    shift16 = jnp.logical_and(
                        active, jnp.logical_and(r >= 1, st > stp))
                    en0p = jnp.minimum(jnp.minimum(tlen - 1, r - 1),
                                       ((r - 1) + w) >> 1)
                    enp = (en0p + 16) // 16 * 16 - 1
                    in_prev = jnp.logical_and(st - 1 >= stp, st - 1 <= enp)
                    in_prev = jnp.logical_and(in_prev, r >= 1)
                    use_nat = jnp.logical_and(shift16, in_prev)
                    at_lane0 = lane_rel == rel16(st - base)
                    at_st = jnp.logical_and(at_lane0, active)
                    at0 = st == 0

                    # ---- u[r]/y[r] boundary cell (t == r in rounded band)
                    has_r = jnp.logical_and(
                        active, jnp.logical_and(en >= r, r >= st))
                    rel_r = rel16(r - base)
                    onehot_r = jnp.logical_and(has_r, lane_rel == rel_r)
                    ub = ubound(r)
                    ub8 = ub.astype(CD)  # all boundary values fit int8
                    y = jnp.where(onehot_r, cd(init_xy), y)
                    if y2 is not None:
                        y2 = jnp.where(onehot_r, cd(init_xy2), y2)
                    u = jnp.where(onehot_r, ub8, u)
                else:
                    at_st = jnp.zeros_like(done, jnp.bool_)
                    use_nat = at_st
                    at0 = st == 0
                    ub8 = cd(0)

                # ---- score row over the covered chunk ----
                if "noscore" not in ABL:
                    cover_last = st0 + (en0 - st0) // 16 * 16 + 15
                    s_mask = jnp.logical_and(
                        active,
                        jnp.logical_and(lane_rel >= rel16(st0 - base),
                                        lane_rel <= rel16(cover_last
                                                          - base)))
                    sc_n_def = -e if splice is not None else -e2
                    sc = jnp.where(
                        jnp.logical_or(sfv == 4, qv == 4),
                        cd(sc_n_def if sc_n is None else sc_n),
                        jnp.where(sfv == qv, cd(sc_mch), cd(sc_mis)),
                    )
                    s = jnp.where(s_mask, sc, s)

                # ---- core recurrence over the rounded band [st, en] ----
                # native wrapping int8, exactly the SSE kernel's lanes
                band_mask = jnp.logical_and(
                    active, jnp.logical_and(lane_rel >= rel16(st - base),
                                            lane_rel <= rel16(en - base)))

                lane0 = lane_rel == 0

                def shl1(a, fill):
                    # static 1-lane shift; tpu.dynamic_rotate is 32-bit-only
                    # so sub-32-bit lanes must take the jnp.roll lowering
                    return jnp.where(lane0, fill, jnp.roll(a, 1, axis=1))

                xt1 = shl1(x, cd(init_xy))
                x2t1 = shl1(x2, cd(init_xy2))
                vt1 = shl1(v, cd(init_xy))
                no_nat = jnp.logical_and(at_st, jnp.logical_not(use_nat))
                xt1 = jnp.where(no_nat, cd(init_xy), xt1)
                x2t1 = jnp.where(no_nat, cd(init_xy2), x2t1)
                vt1 = jnp.where(no_nat, cd(init_xy), vt1)
                vt1 = jnp.where(jnp.logical_and(at_st, at0), ub8, vt1)

                z = s
                a_ = w8(xt1 + vt1)
                b_ = w8(y + u)
                a2_ = w8(x2t1 + vt1)
                if splice is None:
                    a2c = a2_  # candidate competing for z
                    b2_ = w8(y2 + u)
                else:
                    a2c = w8(a2_ + acceptor)  # intron close adds acceptor
                    b2_ = None
                if not with_cigar:
                    z = jnp.maximum(z, a_)
                    z = jnp.maximum(z, b_)
                    z = jnp.maximum(z, a2c)
                    if b2_ is not None:
                        z = jnp.maximum(z, b2_)
                    d = None
                elif not right_gaps:
                    d = jnp.where(a_ > z, cd(1), cd(0))
                    z = jnp.maximum(z, a_)
                    d = jnp.where(b_ > z, cd(2), d)
                    z = jnp.maximum(z, b_)
                    d = jnp.where(a2c > z, cd(3), d)
                    z = jnp.maximum(z, a2c)
                    if b2_ is not None:
                        d = jnp.where(b2_ > z, cd(4), d)
                        z = jnp.maximum(z, b2_)
                else:
                    d = jnp.where(z > a_, cd(0), cd(1))
                    z = jnp.maximum(z, a_)
                    d = jnp.where(z > b_, d, cd(2))
                    z = jnp.maximum(z, b_)
                    d = jnp.where(z > a2c, d, cd(3))
                    z = jnp.maximum(z, a2c)
                    if b2_ is not None:
                        d = jnp.where(z > b2_, d, cd(4))
                        z = jnp.maximum(z, b2_)
                if splice is None:
                    z = jnp.minimum(z, cd(sc_mch))  # exts has no clamp
                u_new = w8(z - vt1)
                v_new = w8(z - u)
                zq = w8(z - cd(q))
                zq2 = w8(z - cd(q2))
                an = w8(a_ - zq)
                bn = w8(b_ - zq)
                a2n = w8(a2_ - zq2)
                zero8 = cd(0)
                x2_floor = zero8 if splice is None else donor
                if splice is None:
                    b2n = w8(b2_ - zq2)
                if not right_gaps:
                    ax_, bx_, a2x_ = an > 0, bn > 0, a2n > x2_floor
                    if splice is None:
                        b2x_ = b2n > 0
                else:
                    ax_ = jnp.logical_not(zero8 > an)
                    bx_ = jnp.logical_not(zero8 > bn)
                    a2x_ = jnp.logical_not(x2_floor > a2n)
                    if splice is None:
                        b2x_ = jnp.logical_not(zero8 > b2n)
                x_new = w8(jnp.where(ax_, an, zero8) - cd(qe))
                y_new = w8(jnp.where(bx_, bn, zero8) - cd(qe))
                x2_cost = cd(q2 + e2) if splice is None else cd(q2)
                x2_new = w8(jnp.where(a2x_, a2n, x2_floor) - x2_cost)
                if splice is None:
                    y2_new = w8(jnp.where(b2x_, b2n, zero8) - cd(q2 + e2))
                if with_cigar:
                    d = d | jnp.where(ax_, cd(0x08), zero8)
                    d = d | jnp.where(bx_, cd(0x10), zero8)
                    d = d | jnp.where(a2x_, cd(0x20), zero8)
                    if splice is None:
                        d = d | jnp.where(b2x_, cd(0x40), zero8)

                u = jnp.where(band_mask, u_new, u)
                v = jnp.where(band_mask, v_new, v)
                x = jnp.where(band_mask, x_new, x)
                y = jnp.where(band_mask, y_new, y)
                x2 = jnp.where(band_mask, x2_new, x2)
                if splice is None:
                    y2 = jnp.where(band_mask, y2_new, y2)

                if with_cigar:
                    # pack 4 rows per i32 word (byte j%4), one store per 4
                    # rows -- see the packing note above MAX_DELTA
                    dm = jnp.where(band_mask, d, zero8).astype(i32)
                    dacc = dm if j % 4 == 0 else dacc | (dm << (8 * (j % 4)))
                    if j % 4 == 3:
                        dirs_ref[j // 4, :, :] = dacc

                mx = accv["mx"]
                max_q = accv["max_q"]
                max_t = accv["max_t"]
                score = accv["score"]

                if not approx_max:
                    mqe = accv["mqe"]
                    mqe_t = accv["mqe_t"]
                    mte = accv["mte"]
                    mte_q = accv["mte_q"]
                    vi = v.astype(i32)
                    ui = u.astype(i32)
                    H_en0_prev = lane_val32(H, en0)
                    H_en0m1_prev = lane_val32(H, en0 - 1)
                    u_en0 = lane_val32(ui, en0)
                    v_en0 = lane_val32(vi, en0)
                    Hen0_new = jnp.where(en0 >= 1, H_en0m1_prev + u_en0,
                                         H_en0_prev + v_en0)
                    upd_mask = jnp.logical_and(t_abs >= st0, t_abs < en0)
                    H_upd = jnp.where(upd_mask, H + vi, H)
                    H_upd = jnp.where(t_abs == en0, Hen0_new, H_upd)
                    H_r0 = jnp.where(t_abs == 0, vi - qe, H)
                    H_new = jnp.where(r == 0, H_r0, H_upd)
                    H = jnp.where(active, H_new, H)

                    en1 = st0 + (en0 - st0) // 4 * 4
                    p_rel = t_abs - st0
                    in_str = jnp.logical_and(t_abs >= st0, t_abs < en1)
                    in_tail = jnp.logical_and(t_abs >= en1, t_abs < en0)
                    rank = jnp.where(
                        t_abs == en0, 0,
                        jnp.where(
                            in_str,
                            1 + (p_rel & 3) * S_STRIDE + (p_rel >> 2),
                            jnp.where(in_tail,
                                      1 + 4 * S_STRIDE + (t_abs - en1),
                                      16383)))
                    valid = jnp.logical_and(rank < 16383, active)
                    Hc = jnp.maximum(H, H_CLAMP)
                    K = jnp.where(valid, Hc * 16384 + (16383 - rank),
                                  jnp.int32(-0x7FFFFFFF))
                    Kmax = jnp.max(K, axis=1, keepdims=True)
                    max_H = jax.lax.shift_right_arithmetic(Kmax, 14)
                    max_tv = jnp.sum(jnp.where(K == Kmax, t_abs, 0), axis=1,
                                     keepdims=True)
                    max_H = jnp.where(r == 0, lane_val32(H, 0), max_H)
                    max_tv = jnp.where(r == 0, 0, max_tv)

                    H_en0_now = jnp.where(r == 0, lane_val32(H, en0),
                                          Hen0_new)
                    H_st0_now = lane_val32(H, st0)
                    mte_upd = jnp.logical_and(
                        active, jnp.logical_and(en0 == tlen - 1,
                                                H_en0_now > mte))
                    mte = jnp.where(mte_upd, H_en0_now, mte)
                    mte_q = jnp.where(mte_upd, r - en, mte_q)
                    mqe_upd = jnp.logical_and(
                        active, jnp.logical_and(r - st0 == qlen - 1,
                                                H_st0_now > mqe))
                    mqe = jnp.where(mqe_upd, H_st0_now, mqe)
                    mqe_t = jnp.where(mqe_upd, st0, mqe_t)

                    better = max_H > mx
                    mx_n = jnp.where(better, max_H, mx)
                    max_t_n = jnp.where(better, max_tv, max_t)
                    max_q_n = jnp.where(better, r - max_tv, max_q)
                    inquad = jnp.logical_and(
                        jnp.logical_not(better),
                        jnp.logical_and(max_tv >= max_t,
                                        r - max_tv >= max_q))
                    ldiff = jnp.abs((max_tv - max_t) - ((r - max_tv) - max_q))
                    dropped = jnp.logical_and(
                        jnp.logical_and(inquad, zdrop >= 0),
                        mx - max_H > zdrop + ldiff * zdrop_e)
                    dropped = jnp.logical_and(active, dropped)
                    zdr = jnp.where(dropped, 1, zdr)
                    done = jnp.where(dropped, 1, done)
                    mx = jnp.where(active, mx_n, mx)
                    max_t = jnp.where(active, max_t_n, max_t)
                    max_q = jnp.where(active, max_q_n, max_q)

                    fin = jnp.logical_and(
                        jnp.logical_and(active, jnp.logical_not(dropped)),
                        jnp.logical_and(r == qlen + tlen - 2,
                                        en0 == tlen - 1))
                    score = jnp.where(fin, H_en0_now, score)
                    accv["mqe"] = mqe
                    accv["mqe_t"] = mqe_t
                    accv["mte"] = mte
                    accv["mte_q"] = mte_q
                elif "noh0" in ABL:
                    pass
                else:
                    H0 = accv["H0"]
                    lH0t = accv["lH0t"]
                    # fused single-reduce form of the oracle's d0/d1 walk
                    # (wm_ksw approx branch; reference ksw2_extd2_sse.c /
                    # ksw2_exts2_sse.c "if (d0 > d1) H0 += d0; else H0 +=
                    # d1, ++last_H0_t"): d0 = v[lH0t], d1 = u[lH0t+1],
                    # ties take d1 and ADVANCE in both extd and exts.
                    # Encode both candidates into ONE masked max-reduce
                    # with the winner's identity in the LSB; d1 carries
                    # the +1 so it wins ties.
                    only_cur = jnp.logical_and(lH0t >= st0, lH0t <= en0)
                    both_in = jnp.logical_and(
                        only_cur,
                        jnp.logical_and(lH0t + 1 >= st0, lH0t + 1 <= en0))
                    use1 = jnp.logical_or(both_in,
                                          jnp.logical_not(only_cur))
                    rel0 = rel16(lH0t - base)
                    m0 = jnp.logical_and(lane_rel == rel0, only_cur)
                    m1 = jnp.logical_and(lane_rel == rel0 + 1, use1)
                    vi = v.astype(i32)
                    ui = u.astype(i32)
                    enc0, enc1 = vi * 2, ui * 2 + 1
                    # no-lane fill: decodes to NEG_INF (>>1) with LSB=1 so
                    # the no-candidate walk still advances lH0t (the
                    # oracle's "neither in band" branch takes d1)
                    kfill = jnp.int32(-0x7FFFFFFF)
                    K = jnp.max(
                        jnp.where(m0, enc0, jnp.where(m1, enc1, kfill)),
                        axis=1, keepdims=True)
                    dsel = jax.lax.shift_right_arithmetic(K, 1)
                    took1 = (K & 1) == 1
                    H0_new = H0 + dsel
                    lH0t_new = jnp.where(took1, lH0t + 1, lH0t)
                    # r == 0: lH0t is 0 and only m0 selects (st0 == en0 ==
                    # 0), so dsel already equals v[0 - base]; the oracle's
                    # H0 init is that value minus qe
                    H0_new = jnp.where(r == 0, H0_new - qe, H0_new)
                    lH0t_new = jnp.where(r == 0, 0, lH0t_new)
                    H0 = jnp.where(active, H0_new, H0)
                    lH0t = jnp.where(active, lH0t_new, lH0t)
                    if approx_drop:
                        # extd's oracle applies the z-drop/max bookkeeping
                        # only for r > 0 (wm_ksw.cpp: apply_zdrop sits inside
                        # `if (r > 0)`); exts applies it for every r
                        app = (active if splice is not None
                               else jnp.logical_and(active, r >= 1))
                        better = H0 > mx
                        mx_n = jnp.where(better, H0, mx)
                        mt_n = jnp.where(better, lH0t, max_t)
                        mq_n = jnp.where(better, r - lH0t, max_q)
                        inquad = jnp.logical_and(
                            jnp.logical_not(better),
                            jnp.logical_and(lH0t >= max_t,
                                            r - lH0t >= max_q))
                        ldiff = jnp.abs((lH0t - max_t) - ((r - lH0t) - max_q))
                        dropped = jnp.logical_and(
                            jnp.logical_and(jnp.logical_and(app, inquad),
                                            zdrop >= 0),
                            mx - H0 > zdrop + ldiff * zdrop_e)
                        zdr = jnp.where(dropped, 1, zdr)
                        done = jnp.where(dropped, 1, done)
                        mx = jnp.where(app, mx_n, mx)
                        max_t = jnp.where(app, mt_n, max_t)
                        max_q = jnp.where(app, mq_n, max_q)
                    fin = jnp.logical_and(
                        active, jnp.logical_and(r == qlen + tlen - 2,
                                                en0 == tlen - 1))
                    score = jnp.where(fin, H0, score)
                    accv["H0"] = H0
                    accv["lH0t"] = lH0t

                accv["mx"] = mx
                accv["max_q"] = max_q
                accv["max_t"] = max_t
                accv["score"] = score
                accv["zdr"] = zdr
                accv["done"] = done

            # ---- write state back (once per step; i32 lanes, values are
            # already int8-wrapped by w8 so no truncation is needed) ----
            u_s[:] = u.astype(i32)
            v_s[:] = v.astype(i32)
            x_s[:] = x.astype(i32)
            y_s[:] = y.astype(i32)
            x2_s[:] = x2.astype(i32)
            if y2_s is not None:
                y2_s[:] = y2.astype(i32)
            s_s[:] = s.astype(i32)
            if not approx_max:
                H_s[:] = H
            pad = jnp.zeros((TB, 4), i32)
            acc_s[:] = jnp.concatenate(
                [accv["mx"], accv["zdr"].astype(i32), accv["max_q"],
                 accv["max_t"], accv["mqe"], accv["mqe_t"], accv["mte"],
                 accv["mte_q"], accv["score"], accv["H0"], accv["lH0t"],
                 accv["done"].astype(i32), pad], axis=1)

        @pl.when(k_step == (R + ROWS - 1) // ROWS - 1)
        def _out():
            res_ref[:] = acc_s[:]

    return kernel


@functools.lru_cache(maxsize=512)
def _compiled_extd_pallas(B, TB, Lq, Lt, R, Wb, q, e, q2, e2, W_MAX,
                          approx_max, right_gaps, with_cigar, approx_drop,
                          sc_mch, sc_mis, sc_n, ROWS=32):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    QOFF = Lq + Lt + 16
    SOFF = 16
    WQ = _round_up(QOFF + Wb + 256, 128)
    WT = _round_up(SOFF + Lt + Wb + 256, 128)
    nB = B // TB
    KR = (R + ROWS - 1) // ROWS  # grid steps, ROWS anti-diagonals each
    kernel = _build_extd_kernel(TB, Wb, WQ, WT, QOFF, SOFF, Lq, R, q, e, q2,
                                e2, W_MAX, approx_max, right_gaps,
                                with_cigar, approx_drop, sc_mch, sc_mis,
                                sc_n, ROWS=ROWS)

    in_specs = [
        pl.BlockSpec((TB, WQ), lambda b, r: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, WT), lambda b, r: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
    ]
    # band state lives in i32 lanes: values always fit int8 (the compute
    # path wraps through w8 before merging), but i8 scratch costs Mosaic a
    # pack/unpack relayout on every read+write of every array per step --
    # i32 storage trades 4x VMEM footprint (~1.1 MB at TB=64, Wb=640) for
    # zero relayouts (measured ~9 ms/call of state r/w at the bench shape)
    scratch = [
        pltpu.VMEM((TB, Wb), jnp.int32),  # u
        pltpu.VMEM((TB, Wb), jnp.int32),  # v
        pltpu.VMEM((TB, Wb), jnp.int32),  # x
        pltpu.VMEM((TB, Wb), jnp.int32),  # y
        pltpu.VMEM((TB, Wb), jnp.int32),  # x2
        pltpu.VMEM((TB, Wb), jnp.int32),  # y2
        pltpu.VMEM((TB, Wb), jnp.int32),  # s
        pltpu.VMEM((TB, Wb), jnp.int32),  # H
        pltpu.VMEM((TB, 16), jnp.int32),  # acc
    ]
    if with_cigar:
        # dirs rows padded to the traceback's KTB multiple; rows past
        # KR*ROWS are never written or walked (see _compiled_traceback).
        # PACKED: 4 direction rows per i32 word (row r = byte r%4 of word
        # r//4), so the tensor is (rows/4, B, Wb) i32 -- same HBM bytes
        RT = _round_up(KR * ROWS, TB_KTB)
        assert RT % ROWS == 0 and RT % 4 == 0
        out_shape = (
            jax.ShapeDtypeStruct((B, 16), jnp.int32),
            jax.ShapeDtypeStruct((RT // 4, B, Wb), jnp.int32),
        )
        out_specs = (
            pl.BlockSpec((TB, 16), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS // 4, TB, Wb), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
        )
    else:
        out_shape = (jax.ShapeDtypeStruct((B, 16), jnp.int32),)
        out_specs = (
            pl.BlockSpec((TB, 16), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        )

    call = pl.pallas_call(
        kernel,
        grid=(nB, KR),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )
    return jax.jit(call), (WQ, WT, QOFF, SOFF)


@functools.lru_cache(maxsize=256)
def _compiled_exts_pallas(B, TB, Lq, Lt, R, Wb, q, e, q2, noncan, junc_bonus,
                          has_junc, approx_max, right_gaps, with_cigar,
                          approx_drop, spl_for, spl_rev, spl_flank,
                          rev_motifs, sc_mch, sc_mis, sc_n, ROWS=8):
    """Spliced (exts) step-window kernel: the extd builder in splice mode
    (reference ksw_exts2_sse, src/ksw2_exts2_sse.c).  The band is the full
    anti-diagonal, so W_MAX = Lq + Lt disables the band terms; SOFF = 32
    leaves room for the acceptor's target[t-2] reads below the window."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W_MAX = Lq + Lt
    QOFF = Lq + Lt + 16
    SOFF = 32
    WQ = _round_up(QOFF + Wb + 256, 128)
    WT = _round_up(SOFF + Lt + Wb + 384, 128)
    nB = B // TB
    KR = (R + ROWS - 1) // ROWS
    kernel = _build_extd_kernel(
        TB, Wb, WQ, WT, QOFF, SOFF, Lq, R, q, e, q2, 0, W_MAX, approx_max,
        right_gaps, with_cigar, approx_drop, sc_mch, sc_mis, sc_n, ROWS=ROWS,
        splice=(noncan, junc_bonus, has_junc, spl_for, spl_rev, spl_flank,
                rev_motifs))

    def vspec(shape):
        return pl.BlockSpec(shape, lambda b, r: (b, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [vspec((TB, WQ)), vspec((TB, WT)), vspec((TB, 1)),
                vspec((TB, 1)), vspec((TB, 1)), vspec((TB, 1))]
    if has_junc:
        in_specs.append(vspec((TB, WT)))
    scratch = [
        pltpu.VMEM((TB, Wb), jnp.int32),  # u  (i32 state: see extd note)
        pltpu.VMEM((TB, Wb), jnp.int32),  # v
        pltpu.VMEM((TB, Wb), jnp.int32),  # x
        pltpu.VMEM((TB, Wb), jnp.int32),  # y
        pltpu.VMEM((TB, Wb), jnp.int32),  # x2 (intron)
        pltpu.VMEM((TB, Wb), jnp.int32),  # s
        pltpu.VMEM((TB, Wb), jnp.int32),  # H
        pltpu.VMEM((TB, 16), jnp.int32),  # acc
    ]
    if with_cigar:
        # packed dirs: 4 rows per i32 word, as in _compiled_extd_pallas
        RT = _round_up(KR * ROWS, TB_KTB)
        assert RT % ROWS == 0 and RT % 4 == 0
        out_shape = (
            jax.ShapeDtypeStruct((B, 16), jnp.int32),
            jax.ShapeDtypeStruct((RT // 4, B, Wb), jnp.int32),
        )
        out_specs = (
            vspec((TB, 16)),
            pl.BlockSpec((ROWS // 4, TB, Wb), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
        )
    else:
        out_shape = (jax.ShapeDtypeStruct((B, 16), jnp.int32),)
        out_specs = (vspec((TB, 16)),)

    call = pl.pallas_call(
        kernel,
        grid=(nB, KR),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )
    return jax.jit(call), (WQ, WT, QOFF, SOFF, W_MAX)


def _exts_long_thres(q, e, q2):
    """exts long_thres == the traceback min_intron_len (reference
    ksw2_exts2_sse.c:76-78)."""
    long_thres = (q2 - q) // e - 1
    if q2 > q + e + long_thres * e:
        long_thres += 1
    return long_thres


def exts_pallas(qseqs, tseqs, mat, q, e, q2, noncan, zdrop, junc_bonus, flag,
                juncs=None, TB=32):
    """Batched wm_exts-equivalent on TPU via the splice-mode step-window
    kernel + device traceback (reference ksw_exts2_sse,
    src/ksw2_exts2_sse.c).  juncs: optional per-job junction-flag arrays
    (already window-sliced and orientation-reversed by the caller, like the
    `junc` argument of native.exts).  Returns a list of DevExtResult."""
    B0 = len(qseqs)
    qlen = np.array([len(s) for s in qseqs], np.int32)
    tlen = np.array([len(s) for s in tseqs], np.int32)
    Lq = quantize_len(int(max(1, qlen.max())))
    Lt = quantize_len(int(max(1, tlen.max())))
    R = Lq + Lt - 1
    n_col = min(Lq, Lt)
    Wb = _round_up(((n_col + 15) // 16 + 1) * 16 + 32 + _EXTD_ROWS, 128)
    if Wb > 2048:
        TB = min(TB, 32)
    if Wb > 3968:
        TB = min(TB, 16)
    B = _round_up(B0, TB)

    mat = np.asarray(mat, np.int8)
    sc_n = int(mat[24]) if mat[24] != 0 else None
    with_cigar = not (flag & 0x01)
    approx_max = bool(flag & 0x08)
    approx_drop = bool(flag & 0x10)
    right_gaps = bool(flag & 0x02)
    extz_only = bool(flag & 0x40)
    rev_cigar = bool(flag & 0x80)
    spl_for = bool(flag & 0x100)
    spl_rev = bool(flag & 0x200)
    spl_flank = bool(flag & 0x400)
    has_junc = juncs is not None and any(j is not None for j in juncs)
    ROWS = extd_rows(Wb)

    run, (WQ, WT, QOFF, SOFF, W_MAX) = _compiled_exts_pallas(
        B, TB, Lq, Lt, R, Wb, q, e, q2, noncan, junc_bonus, has_junc,
        approx_max, right_gaps, with_cigar, approx_drop, spl_for, spl_rev,
        spl_flank, rev_cigar, int(mat[0]), int(mat[1]), sc_n, ROWS=ROWS)

    qbuf = np.zeros((B, WQ), np.uint8)
    sfbuf = np.zeros((B, WT), np.uint8)
    jbuf = np.zeros((B, WT), np.uint8) if has_junc else None
    for i, (qs, ts) in enumerate(zip(qseqs, tseqs)):
        n = len(qs)
        qbuf[i, QOFF - n:QOFF] = qs[::-1]
        sfbuf[i, SOFF:SOFF + len(ts)] = ts
        if has_junc and juncs[i] is not None:
            jbuf[i, SOFF:SOFF + len(ts)] = juncs[i]

    def col(v, fill=1):
        a = np.full((B, 1), fill, np.int32)
        a[:B0, 0] = v
        return a

    qlen_a, tlen_a = col(qlen), col(tlen)
    w_a = np.full((B, 1), W_MAX, np.int32)
    zd_a = col(np.broadcast_to(np.asarray(zdrop, np.int32), (B0,)), -1)
    args = [qbuf, sfbuf, qlen_a, tlen_a, w_a, zd_a]
    if has_junc:
        args.append(jbuf)
    out = run(*args)
    res = np.asarray(out[0])[:B0]
    results = []
    if with_cigar:
        i0, j0 = _compiled_select_starts("max" if extz_only else False)(
            out[0], qlen_a, tlen_a, np.int32(0))
        tb = _compiled_traceback(B, TB, R, Wb, Lq, W_MAX,
                                 RD=out[1].shape[0] * 4, BROWS=ROWS,
                                 min_intron=_exts_long_thres(q, e, q2))
        ops, fin = tb(out[1], qlen_a, tlen_a, i0, j0, w_a)
        ops = np.asarray(ops)
        fin = np.asarray(fin)
    for i in range(B0):
        r = DevExtResult()
        (r.max, zdr, r.max_q, r.max_t, r.mqe, r.mqe_t, r.mte, r.mte_q,
         r.score) = (int(v) for v in res[i, :9])
        r.zdropped = bool(zdr)
        r.reach_end = False
        r.cigar = np.zeros(0, np.uint32)
        if with_cigar:
            has_tb = ((not r.zdropped and not extz_only)
                      or (r.max_t >= 0 and r.max_q >= 0))
            if has_tb:
                mi_len = _exts_long_thres(q, e, q2)
                walked = ops[i, :R][::-1]
                walked = walked[walked != 255].astype(np.int64)
                parts = [walked]
                if fin[i, 0] >= 0:
                    op_i = 3 if mi_len > 0 and fin[i, 0] >= mi_len else 2
                    parts.append(np.full(int(fin[i, 0]) + 1, op_i, np.int64))
                if fin[i, 1] >= 0:
                    parts.append(np.full(int(fin[i, 1]) + 1, 1, np.int64))
                full = np.concatenate(parts)
                if len(full):
                    if not rev_cigar:
                        full = full[::-1]
                    change = np.flatnonzero(np.diff(full)) + 1
                    starts = np.concatenate([[0], change])
                    ends = np.concatenate([change, [len(full)]])
                    lens = ends - starts
                    r.cigar = ((lens.astype(np.uint32) << 4)
                               | full[starts].astype(np.uint32))
        results.append(r)
    return results


TB_KTB = 8  # anti-diagonals walked per traceback grid step


@functools.lru_cache(maxsize=512)
def _compiled_traceback(B, TB, R, Wb, Lq, W_MAX, RD=None, BROWS=1,
                        min_intron=0):
    """Device traceback: all alignments of a batch walk the direction tensor
    in lockstep over descending anti-diagonals (reference ksw_backtrack,
    src/ksw2.h:119-151 semantics incl. the force-state band clamp).  Each
    walker emits one op byte per visited diagonal into a VMEM chunk that is
    flushed 128-aligned into ops[b, r], so only (B, R) bytes ever leave the
    device instead of the (R, B, Wb) direction tensor.

    KTB anti-diagonals are walked per grid step (amortising grid overhead
    ~KTBx), and a whole step is skipped when every walker in the tile is
    finished or has not yet reached this row range.  Rows >= R of the
    padded dirs tensor are never active (i + j <= R - 1), so their
    uninitialized contents are harmless."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i32 = jnp.int32
    u8 = jnp.uint8
    nB = B // TB
    KTB = TB_KTB
    RD = RD or _round_up(R, KTB)
    assert RD % KTB == 0
    NS = RD // KTB
    Rp = _round_up(RD, 128)
    # step-window kernels (BROWS a multiple of 4) emit dirs PACKED 4 rows
    # per i32 word; the per-row extz kernel (BROWS=1) emits u8 rows
    packed = BROWS % 4 == 0

    def kernel(dirs_ref, qlen_ref, tlen_ref, i0_ref, j0_ref, w_ref,
               ops_ref, fin_ref, wk_s, chunk_s):
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _init():
            wk_s[:] = jnp.concatenate(
                [i0_ref[:], j0_ref[:], jnp.zeros((TB, 6), i32)], axis=1)
            chunk_s[:] = jnp.full((TB, 128), 255, i32)
            ops_ref[:] = jnp.full((TB, Rp), 255, u8)

        qlen = qlen_ref[:]
        tlen = tlen_ref[:]
        w = w_ref[:]
        lanes = jax.lax.broadcasted_iota(i32, (TB, Wb), 1)
        lanes128 = jax.lax.broadcasted_iota(i32, (TB, 128), 1)

        r_lo = RD - KTB * (kk + 1)
        iv = wk_s[:, 0:1]
        jv = wk_s[:, 1:2]
        # step liveness: a walker matters here iff it is unfinished and has
        # started by the last row of this range (i + j >= r_lo)
        alive = jnp.logical_and(jnp.logical_and(iv >= 0, jv >= 0),
                                iv + jv >= r_lo)

        def _sub_row(jr):
            r = r_lo + KTB - 1 - jr
            i = wk_s[:, 0:1]
            j = wk_s[:, 1:2]
            state = wk_s[:, 2:3]
            act = jnp.logical_and(jnp.logical_and(i >= 0, j >= 0), i + j == r)
            st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
            en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            # window base matches the DP kernel's granularity: per-row for
            # extz (BROWS=1), per-ROWS-step for the extd step-window kernel
            r0b = (r // BROWS) * BROWS
            st0c = jnp.maximum(jnp.maximum(0, r0b - Lq + 1),
                               (r0b - W_MAX + 1) >> 1)
            base = st0c // 16 * 16 - 16
            rr = KTB - 1 - jr
            if packed:
                # byte rr%4 of word rr//4 (rows ≡ r mod 4: both the DP
                # step base r0 and this step's r_lo are multiples of 4)
                word = dirs_ref[rr // 4, :, :]
                row = jax.lax.shift_right_logical(word, 8 * (rr % 4)) & 0xFF
            else:
                row = dirs_ref[rr, :, :].astype(i32)
            d = jnp.sum(jnp.where(lanes == i - base, row, 0), axis=1,
                        keepdims=True)
            force2 = i < st
            force1 = i > en
            d = jnp.where(jnp.logical_or(force2, force1), 0, d)
            s1 = jnp.where(state == 0, d & 7,
                           jnp.where((jax.lax.shift_right_logical(
                               d, state + 2) & 1) == 0, 0, state))
            s2 = jnp.where(s1 == 0, d & 7, s1)
            s3 = jnp.where(force2, 2, jnp.where(force1, 1, s2))
            is_del = jnp.logical_or(s3 == 1, s3 == 3)
            op = jnp.where(s3 == 0, 0, jnp.where(is_del, 2, 1))
            if min_intron > 0:
                # spliced kernel: the long-gap state emits 'N' ops
                # (reference ksw_backtrack min_intron_len, src/ksw2.h:138)
                op = jnp.where(s3 == 3, 3, op)
            i_new = jnp.where(op != 1, i - 1, i)
            j_new = jnp.where(jnp.logical_or(op == 2, op == 3), j, j - 1)
            opv = jnp.where(act, op, 255)
            chunk_s[:] = jnp.where(lanes128 == (r & 127), opv, chunk_s[:])
            i = jnp.where(act, i_new, i)
            j = jnp.where(act, j_new, j)
            state = jnp.where(act, s3, state)
            wk_s[:] = jnp.concatenate(
                [i, j, state, jnp.zeros((TB, 5), i32)], axis=1)

        any_alive = jnp.any(alive)
        for jr in range(KTB):
            r = RD - KTB * kk - 1 - jr  # == r_lo + KTB-1-jr

            @pl.when(any_alive)
            def _walk(jr=jr):
                _sub_row(jr)

            # the flush is unconditional wrt liveness: a dead tile may still
            # hold unflushed ops in chunk_s from the rows where it was alive
            @pl.when(r % 128 == 0)
            def _flush(r=r):
                o = pl.multiple_of(r, 128)
                ops_ref[:, pl.ds(o, 128)] = chunk_s[:].astype(u8)
                chunk_s[:] = jnp.full((TB, 128), 255, i32)

        @pl.when(kk == NS - 1)
        def _out():
            fin_ref[:] = wk_s[:]

    dirs_spec = (
        pl.BlockSpec((KTB // 4, TB, Wb), lambda b, k: (NS - 1 - k, b, 0),
                     memory_space=pltpu.VMEM) if packed else
        pl.BlockSpec((KTB, TB, Wb), lambda b, k: (NS - 1 - k, b, 0),
                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(nB, NS),
        in_specs=[
            dirs_spec,
            pl.BlockSpec((TB, 1), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, Rp), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 8), lambda b, k: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Rp), jnp.uint8),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((TB, 8), jnp.int32),
                        pltpu.VMEM((TB, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )
    return jax.jit(call)


def _rle_cigar(ops_col, i_fin, j_fin, rev_cigar):
    """Assemble one BAM-packed CIGAR from a walked op column (descending-r
    emit order) plus the leading remainder runs, replicating CigarBuf
    semantics (walked + D-remainder + I-remainder, reversed unless
    rev_cigar)."""
    walked = ops_col[::-1]
    walked = walked[walked != 255].astype(np.int64)
    parts = [walked]
    if i_fin >= 0:
        parts.append(np.full(1, 2, np.int64).repeat(i_fin + 1))
    if j_fin >= 0:
        parts.append(np.full(1, 1, np.int64).repeat(j_fin + 1))
    full = np.concatenate(parts) if len(parts) > 1 else walked
    if len(full) == 0:
        return np.zeros(0, np.uint32)
    if not rev_cigar:
        full = full[::-1]
    change = np.flatnonzero(np.diff(full)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(full)]])
    lens = ends - starts
    return ((lens.astype(np.uint32) << 4) | full[starts].astype(np.uint32))


def traceback_batch(dirs_dev, qlen, tlen, w, Lq, i0, j0, rev_cigar,
                    TB=32, W_MAX=None, BROWS=None):
    """Run the device traceback for a whole DP batch; returns a list of
    BAM-packed CIGARs (empty array where i0/j0 < 0)."""
    RD, B, Wb = dirs_dev.shape
    BROWS = BROWS if BROWS else extd_rows(Wb)
    if BROWS % 4 == 0:
        RD *= 4  # packed dirs: 4 rows per i32 word
    R = RD
    B0 = len(qlen)
    W_MAX = W_MAX or (w if np.isscalar(w) else int(np.max(w)))
    run = _compiled_traceback(B, TB, R, Wb, Lq, W_MAX, RD=RD, BROWS=BROWS)

    def col(v, fill):
        a = np.full((B, 1), fill, np.int32)
        a[:B0, 0] = v
        return a

    ops, fin = run(dirs_dev, col(qlen, 1), col(tlen, 1), col(i0, -1),
                   col(j0, -1), col(w, 1))
    ops = np.asarray(ops)
    fin = np.asarray(fin)
    out = []
    for b in range(B0):
        if i0[b] < 0 or j0[b] < 0:
            out.append(np.zeros(0, np.uint32))
            continue
        out.append(_rle_cigar(ops[b, :R], int(fin[b, 0]), int(fin[b, 1]),
                              rev_cigar[b]))
    return out


def cigar_pallas(res, b: int, i0: int, j0: int, rev_cigar: bool) -> np.ndarray:
    """Host traceback for alignment b of a step-window kernel result
    (common-window dirs layout; reference ksw_backtrack, src/ksw2.h:119-151)."""
    import ctypes

    from .. import native

    L = native.lib()
    if not hasattr(L, "_bt2_ready"):
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        L.wm_backtrack_band2.argtypes = [
            u8p, i32p, i32p, i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
        ]
        L.wm_backtrack_band2.restype = ctypes.c_int
        L._bt2_ready = True
    out = ctypes.POINTER(ctypes.c_uint32)()
    p = np.ascontiguousarray(res.dirs[:, b, :])
    st = np.ascontiguousarray(res.off[b])
    en = np.ascontiguousarray(res.off_end[b])
    n = L.wm_backtrack_band2(p, res.base, st, en, p.shape[1], i0, j0,
                             int(rev_cigar), ctypes.byref(out))
    if n == 0:
        return np.zeros(0, np.uint32)
    cig = np.ctypeslib.as_array(out, (n,)).copy()
    L.wm_free(out)
    return cig


class DevExtResult:
    """Extension result assembled from the device DP + traceback
    (field-compatible with native.ExtResult)."""

    __slots__ = ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
                 "mte_q", "score", "reach_end", "cigar")


_LEN_STEPS = (128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096, 6144,
              8192, 12288, 16384, 24576, 32768, 65536)

# anti-diagonals processed per extd grid step; the step-window kernel holds
# all band state in values across the step (scratch read/written once), so
# large values amortise both grid overhead and state traffic.  Results are
# bit-identical for any value.  Wide bands shrink ROWS so the VMEM working
# set (state values + the (ROWS, TB, Wb) dirs block) stays under the 16 MB
# scoped-vmem limit.
_EXTD_ROWS = max(32, int(__import__("os").environ.get("WM_EXTD_ROWS", "32")))


def extd_rows(Wb: int) -> int:
    import os

    ov = os.environ.get("WM_EXTD_ROWS")
    if ov:
        return int(ov)
    if Wb <= 768:
        return 32
    if Wb <= 1536:
        return 16
    return 8


def quantize_len(n: int, _bisect=__import__("bisect").bisect_left) -> int:
    i = _bisect(_LEN_STEPS, n)
    if i < len(_LEN_STEPS):
        return _LEN_STEPS[i]
    return _round_up(n, 16384)


_LEN_STEPS_A = np.array(_LEN_STEPS, np.int64)


def quantize_len_vec(n):
    """Vectorized quantize_len over an int array (values > the last step
    round up to 16384 like the scalar form)."""
    n = np.maximum(np.asarray(n, np.int64), 1)
    i = np.searchsorted(_LEN_STEPS_A, n)
    big = i >= len(_LEN_STEPS)
    out = _LEN_STEPS_A[np.minimum(i, len(_LEN_STEPS) - 1)]
    if big.any():
        out = np.where(big, (n + 16383) // 16384 * 16384, out)
    return out


def est_dirs_slot_bytes(Lq: int, Lt: int, w: int) -> int:
    """Direction-tensor bytes per padded batch slot for a quantized call
    shape (used by dispatchers to cap a call's HBM footprint)."""
    R = Lq + Lt - 1
    n_col = min(min(Lq, Lt), w + 1)
    Wb = _round_up(((n_col + 15) // 16 + 1) * 16 + 32 + _EXTD_ROWS, 128)
    return _round_up(R, 64) * Wb


MAX_CALL_DIRS_BYTES = 2 << 30


def quantize_batch(n: int) -> int:
    # coarse ladder: at most 3 batch-size variants per kernel shape, so the
    # jit/compile caches converge quickly (padded tiles die on the first
    # anti-diagonal and the liveness guard skips them)
    for s in (256, 1024, 4096):
        if n <= s:
            return s
    return _round_up(n, 4096)


@functools.lru_cache(maxsize=512)
def _compiled_select_starts(mode):
    """Device-side traceback start selection (reference wm_ksw.cpp:318-333 /
    ksw2 tail logic) so the DP -> traceback chain needs no host sync.
    mode: False = full-reach unless dropped; True = extz_only (reach_end via
    mqe + end_bonus); "max" = always the running max (exts with EXTZ_ONLY,
    which has no end-bonus reach rule -- wm_ksw.cpp wm_exts tail)."""
    import jax
    import jax.numpy as jnp

    def sel(res, qlen, tlen, end_bonus):
        mx = res[:, 0:1]
        zdr = res[:, 1:2] != 0
        max_q = res[:, 2:3]
        max_t = res[:, 3:4]
        mqe = res[:, 4:5]
        mqe_t = res[:, 5:6]
        ok_max = jnp.logical_and(max_t >= 0, max_q >= 0)
        if mode == "max":
            i0 = jnp.where(ok_max, max_t, -1)
            j0 = jnp.where(ok_max, max_q, -1)
        elif not mode:
            i0 = jnp.where(~zdr, tlen - 1, jnp.where(ok_max, max_t, -1))
            j0 = jnp.where(~zdr, qlen - 1, jnp.where(ok_max, max_q, -1))
        else:
            reach = jnp.logical_and(~zdr, mqe + end_bonus > mx)
            i0 = jnp.where(reach, mqe_t,
                           jnp.where(ok_max, max_t, -1))
            j0 = jnp.where(reach, qlen - 1,
                           jnp.where(ok_max, max_q, -1))
        return i0.astype(jnp.int32), j0.astype(jnp.int32)

    return jax.jit(sel)


class DevCall:
    """One in-flight device DP(+traceback) batch: dispatch is async, collect
    fetches everything with a single host sync."""

    def __init__(self, qseqs, tseqs, mat, q, e, q2, e2, w, zdrop, end_bonus,
                 flag, TB=32):
        if q2 + e2 < q + e:
            q, q2 = q2, q
            e, e2 = e2, e
        B0 = len(qseqs)
        qlen = np.array([len(s) for s in qseqs], np.int32)
        tlen = np.array([len(s) for s in tseqs], np.int32)
        w = np.broadcast_to(np.asarray(w, np.int32), (B0,))
        zdrop = np.broadcast_to(np.asarray(zdrop, np.int32), (B0,))
        Lq = quantize_len(int(max(1, qlen.max())))
        Lt = quantize_len(int(max(1, tlen.max())))
        R = Lq + Lt - 1
        W_MAX = quantize_len(int(w.max()))
        n_col = min(min(Lq, Lt), W_MAX + 1)
        Wb = _round_up(((n_col + 15) // 16 + 1) * 16 + 32 + _EXTD_ROWS, 128)
        if Wb > 2048:
            # wide bands: shrink the tile so the step-window kernel's
            # value working set stays inside the 16 MB scoped VMEM
            TB = min(TB, 32)
        if Wb > 3968:
            TB = min(TB, 16)
        B = quantize_batch(_round_up(B0, TB))
        slot_bytes = _round_up(R, 64) * Wb
        if B * slot_bytes > MAX_CALL_DIRS_BYTES:
            # clamp to the shape-fixed cap batch (see DevCallPooled note)
            cap_B = max(TB, MAX_CALL_DIRS_BYTES // slot_bytes // TB * TB)
            B = min(B, max(cap_B, _round_up(B0, TB)))

        mat = np.asarray(mat, np.int8)
        sc_n = int(mat[24]) if mat[24] != 0 else None
        self.with_cigar = not (flag & 0x01)
        approx_max = bool(flag & 0x08)
        approx_drop = bool(flag & 0x10)
        right_gaps = bool(flag & 0x02)
        self.extz_only = bool(flag & 0x40)
        self.rev_cigar = bool(flag & 0x80)
        self.end_bonus = end_bonus
        self.B0, self.R, self.qlen, self.tlen = B0, R, qlen, tlen

        run, (WQ, WT, QOFF, SOFF) = _compiled_extd_pallas(
            B, TB, Lq, Lt, R, Wb, q, e, q2, e2, W_MAX, approx_max,
            right_gaps, self.with_cigar, approx_drop, int(mat[0]),
            int(mat[1]), sc_n, ROWS=extd_rows(Wb))

        qbuf = np.zeros((B, WQ), np.uint8)
        sfbuf = np.zeros((B, WT), np.uint8)
        for i, (qs, ts) in enumerate(zip(qseqs, tseqs)):
            n = len(qs)
            qbuf[i, QOFF - n:QOFF] = qs[::-1]
            sfbuf[i, SOFF:SOFF + len(ts)] = ts
        qlen_a = np.ones((B, 1), np.int32)
        tlen_a = np.ones((B, 1), np.int32)
        qlen_a[:B0, 0] = qlen
        tlen_a[:B0, 0] = tlen
        w_a = np.ones((B, 1), np.int32)
        w_a[:B0, 0] = w
        zd_a = np.full((B, 1), -1, np.int32)
        zd_a[:B0, 0] = zdrop

        out = run(qbuf, sfbuf, qlen_a, tlen_a, w_a, zd_a)  # async dispatch
        self.res_dev = out[0]
        self.ops_dev = self.fin_dev = None
        if self.with_cigar:
            eb = np.int32(end_bonus)
            i0, j0 = _compiled_select_starts(self.extz_only)(
                out[0], qlen_a, tlen_a, eb)
            tb = _compiled_traceback(B, TB, R, Wb, Lq, W_MAX,
                                     RD=out[1].shape[0] * 4,
                                     BROWS=extd_rows(Wb))
            self.ops_dev, self.fin_dev = tb(out[1], qlen_a, tlen_a, i0, j0,
                                            w_a)

    def collect(self):
        res = np.asarray(self.res_dev)[:self.B0]
        if self.with_cigar:
            ops = np.asarray(self.ops_dev)
            fin = np.asarray(self.fin_dev)
        res9 = res[:, :9].tolist()
        results = []
        for i in range(self.B0):
            r = DevExtResult()
            (r.max, zdr, r.max_q, r.max_t, r.mqe, r.mqe_t, r.mte, r.mte_q,
             r.score) = res9[i]
            r.zdropped = bool(zdr)
            r.reach_end = False
            r.cigar = np.zeros(0, np.uint32)
            if self.with_cigar:
                if (not r.zdropped and self.extz_only
                        and r.mqe + self.end_bonus > r.max):
                    r.reach_end = True
                has_tb = (not r.zdropped) or (r.max_t >= 0 and r.max_q >= 0)
                if has_tb:
                    r.cigar = _rle_cigar(ops[i, :self.R], int(fin[i, 0]),
                                         int(fin[i, 1]), self.rev_cigar)
            results.append(r)
        return results


def extd_cigar_device(qseqs, tseqs, mat, q, e, q2, e2, w, zdrop, end_bonus,
                      flag, TB=32):
    """Batched extension fully on device: Pallas DP wavefront + Pallas
    traceback; only (B,16) results and (B,R) op bytes cross the host link.
    Shapes are quantized so the compile cache stays small.  Returns a list
    of DevExtResult (reference ksw_extd2_sse + ksw_backtrack semantics,
    src/ksw2_extd2_sse.c, src/ksw2.h:119-151)."""
    return DevCall(qseqs, tseqs, mat, q, e, q2, e2, w, zdrop, end_bonus,
                   flag, TB=TB).collect()


@functools.lru_cache(maxsize=256)
def _compiled_assemble(WQ, WT, QOFF, SOFF):
    """Device-side DP-buffer assembly: gather each job's query/target window
    from the resident sequence pools using affine (offset, sign) indices, so
    per-job sequence bytes never cross the host link."""
    import jax
    import jax.numpy as jnp

    def asm(qpool, tpool, desc):
        B = desc.shape[0]
        i32 = jnp.int32
        cq = jax.lax.broadcasted_iota(i32, (B, WQ), 1)
        qa = desc[:, 0:1]
        qsgn = desc[:, 1:2]
        qlen = desc[:, 2:3]
        idx = qa + qsgn * cq
        maskq = jnp.logical_and(cq >= QOFF - qlen, cq < QOFF)
        qv = jnp.take(qpool, jnp.clip(idx, 0, qpool.shape[0] - 1), axis=0)
        qbuf = jnp.where(maskq, qv, 0).astype(jnp.uint8)

        ct = jax.lax.broadcasted_iota(i32, (B, WT), 1)
        ta = desc[:, 3:4]
        tsgn = desc[:, 4:5]
        tlen = desc[:, 5:6]
        idxt = ta + tsgn * ct
        maskt = jnp.logical_and(ct >= SOFF, ct < SOFF + tlen)
        tv = jnp.take(tpool, jnp.clip(idxt, 0, tpool.shape[0] - 1), axis=0)
        sfbuf = jnp.where(maskt, tv, 0).astype(jnp.uint8)
        return qbuf, sfbuf

    return jax.jit(asm)


@functools.lru_cache(maxsize=256)
def _compiled_pack_ops(cols):
    """Pack traceback op bytes 4-per-byte (2 bits each; idle 255 -> 3) so
    the ops download shrinks 4x."""
    import jax
    import jax.numpy as jnp

    def pack(ops):
        o = jnp.minimum(ops, 3)[:, :cols * 4].reshape(ops.shape[0], cols, 4)
        return (o[..., 0] | (o[..., 1] << 2) | (o[..., 2] << 4)
                | (o[..., 3] << 6)).astype(jnp.uint8)

    return jax.jit(pack)


@functools.lru_cache(maxsize=256)
def _compiled_fuse_out(cols, wide=False):
    """Fuse the per-call outputs (res (B,16) i32, fin (B,8) i32, packed ops
    (B,cols) u8) into ONE u8 array so each device call costs a single
    device->host fetch instead of three (each fetch pays a full link
    round-trip on a tunnel-attached chip).  wide=True packs 4-bit ops
    (2/byte, idle 15) for the spliced kernel whose op alphabet includes the
    intron op 3 (2-bit packing reserves 3 as the idle sentinel)."""
    import jax
    import jax.numpy as jnp

    def fuse(res, fin, ops):
        B = res.shape[0]
        r8 = jax.lax.bitcast_convert_type(res, jnp.uint8).reshape(B, 64)
        f8 = jax.lax.bitcast_convert_type(fin, jnp.uint8).reshape(B, 32)
        if not wide:
            o = jnp.minimum(ops, 3)[:, :cols * 4].reshape(B, cols, 4)
            p = (o[..., 0] | (o[..., 1] << 2) | (o[..., 2] << 4)
                 | (o[..., 3] << 6)).astype(jnp.uint8)
        else:
            o = jnp.minimum(ops, 15)[:, :cols * 2].reshape(B, cols, 2)
            p = (o[..., 0] | (o[..., 1] << 4)).astype(jnp.uint8)
        return jnp.concatenate([r8, f8, p], axis=1)

    return jax.jit(fuse)


def _unpack_ops(packed, R):
    out = np.empty((packed.shape[0], packed.shape[1] * 4), np.uint8)
    for k in range(4):
        out[:, k::4] = (packed >> (2 * k)) & 3
    return out[:, :R]


class PoolContext:
    """Device-resident sequence pools for one mapping batch: the reference
    codes (uploaded once per index) and the batch's read strand pool.
    `device` pins the pools (and thus every DevCallPooled using them) to one
    local device -- the data-parallel multi-device driver
    (parallel/multidev.py) runs one engine + pool set per device."""

    _ref_cache: dict = {}

    def __init__(self, qpool_np, ref_np, device=None):
        import jax

        self.qpool_np = qpool_np
        self.ref_np = ref_np
        self.device = device
        self.qpool = (jax.device_put(qpool_np, device) if device is not None
                      else jax.device_put(qpool_np))
        key = (id(ref_np), device)
        cached = PoolContext._ref_cache.get(key)
        if cached is None or cached[0] is not ref_np:
            dev = (jax.device_put(ref_np, device) if device is not None
                   else jax.device_put(ref_np))
            # one index resident at a time: drop cached uploads of OTHER
            # ref arrays (keep sibling devices' uploads of this one)
            for k in [k for k, v in PoolContext._ref_cache.items()
                      if v[0] is not ref_np]:
                del PoolContext._ref_cache[k]
            PoolContext._ref_cache[key] = (ref_np, dev)
        self.ref = PoolContext._ref_cache[key][1]
        self._q_addr = qpool_np.__array_interface__["data"][0]
        self._r_addr = ref_np.__array_interface__["data"][0]
        self._q_end = self._q_addr + qpool_np.nbytes
        self._r_end = self._r_addr + ref_np.nbytes

    def resolve(self, js) -> tuple[int, int] | None:
        """JobSeq -> (pool_sel, offset) if its view lives in a pool."""
        v = js.view if hasattr(js, "view") else js
        if v.dtype != np.uint8 or v.ndim != 1 or v.strides[0] != 1:
            return None
        addr = v.__array_interface__["data"][0]
        if self._q_addr <= addr and addr + v.nbytes <= self._q_end:
            return 0, addr - self._q_addr
        if self._r_addr <= addr and addr + v.nbytes <= self._r_end:
            return 1, addr - self._r_addr
        return None


# fused assembly->DP->traceback->pack chains, keyed by the (cached) DP
# callable plus the post-processing shape params; each entry is one jax.jit
# whose trace inlines the individually-tested factory pieces
_FUSED_CHAIN: dict = {}


class DevCallPooled:
    """One in-flight pooled device batch: job windows are gathered from the
    resident pools on device; only 32-byte descriptors go up and packed op
    bytes come down."""

    def __init__(self, pools: PoolContext, jobs, mat, q, e, q2, e2,
                 end_bonus, flag, TB=32, shape_override=None, splice=None,
                 juncs=None):
        # jobs: list of (qdesc, tdesc, w, zdrop) where qdesc/tdesc =
        # (pool_sel, off, ln, rev).  shape_override=(Lq, Lt, W_MAX) pins the
        # padded call shape (merged straggler calls use a small fixed shape
        # menu so the kernel-variant space stays bounded).  splice =
        # (noncan, junc_bonus) switches to the exts kernel (e2 ignored);
        # juncs optionally carries per-job junction-flag arrays (window-
        # sliced + orientation-reversed by the caller, uploaded host-side
        # because bed_junc flags depend on the query window bounds).
        is_extz = splice is None and (q == q2 and e == e2)
        if splice is None and q2 + e2 < q + e:
            q, q2 = q2, q
            e, e2 = e2, e
        # jobs: list of (qdesc, tdesc, w, zdrop) tuples, or an (B0, 8) int
        # array of (qoff, qlen, qrev, toff, tlen, trev, w, zdrop) columns
        # (the engine's flat job rows — no per-job Python tuples)
        if isinstance(jobs, np.ndarray):
            ja = np.ascontiguousarray(jobs, np.int64).reshape(-1, 8)
        else:
            for (qs_sel, _, _, _), (ts_sel, _, _, _), _, _ in jobs:
                assert qs_sel == 0 and ts_sel == 1
            ja = np.array([(j[0][1], j[0][2], j[0][3], j[1][1], j[1][2],
                            j[1][3], j[2], j[3]) for j in jobs],
                          np.int64).reshape(-1, 8)
        B0 = len(ja)
        qlen = ja[:, 1].astype(np.int32)
        tlen = ja[:, 4].astype(np.int32)
        ws = ja[:, 6].astype(np.int32)
        zds = ja[:, 7].astype(np.int32)
        if shape_override is not None:
            Lq, Lt, W_MAX = shape_override
        else:
            Lq = quantize_len(int(max(1, qlen.max())))
            Lt = quantize_len(int(max(1, tlen.max())))
            W_MAX = quantize_len(int(ws.max()))
        R = Lq + Lt - 1
        if splice is not None:
            W_MAX = Lq + Lt  # unbanded: the w terms vanish
            n_col = min(Lq, Lt)
        else:
            n_col = min(min(Lq, Lt), W_MAX + 1)
        Wb = _round_up(((n_col + 15) // 16 + 1) * 16 + 32 + _EXTD_ROWS, 128)
        if Wb > 2048:
            # wide bands: shrink the tile so the step-window kernel's
            # value working set stays inside the 16 MB scoped VMEM
            TB = min(TB, 32)
        if Wb > 3968:
            TB = min(TB, 16)
        B = quantize_batch(_round_up(B0, TB))
        slot_bytes = _round_up(R, 64) * Wb
        if B * slot_bytes > MAX_CALL_DIRS_BYTES:
            # big shapes: clamp to the largest TB-multiple batch under the
            # dirs HBM cap.  The clamp is a pure function of the call SHAPE
            # (never of B0), so the jit-variant space stays bounded — an
            # exact-B0 fallback here compiles a fresh run-dependent variant
            # per dispatch and stalls production for minutes.
            cap_B = max(TB, MAX_CALL_DIRS_BYTES // slot_bytes // TB * TB)
            B = min(B, max(cap_B, _round_up(B0, TB)))

        mat = np.asarray(mat, np.int8)
        sc_n = int(mat[24]) if mat[24] != 0 else None
        self.with_cigar = not (flag & 0x01)
        approx_max = bool(flag & 0x08)
        approx_drop = bool(flag & 0x10)
        right_gaps = bool(flag & 0x02)
        self.extz_only = bool(flag & 0x40)
        self.rev_cigar = bool(flag & 0x80)
        # end_bonus: scalar or per-job array (it is a traced argument of
        # the select step, never baked into a kernel variant)
        self.end_bonus = np.broadcast_to(
            np.asarray(end_bonus, np.int32), (B0,))
        self.B0 = B0
        self.R = R
        self.R_act = int((qlen + tlen).max()) - 1
        self.splice = splice
        self.min_intron = 0

        if splice is not None:
            noncan, junc_bonus = splice
            self.min_intron = _exts_long_thres(q, e, q2)
            has_junc = juncs is not None and any(
                j is not None for j in juncs)
            run, (WQ, WT, QOFF, SOFF, W_MAX) = _compiled_exts_pallas(
                B, TB, Lq, Lt, R, Wb, q, e, q2, noncan, junc_bonus,
                has_junc, approx_max, right_gaps, self.with_cigar,
                approx_drop, bool(flag & 0x100), bool(flag & 0x200),
                bool(flag & 0x400), self.rev_cigar, int(mat[0]),
                int(mat[1]), sc_n, ROWS=extd_rows(Wb))
        elif is_extz:
            sc_n_b = (int(mat[24]) if mat[24] != 0 else -e) & 255
            max_sc = (int(mat[0]) + 2 * (q + e)) & 255
            run, (WQ, WT, QOFF, SOFF) = _compiled_extz_pallas(
                B, TB, Lq, Lt, R, Wb, q, e, W_MAX, approx_max, right_gaps,
                self.with_cigar, approx_drop, int(mat[0]) & 255,
                int(mat[1]) & 255, sc_n_b, max_sc)
        else:
            run, (WQ, WT, QOFF, SOFF) = _compiled_extd_pallas(
                B, TB, Lq, Lt, R, Wb, q, e, q2, e2, W_MAX, approx_max,
                right_gaps, self.with_cigar, approx_drop, int(mat[0]),
                int(mat[1]), sc_n, ROWS=extd_rows(Wb))

        # affine descriptor per job: value(c) = pool[a + sgn*c] inside the
        # masked window (see module docstring for the layout derivation)
        desc = np.zeros((B, 8), np.int32)
        desc[:, 2] = 1
        desc[:, 5] = 1
        qo, ql, qrev = ja[:, 0], ja[:, 1], ja[:, 2] != 0
        to, tl, trev = ja[:, 3], ja[:, 4], ja[:, 5] != 0
        desc[:B0, 0] = np.where(qrev, qo + ql - QOFF, qo + QOFF - 1)
        desc[:B0, 1] = np.where(qrev, 1, -1)
        desc[:B0, 2] = ql
        desc[:B0, 3] = np.where(trev, to + tl - 1 + SOFF, to - SOFF)
        desc[:B0, 4] = np.where(trev, -1, 1)
        desc[:B0, 5] = tl
        desc[:B0, 6] = ja[:, 6]
        desc[:B0, 7] = ja[:, 7]

        qlen_a = desc[:, 2:3].copy()
        tlen_a = desc[:, 5:6].copy()
        qlen_a[B0:] = 1
        tlen_a[B0:] = 1
        if splice is not None:
            w_a = np.full((B, 1), W_MAX, np.int32)
        else:
            w_a = desc[:, 6:7].copy()
            w_a[B0:] = 1
        zd_a = desc[:, 7:8].copy()
        zd_a[B0:] = -1

        # One fused jit dispatch per call: window assembly -> DP kernel ->
        # start selection -> traceback -> fused output packing, traced as a
        # single XLA computation (the pieces are the individually-tested
        # jitted factories, inlined).  Five dispatches/call -> one: on a
        # tunnel-attached chip per-dispatch host latency dominates the
        # scheduler's dispatch_s.
        if splice is not None:
            sel_mode = "max" if self.extz_only else False
            self.pack_cols = (R + 1) // 2
        else:
            sel_mode = self.extz_only
            self.pack_cols = (R + 3) // 4  # fixed per shape: one variant
        is_junc = splice is not None and has_junc
        brows = 1 if is_extz else extd_rows(Wb)
        fkey = (run, self.with_cigar, sel_mode, B, TB, R, Wb, Lq, W_MAX,
                brows, self.min_intron, splice is not None, is_junc)
        fused = _FUSED_CHAIN.get(fkey)
        if fused is None:
            import jax

            asm = _compiled_assemble(WQ, WT, QOFF, SOFF)
            with_cigar = self.with_cigar
            is_spl = splice is not None
            min_intron = self.min_intron
            pack_cols = self.pack_cols

            def chain(qpool, tpool, dsc, qlen_, tlen_, w_, zd_, eb,
                      jbuf=None):
                qbuf, sfbuf = asm(qpool, tpool, dsc)
                rargs = [qbuf, sfbuf, qlen_, tlen_, w_, zd_]
                if jbuf is not None:
                    rargs.append(jbuf)
                out = run(*rargs)
                if not with_cigar:
                    return out[0]
                i0, j0 = _compiled_select_starts(sel_mode)(out[0], qlen_,
                                                           tlen_, eb)
                tb = _compiled_traceback(
                    B, TB, R, Wb, Lq, W_MAX,
                    # step-window dirs are packed 4 rows/word; extz
                    # (brows == 1) stays row-per-step u8
                    RD=out[1].shape[0] * (1 if brows == 1 else 4),
                    BROWS=brows, min_intron=min_intron)
                ops, fin = tb(out[1], qlen_, tlen_, i0, j0, w_)
                return _compiled_fuse_out(pack_cols, is_spl)(out[0], fin,
                                                             ops)

            fused = _FUSED_CHAIN[fkey] = jax.jit(chain)

        eb = np.zeros((B, 1), np.int32)
        eb[:B0, 0] = self.end_bonus
        if is_junc:
            jbuf = np.zeros((B, WT), np.uint8)
            for i, jc in enumerate(juncs):
                if jc is not None:
                    jbuf[i, SOFF:SOFF + len(jc)] = jc
            self.out_dev = fused(pools.qpool, pools.ref, desc, qlen_a,
                                 tlen_a, w_a, zd_a, eb, jbuf)
        else:
            self.out_dev = fused(pools.qpool, pools.ref, desc, qlen_a,
                                 tlen_a, w_a, zd_a, eb)

    def start_fetch(self):
        """Begin the async device->host copy of the fused output (one fetch
        per call; each fetch pays a full link round-trip)."""
        try:
            self.out_dev.copy_to_host_async()
        except Exception:
            pass

    def ready(self) -> bool:
        """True when the device result is available (collect won't block)."""
        try:
            return self.out_dev.is_ready()
        except AttributeError:
            return True

    def collect_blob(self):
        """Engine fast path: fetch + decode as flat arrays, no per-job
        result objects.  Returns (res9 (B0,9) int32 in the engine deliver
        column order, cigar blob uint32 | None, per-job blob offsets int64,
        lengths int32, reach_end (B0,) int32)."""
        buf = np.asarray(self.out_dev)[:self.B0]
        blob = off = ln = None
        if self.with_cigar:
            res = np.ascontiguousarray(buf[:, :64]).view(np.int32)
            fin = np.ascontiguousarray(buf[:, 64:96]).view(np.int32)
            from .. import native
            rev = np.full(self.B0, self.rev_cigar, np.uint8)
            if self.splice is not None:
                blob, off, ln = native.rle_ops_blob4(
                    np.ascontiguousarray(buf[:, 96:]), fin[:, 0], fin[:, 1],
                    rev, self.min_intron)
            else:
                blob, off, ln = native.rle_ops_blob(
                    np.ascontiguousarray(buf[:, 96:]), fin[:, 0], fin[:, 1],
                    rev)
        else:
            res = buf
        res9 = np.ascontiguousarray(res[:, :9], np.int32)
        reach = np.zeros(self.B0, np.int32)
        if self.with_cigar and self.splice is None and self.extz_only:
            reach = ((res9[:, 1] == 0)
                     & (res9[:, 4] + self.end_bonus
                        > res9[:, 0])).astype(np.int32)
        return res9, blob, off, ln, reach

    def collect(self):
        res9, blob, off, ln, reach = self.collect_blob()
        res9l = res9.tolist()
        results = []
        for i in range(self.B0):
            r = DevExtResult()
            (r.max, zdr, r.max_q, r.max_t, r.mqe, r.mqe_t, r.mte, r.mte_q,
             r.score) = res9l[i]
            r.zdropped = bool(zdr)
            r.reach_end = bool(reach[i])
            r.cigar = (np.zeros(0, np.uint32) if blob is None
                       else blob[off[i]:off[i] + ln[i]].copy())
            results.append(r)
        return results


def _rle_cigar_packed(ops_col, i_fin, j_fin, rev_cigar):
    """_rle_cigar for 2-bit-packed walks (idle sentinel 3)."""
    walked = ops_col[::-1]
    walked = walked[walked != 3].astype(np.int64)
    parts = [walked]
    if i_fin >= 0:
        parts.append(np.full(i_fin + 1, 2, np.int64))
    if j_fin >= 0:
        parts.append(np.full(j_fin + 1, 1, np.int64))
    full = np.concatenate(parts) if len(parts) > 1 else walked
    if len(full) == 0:
        return np.zeros(0, np.uint32)
    if not rev_cigar:
        full = full[::-1]
    change = np.flatnonzero(np.diff(full)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(full)]])
    lens = ends - starts
    return ((lens.astype(np.uint32) << 4) | full[starts].astype(np.uint32))


def _build_extz_kernel(TB, Wb, WQ, WT, QOFF, SOFF, Lq, R, q, e, W_MAX,
                       approx_max, right_gaps, with_cigar, approx_drop,
                       sc_mch, sc_mis, sc_n, max_sc):
    """Single-gap-cost wavefront (reference ksw_extz2_sse,
    src/ksw2_extz2_sse.c): the SIMD kernel keeps *biased unsigned* uint8
    state with a mix of signed and unsigned comparisons; here the biased
    bytes live in i32 lanes, wrapped with & 255 after arithmetic and viewed
    signed via a low-byte sign-extend, bit-identical to the oracle.  Window
    machinery (common trajectory, right-aligned queries, per-row masks) is
    shared with the extd kernel -- see the module docstring."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i8 = jnp.int8
    i32 = jnp.int32
    u8 = jnp.uint8
    qe = q + e
    qe2 = 2 * (q + e)

    def basefn(r):
        st0c = jnp.maximum(jnp.maximum(0, r - Lq + 1), (r - W_MAX + 1) >> 1)
        return (st0c // 16) * 16 - 16

    IDX = {k: v for v, k in enumerate(
        "mx zdr max_q max_t mqe mqe_t mte mte_q score H0 lH0t done".split())}
    S_STRIDE = Wb // 4 + 2
    assert 4 * S_STRIDE + Wb + 8 < 16384, "band too wide for rank packing"
    assert R * e + 2 * q < -H_CLAMP

    def kernel(qbuf_ref, sf_ref, qlen_ref, tlen_ref, w_ref, zdrop_ref,
               *rest):
        if with_cigar:
            res_ref, dirs_ref, u_s, v_s, x_s, y_s, s_s, H_s, acc_s = rest
        else:
            res_ref, u_s, v_s, x_s, y_s, s_s, H_s, acc_s = rest
            dirs_ref = None
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            z8 = jnp.zeros((TB, Wb), i8)
            u_s[:] = z8
            v_s[:] = z8
            x_s[:] = z8
            y_s[:] = z8
            s_s[:] = z8
            H_s[:] = jnp.full((TB, Wb), NEG_INF, i32)
            col = jax.lax.broadcasted_iota(i32, (TB, 16), 1)
            neg1 = ((col == IDX["max_q"]) | (col == IDX["max_t"])
                    | (col == IDX["mqe_t"]) | (col == IDX["mte_q"]))
            ninf = ((col == IDX["mqe"]) | (col == IDX["mte"])
                    | (col == IDX["score"]))
            acc_s[:] = jnp.where(neg1, -1, jnp.where(ninf, NEG_INF, 0))

        qlen = qlen_ref[:]
        tlen = tlen_ref[:]
        acc = acc_s[:]
        done = acc[:, IDX["done"]:IDX["done"] + 1]
        base_w = basefn(r)
        slide = jnp.logical_and(r >= 1, base_w != basefn(r - 1))

        @pl.when(slide)
        def _slide():
            lane_hi = jax.lax.broadcasted_iota(i32, (TB, Wb), 1) >= Wb - 16

            def roll16(ref, fill):
                ref[:] = jnp.where(lane_hi, fill,
                                   jnp.roll(ref[:], -16, axis=1))

            roll16(u_s, jnp.int8(0))
            roll16(v_s, jnp.int8(0))
            roll16(x_s, jnp.int8(0))
            roll16(y_s, jnp.int8(0))
            roll16(s_s, jnp.int8(0))
            roll16(H_s, jnp.int32(NEG_INF))

        def _step_body(qlen, tlen, acc, done, base_w, r):
            w = w_ref[:]
            zdrop = zdrop_ref[:]
            lanes = jax.lax.broadcasted_iota(i32, (TB, Wb), 1)
            t_abs = base_w + lanes

            active = jnp.logical_and(done == 0, r < qlen + tlen - 1)
            st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
            en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
            collapse = jnp.logical_and(active, st0 > en0)
            zdr = acc[:, IDX["zdr"]:IDX["zdr"] + 1]
            zdr = jnp.where(collapse, 1, zdr)
            done = jnp.where(collapse, 1, done)
            active = jnp.logical_and(active, jnp.logical_not(collapse))

            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            st0p = jnp.maximum(jnp.maximum(0, (r - 1) - qlen + 1),
                               ((r - 1) - w + 1) >> 1)
            stp = st0p // 16 * 16
            shift16 = jnp.logical_and(active,
                                      jnp.logical_and(r >= 1, st > stp))
            en0p = jnp.minimum(jnp.minimum(tlen - 1, r - 1),
                               ((r - 1) + w) >> 1)
            enp = (en0p + 16) // 16 * 16 - 1
            in_prev = jnp.logical_and(st - 1 >= stp, st - 1 <= enp)
            in_prev = jnp.logical_and(in_prev, r >= 1)
            use_nat = jnp.logical_and(shift16, in_prev)
            at_st = jnp.logical_and(t_abs == st, active)
            at0 = st == 0

            def wu8(a):  # biased-unsigned byte in an i32 lane
                return a & 255

            def s8(a):  # signed view of the low byte
                return a.astype(i8).astype(i32)

            u = u_s[:].astype(i32) & 255
            v = v_s[:].astype(i32) & 255
            x = x_s[:].astype(i32) & 255
            y = y_s[:].astype(i32) & 255
            s = s_s[:].astype(i32) & 255
            H = H_s[:]

            # u[r]/y[r] boundary cell (t == r)
            has_r = jnp.logical_and(active,
                                    jnp.logical_and(en >= r, r >= st))
            onehot_r = jnp.logical_and(has_r, t_abs == r)
            ub = jnp.where(r >= 1, q, 0)
            y = jnp.where(onehot_r, 0, y)
            u = jnp.where(onehot_r, ub, u)

            def dyn_row(ref, off):
                o_al = off // 128 * 128
                rem = off - o_al
                blk = ref[:, pl.ds(pl.multiple_of(o_al, 128), Wb + 128)]
                blk = blk.astype(i32)
                blk = pltpu.roll(blk, Wb + 128 - rem, axis=1)
                return blk[:, :Wb]

            o_q = QOFF - 1 - r + base_w
            qv = dyn_row(qbuf_ref, o_q)
            sfv = dyn_row(sf_ref, SOFF + base_w)
            cover_last = st0 + (en0 - st0) // 16 * 16 + 15
            s_mask = jnp.logical_and(
                active, jnp.logical_and(t_abs >= st0, t_abs <= cover_last))
            sc = jnp.where(
                jnp.logical_or(sfv == 4, qv == 4),
                jnp.int32(sc_n & 255),
                jnp.where(sfv == qv, jnp.int32(sc_mch & 255),
                          jnp.int32(sc_mis & 255)))
            s = jnp.where(s_mask, sc, s)

            band_mask = jnp.logical_and(
                active, jnp.logical_and(t_abs >= st, t_abs <= en))

            def shl1(a, fill):
                lane0 = lanes == 0
                return jnp.where(lane0, fill, jnp.roll(a, 1, axis=1))

            x1n = shl1(x, 0)
            v1n = shl1(v, 0)
            not_nat = jnp.logical_and(at_st, jnp.logical_not(use_nat))
            xt1 = jnp.where(not_nat, 0, x1n)
            vt1 = jnp.where(not_nat, 0, v1n)
            vt1 = jnp.where(jnp.logical_and(at_st, at0), ub, vt1)

            z = wu8(s + qe2)
            a_ = wu8(xt1 + vt1)
            b_ = wu8(y + u)
            zs = s8(z)
            as_ = s8(a_)
            bs = s8(b_)
            if not right_gaps:
                d = jnp.where(as_ > zs, 1, 0)
                z = wu8(jnp.maximum(zs, as_))
                d = jnp.where(bs > s8(z), 2, d)
            else:
                d = jnp.where(zs > as_, 0, 1)
                z = wu8(jnp.maximum(zs, as_))
                d = jnp.where(s8(z) > bs, d, 2)
            z = jnp.maximum(z, b_)  # unsigned max (epu8)
            z = jnp.minimum(z, jnp.int32(max_sc))  # unsigned min
            u_new = wu8(z - vt1)
            v_new = wu8(z - u)
            zq = wu8(z - q)
            an = wu8(a_ - zq)
            bn = wu8(b_ - zq)
            ans = s8(an)
            bns = s8(bn)
            if not right_gaps:
                ax_, bx_ = ans > 0, bns > 0
            else:
                ax_, bx_ = jnp.logical_not(0 > ans), jnp.logical_not(0 > bns)
            x_new = jnp.where(ax_, an, 0)
            y_new = jnp.where(bx_, bn, 0)
            d = d | jnp.where(ax_, 0x08, 0)
            d = d | jnp.where(bx_, 0x10, 0)

            u = jnp.where(band_mask, u_new, u)
            v = jnp.where(band_mask, v_new, v)
            x = jnp.where(band_mask, x_new, x)
            y = jnp.where(band_mask, y_new, y)

            u_s[:] = u.astype(i8)
            v_s[:] = v.astype(i8)
            x_s[:] = x.astype(i8)
            y_s[:] = y.astype(i8)
            s_s[:] = s.astype(i8)

            if with_cigar:
                dirs_ref[0, :, :] = jnp.where(band_mask, d, 0).astype(u8)

            def lane_val(arr, pos):
                return jnp.sum(jnp.where(t_abs == pos, arr, 0), axis=1,
                               keepdims=True)

            mx = acc[:, IDX["mx"]:IDX["mx"] + 1]
            max_q = acc[:, IDX["max_q"]:IDX["max_q"] + 1]
            max_t = acc[:, IDX["max_t"]:IDX["max_t"] + 1]
            score = acc[:, IDX["score"]:IDX["score"] + 1]

            if not approx_max:
                mqe = acc[:, IDX["mqe"]:IDX["mqe"] + 1]
                mqe_t = acc[:, IDX["mqe_t"]:IDX["mqe_t"] + 1]
                mte = acc[:, IDX["mte"]:IDX["mte"] + 1]
                mte_q = acc[:, IDX["mte_q"]:IDX["mte_q"] + 1]
                vi = v
                ui = u
                H_en0_prev = lane_val(H, en0)
                H_en0m1_prev = lane_val(H, en0 - 1)
                u_en0 = lane_val(ui, en0)
                v_en0 = lane_val(vi, en0)
                Hen0_new = jnp.where(en0 >= 1, H_en0m1_prev + u_en0 - qe,
                                     H_en0_prev + v_en0 - qe)
                upd_mask = jnp.logical_and(t_abs >= st0, t_abs < en0)
                H_upd = jnp.where(upd_mask, H + vi - qe, H)
                H_upd = jnp.where(t_abs == en0, Hen0_new, H_upd)
                H_r0 = jnp.where(t_abs == 0, vi - qe - qe, H)
                H_new = jnp.where(r == 0, H_r0, H_upd)
                H = jnp.where(active, H_new, H)
                H_s[:] = H

                en1 = st0 + (en0 - st0) // 4 * 4
                p_rel = t_abs - st0
                in_str = jnp.logical_and(t_abs >= st0, t_abs < en1)
                in_tail = jnp.logical_and(t_abs >= en1, t_abs < en0)
                rank = jnp.where(
                    t_abs == en0, 0,
                    jnp.where(in_str,
                              1 + (p_rel & 3) * S_STRIDE + (p_rel >> 2),
                              jnp.where(in_tail,
                                        1 + 4 * S_STRIDE + (t_abs - en1),
                                        16383)))
                valid = jnp.logical_and(rank < 16383, active)
                Hc = jnp.maximum(H, H_CLAMP)
                K = jnp.where(valid, Hc * 16384 + (16383 - rank),
                              jnp.int32(-0x7FFFFFFF))
                Kmax = jnp.max(K, axis=1, keepdims=True)
                max_H = jax.lax.shift_right_arithmetic(Kmax, 14)
                max_tv = jnp.sum(jnp.where(K == Kmax, t_abs, 0), axis=1,
                                 keepdims=True)
                max_H = jnp.where(r == 0, lane_val(H, 0), max_H)
                max_tv = jnp.where(r == 0, 0, max_tv)

                H_en0_now = jnp.where(r == 0, lane_val(H, en0), Hen0_new)
                H_st0_now = lane_val(H, st0)
                mte_upd = jnp.logical_and(
                    active, jnp.logical_and(en0 == tlen - 1,
                                            H_en0_now > mte))
                mte = jnp.where(mte_upd, H_en0_now, mte)
                mte_q = jnp.where(mte_upd, r - en, mte_q)
                mqe_upd = jnp.logical_and(
                    active, jnp.logical_and(r - st0 == qlen - 1,
                                            H_st0_now > mqe))
                mqe = jnp.where(mqe_upd, H_st0_now, mqe)
                mqe_t = jnp.where(mqe_upd, st0, mqe_t)

                better = max_H > mx
                mx_n = jnp.where(better, max_H, mx)
                max_t_n = jnp.where(better, max_tv, max_t)
                max_q_n = jnp.where(better, r - max_tv, max_q)
                inquad = jnp.logical_and(
                    jnp.logical_not(better),
                    jnp.logical_and(max_tv >= max_t, r - max_tv >= max_q))
                ldiff = jnp.abs((max_tv - max_t) - ((r - max_tv) - max_q))
                dropped = jnp.logical_and(
                    jnp.logical_and(inquad, zdrop >= 0),
                    mx - max_H > zdrop + ldiff * e)
                dropped = jnp.logical_and(active, dropped)
                zdr = jnp.where(dropped, 1, zdr)
                done = jnp.where(dropped, 1, done)
                mx = jnp.where(active, mx_n, mx)
                max_t = jnp.where(active, max_t_n, max_t)
                max_q = jnp.where(active, max_q_n, max_q)
                fin = jnp.logical_and(
                    jnp.logical_and(active, jnp.logical_not(dropped)),
                    jnp.logical_and(r == qlen + tlen - 2, en0 == tlen - 1))
                score = jnp.where(fin, H_en0_now, score)
                H0 = acc[:, IDX["H0"]:IDX["H0"] + 1]
                lH0t = acc[:, IDX["lH0t"]:IDX["lH0t"] + 1]
            else:
                mqe = acc[:, IDX["mqe"]:IDX["mqe"] + 1]
                mqe_t = acc[:, IDX["mqe_t"]:IDX["mqe_t"] + 1]
                mte = acc[:, IDX["mte"]:IDX["mte"] + 1]
                mte_q = acc[:, IDX["mte_q"]:IDX["mte_q"] + 1]
                H0 = acc[:, IDX["H0"]:IDX["H0"] + 1]
                lH0t = acc[:, IDX["lH0t"]:IDX["lH0t"] + 1]
                vi = v
                ui = u
                d0 = lane_val(vi, lH0t) - qe
                d1 = lane_val(ui, lH0t + 1) - qe
                both_in = jnp.logical_and(
                    jnp.logical_and(lH0t >= st0, lH0t <= en0),
                    jnp.logical_and(lH0t + 1 >= st0, lH0t + 1 <= en0))
                only_cur = jnp.logical_and(lH0t >= st0, lH0t <= en0)
                H0_new = jnp.where(
                    both_in, H0 + jnp.maximum(d0, d1),
                    jnp.where(only_cur, H0 + d0, H0 + d1))
                lH0t_new = jnp.where(
                    jnp.logical_and(both_in, d1 > d0), lH0t + 1,
                    jnp.where(only_cur, lH0t, lH0t + 1))
                H0_new = jnp.where(r == 0, lane_val(vi, 0) - qe - qe, H0_new)
                lH0t_new = jnp.where(r == 0, 0, lH0t_new)
                H0 = jnp.where(active, H0_new, H0)
                lH0t = jnp.where(active, lH0t_new, lH0t)
                if approx_drop:
                    # oracle parity: apply only for r > 0 (see extd note)
                    app = jnp.logical_and(active, r >= 1)
                    better = H0 > mx
                    mx_n = jnp.where(better, H0, mx)
                    mt_n = jnp.where(better, lH0t, max_t)
                    mq_n = jnp.where(better, r - lH0t, max_q)
                    inquad = jnp.logical_and(
                        jnp.logical_not(better),
                        jnp.logical_and(lH0t >= max_t, r - lH0t >= max_q))
                    ldiff = jnp.abs((lH0t - max_t) - ((r - lH0t) - max_q))
                    dropped = jnp.logical_and(
                        jnp.logical_and(jnp.logical_and(app, inquad),
                                        zdrop >= 0),
                        mx - H0 > zdrop + ldiff * e)
                    zdr = jnp.where(dropped, 1, zdr)
                    done = jnp.where(dropped, 1, done)
                    mx = jnp.where(app, mx_n, mx)
                    max_t = jnp.where(app, mt_n, max_t)
                    max_q = jnp.where(app, mq_n, max_q)
                fin = jnp.logical_and(
                    active, jnp.logical_and(r == qlen + tlen - 2,
                                            en0 == tlen - 1))
                score = jnp.where(fin, H0, score)

            pad = jnp.zeros((TB, 4), i32)
            acc_s[:] = jnp.concatenate(
                [mx, zdr.astype(i32), max_q, max_t, mqe, mqe_t, mte, mte_q,
                 score, H0, lH0t, done.astype(i32), pad], axis=1)

        inact = jnp.logical_or(done >= 1, r >= qlen + tlen - 1)
        live = jnp.logical_not(jnp.all(inact))

        @pl.when(live)
        def _step():
            _step_body(qlen, tlen, acc, done, base_w, r)

        @pl.when(r == R - 1)
        def _out():
            res_ref[:] = acc_s[:]

    return kernel


@functools.lru_cache(maxsize=512)
def _compiled_extz_pallas(B, TB, Lq, Lt, R, Wb, q, e, W_MAX, approx_max,
                          right_gaps, with_cigar, approx_drop, sc_mch,
                          sc_mis, sc_n, max_sc):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    QOFF = Lq + Lt + 16
    SOFF = 16
    WQ = _round_up(QOFF + Wb + 256, 128)
    WT = _round_up(SOFF + Lt + Wb + 256, 128)
    nB = B // TB
    kernel = _build_extz_kernel(TB, Wb, WQ, WT, QOFF, SOFF, Lq, R, q, e,
                                W_MAX, approx_max, right_gaps, with_cigar,
                                approx_drop, sc_mch, sc_mis, sc_n, max_sc)
    in_specs = [
        pl.BlockSpec((TB, WQ), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, WT), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((TB, Wb), jnp.int8),  # u
        pltpu.VMEM((TB, Wb), jnp.int8),  # v
        pltpu.VMEM((TB, Wb), jnp.int8),  # x
        pltpu.VMEM((TB, Wb), jnp.int8),  # y
        pltpu.VMEM((TB, Wb), jnp.int8),  # s
        pltpu.VMEM((TB, Wb), jnp.int32),  # H
        pltpu.VMEM((TB, 16), jnp.int32),  # acc
    ]
    if with_cigar:
        RT = _round_up(R, TB_KTB)  # padded for the multi-row traceback
        out_shape = (
            jax.ShapeDtypeStruct((B, 16), jnp.int32),
            jax.ShapeDtypeStruct((RT, B, Wb), jnp.uint8),
        )
        out_specs = (
            pl.BlockSpec((TB, 16), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, Wb), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
        )
    else:
        out_shape = (jax.ShapeDtypeStruct((B, 16), jnp.int32),)
        out_specs = (
            pl.BlockSpec((TB, 16), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        )
    call = pl.pallas_call(
        kernel,
        grid=(nB, R),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )
    return jax.jit(call), (WQ, WT, QOFF, SOFF)
