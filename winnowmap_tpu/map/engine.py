"""Native-engine batched mapping driver.

The per-read orchestration (seeding, chaining, hit bookkeeping, alignment
control flow, MCAS staging — reference src/map.c:279-981 and src/hit.c /
src/align.c) runs inside the C++ engine (native/src/wm_engine.cpp) on
lightweight threads; this module drives the device side: it pulls flat
extension-DP job descriptors from the engine, batches them by shape onto
the Pallas TPU kernels (extend/pallas_kernel.DevCallPooled), and feeds the
results back.  Python never touches a per-anchor or per-region loop.

Byte-identical to map/frag.map_one by construction (the engine is a port
of the same parity-tested logic; tests/test_engine.py asserts equality).
"""
from __future__ import annotations

import ctypes
import os
from collections import defaultdict, deque

import numpy as np

from .. import native
from ..options import (
    MM_F_FOR_ONLY,
    MM_F_NO_DIAG,
    MM_F_NO_DUAL,
    MM_F_REV_ONLY,
    MM_F_SPLICE,
    MM_F_SR,
    MapOptions,
    stage1_options,
    stage2_options,
)
from .batch import (MAX_INFLIGHT_CALLS, MIN_DEV_BATCH, MIN_MERGED_BATCH,
                    STATS, kernel_broken, note_kernel_failure)
from .frag import MapResult, _x31_hash
from .hit import Extra, Reg

# job row columns (wm_engine.cpp JOB_I64 layout)
(C_ID, C_QOFF, C_QLEN, C_QREV, C_TOFF, C_TLEN, C_TREV, C_W, C_ZD, C_EB,
 C_FLAG, C_PROF) = range(12)


def engine_supported(opt: MapOptions, mi=None) -> bool:
    """Flags the native engine handles; anything else falls back to the
    generator path (map/batch.py).  Splice runs in the engine (exts jobs go
    to the splice Pallas kernel) except when --junc-bed intervals are
    loaded: bed_junc flags depend on each alignment's DP window bounds, so
    junction-annotated runs stay on the generator path."""
    unsupported = (MM_F_NO_DIAG | MM_F_NO_DUAL | MM_F_FOR_ONLY
                   | MM_F_REV_ONLY | MM_F_SR)
    if opt.flag & unsupported:
        return False
    if (opt.flag & MM_F_SPLICE) and mi is not None and mi.intervals:
        return False
    return True


def _opts_to_c(opt: MapOptions) -> native.EngOptsC:
    o = native.EngOptsC()
    for name, _ in o._fields_:
        if name == "pad_":
            continue
        setattr(o, name, getattr(opt, name) if not isinstance(
            getattr(opt, name), bool) else int(getattr(opt, name)))
    return o


def _index_to_c(mi) -> tuple[native.EngIndexC, list]:
    keep = []

    def ptr(a):
        keep.append(a)
        return a.ctypes.data_as(ctypes.c_void_p) if a.size else None

    seq_off = np.array([s.offset for s in mi.seqs], np.int64)
    seq_len = np.array([s.length for s in mi.seqs], np.int32)
    c = native.EngIndexC()
    c.keys = ptr(np.ascontiguousarray(mi.keys, np.uint64))
    c.start = ptr(np.ascontiguousarray(mi.start, np.int64))
    c.pos = ptr(np.ascontiguousarray(mi.pos, np.uint64))
    c.codes = ptr(np.ascontiguousarray(mi.codes, np.uint8))
    c.seq_off = ptr(seq_off)
    c.seq_len = ptr(seq_len)
    c.wset = ptr(np.ascontiguousarray(mi.wset, np.uint64))
    if getattr(mi, "bloom", None) is not None:
        table, bits, s0, s1 = mi.bloom
        c.bloom = ptr(np.ascontiguousarray(table, np.uint8))
        c.bloom_bits = bits
        c.bloom_salts = (s1 << 32) | s0
    c.n_keys = len(mi.keys)
    c.n_wset = len(mi.wset)
    c.n_seq = len(mi.seqs)
    c.w = mi.w
    c.k = mi.k
    c.idx_flag = mi.flag
    return c, keep


def _check_sizes(L):
    s = np.zeros(3, np.int64)
    L.wm_eng_sizes.argtypes = [ctypes.c_void_p]
    L.wm_eng_sizes(s.ctypes.data)
    assert s[0] == ctypes.sizeof(native.EngOptsC), (s[0], ctypes.sizeof(native.EngOptsC))
    assert s[1] == ctypes.sizeof(native.EngIndexC), (s[1], ctypes.sizeof(native.EngIndexC))
    assert s[2] == native.REGOUT_DTYPE.itemsize, (s[2], native.REGOUT_DTYPE.itemsize)


class MapEngine:
    """One batch's native engine + device scheduler."""

    def __init__(self, mi, opt: MapOptions, seqs, qnames, pools, qoffs,
                 qpool_np):
        self.L = native.lib()
        _check_sizes(self.L)
        self.mi = mi
        self.opt = opt
        self.pools = pools
        self.device = not isinstance(pools, _HostOnlyPools)
        self.n = len(seqs)
        self._keep = [qpool_np]
        self._seqs = seqs  # bytes objects must outlive the engine

        self.opts3 = [opt, stage1_options(opt), stage2_options(opt)]
        # profiles with identical DP scoring share kernels and calls: the
        # stage overrides (reference map.c:300-302,711-717) touch zdrop/bw/
        # max_gap — per-JOB columns — not the scoring matrix, so all three
        # profiles normally collapse to one bucket class
        def _score_key(o):
            return (o.a, o.b, o.q, o.e, o.q2, o.e2, o.sc_ambi,
                    bool(o.flag & MM_F_SPLICE), o.noncan, o.junc_bonus)

        skeys = [_score_key(o) for o in self.opts3]
        self.prof_rep = [skeys.index(k) for k in skeys]
        self.c_opts = [_opts_to_c(o) for o in self.opts3]
        self.c_idx, keep = _index_to_c(mi)
        self._keep += keep
        self.h = self.L.wm_eng_create(
            ctypes.byref(self.c_idx), ctypes.byref(self.c_opts[0]),
            ctypes.byref(self.c_opts[1]), ctypes.byref(self.c_opts[2]),
            qpool_np.ctypes.data_as(ctypes.c_void_p),
            int(os.environ.get("WM_ENGINE_THREADS", "512")))
        if self.device:
            # device chaining: anchor sets >= this export through the chain
            # exchange onto chain/device.py (bit-exact).  Default threshold
            # pending on-chip measurement; WM_DEV_CHAIN_MIN overrides,
            # 0 disables.
            self.L.wm_eng_set_chain_min(
                self.h, int(os.environ.get("WM_DEV_CHAIN_MIN", "50000")))
        self.empty = []
        for i, (seq, name) in enumerate(zip(seqs, qnames)):
            if len(seq) == 0:
                self.empty.append(i)
            of, orv = qoffs[i]
            self.L.wm_eng_add_read(
                self.h, ctypes.c_char_p(seq), len(seq), of, orv,
                _x31_hash(name) if name else 0)

    def close(self):
        if self.h:
            self.L.wm_eng_destroy(self.h)
            self.h = None

    # ---- device scheduling -------------------------------------------

    def _step(self) -> np.ndarray:
        p = ctypes.POINTER(ctypes.c_int64)()
        n = self.L.wm_eng_step(self.h, ctypes.byref(p))
        if n == 0:
            return np.zeros((0, 12), np.int64)
        return np.ctypeslib.as_array(p, (n, 12)).copy()

    def _service_chains(self) -> bool:
        """Export pending chain jobs and run them batched on the device
        chain kernel (chain/device.py), delivering (u, ax, ay) back to the
        blocked engine threads."""
        import time

        from ..chain.device import chain_dp_device_batch

        p = ctypes.POINTER(ctypes.c_int64)()
        n = self.L.wm_eng_step_chains(self.h, ctypes.byref(p))
        if n == 0:
            return False
        rows = np.ctypeslib.as_array(p, (n, 16)).copy()
        t0 = time.time()
        groups = defaultdict(list)  # param tuple -> [(id, ax, ay)]
        for r in rows:
            na = int(r[1])
            ax = np.ctypeslib.as_array(
                ctypes.cast(int(r[2]),
                            ctypes.POINTER(ctypes.c_uint64)), (na,))
            ay = np.ctypeslib.as_array(
                ctypes.cast(int(r[3]),
                            ctypes.POINTER(ctypes.c_uint64)), (na,))
            # the engine's scalar path takes gap_scale through a float cast
            gs = float(np.float32(np.int64(r[13]).view(np.float64)))
            key = tuple(int(v) for v in r[4:13]) + (gs,)
            groups[key].append((int(r[0]), ax, ay))
        for key, members in groups.items():
            (mdx, mindx, mdy, bw, mskip, miter, mcnt, msc, is_cdna,
             gs) = key
            results = chain_dp_device_batch(
                [(ax, ay) for _, ax, ay in members], mdx, mindx, mdy, bw,
                mskip, miter, mcnt, msc, gs, is_cdna)
            for (cid, _, _), (u, oax, oay) in zip(members, results):
                u = np.ascontiguousarray(u, np.uint64)
                oax = np.ascontiguousarray(oax, np.uint64)
                oay = np.ascontiguousarray(oay, np.uint64)
                self.L.wm_eng_deliver_chain(
                    self.h, cid, len(u), u.ctypes.data, len(oax),
                    oax.ctypes.data, oay.ctypes.data)
        STATS["chain_dev_s"] += time.time() - t0
        STATS["chain_dev_jobs"] += len(rows)
        return True

    def _deliver(self, rows: np.ndarray, collected) -> None:
        """Feed one call's results back over the flat deliver boundary.
        `collected` is DevCallPooled.collect_blob() output: the res columns
        and the CIGAR blob go to wm_eng_deliver as-is (the native decode
        already emits the blob+offsets layout the engine consumes)."""
        res9, blob, off, ln, reach = collected
        n = len(rows)
        ids = np.ascontiguousarray(rows[:, C_ID])
        res = np.zeros((n, 10), np.int32)
        res[:, :9] = res9
        res[:, 9] = reach
        if blob is None:
            blob = np.zeros(1, np.uint32)
            off = np.zeros(n, np.int64)
            ln = np.zeros(n, np.int32)
        else:
            blob = np.ascontiguousarray(blob, np.uint32)
            off = np.ascontiguousarray(off, np.int64)
            ln = np.ascontiguousarray(ln, np.int32)
        self.L.wm_eng_deliver(self.h, n, ids.ctypes.data, res.ctypes.data,
                              blob.ctypes.data, off.ctypes.data,
                              ln.ctypes.data)

    def _host_run(self, rows: np.ndarray) -> None:
        """Run these exported jobs on the engine's host AVX-512 kernels."""
        import time

        ids = np.ascontiguousarray(rows[:, C_ID])
        t0 = time.time()
        self.L.wm_eng_run_host_ids(self.h, len(ids), ids.ctypes.data)
        STATS["host_s"] += time.time() - t0

    def _dispatch(self, prof, flag, rows, shape_override=None) -> list:
        """DevCallPooled(s) for a homogeneous group of job rows (same
        scoring class + flag; end_bonus/zdrop/w ride per-job columns);
        splits the group when the padded direction tensor would exceed the
        per-call HBM cap.  Returns a list of (call, rows) pairs.  A kernel
        variant that fails to lower/compile sends its jobs to the host
        kernels instead of crashing the run (reference src/map.c has no
        fatal per-read compute path)."""
        import time

        from ..extend.pallas_kernel import (MAX_CALL_DIRS_BYTES,
                                            DevCallPooled,
                                            est_dirs_slot_bytes,
                                            quantize_len)
        from .align import gen_simple_mat

        opt = self.opts3[prof]
        mat = gen_simple_mat(opt.a, opt.b, opt.sc_ambi)
        is_spl = bool(opt.flag & MM_F_SPLICE)
        # longest first: same-length jobs share kernel tiles so whole tiles
        # go dead together for the liveness guard
        order = np.argsort(-(rows[:, C_QLEN] + rows[:, C_TLEN]), kind="stable")
        rows = rows[order]
        if shape_override is not None:
            Lq, Lt, Wq = shape_override
        else:
            Lq = quantize_len(max(1, int(rows[:, C_QLEN].max())))
            Lt = quantize_len(max(1, int(rows[:, C_TLEN].max())))
            Wq = quantize_len(max(1, int(rows[:, C_W].max())))
        if is_spl:
            Wq = Lq + Lt  # unbanded exts: the full anti-diagonal is live
        vkey = ("exts" if is_spl else "extd", Lq, Lt, Wq, int(flag))
        if kernel_broken(vkey):
            self._host_run(rows)
            return []
        max_jobs = max(1, MAX_CALL_DIRS_BYTES
                       // est_dirs_slot_bytes(Lq, Lt, Wq))
        out = []
        for lo in range(0, len(rows), max_jobs):
            crows = rows[lo:lo + max_jobs]
            # flat (B0, 8) job columns — DevCallPooled consumes the array
            # directly (no per-job Python tuples on the dispatch path)
            units = np.ascontiguousarray(
                crows[:, [C_QOFF, C_QLEN, C_QREV, C_TOFF, C_TLEN, C_TREV,
                          C_W, C_ZD]])
            t0 = time.time()
            try:
                call = DevCallPooled(
                    self.pools, units, mat, opt.q, opt.e,
                    opt.q2, opt.e2,
                    np.ascontiguousarray(crows[:, C_EB], np.int32),
                    int(flag),
                    TB=64 if len(units) >= 64 else 32,
                    shape_override=shape_override,
                    splice=((opt.noncan, opt.junc_bonus)
                            if is_spl else None))
                call.start_fetch()
            except Exception as exc:  # lowering/compile failure
                note_kernel_failure(vkey, exc)
                self._host_run(crows)
                continue
            STATS["dispatch_s"] += time.time() - t0
            STATS["dev_calls"] += 1
            STATS["dev_jobs"] += len(units)
            out.append((call, crows))
        return out

    def _drive_phase(self):
        """Pump the engine<->device loop until the phase's threads finish."""
        import time

        from ..extend.pallas_kernel import quantize_len

        if not self.device:
            # no TPU: run every exported job on the engine's host kernels
            while True:
                rows = self._step()
                if len(rows):
                    ids = np.ascontiguousarray(rows[:, C_ID])
                    self.L.wm_eng_run_host_ids(self.h, len(ids),
                                               ids.ctypes.data)
                elif self.L.wm_eng_live(self.h) == 0:
                    return

        pending: dict = defaultdict(list)  # key -> list of row arrays
        inflight: deque = deque()

        def bucket(rows):
            # key = (scoring class, flag, quantized shape); end_bonus/zdrop
            # ride per-job columns so they never split buckets
            for r in rows:
                key = (self.prof_rep[int(r[C_PROF])], int(r[C_FLAG]),
                       quantize_len(max(1, int(r[C_W]))),
                       quantize_len(max(1, int(r[C_QLEN]))),
                       quantize_len(max(1, int(r[C_TLEN]))))
                pending[key].append(r)

        def dispatch_full():
            did = False
            for key in sorted(pending, key=lambda k: -len(pending[k])):
                if len(inflight) >= MAX_INFLIGHT_CALLS:
                    break  # deeper queues add round trips, not overlap
                if len(pending[key]) >= MIN_DEV_BATCH:
                    rows = np.stack(pending.pop(key))
                    inflight.extend(self._dispatch(key[0], key[1], rows))
                    did = True
            return did

        # fixed merged-call shape menu: stall-time merges snap to these
        # (Lq=Lt=L, W) ceilings so the kernel-variant space stays bounded
        # and the jit caches converge after the first batch instead of
        # compiling run-dependent shape combos forever
        MERGE_L = (256, 1024, 4096, 16384)
        MERGE_W = (1024, 4096)

        def promote_stragglers():
            """No full bucket and the device under-fed: pack same-profile
            stragglers into AS FEW fixed-shape padded calls as possible
            (one per (prof, flag) and menu L rung); host-run groups under
            MIN_MERGED_BATCH.  On a tunnel-attached chip the per-call round
            trip dominates padded vector work, so fewer/fatter calls win
            (measured: 390 calls -> 170 calls lifted 34 -> 62 reads/s on
            the bench)."""
            groups = defaultdict(list)
            big = defaultdict(list)  # original bucket key -> rows
            leftovers = []
            for key, rs in pending.items():
                prof_flag = key[:2]
                spl = bool(self.opts3[key[0]].flag & MM_F_SPLICE)
                for r in rs:
                    L = max(int(r[C_QLEN]), int(r[C_TLEN]))
                    w = int(r[C_W])
                    Lc = next((c for c in MERGE_L if L <= c), None)
                    Wc = next((c for c in MERGE_W if w <= c), None)
                    if spl and (Lc is None or Lc > 4096):
                        # exts square merge shapes above 4096 lanes exceed
                        # the rank-packing band; exact-shape call instead
                        big[key].append(r)
                    elif Lc is None or Wc is None:
                        big[key].append(r)  # too costly for the host: own call
                    else:
                        groups[prof_flag + (Lc,)].append(r)
            pending.clear()
            did = False
            for gk in sorted(groups):
                rs = groups[gk]
                if len(rs) >= MIN_MERGED_BATCH:
                    rows = np.stack(rs)
                    Wc = next(c for c in MERGE_W
                              if int(rows[:, C_W].max()) <= c)
                    STATS["dev_merged"] += len(rs)
                    inflight.extend(self._dispatch(
                        gk[0], gk[1], rows,
                        shape_override=(gk[2], gk[2], min(Wc, gk[2]))))
                    did = True
                else:
                    # tiny leftover groups: the padded fixed-shape call
                    # costs more device time than the engine's host DP
                    leftovers.extend(rs)
            for key, rs in big.items():
                # exact bucket-key shape: same variant space as full buckets
                rows = np.stack(rs)
                STATS["dev_merged"] += len(rs)
                inflight.extend(self._dispatch(key[0], key[1], rows))
                did = True
            if leftovers:
                # measured: deferring these to accumulate into padded
                # device calls REGRESSES (42 vs 65 reads/s) — the host
                # AVX-512 DP clears tiny jobs cheaper than the extra
                # device calls cost, and it overlaps in-flight device work
                ids = np.ascontiguousarray(
                    np.array([r[C_ID] for r in leftovers], np.int64))
                STATS["host_small"] += len(ids)
                t0 = time.time()
                self.L.wm_eng_run_host_ids(self.h, len(ids),
                                           ids.ctypes.data)
                STATS["host_s"] += time.time() - t0
                did = True
            return did

        while True:
            rows = self._step()
            if len(rows):
                bucket(rows)
            self._service_chains()
            dispatch_full()
            # drain every READY call without blocking: each deliver wakes
            # engine threads whose next jobs then overlap the device's
            # in-flight work (VERDICT r2: overlap collect with progress)
            def collect_one(call, crows, stat):
                t0 = time.time()
                try:
                    collected = call.collect_blob()
                except Exception as exc:  # device died mid-run
                    note_kernel_failure(("collect",), exc)
                    self._host_run(crows)
                    return
                STATS[stat] += time.time() - t0
                self._deliver(crows, collected)

            delivered = False
            while inflight and inflight[0][0].ready():
                call, crows = inflight.popleft()
                collect_one(call, crows, "dev_s")
                delivered = True
            if delivered:
                continue
            if inflight:
                if pending and len(inflight) >= 2:
                    # the device is deep in work: spend the wait promoting
                    # stragglers (device-merged or host) instead of idling
                    if promote_stragglers():
                        continue
                call, crows = inflight.popleft()
                collect_one(call, crows, "dev_wait_s")
                continue
            if pending:
                if promote_stragglers():
                    continue
            if self.L.wm_eng_live(self.h) == 0 and not pending:
                return
            if len(rows) == 0 and not pending and not inflight:
                # all live threads are mid-delivery wakeups; loop once more
                if self.L.wm_eng_live(self.h) == 0:
                    return

    # ---- results ------------------------------------------------------

    def results(self) -> list[MapResult]:
        out = []
        preg = ctypes.POINTER(ctypes.c_uint8)()
        pcig = ctypes.POINTER(ctypes.c_uint32)()
        ncig = ctypes.c_int64()
        rep_len = ctypes.c_int64()
        frag_gap = ctypes.c_int32()
        rep_def = ctypes.c_int32()
        for i in range(self.n):
            n = self.L.wm_eng_result(
                self.h, i, ctypes.byref(preg), ctypes.byref(pcig),
                ctypes.byref(ncig), ctypes.byref(rep_len),
                ctypes.byref(frag_gap), ctypes.byref(rep_def))
            regs = []
            if n:
                raw = np.ctypeslib.as_array(
                    preg, (n * native.REGOUT_DTYPE.itemsize,))
                rv = raw.view(native.REGOUT_DTYPE)
                cig = (np.ctypeslib.as_array(pcig, (ncig.value,)).copy()
                       if ncig.value else np.zeros(0, np.uint32))
                for j in range(n):
                    f = rv[j]
                    r = Reg(
                        id=int(f["id"]), cnt=int(f["cnt"]), rid=int(f["rid"]),
                        score=int(f["score"]), qs=int(f["qs"]),
                        qe=int(f["qe"]), rs=int(f["rs"]), re=int(f["re"]),
                        parent=int(f["parent"]), subsc=int(f["subsc"]),
                        as_=int(f["as_"]), mlen=int(f["mlen"]),
                        blen=int(f["blen"]), n_sub=int(f["n_sub"]),
                        score0=int(f["score0"]), mapq=int(f["mapq"]),
                        div=float(f["div"]), inv=bool(f["inv"]),
                        rev=bool(f["rev"]), split=int(f["split"]),
                        split_inv=bool(f["split_inv"]),
                        sam_pri=bool(f["sam_pri"]),
                        seg_split=bool(f["seg_split"]),
                        seg_id=int(f["seg_id"]), n_segs=int(f["n_segs"]),
                        is_alt=bool(f["is_alt"]), hash=int(f["hash"]))
                    if f["has_p"]:
                        co, nc = int(f["cigar_off"]), int(f["n_cigar"])
                        r.p = Extra(
                            dp_score=int(f["dp_score"]),
                            dp_max=int(f["dp_max"]),
                            dp_max2=int(f["dp_max2"]),
                            n_ambi=int(f["n_ambi"]),
                            trans_strand=int(f["trans_strand"]),
                            cigar=cig[co:co + nc])
                    regs.append(r)
            out.append(MapResult(regs, int(rep_len.value),
                                 int(frag_gap.value), bool(rep_def.value)))
        return out


def _build_pools_engine(mi, seqs, device=None):
    """qpool of fwd+revcomp strand codes per read (batch._build_pools
    layout) plus per-read (fwd_off, rev_off)."""
    from ..extend.pallas_kernel import PoolContext
    from ..io.seqcode import encode
    from .batch import _use_device

    total = sum(2 * len(s) for s in seqs)
    cap = max(total, 1)
    step = 4 << 20
    cap = (cap + step - 1) // step * step
    qpool = np.zeros(cap, np.uint8)
    qoffs = []
    o = 0
    for seq in seqs:
        L = len(seq)
        fwd = encode(seq)
        qpool[o:o + L] = fwd
        rev = fwd[::-1]
        m = rev < 4
        qpool[o + L:o + 2 * L] = np.where(m, 3 - rev, rev)
        qoffs.append((o, o + L))
        o += 2 * L
    pools = (PoolContext(qpool, mi.codes, device=device)
             if _use_device() else None)
    return pools, qoffs, qpool


def map_batch_engine(mi, opt: MapOptions, seqs, qnames,
                     device=None) -> list[MapResult]:
    """Map a batch of reads through the native engine + TPU scheduler
    (byte-identical to frag.map_one; reference mm_map semantics).
    `device` pins this engine's DP traffic to one local device (the
    multi-device driver runs one engine per device)."""
    pools, qoffs, qpool = _build_pools_engine(mi, seqs, device=device)
    if pools is None:
        # no device: the engine still runs, all jobs on the host kernels
        pools = _HostOnlyPools()
    eng = MapEngine(mi, opt, seqs, qnames, pools, qoffs, qpool)
    try:
        eng.L.wm_eng_start_phase1(eng.h)
        eng._drive_phase()
        if eng.L.wm_eng_start_phase2(eng.h):
            eng._drive_phase()
        results = eng.results()
        # engine-internal perf accounting -> STATS (ns summed across the
        # engine's threads; wall share on a 1-core host equals cpu share)
        perf = np.zeros(8, np.int64)
        eng.L.wm_eng_perf(eng.h, perf.ctypes.data)
        STATS["eng_host_dp_s"] += perf[0] / 1e9
        STATS["eng_host_dp_calls"] += int(perf[1])
        STATS["eng_chain_s"] += perf[2] / 1e9
        STATS["eng_chain_calls"] += int(perf[3])
    finally:
        eng.close()
    for i, seq in enumerate(seqs):
        if len(seq) == 0:
            results[i] = MapResult([], 0, 0)
    return results


def map_batch_engine_pipelined(mi, opt: MapOptions, seqs, qnames,
                               device=None, ways=2) -> list[MapResult]:
    """Interleave `ways` engine drivers in Python threads over strided
    sub-batches of one read batch.  While one driver blocks on in-flight
    device calls (GIL released in the fetch wait), the other's engine
    threads and scheduler use the core — the single-host analogue of the
    reference's read/map/write pipeline overlap (src/kthread.c:130-159),
    shaped for a tunnel-attached chip where device waits leave the core
    idle.  Strided sharding keeps the longest-first batch order balanced
    across drivers; results return in input order."""
    import threading

    ways = max(1, min(ways, (len(seqs) + 63) // 64))
    if ways == 1:
        return map_batch_engine(mi, opt, seqs, qnames, device=device)
    idx = [list(range(w, len(seqs), ways)) for w in range(ways)]
    results: list = [None] * ways
    errs: list = [None] * ways

    def run(w):
        try:
            results[w] = map_batch_engine(
                mi, opt, [seqs[i] for i in idx[w]],
                [qnames[i] for i in idx[w]], device=device)
        except BaseException as e:  # re-raised in the caller
            errs[w] = e

    threads = [threading.Thread(target=run, args=(w,), daemon=True)
               for w in range(ways)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in errs:
        if e is not None:
            raise e
    out: list = [None] * len(seqs)
    for w, ids in enumerate(idx):
        for j, i in enumerate(ids):
            out[i] = results[w][j]
    return out


class _HostOnlyPools:
    """Placeholder pools when the device is disabled (WM_NO_TPU): every
    exported job is immediately host-run inside the engine."""

    def resolve(self, js):
        return None
