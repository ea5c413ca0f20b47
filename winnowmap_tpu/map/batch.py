"""Batched TPU mapping driver.

Runs many reads' mapping generators concurrently, collecting the
extension-DP jobs they yield into shape/parameter buckets and executing
each bucket as one Pallas wavefront batch on the TPU (see
extend/pallas_kernel.py).  Because the device kernels are bit-identical to
the host oracle, the batched path produces byte-identical output to the
sequential path (tests/test_batch.py asserts this) while amortising the
device round-trip latency across hundreds of reads.

This is the TPU-native replacement for the reference's per-read pthread
work-stealing (reference src/kthread.c:30-72 + src/map.c:1008-1030): one
host thread orchestrates, the TPU does the DP for the whole batch.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..options import MM_F_SPLICE, stage2_options
from ..utils.devguard import DeviceHang, device_guard, device_hung
from .align import JobSeq, align_pair
from .frag import (MapResult, McasState, _map_vanilla_gen, make_qseq0,
                   mcas_stage2_gen)

import os as _os

# jobs whose padded DP exceeds this per-side length run on the host instead
MAX_DEV_LEN = 32768
# minimum bucket size worth a device round-trip (latency ~27 ms); merged
# stall-time groups use the lower bound (they'd otherwise run on the host).
# Env-tunable for per-host calibration: the tunnel-attached bench host is
# latency-bound (fewer, larger calls win), a locally-attached chip less so.
MIN_DEV_BATCH = int(_os.environ.get("WM_MIN_DEV_BATCH", "256"))
MIN_MERGED_BATCH = int(_os.environ.get("WM_MIN_MERGED_BATCH", "16"))
# dispatch full buckets only while fewer than this many calls are in
# flight: deeper queues add round trips without adding overlap
MAX_INFLIGHT_CALLS = int(_os.environ.get("WM_MAX_INFLIGHT_CALLS", "1000000"))
# cap the direction-tensor footprint of one device call
MAX_DIRS_BYTES = 2 << 30


_BACKEND_OK: bool | None = None


def _cpu_only_pinned() -> bool:
    """True when the process has pinned jax to CPU-only platforms.

    Read WITHOUT touching jax backends: plugin discovery inside
    ``backends()`` can override the pin (the axon plugin resets
    ``jax_platforms`` to "axon,cpu" as it registers) and then hang
    initializing an unreachable TPU client.
    """
    import os

    plats = None
    try:
        import jax

        plats = jax.config.jax_platforms
    except Exception:
        pass
    if not plats:
        plats = os.environ.get("JAX_PLATFORMS") or ""
    names = {p.strip() for p in plats.split(",") if p.strip()}
    return bool(names) and names <= {"cpu"}


def _use_device() -> bool:
    import os

    if device_hung():
        return False  # wedged tunnel detected: host kernels only
    if os.environ.get("WM_NO_TPU", "") != "":
        return False
    if os.environ.get("WM_PALLAS_INTERPRET") == "1":
        return True  # interpreter-mode kernels run on any backend
    global _BACKEND_OK
    if _BACKEND_OK is None:
        if _cpu_only_pinned():
            _BACKEND_OK = False
            return False
        try:
            import jax
            from jax._src import xla_bridge as _xb

            # compiled Pallas TPU kernels need a real chip.  Initializing
            # the TPU client when the chip is unreachable can HANG (not
            # error) inside the PJRT connect, so unless a backend is
            # already up, probe in a killable subprocess first.  Probed
            # once per process.
            if (os.environ.get("WM_ASSUME_TPU", "") == ""
                    and not _xb.backends_are_initialized()
                    and not _probe_tpu_subprocess()):
                _BACKEND_OK = False
                return False
            _BACKEND_OK = jax.default_backend() != "cpu"
        except Exception:
            _BACKEND_OK = False
    return _BACKEND_OK


_BROKEN_KERNELS: set = set()  # kernel-variant keys that failed to lower/run
_TRANSIENT_FAILS: dict = {}  # key -> count of transient (network-ish) fails

# markers of a transient tunnel/RPC failure (remote compile HTTP hiccup,
# connection reset): retryable, NOT a Mosaic lowering bug
_TRANSIENT_MARKERS = ("remote_compile", "read body", "Connection",
                      "UNAVAILABLE", "DEADLINE", "Socket closed",
                      "RESOURCE_EXHAUSTED", "connection")


def kernel_broken(key) -> bool:
    return "*" in _BROKEN_KERNELS or key in _BROKEN_KERNELS


def note_kernel_failure(key, exc) -> None:
    """A device kernel variant failed to compile or run: remember it so its
    jobs fall back to the host AVX-512 kernels instead of crashing the run
    (reference behaviour: the mapper has no fatal per-read compute path,
    src/map.c).  Transient tunnel errors (remote-compile HTTP hiccups) only
    disable a variant after 2 failures of that same variant and never trip
    the systemic kill; after 2 distinct non-transient variant failures the
    whole device DP path is disabled for the process (the failure is almost
    certainly systemic, e.g. a Mosaic lowering regression)."""
    import sys

    msg = str(exc)
    transient = any(m in msg for m in _TRANSIENT_MARKERS)
    first = not _BROKEN_KERNELS and not _TRANSIENT_FAILS
    if transient:
        n = _TRANSIENT_FAILS[key] = _TRANSIENT_FAILS.get(key, 0) + 1
        if n >= 2 and key not in _BROKEN_KERNELS:
            # repeated same-variant transient failures: disable just it
            # (never counted toward the systemic kill below)
            _BROKEN_KERNELS.add(key)
    else:
        _BROKEN_KERNELS.add(key)
        hard = _BROKEN_KERNELS - set(_TRANSIENT_FAILS) - {"*"}
        if len(hard) >= 2:
            _BROKEN_KERNELS.add("*")
    if first:
        lines = msg.splitlines()
        print(f"[WARNING] device DP kernel {key} failed "
              f"({type(exc).__name__}: {lines[0] if lines else ''}); "
              "falling back to host kernels for affected jobs",
              file=sys.stderr)
    STATS["kernel_failures"] += 1


def _probe_tpu_subprocess() -> bool:
    """Time-bounded out-of-process probe of the non-CPU jax backend."""
    import os
    import subprocess
    import sys

    timeout = float(os.environ.get("WM_TPU_PROBE_TIMEOUT", "120"))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('WM-DEV-' + jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout, env=env)
        return ("WM-DEV-" in proc.stdout
                and "WM-DEV-cpu" not in proc.stdout)
    except Exception:
        return False


class _Task:
    __slots__ = ("gen", "job", "done", "value", "sub_results", "sub_left")

    def __init__(self, gen):
        self.gen = gen
        self.job = None
        self.done = False
        self.value = None
        self.sub_results = None
        self.sub_left = 0

    def advance(self, send_val=None):
        try:
            if send_val is None and self.job is None:
                self.job = next(self.gen)
            else:
                self.job = self.gen.send(send_val)
        except StopIteration as e:
            self.done = True
            self.value = e.value
            self.job = None
        if isinstance(self.job, list):
            self.sub_results = [None] * len(self.job)
            self.sub_left = len(self.job)

    def deliver(self, k, ez):
        """Deliver one unit's result; returns the send value when the task
        is ready to advance, else None."""
        if k is None:
            return ez
        self.sub_results[k] = ez
        self.sub_left -= 1
        if self.sub_left == 0:
            return self.sub_results
        return None


_MAT_BYTES_CACHE: dict = {}
_MAT_BYTES_CAP = 64  # gen_simple_mat memoizes per param set; this is a backstop


def _mat_bytes(mat):
    key = id(mat)
    v = _MAT_BYTES_CACHE.get(key)
    if v is None or v[0] is not mat:
        if len(_MAT_BYTES_CACHE) >= _MAT_BYTES_CAP:
            _MAT_BYTES_CACHE.clear()
        v = (mat, mat.tobytes())
        _MAT_BYTES_CACHE[key] = v
    return v[1]


def _bucket_key(job):
    opt, qseq, tseq, mat, w, end_bonus, zdrop, flag = job[:8]
    from ..extend.pallas_kernel import quantize_len

    # w and zdrop are runtime inputs to the kernels; only the quantized
    # band ceiling (tile width) and end_bonus (shared per call) bucket.
    # Splice jobs add the exts-specific scoring params (their kernel
    # variant depends on them).
    spl = ((opt.noncan, opt.junc_bonus) if opt.flag & MM_F_SPLICE else None)
    return (opt.q, opt.e, opt.q2, opt.e2, _mat_bytes(mat), end_bonus,
            flag, quantize_len(max(1, w)),
            quantize_len(max(1, len(qseq))),
            quantize_len(max(1, len(tseq))), spl)


def _device_eligible(job, _len=len):
    from ..extend.pallas_kernel import H_CLAMP, quantize_len

    opt, qseq, tseq, mat, w, end_bonus, zdrop, flag = job[:8]
    lq = _len(qseq)
    lt = _len(tseq)
    if lq == 0 or lt == 0 or lq > MAX_DEV_LEN or lt > MAX_DEV_LEN:
        return False
    if opt.flag & MM_F_SPLICE:
        # exts device path: replicate the oracle's refusal guards host-side
        # (wm_exts returns the empty result there) and the splice kernel's
        # H-range bound (Lq insertions + one intron entry -- see the
        # splice score-range assert in pallas_kernel)
        if opt.q2 <= opt.q + opt.e:
            return False
        if max(abs(opt.b), abs(opt.sc_ambi)) > 2 * (opt.q + opt.e):
            return False
        # the exts window spans the full min(Lq, Lt) anti-diagonal; the
        # row-max rank packing supports ~6k lanes
        if quantize_len(min(lq, lt)) > 4096:
            return False
        Lq_q = quantize_len(lq)
        if (Lq_q * (opt.q + 2 * opt.e)
                + 2 * (opt.q + opt.q2 + 2 * abs(opt.noncan)) + 1024
                >= -H_CLAMP):
            return False
        if opt.max_sw_mat > 0 and lq * lt > opt.max_sw_mat:
            return False
        return True
    # rank packing in the row-max supports bands up to ~6k lanes
    if w + 1 > 6000 and lq > 6000 and lt > 6000:
        return False
    # the kernel asserts R*max(e,e2)+q+q2 < 2^17 (rank packing score range);
    # enforce the same bound on the *quantized* lengths here so oversized
    # jobs fall back to the host kernel instead of raising in-flight
    R = quantize_len(max(1, lq)) + quantize_len(max(1, lt)) - 1
    if R * max(opt.e, opt.e2) + opt.q + opt.q2 >= -H_CLAMP:
        return False
    if opt.max_sw_mat > 0 and lq * lt > opt.max_sw_mat:
        return False  # align_pair returns the dummy-drop result host-side
    return True


STATS = defaultdict(float)
# per-call trace, for debugging only: unbounded growth on production runs
# otherwise (millions of reads per process), so gated behind WM_CALL_LOG
CALL_LOG = []
_CALL_LOG_ON = bool(__import__("os").environ.get("WM_CALL_LOG"))

# flush host-side when a bucket cannot fill and nothing is in flight
MAX_INFLIGHT_BYTES = 6 << 30


def _resolve_job(pools, job):
    """Pool coordinates for a device job, or None if not pool-backed."""
    opt, qseq, tseq, mat, w, end_bonus, zdrop, flag = job[:8]
    if not (isinstance(qseq, JobSeq) and isinstance(tseq, JobSeq)):
        return None
    qr = pools.resolve(qseq)
    tr = pools.resolve(tseq)
    if qr is None or tr is None or qr[0] != 0 or tr[0] != 1:
        return None
    return ((0, qr[1], len(qseq), qseq.rev), (1, tr[1], len(tseq), tseq.rev),
            w, zdrop)


def run_ext_tasks(tasks: list[_Task], pools=None) -> None:
    """Event-driven scheduler: advance generators, accumulate device-eligible
    jobs into shape buckets (across dependency depths), dispatch a bucket as
    soon as it can fill a device call, and feed results back the moment each
    call lands.  Host kernels absorb jobs only when the pipeline would
    otherwise stall.  Bit-identical to the sequential path by construction
    (the device kernels match the host oracle)."""
    import time
    from collections import deque

    from ..extend.pallas_kernel import DevCallPooled

    use_dev = _use_device() and pools is not None
    queues: dict = defaultdict(list)  # key -> [(task, subidx, resolved_job)]
    inflight: deque = deque()
    inflight_bytes = 0

    def enqueue(t):
        # queue or host-run every unit of the task's current yield; keeps
        # advancing through host-only yields until a device unit queues,
        # a group is pending, or the task finishes
        while not t.done:
            jobs = t.job if isinstance(t.job, list) else [t.job]
            ks = range(len(jobs)) if isinstance(t.job, list) else [None]
            queued = False
            send = None
            for k, job in zip(ks, jobs):
                rj = _resolve_job(pools, job) if use_dev else None
                if rj is not None and _device_eligible(job):
                    queues[_bucket_key(job)].append((t, k, rj, job))
                    queued = True
                else:
                    t0 = time.time()
                    ez = align_pair(job[0], *job[1:])
                    STATS["host_s"] += time.time() - t0
                    STATS["host_jobs"] += 1
                    send = t.deliver(k, ez)
            if queued:
                return
            if send is None and isinstance(t.job, list) and len(jobs) == 0:
                send = []
            t.advance(send)

    def call_bytes(key, n):
        wq, Lq, Lt = key[7], key[8], key[9]
        n_col = min(min(Lq, Lt), wq + 1)
        Wb = ((n_col + 15) // 16 + 3) * 16
        return n * (Lq + Lt) * ((Wb + 127) // 128 * 128)

    def host_run_chunk(chunk):
        """Fallback: run these units on the host oracle and feed results
        back into their generators (the kernel-failure degrade path)."""
        ready = []
        for t, k, rj, job in chunk:
            t0 = time.time()
            ez = align_pair(job[0], *job[1:])
            STATS["host_s"] += time.time() - t0
            send = t.deliver(k, ez)
            if send is not None:
                ready.append((t, send))
        for t, send in ready:
            t.advance(send)
            enqueue(t)

    def dispatch(key, units):
        nonlocal inflight_bytes
        opt = units[0][3][0]
        mat = units[0][3][3]
        end_bonus, flag = key[5], key[6]
        is_spl = bool(opt.flag & MM_F_SPLICE)
        per_job = call_bytes(key, 1)
        cap = max(MIN_DEV_BATCH, int(MAX_DIRS_BYTES // max(1, per_job)))
        vkey = ("exts" if is_spl else "extd") + str(key[5:])
        # longest jobs first: same-length jobs share kernel tiles, so whole
        # tiles go dead together and the wavefront's liveness guard skips
        # their remaining anti-diagonals
        units = sorted(units, key=lambda u: -(u[2][0][2] + u[2][1][2]))
        for lo in range(0, len(units), cap):
            chunk = units[lo:lo + cap]
            if kernel_broken(vkey) or device_hung():
                host_run_chunk(chunk)
                continue
            t0 = time.time()

            def _mk(chunk=chunk):
                call = DevCallPooled(
                    pools, [u[2] for u in chunk], mat, opt.q, opt.e,
                    opt.q2, opt.e2, end_bonus, flag,
                    TB=64 if len(chunk) >= 64 else 32,
                    splice=(opt.noncan, opt.junc_bonus) if is_spl else None,
                    juncs=([u[3][8] if len(u[3]) > 8 else None
                            for u in chunk] if is_spl else None))
                call.start_fetch()
                return call

            try:
                call = device_guard(_mk, tag=f"dispatch:{vkey}")
            except DeviceHang:
                host_run_chunk(chunk)
                continue
            except Exception as exc:  # lowering/compile failure
                note_kernel_failure(vkey, exc)
                host_run_chunk(chunk)
                continue
            STATS["dispatch_s"] += time.time() - t0
            STATS["dev_calls"] += 1
            STATS["dev_jobs"] += len(chunk)
            inflight.append((call, chunk, per_job * len(chunk)))
            inflight_bytes += per_job * len(chunk)

    for t in tasks:
        t.advance()
        enqueue(t)

    while queues or inflight:
        # dispatch every bucket that can fill a call; sub-minimum buckets
        # stay queued and keep accumulating across dependency rounds
        for key in sorted(queues, key=lambda k: -len(queues[k])):
            us = queues[key]
            if len(us) >= MIN_DEV_BATCH and inflight_bytes < MAX_INFLIGHT_BYTES:
                del queues[key]
                dispatch(key, us)
        if not inflight:
            # every remaining unit is parked in a sub-minimum bucket: merge
            # buckets that share scoring/end_bonus/flag (the kernel takes
            # lengths, band width and z-drop as runtime inputs, so jobs of
            # different shapes can share one call padded to the coarsest
            # quantized shape) and dispatch any merged group that can fill
            # a call; host-run only the rest
            merged = defaultdict(list)
            for key, us in queues.items():
                # key[10] (splice params) joins the merge key: exts calls
                # cannot share a kernel with extd/extz ones
                merged[key[:7] + key[10:]].extend((key, u) for u in us)
            queues.clear()
            promoted = False
            for mk, kus in merged.items():
                # greedy shape-aware packing: sweep shapes small->large so a
                # group's padded waste stays bounded; close a group when the
                # next shape would blow up its per-job cost by >4x
                kus.sort(key=lambda ku: (ku[0][8] + ku[0][9], ku[0][7]))
                lo = 0
                while lo < len(kus):
                    hi, wq, Lq, Lt = lo, 1, 1, 1
                    base = None
                    while hi < len(kus):
                        k = kus[hi][0]
                        nwq = max(wq, k[7])
                        nLq, nLt = max(Lq, k[8]), max(Lt, k[9])
                        pj = call_bytes(mk + (nwq, nLq, nLt), 1)
                        if base is None:
                            base = pj
                        if hi - lo >= MIN_MERGED_BATCH and pj > 4 * base:
                            break
                        wq, Lq, Lt = nwq, nLq, nLt
                        hi += 1
                    group = kus[lo:hi]
                    if len(group) >= MIN_MERGED_BATCH:
                        STATS["dev_merged"] += len(group)
                        dispatch(mk[:7] + (wq, Lq, Lt), [u for _, u in group])
                        promoted = True
                    else:
                        for k, u in group:
                            queues[k].append(u)
                    lo = hi
            if promoted:
                continue
            stragglers = [u for us in queues.values() for u in us]
            queues.clear()
            STATS["host_small"] += len(stragglers)
            ready = []
            for t, k, rj, job in stragglers:
                t0 = time.time()
                ez = align_pair(job[0], *job[1:])
                STATS["host_s"] += time.time() - t0
                send = t.deliver(k, ez)
                if send is not None:
                    ready.append((t, send))
            for t, send in ready:
                t.advance(send)
                enqueue(t)
            continue
        # drain the in-flight wave; any bucket the feedback fills dispatches
        # IMMEDIATELY so the device chews on the next wave while the host is
        # still collecting this one
        while inflight:
            call, chunk, nbytes = inflight.popleft()
            inflight_bytes -= nbytes
            t0 = time.time()
            try:
                ezs = device_guard(call.collect, tag="collect")
            except DeviceHang:
                host_run_chunk(chunk)
                continue
            except Exception as exc:  # device died mid-run
                note_kernel_failure(("collect",), exc)
                host_run_chunk(chunk)
                continue
            STATS["dev_s"] += time.time() - t0
            if _CALL_LOG_ON:
                CALL_LOG.append((call.R, len(chunk), time.time() - t0))
            ready = []
            for (t, k, rj, job), ez in zip(chunk, ezs):
                send = t.deliver(k, ez)
                if send is not None:
                    ready.append((t, send))
            for t, send in ready:
                t.advance(send)
                enqueue(t)


def _build_pools(mi, seqs):
    """Concatenate every read's fwd+rev strand codes into one pool array and
    hand out per-read views; upload pools to the device."""
    from ..extend.pallas_kernel import PoolContext
    from ..io.seqcode import encode

    total = sum(2 * len(s) for s in seqs)
    # pad the pool to a quantized size so the on-device assemble function
    # compiles once, not once per batch
    cap = max(total, 1)
    step = 4 << 20
    cap = (cap + step - 1) // step * step
    qpool = np.zeros(cap, np.uint8)
    qseq0s = []
    o = 0
    for seq in seqs:
        L = len(seq)
        fwd = encode(seq)
        qpool[o:o + L] = fwd
        rev = fwd[::-1]
        m = rev < 4
        qpool[o + L:o + 2 * L] = np.where(m, 3 - rev, rev)
        qseq0s.append([qpool[o:o + L], qpool[o + L:o + 2 * L]])
        o += 2 * L
    pools = PoolContext(qpool, mi.codes) if _use_device() else None
    return pools, qseq0s


def map_batch_frags(mi, opt, frags, qnames) -> list[list[MapResult]]:
    """Map a batch of fragments (frag/paired-end mode), TPU-batched.
    `frags` is a list of fragments, each a list of segment sequences;
    returns per-fragment lists of per-segment MapResults (reference
    worker_for with n_seg > 1, src/map.c:1008-1048).  Uni-segment
    fragments take the standard read path (MCAS included)."""
    from .frag import map_frag_gen

    results: list[list[MapResult] | None] = [None] * len(frags)
    singles_i, singles = [], []
    multi = []  # (idx, seqs)
    for i, fr in enumerate(frags):
        if len(fr) == 1:
            singles_i.append(i)
            singles.append(fr[0])
        else:
            multi.append((i, fr))
    if singles:
        for i, res in zip(singles_i,
                          map_batch(mi, opt, singles,
                                    [qnames[i] for i in singles_i])):
            results[i] = [res]
    if multi:
        flat = [s for _, fr in multi for s in fr]
        pools, qseq0s = _build_pools(mi, flat)
        tasks = []
        k = 0
        for i, fr in multi:
            q0 = qseq0s[k:k + len(fr)]
            k += len(fr)
            tasks.append((i, _Task(map_frag_gen(mi, opt, fr, qnames[i],
                                                qseq0s=q0))))
        run_ext_tasks([t for _, t in tasks], pools)
        for i, t in tasks:
            results[i] = t.value
    return results


def map_batch(mi, opt, seqs, qnames) -> list[MapResult]:
    """Map a batch of reads, TPU-batched (bit-identical to per-read
    frag.map_one; reference mm_map semantics, src/map.c:279-981).

    Routes to the native C++ engine (map/engine.py) whenever the option
    flags allow it; the generator path below remains for splice and the
    qname-dependent skip modes, and as the differential oracle
    (WM_NO_ENGINE=1 forces it)."""
    import os as _os

    if not _os.environ.get("WM_NO_ENGINE"):
        from .engine import engine_supported, map_batch_engine

        if engine_supported(opt, mi):
            if (len(seqs) > 1 and _use_device()
                    and _os.environ.get("WM_PALLAS_INTERPRET") != "1"
                    and not _os.environ.get("WM_NO_MULTIDEV")):
                import jax

                devs = jax.local_devices()
                if len(devs) > 1:
                    # production multi-chip path: per-device engines +
                    # rank merge (byte-identical to single-device)
                    from ..parallel.multidev import map_batch_multidev

                    return map_batch_multidev(mi, opt, seqs, qnames,
                                              devices=devs)
            ways = int(_os.environ.get("WM_ENGINE_SPLIT", "1"))
            if ways > 1 and _use_device():
                from .engine import map_batch_engine_pipelined

                return map_batch_engine_pipelined(mi, opt, seqs, qnames,
                                                  ways=ways)
            return map_batch_engine(mi, opt, seqs, qnames)
    n = len(seqs)
    results: list[MapResult | None] = [None] * n
    pools, qseq0s = _build_pools(mi, seqs)

    trial_tasks: list[_Task] = []
    stage2_inputs = []  # (idx, state)
    vanilla_tasks = []  # (idx, task)
    for i, seq in enumerate(seqs):
        qlen = len(seq)
        if qlen == 0:
            results[i] = MapResult([], 0, 0)
            continue
        if opt.sv_aware and qlen >= opt.sv_aware_min_read_length:
            st = McasState(mi, opt, seq, qnames[i], qseq0=qseq0s[i])
            stage2_inputs.append((i, st))
            for g in st.trial_gens(mi, seq, qnames[i]):
                trial_tasks.append(_Task(g))
        else:
            t = _Task(_map_vanilla_gen(mi, opt, seq, qnames[i],
                                       qseq0=qseq0s[i]))
            vanilla_tasks.append((i, t))

    # phase 1: all MCAS substring trials + vanilla reads together
    run_ext_tasks(trial_tasks + [t for _, t in vanilla_tasks], pools)
    for i, t in vanilla_tasks:
        results[i] = t.value

    # phase 2: MCAS anchor pooling + stage-2 (includes vanilla fallback)
    stage2_tasks = []
    for i, st in stage2_inputs:
        t = _Task(mcas_stage2_gen(mi, opt, seqs[i], qnames[i], st))
        stage2_tasks.append((i, t))
    run_ext_tasks([t for _, t in stage2_tasks], pools)
    for i, t in stage2_tasks:
        results[i] = t.value
    return results
