"""Batch mapping driver (reference mm_map_file / worker_pipeline,
src/map.c:983-1276): read batches, longest-first scheduling, ordered output.
"""
from __future__ import annotations

import sys

from ..io import paf as pafmod
from ..io import sam as sammod
from ..io.fastx import FastxReader
from ..options import (
    MM_F_COPY_COMMENT,
    MM_F_NO_PRINT_2ND,
    MM_F_OUT_SAM,
    MM_F_PAF_NO_HIT,
    MM_F_SAM_HIT_ONLY,
    MapOptions,
)
from ..utils.log import phase_log
from .frag import map_one


def map_file(mi, opt: MapOptions, path: str, out=sys.stdout,
             map_fn=None, batched=False) -> int:
    """Map all reads in `path` against index `mi`, writing PAF/SAM to `out`.
    Returns the number of reads processed.  `map_fn` overrides the per-read
    mapper; `batched=True` uses the TPU batch driver (map/batch.py), which
    is bit-identical to the per-read path."""
    map_fn = map_fn or map_one
    n_processed = 0
    with FastxReader(path) as reader:
        while True:
            batch = reader.read_batch(opt.mini_batch_size)
            if batch is None:
                break
            for i, rec in enumerate(batch):
                rec.rid = n_processed + i
            # longest-first scheduling, ties -> later read first
            # (reference map.c:1124-1143; this changes output order)
            order = sorted(
                range(len(batch)),
                key=lambda i: (len(batch[i].seq), i),
                reverse=True,
            )
            batch = [batch[i] for i in order]
            if batched:
                from .batch import map_batch

                results = map_batch(mi, opt, [r.seq for r in batch],
                                    [r.name for r in batch])
            else:
                results = []
                for rec in batch:
                    results.append(map_fn(mi, opt, rec.seq, rec.name))
            for rec, res in zip(batch, results):
                _write_read(mi, opt, rec, res, out)
            n_processed += len(batch)
            phase_log("map_file", f"mapped {len(batch)} sequences")
    return n_processed


def _write_read(mi, opt, rec, res, out) -> None:
    regs = res.regs
    if regs:
        for r in regs:
            assert not r.sam_pri or r.id == r.parent
            if (opt.flag & MM_F_NO_PRINT_2ND) and r.id != r.parent:
                continue
            if opt.flag & MM_F_OUT_SAM:
                line = sammod.write_sam(
                    mi, rec, r, regs, opt.flag, res.rep_len
                )
            else:
                line = pafmod.write_paf(
                    mi, rec.name, len(rec.seq), r, opt.flag, res.rep_len,
                    rec.comment, bool(opt.flag & MM_F_COPY_COMMENT), rec=rec,
                )
            out.write(line + "\n")
    elif (opt.flag & MM_F_PAF_NO_HIT) or (
        (opt.flag & MM_F_OUT_SAM) and not (opt.flag & MM_F_SAM_HIT_ONLY)
    ):
        if opt.flag & MM_F_OUT_SAM:
            line = sammod.write_sam(mi, rec, None, regs, opt.flag, res.rep_len)
        else:
            line = pafmod.write_paf(
                mi, rec.name, len(rec.seq), None, opt.flag, res.rep_len,
                rec.comment, bool(opt.flag & MM_F_COPY_COMMENT),
            )
        out.write(line + "\n")


def split_parts_by_bp(all_records, batch_bp: int):
    """Split the reference into parts of ~batch_bp bases (reference
    mm_idx_reader_read accumulates until sum_len > batch_size,
    index.c:293-295)."""
    parts = []
    cur, cur_len = [], 0
    for rec in all_records:
        cur.append(rec)
        cur_len += len(rec.seq)
        if cur_len > batch_bp:
            parts.append(cur)
            cur, cur_len = [], 0
    if cur:
        parts.append(cur)
    return parts


def merged_meta_index(part_seq_meta, io_opts, part_codes=None):
    """Merged metadata view over index parts for rid-based output
    (names/lengths/codes concatenated; no minimizer tables -- the
    reference's split-merge header/seq lookup, splitidx.c).
    part_seq_meta: per part, list of (name, length)."""
    import numpy as np

    from ..index.build import MinimizerIndex, SeqMeta

    merged = MinimizerIndex(w=io_opts.w, k=io_opts.k, flag=io_opts.flag)
    off = 0
    for metas in part_seq_meta:
        for name, length in metas:
            merged.seqs.append(SeqMeta(name, off, length))
            off += length
    if part_codes is not None:
        merged.codes = np.concatenate(part_codes)
    return merged


def merge_read_regs(opt: MapOptions, merged_k: int, per_part_regs,
                    per_part_rep_len):
    """Merge one read's per-part regions (reference merge_hits,
    map.c:1050-1105): concatenate, re-sort, reassign primaries and MAPQ
    on the union.  rids must already be shifted into merged space."""
    from ..options import MM_F_ALL_CHAINS, MM_F_HARD_MLEVEL, MM_F_SR
    from .hit import hit_sort, select_sub, set_mapq, set_parent, set_sam_pri

    regs = [reg for regs_p in per_part_regs for reg in regs_p]
    rep_len = max(per_part_rep_len)
    regs = hit_sort(regs, opt.alt_drop)
    set_parent(opt.mask_level, opt.mask_len, regs, opt.a * 2 + opt.b,
               opt.flag & MM_F_HARD_MLEVEL, opt.alt_drop)
    if not (opt.flag & MM_F_ALL_CHAINS):
        regs = select_sub(opt.pri_ratio, merged_k * 2, opt.best_n, regs)
        set_sam_pri(regs)
    set_mapq(regs, opt.min_chain_score, opt.a, rep_len,
             bool(opt.flag & MM_F_SR))
    return regs, rep_len


def map_file_multipart(all_records, io_opts, opt: MapOptions, wset, paths,
                       out=sys.stdout, batch_bp: int = 4_000_000_000,
                       batched: bool = False, tmp_dir: str | None = None
                       ) -> int:
    """Multi-part index mapping (reference -I + --split-prefix: index-part
    loop main.c:384-424, per-part hit dumps merged by merge_hits,
    map.c:1050-1105).  Reads are mapped against every index part; each
    read's regions are concatenated with rid shifts, rep_len is the maximum
    over parts, and primary selection + MAPQ are recomputed on the union.

    Streams one index part at a time, exactly like the reference's
    mm_idx_reader loop (index.c:634-679): each part's per-read results are
    serialized to a temp file and the merge runs after the last part, so
    peak memory is bounded by ONE part plus the serialized hits."""
    import pickle
    import tempfile
    from pathlib import Path

    from ..index.build import build_index
    from ..io.fastx import FastxReader
    from ..options import update_mid_occ
    from ..parallel.sharded import pack_results, unpack_results
    from .batch import map_batch
    from .frag import MapResult, map_one

    parts = split_parts_by_bp(all_records, batch_bp)
    n_parts = len(parts)
    part_meta = [[(r.name, len(r.seq)) for r in prt] for prt in parts]
    rid_shift = [0]
    for metas in part_meta:
        rid_shift.append(rid_shift[-1] + len(metas))

    def read_batches():
        """Yield read batches in deterministic order across part passes."""
        n_before = 0
        for path in paths:
            with FastxReader(path) as reader:
                while True:
                    batch = reader.read_batch(opt.mini_batch_size)
                    if batch is None:
                        break
                    for i, rec in enumerate(batch):
                        rec.rid = n_before + i
                    order = sorted(range(len(batch)),
                                   key=lambda i: (len(batch[i].seq), i),
                                   reverse=True)
                    yield [batch[i] for i in order]
                    n_before += len(batch)

    single = n_parts == 1
    tdir = None
    dumps = []
    codes_file = None
    import copy

    for pi, prt in enumerate(parts):
        # one part resident at a time (reference index.c:634-679)
        mi = build_index(prt, io_opts.w, io_opts.k, io_opts.flag, wset,
                         bool(io_opts.flag & 1))
        if not single:
            # spill packed codes to disk: the merge pass memmaps them for
            # SAM/cs output, so peak memory stays bounded by ONE part
            if tdir is None:
                import tempfile as _tf

                tdir = tempfile.TemporaryDirectory(dir=tmp_dir)
                codes_file = open(Path(tdir.name) / "codes.bin", "wb")
            codes_file.write(mi.codes.tobytes())
        opt_p = copy.copy(opt)
        update_mid_occ(opt_p, mi)
        if single:
            n_processed = 0
            for batch in read_batches():
                if batched:
                    res = map_batch(mi, opt_p, [r.seq for r in batch],
                                    [r.name for r in batch])
                else:
                    res = [map_one(mi, opt_p, r.seq, r.name) for r in batch]
                for rec, r in zip(batch, res):
                    _write_read(mi, opt, rec, r, out)
                n_processed += len(batch)
                phase_log("map_file", f"mapped {len(batch)} sequences")
            return n_processed
        dump_path = Path(tdir.name) / f"part{pi}.hits"
        with open(dump_path, "wb") as df:
            for batch in read_batches():
                if batched:
                    res = map_batch(mi, opt_p, [r.seq for r in batch],
                                    [r.name for r in batch])
                else:
                    res = [map_one(mi, opt_p, r.seq, r.name) for r in batch]
                for r in res:
                    for reg in r.regs:
                        reg.rid += rid_shift[pi]
                pickle.dump(pack_results(res), df,
                            protocol=pickle.HIGHEST_PROTOCOL)
        dumps.append(dump_path)
        phase_log("map_file", f"index part {pi + 1}/{n_parts} mapped")

    codes_file.close()
    import numpy as np

    merged = merged_meta_index(part_meta, io_opts, None)
    merged.codes = np.memmap(Path(tdir.name) / "codes.bin", dtype=np.uint8,
                             mode="r")

    # merge pass (reference merge_hits + splitidx temp-file replay)
    n_processed = 0
    files = [open(p, "rb") for p in dumps]
    try:
        for batch in read_batches():
            per_part = [unpack_results(*pickle.load(f)) for f in files]
            for k, rec in enumerate(batch):
                regs, rep_len = merge_read_regs(
                    opt, merged.k, [res[k].regs for res in per_part],
                    [res[k].rep_len for res in per_part])
                _write_read(merged, opt, rec,
                            MapResult(regs, rep_len, 0), out)
            n_processed += len(batch)
            phase_log("map_file", f"merged {len(batch)} sequences "
                                  f"({n_parts} index parts)")
    finally:
        for f in files:
            f.close()
        tdir.cleanup()
    return n_processed
