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


def map_file_multipart(all_records, io_opts, opt: MapOptions, wset, paths,
                       out=sys.stdout, batch_bp: int = 4_000_000_000,
                       batched: bool = False) -> int:
    """Multi-part index mapping (reference -I + --split-prefix: index-part
    loop main.c:384-424, per-part hit dumps merged by merge_hits,
    map.c:1050-1105).  Reads are mapped against every index part; each
    read's regions are concatenated with rid shifts, rep_len is the maximum
    over parts, and primary selection + MAPQ are recomputed on the union."""
    from ..index.build import build_index
    from ..io.fastx import FastxReader
    from ..options import MM_F_ALL_CHAINS, MM_F_HARD_MLEVEL, MM_F_SR
    from ..options import update_mid_occ
    from .batch import map_batch
    from .frag import MapResult, map_one
    from .hit import hit_sort, select_sub, set_mapq, set_parent, set_sam_pri

    # split the reference into parts of ~batch_bp bases (reference
    # mm_idx_reader_read accumulates until sum_len > batch_size,
    # index.c:293-295)
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

    part_indexes = []
    rid_shift = [0]
    for prt in parts:
        mi = build_index(prt, io_opts.w, io_opts.k, io_opts.flag, wset,
                         bool(io_opts.flag & 1))
        part_indexes.append(mi)
        rid_shift.append(rid_shift[-1] + mi.n_seq)

    # a merged metadata view for rid-based output (names/lengths/codes
    # concatenated; no minimizer tables -- this is the reference's
    # split-merge header/seq lookup, splitidx.c)
    if len(parts) > 1:
        import numpy as np

        from ..index.build import MinimizerIndex, SeqMeta

        merged = MinimizerIndex(w=io_opts.w, k=io_opts.k, flag=io_opts.flag)
        off = 0
        for mi in part_indexes:
            for sm in mi.seqs:
                merged.seqs.append(SeqMeta(sm.name, off, sm.length))
                off += sm.length
        merged.codes = np.concatenate([mi.codes for mi in part_indexes])
    else:
        merged = part_indexes[0]

    n_processed = 0
    is_sr = bool(opt.flag & MM_F_SR)
    for path in paths:
        with FastxReader(path) as reader:
            while True:
                batch = reader.read_batch(opt.mini_batch_size)
                if batch is None:
                    break
                for i, rec in enumerate(batch):
                    rec.rid = n_processed + i
                order = sorted(range(len(batch)),
                               key=lambda i: (len(batch[i].seq), i),
                               reverse=True)
                batch = [batch[i] for i in order]
                per_part = []
                for pi, mi in enumerate(part_indexes):
                    import copy

                    opt_p = copy.copy(opt)
                    update_mid_occ(opt_p, mi)
                    if batched:
                        res = map_batch(mi, opt_p, [r.seq for r in batch],
                                        [r.name for r in batch])
                    else:
                        res = [map_one(mi, opt_p, r.seq, r.name)
                               for r in batch]
                    for r in res:
                        for reg in r.regs:
                            reg.rid += rid_shift[pi]
                    per_part.append(res)
                for k, rec in enumerate(batch):
                    regs = [reg for res in per_part for reg in res[k].regs]
                    rep_len = max(res[k].rep_len for res in per_part)
                    regs = hit_sort(regs, opt.alt_drop)
                    set_parent(opt.mask_level, opt.mask_len, regs,
                               opt.a * 2 + opt.b,
                               opt.flag & MM_F_HARD_MLEVEL, opt.alt_drop)
                    if not (opt.flag & MM_F_ALL_CHAINS):
                        regs = select_sub(opt.pri_ratio, merged.k * 2,
                                          opt.best_n, regs)
                        set_sam_pri(regs)
                    set_mapq(regs, opt.min_chain_score, opt.a, rep_len, is_sr)
                    _write_read(merged, opt, rec,
                                MapResult(regs, rep_len, 0), out)
                n_processed += len(batch)
                phase_log("map_file", f"mapped {len(batch)} sequences "
                                      f"({len(parts)} index parts)")
    return n_processed
