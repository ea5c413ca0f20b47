"""scripts/-equivalent analysis utilities (reference scripts/minimizerDist.R,
scripts/extractSelectedReads.R)."""
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "data" / "golden"


def test_minimizer_dist_golden_dump(tmp_path):
    """Density profile over the committed reference minimizer dump: the
    in-process sketch_dump agrees with the reference's own dump, max-occ
    filtering counts across the whole dump, and the KDE integrates to 1."""
    from winnowmap_tpu.tools.minimizer_dist import (density_grid,
                                                    filter_max_occ, main,
                                                    sketch_dump)

    want = np.loadtxt(GOLD / "golden_ref_minimizers.txt", dtype=np.int64)
    got = sketch_dump(str(GOLD / "t_ref.fa"), 15, 50,
                      wfile=str(GOLD / "t_rep_k15.txt"))
    assert {tuple(r) for r in got.tolist()} == {tuple(r)
                                                for r in want.tolist()}

    # max-occ filter: a key occurring k times survives iff k <= max_occ
    keys, counts = np.unique(got[:, 2], return_counts=True)
    if counts.max() > 1:
        thr = int(counts.max()) - 1
        kept = filter_max_occ(got, thr)
        kk, kc = np.unique(kept[:, 2], return_counts=True)
        assert kc.max() <= thr

    grid, dens = density_grid(got[got[:, 0] == 0][:, 1], bw=500.0)
    area = np.trapezoid(dens, grid)
    assert abs(area - 1.0) < 1e-3

    out = tmp_path / "density.tsv"
    rc = main(["--input", str(GOLD / "golden_ref_minimizers.txt"),
               "--rid", "0", "--out", str(out)])
    assert rc == 0
    rows = [ln for ln in out.read_text().splitlines()
            if not ln.startswith("#")]
    assert len(rows) == 512


def test_extract_selected_reads(tmp_path):
    from winnowmap_tpu.tools.extract_selected_reads import extract, main

    paf = tmp_path / "o.paf"
    paf.write_text("r1\t100\t0\t90\t+\tc\t1\t2\t3\t4\t5\t60\n"
                   "r2\t100\t0\t90\t+\tc\t1\t2\t3\t4\t5\t60\n"
                   "r10\t100\t0\t90\t+\tc\t1\t2\t3\t4\t5\t60\n")
    ids = tmp_path / "ids.txt"
    ids.write_text("r1\nr10\n")
    out = tmp_path / "f.paf"
    assert extract(str(paf), str(ids), str(out)) == 2
    names = [ln.split("\t")[0] for ln in out.read_text().splitlines()]
    assert names == ["r1", "r10"]  # exact-id match: r2 dropped, not "r1*"
    assert main(["--paf", str(paf), "--ids", str(ids),
                 "--out", str(out)]) == 0
