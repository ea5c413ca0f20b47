"""k-mer counter parity with meryl (reference ext/meryl).

Goldens were produced by the reference meryl on a single-line FASTA: the
vendored meryl drops k-mers spanning FASTA line breaks (verified: 70-col
wrapping loses exactly 2 x n_linebreaks k-mers), so the wrapped-input counts
differ; ours are the mathematically correct ones and match meryl on
unwrapped input byte-for-byte.
"""
import hashlib

import numpy as np
import pytest

from winnowmap_tpu.kcount import KmerCounts, count_kmers, lookup, seq_to_kmers


@pytest.fixture(scope="module")
def counts(ref_records):
    return count_kmers(ref_records, 15)


def test_histogram_matches_meryl(golden_dir, counts):
    vals, occ = counts.histogram()
    gold = [tuple(map(int, l.split())) for l in open(golden_dir / "golden_meryl_histogram.txt")]
    assert list(zip(vals.tolist(), occ.tolist())) == gold


def test_print_md5_matches_meryl(golden_dir, counts):
    h = hashlib.md5()
    for line in counts.print_lines():
        h.update(line.encode())
        h.update(b"\n")
    assert h.hexdigest() == (golden_dir / "golden_meryl_print.md5").read_text().strip()


def test_distinct_threshold_filter(golden_dir, counts):
    thr = counts.threshold_distinct(0.9998)
    got = list(counts.greater_than(thr).print_lines())
    gold = (golden_dir / "golden_meryl_rep_distinct9998.txt").read_text().splitlines()
    assert got == gold


def test_greater_than_filter(golden_dir, counts):
    got = list(counts.greater_than(4).print_lines())
    gold = (golden_dir / "golden_meryl_gt4.txt").read_text().splitlines()
    assert got == gold


def test_canonicalization_meryl_order():
    # meryl's encoding is A=0,C=1,T=2,G=3: canonical of "AT..." vs revcomp
    ks = seq_to_kmers(b"TGACTGGCGCCAGTC", 15)
    assert len(ks) == 1
    kc = KmerCounts(15, ks, np.array([1]))
    assert kc.decode(int(ks[0])) == "TGACTGGCGCCAGTC"


def test_line_spanning_kmers_counted(ref_records):
    # total k-mer windows = sum(len - k + 1): nothing lost at line breaks
    counts = count_kmers(ref_records, 15)
    expect = sum(len(r.seq) - 14 for r in ref_records)
    assert counts.n_total == expect


def test_set_algebra(ref_records):
    a = count_kmers(ref_records[:1], 11)
    b = count_kmers(ref_records[1:], 11)
    u = a.union_sum(b)
    both = count_kmers(ref_records, 11)
    assert np.array_equal(u.kmers, both.kmers)
    assert np.array_equal(u.counts, both.counts)
    i = a.intersect_min(b)
    assert (np.isin(i.kmers, a.kmers)).all() and (np.isin(i.kmers, b.kmers)).all()
    d = a.difference(b)
    assert not np.isin(d.kmers, b.kmers).any()
    s = both.subtract(a)
    assert np.array_equal(s.kmers, b.kmers) and np.array_equal(s.counts, b.counts)


def test_lookup(ref_records):
    counts = count_kmers(ref_records, 15)
    res = lookup(counts, ref_records[0].seq[:1000])
    assert len(res) == 1000 - 14
    assert (res >= 1).all()  # every genome k-mer is present


def test_db_roundtrip(tmp_path, counts):
    counts.save(str(tmp_path / "db"))
    back = KmerCounts.load(str(tmp_path / "db"))
    assert back.k == counts.k
    assert np.array_equal(back.kmers, counts.kmers)
    assert np.array_equal(back.counts, counts.counts)


def test_device_counting_matches_host(ref_records):
    from winnowmap_tpu.kcount.device import count_kmers_device

    host = count_kmers(ref_records, 15)
    dev = count_kmers_device(ref_records, 15)
    assert np.array_equal(host.kmers, dev.kmers)
    assert np.array_equal(host.counts, dev.counts)


def test_meryl_lookup_oracle_parity(golden_dir, tmp_path):
    """meryl-lookup report types byte-match the reference tool (oracle
    outputs generated from ext/meryl meryl-lookup on the same DB; large
    reports committed as md5)."""
    import hashlib

    from winnowmap_tpu.meryl_cli import main as meryl_main
    from winnowmap_tpu.meryl_lookup_cli import main as ml_main

    db = tmp_path / "db"
    assert meryl_main(["count", "k=15", "output", str(db),
                       str(golden_dir / "t_ref.fa")]) == 0
    for mode in ("existence", "include", "bed", "bed-runs", "exclude",
                 "wig-count", "wig-depth"):
        out = tmp_path / f"{mode}.out"
        assert ml_main([f"-{mode}", "-sequence",
                        str(golden_dir / "t_reads.fa"),
                        "-output", str(out), "-mers", str(db)]) == 0
        data = out.read_bytes()
        if mode == "existence":
            assert data.decode() == (
                golden_dir / "golden_lookup_existence.txt").read_text()
        else:
            want = (golden_dir / f"golden_lookup_{mode}.md5").read_text().strip()
            assert hashlib.md5(data).hexdigest() == want


def test_meryl_nested_op_tree(golden_dir, tmp_path, capsys):
    """Nested [...] operation trees (reference merylCommandBuilder.C) give
    the same result as the flat subcommands."""
    from winnowmap_tpu.meryl_cli import main as meryl_main

    a, b, u = tmp_path / "a", tmp_path / "b", tmp_path / "u"
    assert meryl_main(["count", "k=15", "output", str(a),
                       str(golden_dir / "t_ref.fa")]) == 0
    assert meryl_main(["count", "k=15", "output", str(b),
                       str(golden_dir / "t_reads.fa")]) == 0
    assert meryl_main(["print", "union-sum", str(a), str(b)]) == 0
    flat = capsys.readouterr().out
    assert meryl_main(["print", "union-sum",
                       "[", "count", "k=15", str(golden_dir / "t_ref.fa"), "]",
                       "[", "count", "k=15", str(golden_dir / "t_reads.fa"),
                       "]"]) == 0
    tree = capsys.readouterr().out
    assert tree == flat


def test_meryl_import_roundtrip(golden_dir, tmp_path, capsys):
    """meryl-import equivalent: 'KMER count' text -> DB -> print round-trips
    (reference ext/meryl/src/meryl-import)."""
    from winnowmap_tpu.meryl_cli import main as meryl_main

    db = tmp_path / "db"
    assert meryl_main(["count", "k=15", "output", str(db),
                       str(golden_dir / "t_ref.fa")]) == 0
    assert meryl_main(["print", str(db)]) == 0
    text = capsys.readouterr().out
    dump = tmp_path / "dump.txt"
    dump.write_text(text)
    imp = tmp_path / "imp"
    assert meryl_main(["import", "-k", "15", "-kmers", str(dump),
                       "-output", str(imp)]) == 0
    assert meryl_main(["print", str(imp)]) == 0
    assert capsys.readouterr().out == text


def test_meryl_db_container_interop(golden_dir, tmp_path, counts):
    """The on-disk DB container is the real meryl v1 format: our writer's
    DBs are read by the reference meryl (print/histogram byte-match) and
    our reader decodes reference-meryl DBs (reference kmers-v1 writer/
    reader, stuffedBits container).  Oracle-gated."""
    import os
    import subprocess

    from winnowmap_tpu.kcount.meryldb import is_meryl_db, read_meryl_db

    db = tmp_path / "db"
    counts.save(str(db))
    assert is_meryl_db(str(db))
    assert sorted(os.listdir(db)) == sorted(
        ["merylIndex"]
        + [f"0x{i:06b}.merylData" for i in range(64)]
        + [f"0x{i:06b}.merylIndex" for i in range(64)])

    # our reader round-trips our writer
    kc2 = KmerCounts.load(str(db))
    assert kc2.k == counts.k
    assert np.array_equal(kc2.kmers, counts.kmers)
    assert np.array_equal(kc2.counts, counts.counts)

    meryl = "/tmp/refbuild/bin/meryl"
    if not os.path.exists(meryl):
        pytest.skip("oracle meryl not present")

    # reference meryl reads our DB: print and histogram byte-match ours
    out = subprocess.run([meryl, "print", str(db)], capture_output=True,
                         text=True, check=True).stdout
    assert sorted(out.splitlines()) == sorted(counts.print_lines())
    hist = subprocess.run([meryl, "histogram", str(db)],
                          capture_output=True, text=True, check=True).stdout
    vals, occ = counts.histogram()
    assert [tuple(map(int, l.split())) for l in hist.splitlines()] \
        == list(zip(vals.tolist(), occ.tolist()))

    # our reader decodes a reference-meryl-produced DB (single-line FASTA:
    # the vendored meryl drops k-mers spanning FASTA line breaks)
    seq = []
    for line in open(golden_dir / "t_ref.fa"):
        if line.startswith(">"):
            seq.append(("\n" if seq else "") + line.strip() + "\n")
        else:
            seq.append(line.strip())
    oneline = tmp_path / "oneline.fa"
    oneline.write_text("".join(seq) + "\n")
    odb = tmp_path / "odb"
    subprocess.run([meryl, "count", "k=15", "output", str(odb),
                    str(oneline)], capture_output=True, check=True)
    k, km, ct = read_meryl_db(str(odb))
    order = np.argsort(km)
    assert k == 15
    assert np.array_equal(km[order], counts.kmers)
    assert np.array_equal(ct[order], counts.counts)


def test_meryl_side_tools_oracle_parity(golden_dir, tmp_path, counts):
    """meryl-simple dump/histogram, meryl-analyze GC/GA composition
    histograms, and position-lookup hpq/mpb/qpb reports byte-match the
    reference side tools (reference ext/meryl/src/meryl-simple,
    meryl-analyze, meryl-lookup/position-lookup.C).  Oracle-gated."""
    import os
    import subprocess

    bindir = "/tmp/refbuild/bin"
    if not os.path.exists(f"{bindir}/meryl-simple"):
        pytest.skip("oracle side tools not present")

    # single-line FASTA (the vendored meryl family drops k-mers spanning
    # FASTA line breaks)
    seq = []
    for line in open(golden_dir / "t_ref.fa"):
        if line.startswith(">"):
            seq.append(("\n" if seq else "") + line.strip() + "\n")
        else:
            seq.append(line.strip())
    ref1 = tmp_path / "ref1.fa"
    ref1.write_text("".join(seq) + "\n")

    from winnowmap_tpu.meryl_analyze_cli import main as analyze_main
    from winnowmap_tpu.meryl_simple_cli import main as simple_main
    from winnowmap_tpu.position_lookup_cli import main as poslook_main

    # meryl-simple
    subprocess.run([f"{bindir}/meryl-simple", "-k", "15", "-S", str(ref1),
                    "-D", str(tmp_path / "o.dump"),
                    "-H", str(tmp_path / "o.hist")],
                   capture_output=True, check=True)
    assert simple_main(["-k", "15", "-S", str(ref1),
                        "-D", str(tmp_path / "u.dump"),
                        "-H", str(tmp_path / "u.hist")]) == 0
    assert (tmp_path / "u.dump").read_bytes() == \
        (tmp_path / "o.dump").read_bytes()
    assert (tmp_path / "u.hist").read_bytes() == \
        (tmp_path / "o.hist").read_bytes()

    # meryl-analyze over a reference-meryl DB
    db = tmp_path / "db"
    subprocess.run([f"{bindir}/meryl", "count", "k=15", "output", str(db),
                    str(ref1)], capture_output=True, check=True)
    for mode in ("-gc", "-ga"):
        subprocess.run([f"{bindir}/meryl-analyze", "-mers", str(db),
                        "-prefix", str(tmp_path / "o_an"), mode],
                       capture_output=True, check=True)
        assert analyze_main(["-mers", str(db),
                             "-prefix", str(tmp_path / "u_an"), mode]) == 0
    for ext in ("GC.hist", "GA.hist", "TC.hist", "GA_TC.hist"):
        assert (tmp_path / f"u_an.{ext}").read_bytes() == \
            (tmp_path / f"o_an.{ext}").read_bytes()

    # position-lookup
    reads = golden_dir / "t_reads.fa"
    subprocess.run([f"{bindir}/position-lookup", "-m", str(db), "-s",
                    str(ref1), "-hpq", str(tmp_path / "o_hpq"),
                    "-mpb", str(tmp_path / "o_mpb"),
                    "-qpb", str(tmp_path / "o_qpb"), str(reads)],
                   capture_output=True, check=True)
    assert poslook_main(["-m", str(db), "-s", str(ref1),
                         "-hpq", str(tmp_path / "u_hpq"),
                         "-mpb", str(tmp_path / "u_mpb"),
                         "-qpb", str(tmp_path / "u_qpb"), str(reads)]) == 0
    for f in ("hpq", "mpb", "qpb"):
        assert (tmp_path / f"u_{f}").read_bytes() == \
            (tmp_path / f"o_{f}").read_bytes()
