#!/bin/bash
# Regenerate golden outputs from the reference oracle binaries.
# Usage: gen_goldens.sh <refbuild-bin-dir> <outdir>
# The oracle is the reference Winnowmap v2.03 built from /root/reference
# (out of tree); goldens are committed so CI does not need the oracle.
set -euo pipefail
BIN=$1; OUT=$2
mkdir -p $OUT
cd $OUT
python3 $(dirname $0)/make_testdata.py --out-prefix t
$BIN/meryl count k=15 output t_db t_ref.fa 2>/dev/null
$BIN/meryl print greater-than distinct=0.9998 t_db 2>/dev/null > t_rep_k15.txt
rm -rf t_db
# PAF goldens (with CIGAR) -- vanilla path and SV-aware path
$BIN/winnowmap --sv-off -c -W t_rep_k15.txt t_ref.fa t_reads.fa 2>/dev/null > golden_svoff.paf
$BIN/winnowmap          -c -W t_rep_k15.txt t_ref.fa t_reads.fa 2>/dev/null > golden_svon.paf
# SAM goldens
$BIN/winnowmap --sv-off -a -W t_rep_k15.txt t_ref.fa t_reads.fa 2>/dev/null > golden_svoff.sam
$BIN/winnowmap          -a -W t_rep_k15.txt t_ref.fa t_reads.fa 2>/dev/null > golden_svon.sam
# No-alignment (chain-only) PAF golden
$BIN/winnowmap --sv-off    -W t_rep_k15.txt t_ref.fa t_reads.fa 2>/dev/null > golden_svoff_nocig.paf
# MMI interop goldens (needs the -d/-NULL-guard patched oracle, see NOTES)
$BIN/winnowmap -W t_rep_k15.txt -d t_ref.mmi t_ref.fa 2>/dev/null >/dev/null
$BIN/winnowmap -a t_ref.mmi t_reads.fa 2>/dev/null > golden_mmi.sam
# Paired-end golden (needs the assert/reshuffle patched oracle, see NOTES;
# pe_ref.fa/pe_1.fq/pe_2.fq/pe_rep.txt from tests/test_pe.py::_pe_corpus
# defaults, committed alongside)
$BIN/winnowmap -a --frag yes -W pe_rep.txt pe_ref.fa pe_1.fq pe_2.fq \
  2>/dev/null > golden_pe.sam
echo "goldens written to $OUT"
# Splice goldens (synthetic RNA corpus; see tests/test_e2e.py for the
# deterministic generator parameters, seed 4242)
# $BIN/winnowmap -t 1 -x splice -c -W s_rep_k15.txt s_ref.fa s_reads.fa > golden_splice.paf
# $BIN/winnowmap -t 1 -x splice -a -W s_rep_k15.txt s_ref.fa s_reads.fa > golden_splice.sam
