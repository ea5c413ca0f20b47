"""Generate deterministic synthetic test data (genome + reads) for golden tests.

A small E. coli-like genome with embedded tandem repeats (so the repetitive
k-mer machinery has something to chew on) plus simulated noisy long reads.
"""
import argparse
import numpy as np

BASES = np.array(list("ACGT"))

def make_genome(rng, length, n_repeats=6, rep_unit=400, rep_copies=8):
    g = rng.integers(0, 4, size=length)
    # plant tandem repeat arrays
    for _ in range(n_repeats):
        unit = rng.integers(0, 4, size=rep_unit)
        pos = rng.integers(0, length - rep_unit * rep_copies)
        for c in range(rep_copies):
            seg = unit.copy()
            nmut = rng.integers(0, rep_unit // 50 + 1)
            idx = rng.integers(0, rep_unit, size=nmut)
            seg[idx] = rng.integers(0, 4, size=nmut)
            g[pos + c * rep_unit : pos + (c + 1) * rep_unit] = seg
    return g

def mutate_read(rng, seq, sub=0.02, ins=0.02, dele=0.02):
    out = []
    i = 0
    n = len(seq)
    while i < n:
        r = rng.random()
        if r < dele:
            i += 1
            continue
        if r < dele + ins:
            out.append(rng.integers(0, 4))
            continue
        if r < dele + ins + sub:
            out.append((seq[i] + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(seq[i])
        i += 1
    return np.array(out, dtype=np.int64)

def revcomp(a):
    return (3 - a)[::-1]

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-prefix", required=True)
    ap.add_argument("--genome-len", type=int, default=200_000)
    ap.add_argument("--n-reads", type=int, default=60)
    ap.add_argument("--read-len", type=int, default=8000)
    ap.add_argument("--read-len-jitter", type=int, default=4000)
    ap.add_argument("--error", type=float, default=0.06)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-chroms", type=int, default=2)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    chroms = []
    with open(args.out_prefix + "_ref.fa", "w") as f:
        for c in range(args.n_chroms):
            g = make_genome(rng, args.genome_len // args.n_chroms)
            chroms.append(g)
            s = "".join(BASES[g])
            f.write(f">chr{c+1} synthetic\n")
            for i in range(0, len(s), 70):
                f.write(s[i : i + 70] + "\n")

    e = args.error / 3.0
    with open(args.out_prefix + "_reads.fa", "w") as f:
        for i in range(args.n_reads):
            ci = rng.integers(0, len(chroms))
            g = chroms[ci]
            rl = args.read_len + rng.integers(-args.read_len_jitter, args.read_len_jitter + 1)
            rl = max(1000, min(rl, len(g) - 1))
            pos = rng.integers(0, len(g) - rl)
            seq = g[pos : pos + rl]
            seq = mutate_read(rng, seq, sub=e, ins=e, dele=e)
            if rng.random() < 0.5:
                seq = revcomp(seq)
                strand = "-"
            else:
                strand = "+"
            s = "".join(BASES[seq])
            f.write(f">read{i}_chr{ci+1}_{pos}_{strand}\n")
            for j in range(0, len(s), 70):
                f.write(s[j : j + 70] + "\n")

if __name__ == "__main__":
    main()
