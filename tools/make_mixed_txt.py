"""Generate a plain-text corpus with the caption-like length mix used by
tools/bench_bucketed.py (lognormal mean~13 tokens, clipped to
[min_len, max_len]) so the full CLI (`cliora_tpu.scripts.train
--data_type txt`) can be timed at the production bucketed envelope and
compared against bench_bucketed's device-resident steady state
(VERDICT r4 item 3).

Usage: python tools/make_mixed_txt.py out_dir [n_train] [n_valid]
           [vocab] [min_len] [max_len] [seed]
"""

import os
import sys

import numpy as np


def write_split(path, n, vocab, lo, hi, rs):
    lens = np.clip(np.round(rs.lognormal(2.55, 0.45, n)),
                   lo, hi).astype(int)
    with open(path, "w") as f:
        for m in lens:
            # zipf-ish unigram so the negative sampler sees a realistic
            # frequency distribution
            ids = np.minimum((rs.pareto(1.2, m) * 40).astype(int),
                             vocab - 1)
            f.write(" ".join(f"w{i}" for i in ids) + "\n")
    return lens


def main():
    out = sys.argv[1]
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    n_valid = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    vocab = int(sys.argv[4]) if len(sys.argv) > 4 else 10000
    lo = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    hi = int(sys.argv[6]) if len(sys.argv) > 6 else 40
    seed = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    os.makedirs(out, exist_ok=True)
    rs = np.random.RandomState(seed)
    lens = write_split(os.path.join(out, "train.txt"), n_train, vocab,
                       lo, hi, rs)
    write_split(os.path.join(out, "valid.txt"), n_valid, vocab, lo, hi, rs)
    print(f"{out}: {n_train} train / {n_valid} valid sentences, "
          f"lengths {lens.min()}..{lens.max()} "
          f"(mean {lens.mean():.1f}), vocab {vocab}")


if __name__ == "__main__":
    main()
