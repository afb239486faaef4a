"""Tail-averaged energy ± stderr from a run's train_stats.csv.

Blocked statistics over the last `frac` of logged steps: the rows are
correlated (MCMC + KFAC trajectories), so the stderr uses non-overlapping
block means (default 10 blocks) rather than the naive row variance.
Also reports the first-half/second-half tail split as a plateau check.

Usage: python runs/tail_energy.py <save_dir_or_csv> [frac=0.33] [col=energy]
"""
import csv
import os
import sys

import numpy as np


def load(path, col):
    if os.path.isdir(path):
        path = os.path.join(path, "train_stats.csv")
    steps, vals = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            steps.append(int(float(row["step"])))
            vals.append(float(row[col]))
    return np.asarray(steps), np.asarray(vals)


def blocked(vals, n_blocks=10):
    n = (len(vals) // n_blocks) * n_blocks
    if n == 0:
        return float(np.mean(vals)), float("nan")
    b = vals[len(vals) - n:].reshape(n_blocks, -1).mean(axis=1)
    return float(b.mean()), float(b.std(ddof=1) / np.sqrt(n_blocks))


def main():
    path = sys.argv[1]
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.33
    col = sys.argv[3] if len(sys.argv) > 3 else "energy"
    steps, vals = load(path, col)
    k = int(len(vals) * (1.0 - frac))
    tail_s, tail_v = steps[k:], vals[k:]
    mean, err = blocked(tail_v)
    h = len(tail_v) // 2
    m1, e1 = blocked(tail_v[:h], 5)
    m2, e2 = blocked(tail_v[h:], 5)
    drift = m2 - m1
    sig = abs(drift) / np.hypot(e1, e2) if e1 == e1 else float("nan")
    print(
        f"{col} tail [{tail_s[0]}..{tail_s[-1]}] ({len(tail_v)} rows): "
        f"{mean:.5f} +- {err:.5f}\n"
        f"  halves: {m1:.5f}(±{e1:.5f}) -> {m2:.5f}(±{e2:.5f}), "
        f"drift {drift*1e3:+.2f} mHa = {sig:.1f} sigma"
    )


if __name__ == "__main__":
    main()
