"""A/B: full KFAC train-step wall time with the GJ det kernel off vs on.

The det kernel touches two places: the forward-Laplacian det head
(slogdet_jet) and the value-path slogdet (the sampler runs 20 forwards
per iteration; loss/KFAC forwards + their custom-VJP backward). bench.py
A/Bs the E_L path alone; this measures the whole training step on
C-diamond 2x2x2 sto-3g, batch 1024 (BASELINE metric-(b) shape).

Each arm runs the real CLI in a subprocess (env + config knob), then the
per-step time = median delta of consecutive driver log timestamps with
the compile steps discarded. Prints one JSON line.
"""

import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEP_RE = re.compile(
    r"I(\d{4}) (\d\d:\d\d:\d\d\.\d+).* Step (\d+):"
)


def run_arm(arm: str, save: str) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "bin", "deepsolid_tpu"),
        "--config",
        os.path.join(REPO, "deepsolid_tpu", "configs", "diamond.py")
        + ":C,C,3.567,2,sto-3g",
        "--config.precision", "float32",
        "--config.batch_size", "1024",
        "--config.optim.optimizer", "kfac",
        "--config.optim.laplacian_mode", "forward",
        "--config.optim.el_chunk", "32",
        "--config.optim.iterations", "12",
        "--config.mcmc.burn_in", "3",
        "--config.mcmc.steps", "20",
        "--config.pretrain.method", "none",
        "--config.log.stats_frequency", "1",
        "--config.log.save_path", save,
        "--config.debug.det_kernel", arm,
    ]
    env = dict(os.environ)
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=2700, env=env
    )
    times = []
    for line in (out.stdout + out.stderr).splitlines():
        m = STEP_RE.search(line)
        if m:
            t = datetime.datetime.strptime(m.group(2), "%H:%M:%S.%f")
            times.append((int(m.group(3)), t))
    deltas = [
        (t2 - t1).total_seconds()
        for (s1, t1), (s2, t2) in zip(times, times[1:])
        if s2 == s1 + 1 and s1 >= 2  # drop compile/warmup steps
    ]
    deltas.sort()
    med = deltas[len(deltas) // 2] if deltas else None
    return {"arm": arm, "steps_timed": len(deltas), "s_per_step": med,
            "rc": out.returncode}


def main():
    res = {}
    for arm in ("off", "on"):
        res[arm] = run_arm(arm, f"/tmp/detk_ab_{arm}")
    off, on = res["off"]["s_per_step"], res["on"]["s_per_step"]
    res["speedup_off_over_on"] = (off / on) if (off and on) else None
    print(json.dumps(res))


if __name__ == "__main__":
    main()
