"""Round-4 epoch-faithful arm analysis (VERDICT r3 #1/#5).

Reads each arm's live metrics.csv under --runs (default /tmp/r4runs),
reconstructs training wall-clock from the logged per-window
``iterations_per_sec`` (validation/checkpoint boundary work lands inside
the following window's rate, so windows sum to end-to-end wall — same
method as experiments/r3-object120k/time_to_quality.py), and prints:

- per-arm: total wall, effective rays/s, final val-PSNR proxy
  (``-10*log10(val_fine_loss)``), plus the score.py test PSNR/SSIM if the
  arm's run log is present under /tmp/r4_<arm-suffix>.log
- time-to-val-quality table across arms

Run: python experiments/r4/analyze.py [--runs DIR] [arms...]
"""

import argparse
import csv
import math
import pathlib
import re

DEFAULT_ARMS = ["o100-fast", "o100-prog60", "o100-prog20", "o100-sched3",
                "o100-uni"]
LOGS = pathlib.Path("/tmp")
STALL_FRAC = 0.2  # window rate < 20% of the local median => tunnel stall


def analyze(runs: pathlib.Path, name: str):
    path = runs / name / "metrics.csv"
    if not path.exists():
        return None
    with open(path) as f:
        rows = list(csv.DictReader(f))
    # The axon tunnel occasionally stalls for minutes mid-run (observed: a
    # 1,520 s window at 269 rays/s inside o100-sched3, step 97500 — 25 min
    # of a 68-min run); a window far below the LOCAL healthy rate (median
    # of its ±5 neighbors — local, because budget-schedule phases change
    # the true rate) is a tunnel artifact, not compute (CLAUDE.md "treat a
    # lone catastrophic number as a stall first"). Report both raw and
    # stall-adjusted wall.
    win = [(int(r["step"]), float(r["iterations_per_sec"]))
           for r in rows if r.get("iterations_per_sec")]
    local_med = []
    for i in range(len(win)):
        nb = [v for _, v in win[max(0, i - 5):i + 6]]
        nb.sort()
        local_med.append(nb[len(nb) // 2])
    adj_rate = dict()  # step -> healthy rate for stall windows
    for (s, v), m in zip(win, local_med):
        if v < m * STALL_FRAC:
            adj_rate[s] = m
    # prefer the exact per-row wall clock when the run logged it
    # (trainer logs `wall_seconds` since round 4); reconstruct from
    # per-window rates for older CSVs. Stall adjustment applies either way.
    wall, adj_wall, stall_s, prev_step, prev_ws, out = 0.0, 0.0, 0.0, 0, 0.0, []
    for r in rows:
        step = int(r["step"])
        if r.get("iterations_per_sec"):
            ds = step - prev_step
            its = float(r["iterations_per_sec"])
            if ds > 0 and its > 0:
                if r.get("wall_seconds"):
                    # exact session-relative clock; a drop = a resume
                    # (new session), whose first row contributes its own
                    # session-relative time
                    ws = float(r["wall_seconds"])
                    dt = ws - prev_ws if ws >= prev_ws else ws
                    prev_ws = ws
                else:
                    dt = ds / its
                wall += dt
                if step in adj_rate:
                    adj = ds / adj_rate[step]
                    stall_s += dt - adj
                    dt = adj
                adj_wall += dt
            prev_step = step
        if r.get("val_fine_loss"):
            out.append((step, wall, float(r["val_fine_loss"])))
    return out, adj_wall, stall_s


def scored(name: str):
    """score.py PSNR/SSIM from the arm's run log, if finished."""
    log = LOGS / f"r4_{name.replace('o100-', 'o100_')}.log"
    if not log.exists():
        return None, None
    text = log.read_text(errors="ignore")
    p = re.findall(r"average psnr score: ([0-9.]+)", text)
    s = re.findall(r"average ssim score: ([0-9.]+)", text)
    return (float(p[-1]) if p else None, float(s[-1]) if s else None)


def time_to(series, db):
    target = 10 ** (-db / 10)
    for _step, wall, loss in series:
        if loss <= target:
            return wall / 60
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="/tmp/r4runs")
    ap.add_argument("arms", nargs="*", default=DEFAULT_ARMS)
    args = ap.parse_args()
    runs = pathlib.Path(args.runs)
    results = {a: analyze(runs, a) for a in args.arms}
    series = {a: (r[0] if r else None) for a, r in results.items()}
    print("arm          steps  wall_min  adj_min  stall_min  eff_rays/s  "
          "adj_rays/s  val_proxy   test_psnr  ssim")
    for a in args.arms:
        if not results[a]:
            print(f"{a:12s} (no metrics.csv)")
            continue
        s, adj_wall, stall_s = results[a]
        step, wall, loss = s[-1]
        eff = step * 4096 / wall
        adj_eff = step * 4096 / adj_wall
        psnr, ssim = scored(a)
        print(f"{a:12s} {step:6d} {wall / 60:9.1f} {adj_wall / 60:8.1f} "
              f"{stall_s / 60:10.1f} {eff:11,.0f} {adj_eff:11,.0f} "
              f"{-10 * math.log10(loss):8.2f} dB "
              f"{psnr if psnr else float('nan'):9.2f} "
              f"{ssim if ssim else float('nan'):.4f}")
    done = [a for a in args.arms if series[a]]
    print("\ntime-to-val-quality (min, incl. compile+boundaries):")
    print("target_dB " + " ".join(
        f"{a.replace('o100-', ''):>8s}" for a in done))
    for db in (40, 44, 46, 48, 49, 50, 51):
        cells = [
            f"{w:8.1f}" if (w := time_to(series[a], db)) else "       -"
            for a in done
        ]
        print(f"{db:9d} " + " ".join(cells))


if __name__ == "__main__":
    main()
