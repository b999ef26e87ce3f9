"""Time-to-quality analysis over the archived 120k-run metrics histories.

Reconstructs each arm's cumulative training wall-clock from the logged
per-window ``iterations_per_sec`` (validation/checkpoint boundary work lands
inside the following window's rate, so windows sum to end-to-end wall — the
reconstruction matches the run logs' bracketing timestamps to ~1 min) and
reports when each run's validation quality (PSNR proxy ``-10*log10
(val_fine_loss)``) first reaches a target. Produces the table in
PERFORMANCE.md "Time-to-quality".

Run: python experiments/r3-object120k/time_to_quality.py
"""
import csv
import gzip
import math
import pathlib

HERE = pathlib.Path(__file__).parent
ARMS = ["obj120k-uni", "obj120k-fast", "obj120k-gsrc", "obj120k-prog",
        "obj120k-prog2"]


def analyze(name):
    with gzip.open(HERE / "metrics" / f"{name}.metrics.csv.gz", "rt") as f:
        rows = list(csv.DictReader(f))
    wall, prev_step, out = 0.0, 0, []
    for r in rows:
        step = int(r["step"])
        if r.get("iterations_per_sec"):
            ds = step - prev_step
            its = float(r["iterations_per_sec"])
            if ds > 0 and its > 0:
                wall += ds / its
            prev_step = step
        if r.get("val_fine_loss"):
            out.append((step, wall, float(r["val_fine_loss"])))
    return out


def time_to(series, db):
    target = 10 ** (-db / 10)
    for _step, wall, loss in series:
        if loss <= target:
            return wall / 60
    return None


def main():
    series = {a: analyze(a) for a in ARMS}
    print("arm             total_wall_min  final_val_psnr_proxy")
    for a in ARMS:
        s = series[a]
        print(f"{a:15s} {s[-1][1] / 60:8.1f}        "
              f"{-10 * math.log10(s[-1][2]):.2f} dB")
    print("\ntime-to-val-quality (min, incl. compile+boundaries):")
    print("target_dB " + " ".join(
        f"{a.replace('obj120k-', ''):>8s}" for a in ARMS))
    for db in (40, 42, 44, 45, 46, 47, 48):
        cells = [
            f"{w:8.1f}" if (w := time_to(series[a], db)) else "       -"
            for a in ARMS
        ]
        print(f"{db:9d} " + " ".join(cells))


if __name__ == "__main__":
    main()
