"""Round-5 result figures (matplotlib, light mode).

Produces:
- media/parity-2k.png — torch-reference vs this-framework PSNR
  trajectories from the round-5 pinned 2,000-step parity arms, both seeds
  (experiments/r5-parity/results/pinned_s{0,1}/{torch,jax}.csv)
- media/cross-archetype.png — 12k-step fast-vs-uniform test PSNR across
  the four procedural occupancy archetypes, with the thin-scene 120k
  progressive fix annotated (PERFORMANCE.md "Cross-archetype generality")
- media/epoch-faithful-tradeoff.png (refresh) — r4 figure + the round-5
  seed-1 replicate of the 3-phase schedule

Same two-slot palette as experiments/r4/figures.py (skill default
categorical slots, adjacent-pair CVD dE >= 8 documented there; the
validator needs node, absent in this image — palette reused unchanged,
identity carried by direct labels + legend, never color alone).

Run: python experiments/r5/figures.py
"""

import csv
import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = pathlib.Path(__file__).resolve().parents[2]
RESULTS = REPO / "experiments/r5-parity/results"
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


def parity_2k_figure():
    fig, axes = plt.subplots(1, 2, figsize=(9.2, 3.8), dpi=150,
                             sharey=True)
    fig.patch.set_facecolor(SURFACE)
    for seed, ax in zip((0, 1), axes):
        styled_axes(ax)
        st, pt = read_curve(RESULTS / f"pinned_s{seed}" / "torch.csv")
        sj, pj = read_curve(RESULTS / f"pinned_s{seed}" / "jax.csv")
        ax.plot(st, pt, color=ORANGE, linewidth=2, marker="o",
                markersize=4, label="torch reference")
        ax.plot(sj, pj, color=BLUE, linewidth=2, marker="o",
                markersize=4, label="this framework (JAX/TPU)")
        deltas = [abs(a - b) for a, b in zip(pt, pj)]
        ax.set_title(f"seed {seed} — max |Δ| = {max(deltas):.2f} dB",
                     color=TEXT, fontsize=9.5, loc="left")
        ax.set_xlabel("training step", color=TEXT2, fontsize=9)
        ax.set_xlim(150, 2100)
    axes[0].set_ylabel("reconstructed-view PSNR (dB)", color=TEXT2,
                       fontsize=9)
    axes[0].legend(loc="lower right", fontsize=8, frameon=False,
                   labelcolor=TEXT)
    fig.suptitle(
        "Training-trajectory parity to 2,000 steps (shared init, identical "
        "hyperparameters; gate 0.5 dB)",
        color=TEXT, fontsize=10.5, x=0.02, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    out = MEDIA / "parity-2k.png"
    fig.savefig(out, facecolor=SURFACE)
    print("wrote", out)


# 12k-step pre-saturation A/B, scored at each model's trained budget/kernel
# (PERFORMANCE.md "Cross-archetype generality"; object pair from the r3
# study the sweep replicates).
ARCHETYPES = [
    # name, fast (--fast occ 16+48), uniform 64+128 (unrounded, from the
    # archived sweep logs experiments/r5/logs/r4_sw_*.log.gz + the r3
    # object pair)
    ("field", 41.6247, 41.5877),
    ("object", 42.02, 42.01),
    ("shell", 43.4498, 46.3389),
    ("thin", 43.8367, 47.2181),
]


def cross_archetype_figure():
    fig, ax = plt.subplots(figsize=(6.8, 3.9), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    styled_axes(ax)
    ax.grid(axis="x", visible=False)
    w = 0.36
    xs = range(len(ARCHETYPES))
    for i, (name, fast, uni) in enumerate(ARCHETYPES):
        # 2px surface gap between adjacent fills: shrink bars slightly
        ax.bar(i - w / 2, fast, width=w - 0.03, color=BLUE, zorder=3)
        ax.bar(i + w / 2, uni, width=w - 0.03, color=ORANGE, zorder=3)
        d = fast - uni
        ax.annotate(f"{d:+.2f} dB", (i, max(fast, uni) + 0.25),
                    ha="center", color=TEXT, fontsize=8.5)
    ax.set_xticks(list(xs))
    ax.set_xticklabels([a[0] for a in ARCHETYPES], color=TEXT, fontsize=9)
    ax.set_ylim(38, 49.2)
    ax.set_ylabel("test PSNR (dB), 12k steps", color=TEXT2, fontsize=9)
    ax.set_title(
        "Flat fast recipe vs uniform 64+128 across occupancy archetypes\n"
        "(equal steps, pre-saturation; thin-scene gap closes at reference "
        "length:\nprog 100k/20k 52.23 vs twin 51.81 dB at 2.2× — "
        "PERFORMANCE.md)",
        color=TEXT, fontsize=9.5, loc="left")
    ax.legend(handles=[
        plt.Rectangle((0, 0), 1, 1, color=BLUE, label="--fast (occ 16+48)"),
        plt.Rectangle((0, 0), 1, 1, color=ORANGE, label="uniform 64+128"),
    ], loc="upper left", fontsize=8, frameon=False, labelcolor=TEXT)
    fig.tight_layout()
    out = MEDIA / "cross-archetype.png"
    fig.savefig(out, facecolor=SURFACE)
    print("wrote", out)


def tradeoff_refresh():
    """Re-render the r4 tradeoff figure with the r5 sched3 seed-1 point."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "r4figures", REPO / "experiments/r4/figures.py")
    r4 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(r4)  # definitions only (__main__-guarded)
    # append the round-5 replicate and re-render the tradeoff
    r4.REPLICATES.append(("3-phase schedule", 50.92, 39.5, "progressive"))
    r4.tradeoff_figure()


if __name__ == "__main__":
    parity_2k_figure()
    cross_archetype_figure()
    tradeoff_refresh()
