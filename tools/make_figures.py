"""Render the framework architecture figure (counterpart of the reference's
tools/make_architecture_figure.py, drawn for the TPU-native design).

Usage: python tools/make_figures.py --out architecture.png
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


BOXES = [
    # (column, row, text, colour)
    (0, 0, "RGB image\n(H, W, 3)", "#dbe9f6"),
    (0, 1, "ops.image\nLAB / HSV / gray / Sobel", "#dbe9f6"),
    (0, 2, "ops.slic\nfixed-K SLIC +\nconnectivity (on-device)", "#dbe9f6"),
    (0, 3, "ops.region | ops.edges | ops.prior\n16-d node feats · 5-d edges\nsaliency prior", "#dbe9f6"),
    (1, 0, "core.GraphBatch\ndense-padded (G, N, F)\n+ masks", "#fde9d9"),
    (1, 1, "models.ResGCNNet (flagship)\nInputNorm → proj → prior gate\n6× pre-norm GCN blocks (MXU matmul)\nSAGE branch → JK fusion → ctx → head", "#fde9d9"),
    (1, 2, "ops.spmm (Pallas)\nbanded one-hot SpMM\nfor 10k+-node graphs", "#fde9d9"),
    (1, 3, "train.Trainer\noptax AdamW + layer-wise LR\nSGDR · bf16 · early stop", "#fde9d9"),
    (2, 0, "pipeline.refine_trimap\nguided filter (cumsum box)", "#e2efda"),
    (2, 1, "grabcut.GrabCut\nGMM (k-means++ / EM)\n+ parallel push-relabel min-cut\n(native C++ host fallback)", "#e2efda"),
    (2, 2, "ops.connected\nCC clean-up", "#e2efda"),
    (2, 3, "SegmentationResult\nmask · trimap · overlay · rgba", "#e2efda"),
    (3, 0, "parallel.mesh\n(data, graph) device mesh", "#ece3f6"),
    (3, 1, "parallel.partition\nedge-partitioned aggregation\nall-gather or ppermute ring", "#ece3f6"),
    (3, 2, "jax.distributed\nmulti-host (tested 2-process)", "#ece3f6"),
    (3, 3, "utils\ncompile cache · profiler traces", "#ece3f6"),
]

COLS = ["Graph front-end\n(one fused jit)", "Model + training",
        "Classical refinement\n(on device)", "Distribution"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="architecture.png")
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyBboxPatch

    fig, ax = plt.subplots(figsize=(15, 8))
    ax.set_xlim(0, 4)
    ax.set_ylim(-0.6, 4.6)
    ax.axis("off")
    ax.set_title("gcn_grabcut_tpu — TPU-native architecture", fontsize=15)

    for c, title in enumerate(COLS):
        ax.text(c + 0.5, 4.35, title, ha="center", va="center",
                fontsize=11, fontweight="bold")

    for c, r, text, colour in BOXES:
        y = 3.3 - r
        box = FancyBboxPatch((c + 0.06, y - 0.38), 0.88, 0.8,
                             boxstyle="round,pad=0.02",
                             facecolor=colour, edgecolor="#666666")
        ax.add_patch(box)
        ax.text(c + 0.5, y, text, ha="center", va="center", fontsize=7.8)

    # Flow arrows across columns
    for c in range(3):
        ax.annotate("", xy=(c + 1.04, 1.8), xytext=(c + 0.96, 1.8),
                    arrowprops=dict(arrowstyle="->", lw=1.6,
                                    color="#444444"))

    fig.tight_layout()
    fig.savefig(args.out, dpi=140)
    print(f"[Figures] wrote {args.out}")


if __name__ == "__main__":
    main()
