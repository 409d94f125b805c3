"""Per-layer parity vs independent torch implementations (the BASELINE
acceptance gate: GCN layer activations allclose with shared weights)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_per_layer_torch_parity():
    import parity_torch
    assert parity_torch.main() == 0
