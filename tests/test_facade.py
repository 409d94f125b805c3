"""Import-parity with the reference's public facade.

The reference exports its full public API at package top level
(/root/reference/src/gcn_grabcut/__init__.py:57-81); anyone porting
reference-facing code expects the same names importable from the package
root here.  This test enumerates the reference ``__all__`` verbatim.
"""

import numpy as np
import pytest

import gcn_grabcut_tpu as g

# The reference __all__ (src/gcn_grabcut/__init__.py:57-81), minus
# `_probs_to_trimap` which the reference itself keeps private.
REFERENCE_ALL = [
    "GrabCut", "GrabCutConfig", "Label",
    "GraphBuilder", "SuperpixelGraph", "SuperpixelGraphConfig",
    "compute_auto_prior", "encode_user_hints",
    "N_NODE_FEATS", "N_EDGE_FEATS", "N_PRIOR_FEATS",
    "load_image_mask_dataset", "make_synthetic_dataset", "split_dataset",
    "sample_clicks", "prepare_sample", "prepare_dataset",
    "augment_sample", "derive_trimap_labels",
    "evaluate", "SegmentationMetrics",
    "evaluate_trimap", "TrimapMetrics", "evaluate_batch",
    "GCNGrabCutPipeline", "SegmentationResult", "clean_mask",
    "guided_filter", "refine_trimap",
    "Trainer", "TrainConfig", "FocalLoss", "LabelSmoothingCE", "TrimapLoss",
    "GCNTrimapNet", "GATTrimapNet", "ResGCNNet", "build_model",
    "probs_to_node_trimap", "project_to_pixels",
    "plot_training_curves", "plot_trimap_comparison",
    "plot_superpixel_graph", "plot_confusion_matrix",
    "save_research_report",
]


@pytest.mark.parametrize("name", REFERENCE_ALL)
def test_reference_export_present(name):
    assert hasattr(g, name), f"reference top-level export missing: {name}"


def test_label_enum_matches_opencv_convention():
    # Values per src/gcn_grabcut/grabcut.py:22-27 (cv2.GC_* convention).
    assert int(g.Label.BG_DEFINITE) == 0 == g.TRIMAP_BG
    assert int(g.Label.FG_DEFINITE) == 1 == g.TRIMAP_FG
    assert int(g.Label.BG_PROBABLE) == 2 == g.TRIMAP_PROB_BG
    assert int(g.Label.FG_PROBABLE) == 3 == g.TRIMAP_PROB_FG


def test_graph_builder_class_form():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (96, 96, 3), np.uint8)
    graph = g.GraphBuilder(
        img, g.SuperpixelGraphConfig(n_segments=40)).build()
    assert isinstance(graph, g.SuperpixelGraph)
    assert graph.segments.shape == (96, 96)
    assert graph.n_nodes > 0


def test_loss_classes_match_functions():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 8, 3).astype(np.float32)
    labels = rng.randint(0, 3, (2, 8))
    mask = np.ones((2, 8), np.float32)
    np.testing.assert_allclose(
        float(g.FocalLoss(gamma=2.0)(logits, labels, mask)),
        float(g.focal_loss(logits, labels, mask, gamma=2.0)), rtol=1e-6)
    np.testing.assert_allclose(
        float(g.LabelSmoothingCE(0.1)(logits, labels, mask)),
        float(g.label_smoothing_ce(logits, labels, mask, smoothing=0.1)),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(g.TrimapLoss()(logits, labels, mask)),
        float(g.trimap_loss(logits, labels, mask)), rtol=1e-6)
