"""gcn_grabcut_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of GCN-GrabCut: automatic image segmentation via superpixel
graphs, residual GCN trimap prediction, and on-device GrabCut refinement."""

__version__ = "0.1.0"

from .core.graph import (  # noqa: F401
    GraphBatch, make_graph_batch, single_graph, stack_graphs, pad_graph,
    N_NODE_FEATS, N_EDGE_FEATS, N_PRIOR_FEATS, N_IMAGE_FEATS,
    TRIMAP_BG, TRIMAP_FG, TRIMAP_PROB_BG, TRIMAP_PROB_FG,
    CLASS_BG, CLASS_UNK, CLASS_FG, Label,
)
from .graph_build import (  # noqa: F401
    SuperpixelGraphConfig, RegionGraph, build_graph,
    GraphBuilder, SuperpixelGraph,
)
from .grabcut import GrabCut, GrabCutConfig, GrabCutSnapshot  # noqa: F401
from .pipeline import (  # noqa: F401
    GCNGrabCutPipeline, SegmentationResult, refine_trimap, seed_from_prior,
    colour_trimap,
)
from .metrics import (  # noqa: F401
    evaluate, evaluate_trimap, evaluate_batch, boundary_f1,
    SegmentationMetrics, TrimapMetrics,
)
from .models import (  # noqa: F401
    build_model, init_model, apply_model, predict_probs,
    probs_to_node_trimap, project_to_pixels, probs_to_trimap,
    stack_variables, is_ensemble,
    ResGCNNet, GCNTrimapNet, GATTrimapNet,
)
from .train import (  # noqa: F401
    Trainer, TrainConfig, load_model_from_checkpoint,
    load_ensemble_from_checkpoints,
)

# ---------------------------------------------------------------------------
# Reference facade parity: every public name the reference exports at package
# top level (src/gcn_grabcut/__init__.py:57-81) has a same-named equivalent
# here, so reference-facing code ports without chasing submodules.
# ---------------------------------------------------------------------------
from .ops.prior import compute_auto_prior  # noqa: F401
from .ops.image import guided_filter  # noqa: F401
from .ops.connected import clean_mask  # noqa: F401
from .data.hints import sample_clicks, encode_user_hints  # noqa: F401
from .data.dataset import (  # noqa: F401
    load_image_mask_dataset, make_synthetic_dataset, split_dataset,
    prepare_sample, prepare_dataset, augment_sample, derive_trimap_labels,
    make_hard_synthetic_dataset, make_photo_synthetic_dataset,
)
from .train.losses import (  # noqa: F401
    FocalLoss, LabelSmoothingCE, TrimapLoss,
    focal_loss, label_smoothing_ce, trimap_loss,
)
from .visualise import (  # noqa: F401
    plot_training_curves, plot_trimap_comparison, plot_superpixel_graph,
    plot_confusion_matrix, save_research_report,
)
