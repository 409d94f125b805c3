"""gcn_grabcut_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of GCN-GrabCut: automatic image segmentation via superpixel
graphs, residual GCN trimap prediction, and on-device GrabCut refinement."""

__version__ = "0.1.0"

from .core.graph import (  # noqa: F401
    GraphBatch, make_graph_batch, single_graph, stack_graphs, pad_graph,
    N_NODE_FEATS, N_EDGE_FEATS, N_PRIOR_FEATS, N_IMAGE_FEATS,
    TRIMAP_BG, TRIMAP_FG, TRIMAP_PROB_BG, TRIMAP_PROB_FG,
    CLASS_BG, CLASS_UNK, CLASS_FG,
)
from .graph_build import (  # noqa: F401
    SuperpixelGraphConfig, RegionGraph, build_graph,
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
    ResGCNNet, GCNTrimapNet, GATTrimapNet,
)
from .train import Trainer, TrainConfig, load_model_from_checkpoint  # noqa: F401
