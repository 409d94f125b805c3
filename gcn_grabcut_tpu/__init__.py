"""gcn_grabcut_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of GCN-GrabCut: automatic image segmentation via superpixel
graphs, residual GCN trimap prediction, and on-device GrabCut refinement."""

__version__ = "0.1.0"

from .core.graph import (  # noqa: F401
    GraphBatch, make_graph_batch, single_graph, stack_graphs,
    N_NODE_FEATS, N_EDGE_FEATS, N_PRIOR_FEATS, N_IMAGE_FEATS,
    TRIMAP_BG, TRIMAP_FG, TRIMAP_PROB_BG, TRIMAP_PROB_FG,
    CLASS_BG, CLASS_UNK, CLASS_FG,
)
from .graph_build import (  # noqa: F401
    SuperpixelGraphConfig, RegionGraph, build_graph,
)
