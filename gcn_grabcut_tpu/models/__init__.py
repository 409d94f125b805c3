from .factory import (  # noqa: F401
    build_model, init_model, apply_model, predict_probs,
    probs_to_node_trimap, project_to_pixels, probs_to_trimap,
    stack_variables, is_ensemble,
)
from .resgcn import ResGCNNet, resgcn_lr_label, resgcn_group_scales  # noqa: F401
from .gcn import GCNTrimapNet  # noqa: F401
from .gat import GATTrimapNet  # noqa: F401
