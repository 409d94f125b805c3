"""ResGCNNet — the flagship residual GCN with jumping-knowledge fusion.

TPU-native re-implementation of the reference default model
(src/gcn_grabcut/model.py:421-590):

    InputNorm -> InputProj -> PriorBooster -> [pre-norm ResBlock x n] ->
    SAGE branch -> JK softmax fusion -> GlobalContext -> fuse -> head

Differences from the reference are purely representational: the model
consumes dense-padded ``GraphBatch``es (G, N, F), neighbourhood aggregation
is a normalised-adjacency matmul on the MXU (built once per forward and
shared by all blocks), and all per-graph reductions are masked axis
reductions.  Per-node outputs on valid nodes are identical to the edge-list
formulation (tested), preserving the reference's batched-equals-single
contract (reference tests/test.py:294-306).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.graph import GraphBatch, N_PRIOR_FEATS
from .layers import (
    KAIMING, GCNConv, SAGEConv, EdgeContext, GlobalContext, InputNorm,
    dense_adjacency, gcn_norm_adjacency, mean_adjacency,
)


class ResGCNNet(nn.Module):
    in_channels: int = 19
    edge_channels: int = 5
    hidden_channels: int = 128
    n_layers: int = 6
    n_classes: int = 3
    dropout: float = 0.15
    dtype: Optional[jnp.dtype] = None

    # Accepts SpMM aggregators for the 10k+-node path (models/large.py).
    supports_spmm_aggregators = True

    @nn.compact
    def __call__(self, g: GraphBatch, train: bool = False,
                 aggregators=None) -> jnp.ndarray:
        """`aggregators`: optional (gcn_propagate, mean_propagate) callables
        replacing the dense adjacency path — used for single large graphs
        via the banded Pallas SpMM (models/large.py)."""
        D = self.hidden_channels
        N = g.max_nodes
        dense = lambda feats, name=None, bias=True: nn.Dense(
            feats, use_bias=bias, kernel_init=KAIMING, dtype=self.dtype,
            name=name)

        x = g.x
        prior = x[..., -N_PRIOR_FEATS:]

        # Input standardisation + projection (LN/GELU).
        h = InputNorm(self.in_channels, momentum=0.05, dtype=self.dtype,
                      name="in_norm")(x, g.node_mask, train=train)
        h = dense(D, name="input_proj")(h)
        h = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="input_ln")(h))

        # Prior-conditioned boost: h * (1 + sigmoid(MLP(prior))).
        pb = dense(max(D // 4, 8), name="prior_fc1")(prior)
        pb = nn.gelu(pb)
        pb = nn.sigmoid(dense(D, name="prior_fc2")(pb))
        h = h * (1.0 + pb)

        # One shared edge-context gate, read by every block.
        gate = EdgeContext(D, dtype=self.dtype, name="edge_ctx")(
            g.edge_attr, g.edge_dst, g.edge_mask, N).astype(h.dtype)

        # Normalised adjacency built once, reused by all n_layers matmuls
        # (or caller-provided SpMM aggregators for large graphs).
        if aggregators is not None:
            adj_gcn, adj_mean = aggregators
        else:
            adj = dense_adjacency(g.edge_src, g.edge_dst, g.edge_mask, N)
            adj_gcn = gcn_norm_adjacency(adj)
            adj_mean = mean_adjacency(adj)

        drop = nn.Dropout(self.dropout, deterministic=not train)

        states = [h]
        for i in range(self.n_layers):
            h_res = nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(h)
            h_res = GCNConv(D, dtype=self.dtype, name=f"gcn_{i}")(
                h_res, adj_gcn)
            h_res = nn.gelu(h_res * gate)
            h_res = drop(h_res)
            h = h + h_res
            states.append(h)

        # Coarse SAGE branch.
        sage = SAGEConv(D, dtype=self.dtype, name="sage")(h, adj_mean)
        sage = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="sage_norm")(sage))
        states.append(sage)

        # Jumping-knowledge fusion: learned convex combination of states.
        jk_logits = self.param("jk_logits", nn.initializers.zeros,
                               (self.n_layers + 2,))
        w = nn.softmax(jk_logits.astype(jnp.float32)).astype(h.dtype)
        h_jk = jnp.einsum("k,kgnd->gnd", w, jnp.stack(states, axis=0))

        h_jk = GlobalContext(D, dtype=self.dtype, name="ctx")(
            h_jk, g.node_mask)

        # fuse: LN -> Linear -> GELU -> Dropout, then the classifier head.
        out = nn.LayerNorm(dtype=self.dtype, name="fuse_ln")(h_jk)
        out = nn.gelu(dense(D, name="fuse_fc")(out))
        out = drop(out)
        return dense(self.n_classes, name="head")(out)

    @staticmethod
    def layer_weights(params) -> jnp.ndarray:
        """Fusion weights over [input, block 1..n, SAGE] (model.py:538-541)."""
        return nn.softmax(params["jk_logits"])


def resgcn_lr_label(path: tuple, n_layers: int) -> str:
    """Map a parameter path to its layer-wise LR group.

    Reproduces reference ``ResGCNNet.param_groups`` (model.py:559-590):
    GCN block i → lr * 0.8^(n-i); input stack → 0.5; edge/sage/ctx → 0.9;
    jk/fuse/head → 1.0.
    """
    top = path[0] if path else ""
    for i in range(n_layers):
        if top in (f"gcn_{i}", f"norm_{i}"):
            return f"block_{i}"
    if top in ("in_norm", "input_proj", "input_ln", "prior_fc1", "prior_fc2"):
        return "input"
    if top in ("edge_ctx", "sage", "sage_norm", "ctx"):
        return "mid"
    return "head"


def resgcn_group_scales(n_layers: int) -> dict[str, float]:
    scales = {f"block_{i}": 0.8 ** (n_layers - i) for i in range(n_layers)}
    scales.update(input=0.5, mid=0.9, head=1.0)
    return scales
