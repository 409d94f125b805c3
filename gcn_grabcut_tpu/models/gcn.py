"""GCNTrimapNet — baseline residual GCN with per-layer edge injection.

Reference: src/gcn_grabcut/model.py:216-316 (ResGCNBlock + GCNTrimapNet).
Structure: InputNorm → Linear/BN/ReLU projection → n ResGCNBlocks
(GCNConv → BN → ReLU → dropout → +skip → edge-inject) → concat-all head.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.graph import GraphBatch
from .layers import (
    KAIMING, GCNConv, EdgeInjection, InputNorm,
    dense_adjacency, gcn_norm_adjacency,
)


class GCNTrimapNet(nn.Module):
    in_channels: int = 19
    edge_channels: int = 5
    hidden_channels: int = 128
    n_layers: int = 6
    n_classes: int = 3
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    # Accepts SpMM aggregators for the 10k+-node path (models/large.py).
    supports_spmm_aggregators = True

    @nn.compact
    def __call__(self, g: GraphBatch, train: bool = False,
                 aggregators=None) -> jnp.ndarray:
        """`aggregators`: optional (gcn_propagate, mean_propagate) callables
        replacing the dense adjacency (the banded-SpMM large-graph path);
        only the GCN propagation is used by this variant."""
        D = self.hidden_channels
        N = g.max_nodes
        dense = lambda feats, name: nn.Dense(
            feats, kernel_init=KAIMING, dtype=self.dtype, name=name)
        drop = nn.Dropout(self.dropout, deterministic=not train)

        h = InputNorm(self.in_channels, momentum=0.05, dtype=self.dtype,
                      name="in_norm")(g.x, g.node_mask, train=train)
        h = dense(D, "input_proj")(h)
        h = InputNorm(D, momentum=0.1, dtype=self.dtype,
                      name="input_bn")(h, g.node_mask, train=train)
        h = nn.relu(h)

        if aggregators is not None:
            adj_gcn, _ = aggregators
        else:
            adj = dense_adjacency(g.edge_src, g.edge_dst, g.edge_mask, N)
            adj_gcn = gcn_norm_adjacency(adj)

        # One dst-sort shared by every layer's edge gate (see gat.py).
        order = jnp.argsort(g.edge_dst, axis=1)
        e_dst = jnp.take_along_axis(g.edge_dst, order, axis=1)
        e_attr = jnp.take_along_axis(g.edge_attr, order[..., None], axis=1)
        e_mask = jnp.take_along_axis(g.edge_mask, order, axis=1)

        all_h = [h]
        for i in range(self.n_layers):
            u = GCNConv(D, dtype=self.dtype, name=f"gcn_{i}")(h, adj_gcn)
            u = InputNorm(D, momentum=0.1, dtype=self.dtype,
                          name=f"bn_{i}")(u, g.node_mask, train=train)
            u = nn.relu(u)
            u = drop(u)
            u = u + h  # same-width skip (reference uses Identity here)
            u = EdgeInjection(D, dtype=self.dtype, name=f"edge_{i}")(
                e_attr, e_dst, e_mask, u, pre_sorted=True)
            h = u
            all_h.append(h)

        cat = jnp.concatenate(all_h, axis=-1)      # (G, N, D*(n+1))
        out = dense(D, "head_fc1")(cat)
        out = InputNorm(D, momentum=0.1, dtype=self.dtype,
                        name="head_bn")(out, g.node_mask, train=train)
        out = nn.relu(out)
        out = drop(out)
        out = nn.relu(dense(D // 2, "head_fc2")(out))
        return dense(self.n_classes, "head_fc3")(out)
