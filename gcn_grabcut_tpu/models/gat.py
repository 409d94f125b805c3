"""GATTrimapNet — GATv2 attention variant with edge-aware kernels.

Reference: src/gcn_grabcut/model.py:323-414.  n layers of
GATv2Conv(heads=8, edge_dim=5) + LayerNorm + GELU + dropout + edge gate,
with a global input skip, attention-pooled global context, and a small head.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.graph import GraphBatch
from .layers import (
    KAIMING, GATv2Conv, EdgeInjection, GlobalContext, InputNorm,
)


class GATTrimapNet(nn.Module):
    in_channels: int = 19
    edge_channels: int = 5
    hidden_channels: int = 128
    n_heads: int = 8
    n_layers: int = 5
    n_classes: int = 3
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    # 10k+-node path: models/large.py builds an ops.sddmm.GatPlan and passes
    # it as `gat_plan`; attention then runs banded (scores dense over the
    # window, softmax over band slots) instead of over the edge list.
    supports_banded_attention = True

    @nn.compact
    def __call__(self, g: GraphBatch, train: bool = False,
                 gat_plan=None,
                 gat_precision: str = "default") -> jnp.ndarray:
        D = self.hidden_channels
        head_dim = D // self.n_heads
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, kernel_init=KAIMING, dtype=self.dtype,
            name=name)
        drop = nn.Dropout(self.dropout, deterministic=not train)

        h = InputNorm(self.in_channels, momentum=0.05, dtype=self.dtype,
                      name="in_norm")(g.x, g.node_mask, train=train)
        h = dense(D, "input_proj")(h)
        h = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="input_ln")(h))

        skip = dense(head_dim * self.n_heads, "skip_proj", bias=False)(h)

        # Destination-sort the edge list ONCE per forward: every layer's
        # segment reductions (attention softmax + edge gates) then take the
        # sorted-scatter lowering without paying a per-layer argsort
        # (2 E log E sorts per layer — the dominant non-matmul cost at
        # 10k+ nodes).  Per-node outputs are edge-order independent.
        order = jnp.argsort(g.edge_dst, axis=1)
        take = lambda a: jnp.take_along_axis(
            a, order[..., None] if a.ndim == 3 else order, axis=1)
        e_src, e_dst = take(g.edge_src), take(g.edge_dst)
        e_attr, e_mask = take(g.edge_attr), take(g.edge_mask)

        for i in range(self.n_layers):
            u = GATv2Conv(head_dim, heads=self.n_heads, dtype=self.dtype,
                          name=f"gat_{i}")(
                h, e_src, e_dst, e_attr, e_mask, g.node_mask,
                pre_sorted=True, plan=gat_plan,
                plan_precision=gat_precision)
            u = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(u)
            u = nn.gelu(u)
            u = drop(u)
            u = EdgeInjection(u.shape[-1], dtype=self.dtype,
                              name=f"edge_{i}")(
                e_attr, e_dst, e_mask, u, pre_sorted=True)
            h = u

        h = h + skip
        h = GlobalContext(h.shape[-1], dtype=self.dtype,
                          name="ctx")(h, g.node_mask)
        out = nn.gelu(dense(D, "head_fc1")(h))
        out = drop(out)
        return dense(self.n_classes, "head_fc2")(out)
