"""Shared graph-NN building blocks (flax) over dense-padded batches.

Re-implements, TPU-first, the reference's torch/PyG layer set
(src/gcn_grabcut/model.py:69-232):

* ``gcn_norm_adjacency`` / ``GCNConv`` — PyG ``GCNConv`` semantics (add
  self-loops + symmetric 1/sqrt(d_i d_j) normalisation, README.md eq 18) as
  one dense ``(N, N)`` adjacency matmul on the MXU per graph.  For superpixel
  graphs (N ≤ ~1k) the dense normalised adjacency is built once per forward
  and shared by all layers; large graphs switch to the segment-CSR path in
  ``ops/spmm.py``.
* ``SAGEConv`` — W_r x + W_l mean_{j∈N(i)} x_j (PyG SAGEConv, eq 20).
* ``GATv2Conv`` — dynamic attention with edge attributes in the kernel
  (GATv2, model.py:323-414), edge-list formulation with per-destination
  segment softmax.
* ``EdgeContext`` — edge features encoded once into a per-node sigmoid gate
  (model.py:111-139), one scatter-mean per forward.
* ``EdgeInjection`` — per-layer edge gate used by the GCN/GAT variants
  (model.py:142-162).
* ``GlobalContext`` — attention-pooled per-graph summary + squeeze-excite
  gate (model.py:165-188), a masked softmax over the node axis.
* ``InputNorm`` — BatchNorm1d-style whitening with running statistics and
  masked batch stats (model.py:191-213), momentum 0.05.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.scatter import masked_softmax, masked_var

KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def dense_adjacency(edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
                    edge_mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """(G, E) edge lists → dense (G, N, N) adjacency, A[g, dst, src] = 1.

    Built once per forward; padded edges contribute zero.
    """
    def one(src, dst, m):
        return jnp.zeros((n, n), jnp.float32).at[dst, src].add(m)
    return jax.vmap(one)(edge_src, edge_dst, edge_mask)


def gcn_norm_adjacency(adj: jnp.ndarray) -> jnp.ndarray:
    """Â = D̂^-1/2 (A + I) D̂^-1/2 with self-loops, PyG GCNConv convention."""
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    a_hat = adj + eye
    deg = jnp.sum(a_hat, axis=-1)                       # (G, N)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    return a_hat * dinv[..., :, None] * dinv[..., None, :]


def mean_adjacency(adj: jnp.ndarray) -> jnp.ndarray:
    """Row-normalised adjacency for mean aggregation (SAGE)."""
    deg = jnp.sum(adj, axis=-1, keepdims=True)
    return adj / jnp.maximum(deg, 1.0)


def _as_aggregate(adj: jnp.ndarray):
    """Wrap a dense (G, N, N) matrix into an aggregation callable."""
    def agg(h):
        return jnp.einsum(
            "gij,gjd->gid", adj.astype(h.dtype), h,
            preferred_element_type=jnp.float32).astype(h.dtype)
    return agg


class GCNConv(nn.Module):
    """PyG-semantics GCN convolution.

    `propagate` is either a dense pre-normalised (G, N, N) adjacency or a
    callable h → aggregated-h (e.g. the banded Pallas SpMM for large
    graphs, ops/spmm.py).
    """
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, propagate) -> jnp.ndarray:
        if not callable(propagate):
            propagate = _as_aggregate(propagate)
        # PyG order: linear (no bias) → propagate → add bias.
        h = nn.Dense(self.features, use_bias=False, kernel_init=KAIMING,
                     dtype=self.dtype)(x)
        out = propagate(h)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + bias.astype(out.dtype)


class SAGEConv(nn.Module):
    """GraphSAGE with mean aggregation: lin_l(mean_nbr) + lin_r(x).

    `propagate` as in GCNConv, but computing the *mean* over in-neighbours.
    """
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, propagate) -> jnp.ndarray:
        if not callable(propagate):
            propagate = _as_aggregate(propagate)
        agg = propagate(x)
        out = nn.Dense(self.features, use_bias=True, kernel_init=KAIMING,
                       dtype=self.dtype, name="lin_l")(agg)
        out = out + nn.Dense(self.features, use_bias=False,
                             kernel_init=KAIMING, dtype=self.dtype,
                             name="lin_r")(x)
        return out


class GATv2Conv(nn.Module):
    """GATv2 with edge attributes, edge-list formulation.

    e_ij = a_h^T LeakyReLU(W_l x_j + W_r x_i + W_e attr_ij); attention is a
    per-destination masked segment softmax; heads are concatenated.  Self
    loops use mean-filled edge attributes (PyG default fill_value="mean")
    and are folded in DENSELY — the loop's score/message for node i is a
    (G, N, H) elementwise term added outside the segment reductions, so the
    scattered edge list stays length E instead of E + N.

    `pre_sorted=True` asserts the edge arrays are already sorted by
    destination (callers that run several attention layers over one graph —
    GATTrimapNet — sort once per forward instead of once per layer); the
    per-node outputs are edge-order independent either way.

    `plan=` (an ``ops.sddmm.GatPlan``, G == 1 only) switches to the banded
    SDDMM formulation: scores dense over the band window, softmax over band
    slots, aggregation as batched MXU matmuls — same math, no per-edge
    gathers/scatters for in-window edges (the 10k+-node path).  Parameters
    are shared between the two formulations, so checkpoints interchange.
    """
    features: int          # per-head output dim
    heads: int = 8
    negative_slope: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_mask,
                 node_mask, pre_sorted: bool = False, plan=None,
                 plan_precision: str = "default"):
        G, N, _ = x.shape
        H, F = self.heads, self.features

        dense = lambda name: nn.Dense(H * F, use_bias=True,
                                      kernel_init=KAIMING, dtype=self.dtype,
                                      name=name)
        xl = dense("lin_l")(x).reshape(G, N, H, F)
        xr = dense("lin_r")(x).reshape(G, N, H, F)

        if plan is not None:
            from ..ops.sddmm import banded_gat_attention
            assert G == 1, "banded attention operates on one graph"
            lin_edge = nn.Dense(H * F, use_bias=False, kernel_init=KAIMING,
                                dtype=self.dtype, name="lin_edge")
            att = self.param("att", KAIMING, (H, F))
            out = banded_gat_attention(
                xl[0], xr[0], plan, lin_edge, att, node_mask[0],
                negative_slope=self.negative_slope,
                precision=plan_precision)
            bias = self.param("bias", nn.initializers.zeros, (H * F,))
            return out.reshape(1, N, H * F) + bias.astype(out.dtype)
        # Mean edge attribute per graph for the self-loop fill.
        em = edge_mask[..., None]
        attr_mean = (jnp.sum(edge_attr * em, axis=1, keepdims=True)
                     / jnp.maximum(jnp.sum(em, axis=1, keepdims=True), 1.0))
        lin_edge = nn.Dense(H * F, use_bias=False, kernel_init=KAIMING,
                            dtype=self.dtype, name="lin_edge")
        ea = lin_edge(edge_attr).reshape(G, -1, H, F)
        ea_loop = lin_edge(attr_mean).reshape(G, 1, H, F)

        att = self.param("att", KAIMING, (H, F))

        def per_graph(xl_g, xr_g, src_g, dst_g, ea_g, m_g, nm_g, eal_g):
            if not pre_sorted:
                # Destination-sort so the segment reductions take the
                # sorted-scatter lowering (unsorted scatters both run and
                # COMPILE pathologically on this backend — see ops/spmm.py).
                order = jnp.argsort(dst_g)
                src_g, dst_g = src_g[order], dst_g[order]
                ea_g, m_g = ea_g[order], m_g[order]
            z = xl_g[src_g] + xr_g[dst_g] + ea_g          # (E, H, F)
            z = nn.leaky_relu(z, self.negative_slope)
            score = jnp.einsum("ehf,hf->eh", z, att.astype(z.dtype))
            # Self-loop score, dense: z_ii = LeakyReLU(xl_i + xr_i + ea_mean).
            zl = nn.leaky_relu(xl_g + xr_g + eal_g, self.negative_slope)
            sl = jnp.einsum("nhf,hf->nh", zl,
                            att.astype(zl.dtype)).astype(jnp.float32)
            sl = jnp.where(nm_g[:, None] > 0, sl, -1e30)
            # Per-destination softmax over {edges into i} ∪ {loop i},
            # fp32 island.
            s = score.astype(jnp.float32)
            s = jnp.where(m_g[:, None] > 0, s, -1e30)
            peak = jax.ops.segment_max(s, dst_g, num_segments=N,
                                       indices_are_sorted=True)
            peak = jnp.maximum(jnp.where(jnp.isfinite(peak), peak, -1e30),
                               sl)
            ex = jnp.exp(s - peak[dst_g]) * m_g[:, None]
            exl = jnp.exp(sl - peak) * nm_g[:, None]       # (N, H)
            tot = jax.ops.segment_sum(ex, dst_g, num_segments=N,
                                      indices_are_sorted=True) + exl
            alpha = (ex / (tot[dst_g] + 1e-12)).astype(z.dtype)
            alpha_l = (exl / (tot + 1e-12)).astype(z.dtype)
            # Flat (E, H·F) messages: the 3-D (E, H, F) segment_sum lowers
            # ~6x slower on this backend than the same reduction with the
            # head axis folded into the minor dim (see ops/sddmm.py).
            msg = (xl_g[src_g].reshape(-1, H * F)
                   * jnp.repeat(alpha, F, axis=1))
            out = jax.ops.segment_sum(msg, dst_g, num_segments=N,
                                      indices_are_sorted=True)
            return out.reshape(N, H, F) + xl_g * alpha_l[..., None]

        out = jax.vmap(per_graph)(xl, xr, edge_src, edge_dst, ea, edge_mask,
                                  node_mask,
                                  jnp.broadcast_to(ea_loop, (G, 1, H, F)))
        out = out.reshape(G, N, H * F)
        bias = self.param("bias", nn.initializers.zeros, (H * F,))
        return out + bias.astype(out.dtype)


class EdgeContext(nn.Module):
    """Edge features → per-node multiplicative gate, computed once."""
    hidden_dim: int
    ctx_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, edge_attr, edge_dst, edge_mask, n_nodes):
        ctx_dim = self.ctx_dim or max(self.hidden_dim // 2, 8)
        h = nn.Dense(ctx_dim, kernel_init=KAIMING, dtype=self.dtype)(edge_attr)
        h = nn.gelu(h)
        h = nn.Dense(ctx_dim, kernel_init=KAIMING, dtype=self.dtype)(h)

        def scatter_mean_g(vals, dst, m):
            # dst-sorted scatter: unsorted segment sums compile and run
            # pathologically on this backend at 10k+-node edge counts.
            order = jnp.argsort(dst)
            vals, dst, m = vals[order], dst[order], m[order]
            w = m[:, None]
            tot = jax.ops.segment_sum(vals * w, dst, num_segments=n_nodes,
                                      indices_are_sorted=True)
            cnt = jax.ops.segment_sum(m, dst, num_segments=n_nodes,
                                      indices_are_sorted=True)
            return tot / jnp.maximum(cnt, 1.0)[:, None]

        ctx = jax.vmap(scatter_mean_g)(h, edge_dst, edge_mask)
        ctx = nn.LayerNorm(dtype=self.dtype)(ctx)
        gate = nn.Dense(self.hidden_dim, kernel_init=KAIMING,
                        dtype=self.dtype)(ctx)
        return nn.sigmoid(gate)


class EdgeInjection(nn.Module):
    """Per-layer edge gate (reference EdgeInjectionLayer, model.py:142-162)."""
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, edge_attr, edge_dst, edge_mask, node_updates,
                 pre_sorted: bool = False):
        n_nodes = node_updates.shape[1]
        h = nn.Dense(self.hidden_dim, kernel_init=KAIMING,
                     dtype=self.dtype)(edge_attr)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, kernel_init=KAIMING, dtype=self.dtype)(h)
        h = nn.sigmoid(h)

        def scatter_mean_g(vals, dst, m):
            if not pre_sorted:
                # dst-sorted scatter: unsorted segment sums compile and run
                # pathologically on this backend at 10k+-node edge counts.
                order = jnp.argsort(dst)
                vals, dst, m = vals[order], dst[order], m[order]
            w = m[:, None]
            tot = jax.ops.segment_sum(vals * w, dst, num_segments=n_nodes,
                                      indices_are_sorted=True)
            cnt = jax.ops.segment_sum(m, dst, num_segments=n_nodes,
                                      indices_are_sorted=True)
            return tot / jnp.maximum(cnt, 1.0)[:, None]

        gates = jax.vmap(scatter_mean_g)(h, edge_dst, edge_mask)
        return node_updates * gates.astype(node_updates.dtype)


class GlobalContext(nn.Module):
    """Attention-pooled per-graph summary → squeeze-excite node gating."""
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, node_mask):
        w = nn.Dense(1, kernel_init=KAIMING, dtype=self.dtype,
                     name="attn")(x)                       # (G, N, 1)
        w = masked_softmax(w[..., 0], node_mask, axis=1)[..., None]
        g = jnp.sum(w.astype(x.dtype) * x, axis=1, keepdims=True)  # (G, 1, D)
        g = nn.relu(nn.Dense(self.hidden_dim // 2, kernel_init=KAIMING,
                             dtype=self.dtype, name="compress")(g))
        g = nn.sigmoid(nn.Dense(self.hidden_dim, kernel_init=KAIMING,
                                dtype=self.dtype, name="expand")(g))
        return x * g


class InputNorm(nn.Module):
    """Masked BatchNorm1d analog with running statistics (momentum 0.05).

    Batch statistics are computed over *valid* nodes only.  When fewer than
    two valid nodes are present during training, the stored statistics are
    used instead (reference model.py:204-213).  PyTorch conventions: biased
    variance for normalisation, unbiased for the running update, eps 1e-5.
    """
    n_features: int
    momentum: float = 0.05
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, node_mask, train: bool = False):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.n_features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.n_features))
        gamma = self.param("scale", nn.initializers.ones, (self.n_features,))
        beta = self.param("bias", nn.initializers.zeros, (self.n_features,))

        if train:
            mean, var, count = masked_var(
                x.astype(jnp.float32), node_mask, axis=(0, 1))
            use_batch = count >= 2.0
            mean = jnp.where(use_batch, mean, ra_mean.value)
            var = jnp.where(use_batch, var, ra_var.value)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = jnp.where(
                    use_batch, (1 - m) * ra_mean.value + m * mean,
                    ra_mean.value)
                ra_var.value = jnp.where(
                    use_batch, (1 - m) * ra_var.value + m * unbiased,
                    ra_var.value)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv * gamma + beta
        return y.astype(self.dtype or x.dtype)
