"""Padded, fixed-shape graph containers — the TPU-native analog of the
reference's ``SuperpixelGraph`` / PyG ``Data``/``Batch``.

Design
------
The reference batches ragged graphs by concatenation plus a ``batch`` segment
vector (reference: src/gcn_grabcut/model.py:77-108, trainer.py:272-279).  On
TPU, ragged concatenation forces segment scatter/gather everywhere and defeats
XLA tiling.  Instead every graph is padded to a *static* ``(N, E)`` budget and
batches are dense stacks ``(G, N, F)``:

* per-graph reductions (mean / softmax / dice) become masked axis reductions,
* neighbourhood aggregation becomes a dense ``(N, N)`` adjacency matmul on the
  MXU for typical superpixel graphs (N ≈ 300-1000), with a segment-CSR path
  for large graphs,
* the whole training step is one ``jit`` with zero shape polymorphism.

Because our SLIC front-end uses a fixed grid of K cluster seeds (see
``ops/slic.py``), N == K is exact, not a padding waste: clusters that end up
empty are masked nodes with zero area.

Conventions (shared with the reference):
* trimap labels match OpenCV: BG=0, FG=1, PR_BG=2, PR_FG=3
  (reference: src/gcn_grabcut/model.py:57-60)
* node classes: BG=0, UNK=1, FG=2 (reference: model.py:62-64)
* node features: 16 image dims + 3 prior dims = 19
  (reference: src/gcn_grabcut/graph_builder.py:73-77)
* edge features: 5 dims (reference: graph_builder.py:77)
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# ---------------------------------------------------------------------------
# Constants (mirroring the reference contract, graph_builder.py:73-77 and
# model.py:57-64)
# ---------------------------------------------------------------------------

N_IMAGE_FEATS = 16
N_PRIOR_FEATS = 3
N_NODE_FEATS = N_IMAGE_FEATS + N_PRIOR_FEATS  # 19
N_EDGE_FEATS = 5

TRIMAP_BG = 0       # cv2.GC_BGD
TRIMAP_FG = 1       # cv2.GC_FGD
TRIMAP_PROB_BG = 2  # cv2.GC_PR_BGD
TRIMAP_PROB_FG = 3  # cv2.GC_PR_FGD


class Label(enum.IntEnum):
    """Pixel label constants, OpenCV GrabCut convention — same names and
    values as the reference facade (src/gcn_grabcut/grabcut.py:22-27)."""
    BG_DEFINITE = TRIMAP_BG
    FG_DEFINITE = TRIMAP_FG
    BG_PROBABLE = TRIMAP_PROB_BG
    FG_PROBABLE = TRIMAP_PROB_FG

CLASS_BG = 0
CLASS_UNK = 1
CLASS_FG = 2


@struct.dataclass
class GraphBatch:
    """A dense-padded batch of G graphs, each with static (N, E) budgets.

    Shapes
    ------
    x          : (G, N, F)  float32  node features (F = 19 by default)
    edge_src   : (G, E)     int32    source node index per directed edge
    edge_dst   : (G, E)     int32    destination node index per directed edge
    edge_attr  : (G, E, Fe) float32  edge features (Fe = 5)
    node_mask  : (G, N)     float32  1.0 for real nodes, 0.0 for padding
    edge_mask  : (G, E)     float32  1.0 for real edges, 0.0 for padding
    node_area  : (G, N)     float32  region area as fraction of the image
    fg_ratio   : (G, N)     float32  soft foreground coverage target (or zeros)
    y          : (G, N)     int32    per-node class labels (or zeros)

    Padded edges have src == dst == 0 and edge_mask == 0; every consumer must
    weight by the mask (scatter-adds of masked-out values contribute zero).
    """

    x: jnp.ndarray
    edge_src: jnp.ndarray
    edge_dst: jnp.ndarray
    edge_attr: jnp.ndarray
    node_mask: jnp.ndarray
    edge_mask: jnp.ndarray
    node_area: jnp.ndarray
    fg_ratio: jnp.ndarray
    y: jnp.ndarray

    @property
    def n_graphs(self) -> int:
        return self.x.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.x.shape[1]

    @property
    def max_edges(self) -> int:
        return self.edge_src.shape[1]

    @property
    def n_nodes(self) -> jnp.ndarray:
        """(G,) number of real nodes per graph."""
        return jnp.sum(self.node_mask, axis=1).astype(jnp.int32)

    @property
    def n_edges(self) -> jnp.ndarray:
        """(G,) number of real (directed) edges per graph."""
        return jnp.sum(self.edge_mask, axis=1).astype(jnp.int32)

    def prior(self) -> jnp.ndarray:
        """(G, N, 3) the automatic-prior slice of the node features."""
        return self.x[..., -N_PRIOR_FEATS:]


def make_graph_batch(
    x: np.ndarray | jnp.ndarray,
    edge_src: np.ndarray | jnp.ndarray,
    edge_dst: np.ndarray | jnp.ndarray,
    edge_attr: np.ndarray | jnp.ndarray,
    node_mask: np.ndarray | jnp.ndarray,
    edge_mask: np.ndarray | jnp.ndarray,
    node_area: Optional[np.ndarray] = None,
    fg_ratio: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
) -> GraphBatch:
    """Build a GraphBatch, filling optional supervision fields with zeros."""
    x = jnp.asarray(x, jnp.float32)
    G, N = x.shape[:2]
    node_mask = jnp.asarray(node_mask, jnp.float32)
    if node_area is None:
        counts = jnp.maximum(jnp.sum(node_mask, axis=1, keepdims=True), 1.0)
        node_area = node_mask / counts
    return GraphBatch(
        x=x,
        edge_src=jnp.asarray(edge_src, jnp.int32),
        edge_dst=jnp.asarray(edge_dst, jnp.int32),
        edge_attr=jnp.asarray(edge_attr, jnp.float32),
        node_mask=node_mask,
        edge_mask=jnp.asarray(edge_mask, jnp.float32),
        node_area=jnp.asarray(node_area, jnp.float32),
        fg_ratio=jnp.zeros((G, N), jnp.float32) if fg_ratio is None
        else jnp.asarray(fg_ratio, jnp.float32),
        y=jnp.zeros((G, N), jnp.int32) if y is None
        else jnp.asarray(y, jnp.int32),
    )


def single_graph(
    x, edge_src, edge_dst, edge_attr,
    n_nodes: Optional[int] = None,
    max_nodes: Optional[int] = None,
    max_edges: Optional[int] = None,
    node_area=None, fg_ratio=None, y=None,
) -> GraphBatch:
    """Wrap one (possibly unpadded) graph into a G=1 GraphBatch.

    ``x`` is (n, F); edges are (e,) index vectors.  If ``max_nodes`` /
    ``max_edges`` exceed the actual sizes, the graph is padded with masked
    entries.  This is the bridge from host-side graph construction into the
    static-shape device world.
    """
    x = np.asarray(x, np.float32)
    edge_src = np.asarray(edge_src, np.int64)
    edge_dst = np.asarray(edge_dst, np.int64)
    edge_attr = np.asarray(edge_attr, np.float32)
    n = x.shape[0] if n_nodes is None else n_nodes
    e = edge_src.shape[0]
    N = max_nodes or n
    E = max_edges or max(e, 1)
    assert n <= N and e <= E, (n, N, e, E)

    def pad_rows(a, rows):
        pad = rows - a.shape[0]
        if pad <= 0:
            return a
        return np.concatenate(
            [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    node_mask = np.zeros(N, np.float32)
    node_mask[:n] = 1.0
    edge_mask = np.zeros(E, np.float32)
    edge_mask[:e] = 1.0

    fields = dict(
        x=pad_rows(x, N)[None],
        edge_src=pad_rows(edge_src.astype(np.int32), E)[None],
        edge_dst=pad_rows(edge_dst.astype(np.int32), E)[None],
        edge_attr=pad_rows(edge_attr, E)[None],
        node_mask=node_mask[None],
        edge_mask=edge_mask[None],
    )
    for name, val in (("node_area", node_area), ("fg_ratio", fg_ratio)):
        if val is not None:
            fields[name] = pad_rows(np.asarray(val, np.float32), N)[None]
    if y is not None:
        fields["y"] = pad_rows(np.asarray(y, np.int32), N)[None]
    return make_graph_batch(**fields)


def stack_graphs(graphs: list[GraphBatch]) -> GraphBatch:
    """Stack G=1 batches (with identical static budgets) into one batch."""
    assert graphs, "empty graph list"
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *graphs)


def pad_graph(g: GraphBatch, max_nodes: int, max_edges: int) -> GraphBatch:
    """Grow a batch's static (N, E) budgets; new slots are masked.

    Needed to bucket graphs of different image sizes into one stacked
    training batch (graphs built from the same signature already share
    budgets).
    """
    dn = max_nodes - g.max_nodes
    de = max_edges - g.max_edges
    assert dn >= 0 and de >= 0, (g.max_nodes, max_nodes, g.max_edges,
                                 max_edges)
    if dn == 0 and de == 0:
        return g

    def pad(a, count, axis=1):
        if count == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, count)
        return jnp.pad(a, widths)

    return GraphBatch(
        x=pad(g.x, dn),
        edge_src=pad(g.edge_src, de),
        edge_dst=pad(g.edge_dst, de),
        edge_attr=pad(g.edge_attr, de),
        node_mask=pad(g.node_mask, dn),
        edge_mask=pad(g.edge_mask, de),
        node_area=pad(g.node_area, dn),
        fg_ratio=pad(g.fg_ratio, dn),
        y=pad(g.y, dn),
    )
