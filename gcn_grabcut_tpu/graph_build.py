"""End-to-end superpixel graph construction: image → GraphBatch, one jit.

TPU-native counterpart of the reference ``GraphBuilder``
(src/gcn_grabcut/graph_builder.py:131-355).  The entire front-end — colour
conversion, gradients, SLIC, region statistics, feature assembly, edge
extraction, saliency prior — is a single fused, fixed-shape XLA program per
(H, W, n_segments, connectivity, n_nonlocal) signature.  Per-signature
compilation is cached by jit.

The node count is the static SLIC grid size K (empty clusters are masked
nodes), and edge budgets are static (4K adjacency + K*n_nonlocal non-local
undirected pairs, stored symmetric → E = 2*(4K + K*n_nl)).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.graph import GraphBatch, make_graph_batch, N_NODE_FEATS
from .ops import image as im
from .ops import slic as slic_ops
from .ops import region as region_ops
from .ops import edges as edge_ops
from .ops import prior as prior_ops


@dataclasses.dataclass(frozen=True)
class SuperpixelGraphConfig:
    """Mirror of the reference config (graph_builder.py:64-71)."""
    n_segments: int = 300
    compactness: float = 10.0
    sigma: float = 1.0
    use_lab: bool = True
    connectivity: int = 4
    n_nonlocal: int = 4
    slic_iters: int = 10
    # Opt-in geodesic boundary-connectivity background cue (frame/low-key
    # robust; ops/prior.boundary_connectivity_bg).  Off by default for
    # reference parity (graph_builder.py:357-444 has no such cue).
    bg_connectivity: bool = False


@dataclasses.dataclass
class RegionGraph:
    """Host-side view of one built graph (the `SuperpixelGraph` analog)."""
    segments: np.ndarray          # (H, W) int32
    graph: GraphBatch             # G=1 padded batch; x = 16 image + 3 prior
    centroids: np.ndarray         # (K, 2) normalised (y, x)
    prior: np.ndarray             # (K, 3)
    n_nodes: int                  # static K (valid count <= K)

    @property
    def node_mask(self) -> np.ndarray:
        return np.asarray(self.graph.node_mask[0])

    @property
    def node_areas(self) -> np.ndarray:
        return np.asarray(self.graph.node_area[0])

    def node_input(self) -> np.ndarray:
        """Full (K, 19) node input = 16 image features ‖ 3-d prior
        (the analog of reference SuperpixelGraph.node_input,
        graph_builder.py:93-98; here the prior is already concatenated)."""
        return np.asarray(self.graph.x[0])

    def edges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(edge_index (2, E_valid), edge_attr (E_valid, 5)) over valid
        edges only."""
        em = np.asarray(self.graph.edge_mask[0]) > 0
        src = np.asarray(self.graph.edge_src[0])[em]
        dst = np.asarray(self.graph.edge_dst[0])[em]
        attr = np.asarray(self.graph.edge_attr[0])[em]
        return np.stack([src, dst]), attr, em

    def to_networkx(self):
        """Export the valid subgraph to networkx (undirected), with `feat`
        node attributes — mirror of graph_builder.py:100-108."""
        import networkx as nx
        x = self.node_input()
        mask = self.node_mask > 0
        G = nx.Graph()
        for i in np.nonzero(mask)[0]:
            G.add_node(int(i), feat=x[i])
        edge_index, attr, _ = self.edges()
        for (s, d), a in zip(edge_index.T, attr):
            if s < d:
                G.add_edge(int(s), int(d), attr=a)
        return G

    def to_torch(self) -> dict:
        """Export to torch tensors in the PyG Data layout (x, edge_index,
        edge_attr, node_area) for interop / parity harnesses — the analog
        of SuperpixelGraph.to_pyg (graph_builder.py:110-129)."""
        import torch
        edge_index, attr, _ = self.edges()
        return dict(
            x=torch.tensor(self.node_input(), dtype=torch.float32),
            edge_index=torch.tensor(edge_index, dtype=torch.long),
            edge_attr=torch.tensor(attr, dtype=torch.float32),
            node_area=torch.tensor(self.node_areas, dtype=torch.float32),
        )


def num_nodes_for(h: int, w: int, cfg: SuperpixelGraphConfig) -> int:
    return slic_ops.slic_num_labels(h, w, cfg.n_segments)


def edge_budget_for(h: int, w: int, cfg: SuperpixelGraphConfig) -> int:
    k = num_nodes_for(h, w, cfg)
    und = edge_ops.adjacency_budget(k, cfg.connectivity) + edge_ops.nonlocal_budget(
        k, max(cfg.n_nonlocal, 1))
    return 2 * und


@functools.partial(
    jax.jit,
    static_argnames=("n_segments", "compactness", "sigma", "connectivity",
                     "n_nonlocal", "slic_iters", "bg_connectivity"))
def _build_graph_arrays(rgb: jnp.ndarray, n_segments: int, compactness: float,
                        sigma: float, connectivity: int, n_nonlocal: int,
                        slic_iters: int, bg_connectivity: bool = False):
    """The fused device program.  rgb: (H, W, 3) float32 in 0..255."""
    H, W, _ = rgb.shape
    k = slic_ops.slic_num_labels(H, W, n_segments)

    lab = im.rgb_to_lab(rgb)
    hsv = im.rgb_to_hsv(rgb)
    gray = im.rgb_to_gray(rgb)
    grad = im.gradient_magnitude(gray)

    segments = slic_ops.slic(lab, n_segments=n_segments,
                             compactness=compactness, n_iter=slic_iters,
                             smooth_sigma=sigma)

    st = region_ops.region_statistics(segments, lab, hsv, grad, k)
    node_feats = region_ops.assemble_node_features(st)

    adj_pairs, shared, adj_mask = edge_ops.adjacency_pairs(
        segments, k, connectivity)
    adj_attr = edge_ops.pair_features(
        adj_pairs, adj_mask, st, shared, jnp.zeros_like(shared))

    nl_k = max(n_nonlocal, 1)
    if k > prior_ops.LARGE_K_THRESHOLD:
        # 10k+-superpixel configuration (SURVEY §5.7): blocked k-NN with
        # index-window adjacency exclusion (SLIC grid order bounds
        # adjacent labels to ±(gw+1)).
        _, gw = slic_ops.grid_shape(H, W, n_segments)
        nl_pairs, nl_mask = edge_ops.nonlocal_pairs_banded(
            st["mean_lab"], st["valid"], k, nl_k, exclude_window=gw + 1)
    else:
        nl_pairs, nl_mask = edge_ops.nonlocal_pairs(
            adj_pairs, adj_mask, st["mean_lab"], st["valid"], k, nl_k)
    if n_nonlocal <= 0:
        nl_mask = jnp.zeros_like(nl_mask)
    nl_attr = edge_ops.pair_features(
        nl_pairs, nl_mask, st, jnp.zeros_like(nl_mask),
        jnp.ones_like(nl_mask))

    pairs = jnp.concatenate([adj_pairs, nl_pairs], axis=0)
    attr = jnp.concatenate([adj_attr, nl_attr], axis=0)
    mask = jnp.concatenate([adj_mask, nl_mask], axis=0)
    src, dst, attr, emask = edge_ops.symmetrise(pairs, attr, mask)

    # Reuse region_statistics' moments: the prior's own segment passes are
    # several extra O(HW) scatters per image (~80 ms per 8-image batch).
    # geo_iters covers the region-grid diameter (~2·sqrt(K) hops).
    geo_iters = min(int(2 * k ** 0.5) + 8, 96) if bg_connectivity else 0
    pr = prior_ops.compute_auto_prior(
        segments, lab, k,
        stats=(st["counts"], st["mean_lab"], st["centroids"]),
        adjacency=(adj_pairs, adj_mask) if bg_connectivity else None,
        geo_iters=geo_iters)

    x = jnp.concatenate([node_feats, pr], axis=1)    # (K, 19)
    return dict(
        segments=segments,
        x=x,
        edge_src=src, edge_dst=dst, edge_attr=attr, edge_mask=emask,
        node_mask=st["valid"],
        node_area=st["area_ratio"],
        centroids=st["centroids"],
        prior=pr,
        counts=st["counts"],
    )


def build_graph_batch_arrays(rgbs: jnp.ndarray,
                             config: Optional[SuperpixelGraphConfig] = None
                             ) -> dict:
    """Device-resident batched build: (B, H, W, 3) float32 RGB → dict of
    batched arrays (B leading axis), one fused vmapped program, no host
    pulls.  The batched pipeline composes this with the model forward and
    GrabCut without leaving the device."""
    cfg = config or SuperpixelGraphConfig()
    return _build_graph_batch_jit(
        rgbs, cfg.n_segments, cfg.compactness, cfg.sigma, cfg.connectivity,
        cfg.n_nonlocal, cfg.slic_iters, cfg.bg_connectivity)


@functools.partial(
    jax.jit,
    static_argnames=("n_segments", "compactness", "sigma", "connectivity",
                     "n_nonlocal", "slic_iters", "bg_connectivity"))
def _build_graph_batch_jit(rgbs, n_segments, compactness, sigma,
                           connectivity, n_nonlocal, slic_iters,
                           bg_connectivity=False):
    # One cached jit around the vmap: an eager vmap-of-jit re-dispatches
    # every primitive per call (~0.5-4 ms each over the tunnel).
    def one(rgb):
        return _build_graph_arrays(rgb, n_segments, compactness, sigma,
                                   connectivity, n_nonlocal, slic_iters,
                                   bg_connectivity)

    return jax.vmap(one)(rgbs)


def build_graph(image: np.ndarray,
                config: Optional[SuperpixelGraphConfig] = None
                ) -> RegionGraph:
    """Build the full attributed superpixel graph for one RGB image.

    `image`: (H, W, 3) uint8 RGB (note: the reference consumes BGR from cv2;
    this framework standardises on RGB at the API boundary).
    """
    cfg = config or SuperpixelGraphConfig()
    # Upload in the image's native dtype (uint8 for photos) and cast on
    # device — a host-side float32 conversion quadruples the h2d bytes.
    rgb = jnp.asarray(image).astype(jnp.float32)
    out = _build_graph_arrays(
        rgb, cfg.n_segments, cfg.compactness, cfg.sigma, cfg.connectivity,
        cfg.n_nonlocal, cfg.slic_iters, cfg.bg_connectivity)

    k = out["x"].shape[0]
    batch = make_graph_batch(
        x=out["x"][None],
        edge_src=out["edge_src"][None],
        edge_dst=out["edge_dst"][None],
        edge_attr=out["edge_attr"][None],
        node_mask=out["node_mask"][None],
        edge_mask=out["edge_mask"][None],
        node_area=out["node_area"][None],
    )
    return RegionGraph(
        # K << 65536: pull the label map as uint16 (halves the d2h bytes).
        segments=np.asarray(
            out["segments"].astype(jnp.uint16)).astype(np.int32),
        graph=batch,
        centroids=np.asarray(out["centroids"]),
        prior=np.asarray(out["prior"]),
        n_nodes=k,
    )


# ---------------------------------------------------------------------------
# Facade parity with the reference's class-based builder
# (src/gcn_grabcut/graph_builder.py GraphBuilder / SuperpixelGraph,
# re-exported at package top level, __init__.py:11-15).  This framework's
# native surface is the functional `build_graph`; the class form wraps it.
# ---------------------------------------------------------------------------

SuperpixelGraph = RegionGraph


class GraphBuilder:
    """`GraphBuilder(image, config).build()` → :class:`RegionGraph`.

    `image` is (H, W, 3) uint8 RGB (the reference consumes BGR from cv2;
    this framework standardises on RGB at the API boundary).
    """

    def __init__(self, image: np.ndarray,
                 config: Optional[SuperpixelGraphConfig] = None):
        self.image = image
        self.config = config or SuperpixelGraphConfig()

    def build(self) -> RegionGraph:
        return build_graph(self.image, self.config)
