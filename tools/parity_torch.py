"""Per-layer numerical parity harness: JAX layers vs an independent torch
edge-list implementation with *shared weights*.

BASELINE.json's acceptance gate is "per-layer GCN activations match the
PyTorch-Geometric reference (allclose)".  torch-geometric is not installed
in this image, so this harness implements PyG's documented layer semantics
directly in torch (GCNConv: self-loops + symmetric normalisation, linear
before propagate, bias after; SAGEConv: lin_l(mean_nbr) + lin_r(x); GATv2:
LeakyReLU attention with edge attrs + per-destination softmax + mean-filled
self-loops), loads the *same* weights into both sides, and reports the
max abs deviation per layer.

Run:  python tools/parity_torch.py          (exit code 0 iff all pass)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch

from gcn_grabcut_tpu.models.layers import (
    GCNConv, SAGEConv, GATv2Conv, dense_adjacency, gcn_norm_adjacency,
    mean_adjacency)

ATOL = 2e-5


def make_graph(n=50, seed=0):
    r = np.random.RandomState(seed)
    pairs = set()
    while len(pairs) < 3 * n:
        a, b = r.randint(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
    x = r.randn(n, 16).astype(np.float32)
    attr = r.rand(len(src), 5).astype(np.float32)
    return x, src, dst, attr


def check(name, ours, theirs):
    err = float(np.abs(np.asarray(ours) - np.asarray(theirs)).max())
    status = "OK " if err < ATOL else "FAIL"
    print(f"  [{status}] {name:<22} max|Δ| = {err:.2e}")
    return err < ATOL


def torch_gcn_conv(x, src, dst, W, b):
    """PyG GCNConv semantics in plain torch."""
    n = x.shape[0]
    h = x @ W                                    # lin (no bias)
    deg = torch.zeros(n).index_add_(0, torch.as_tensor(dst),
                                    torch.ones(len(dst))) + 1.0
    dis = deg.rsqrt()
    out = torch.zeros_like(h)
    msg = h[torch.as_tensor(src)] * (dis[src] * dis[dst])[:, None]
    out.index_add_(0, torch.as_tensor(dst), msg)
    out = out + h * (dis ** 2)[:, None]          # self loop
    return out + b


def torch_sage_conv(x, src, dst, Wl, bl, Wr):
    n = x.shape[0]
    agg = torch.zeros_like(x)
    agg.index_add_(0, torch.as_tensor(dst), x[torch.as_tensor(src)])
    cnt = torch.zeros(n).index_add_(0, torch.as_tensor(dst),
                                    torch.ones(len(dst))).clamp(min=1)
    agg = agg / cnt[:, None]
    return agg @ Wl + bl + x @ Wr


def torch_gatv2_conv(x, src, dst, attr, Wl, bl_, Wr, br_, We, att, bias,
                     heads, fdim, slope=0.2):
    n = x.shape[0]
    # self loops with mean-filled edge attrs (PyG fill_value="mean")
    loops = np.arange(n)
    src = np.concatenate([src, loops])
    dst = np.concatenate([dst, loops])
    attr_t = torch.as_tensor(np.concatenate(
        [attr, np.repeat(attr.mean(0, keepdims=True), n, 0)]),
        dtype=torch.float32)
    xl = (x @ Wl + bl_).reshape(n, heads, fdim)
    xr = (x @ Wr + br_).reshape(n, heads, fdim)
    ea = (attr_t @ We).reshape(-1, heads, fdim)
    z = xl[torch.as_tensor(src)] + xr[torch.as_tensor(dst)] + ea
    z = torch.nn.functional.leaky_relu(z, slope)
    score = torch.einsum("ehf,hf->eh", z, att)
    # per-destination softmax
    out = torch.zeros(n, heads, fdim)
    for h_ in range(heads):
        s = score[:, h_]
        peak = torch.full((n,), -1e30).index_reduce_(
            0, torch.as_tensor(dst), s, "amax", include_self=True)
        ex = torch.exp(s - peak[dst])
        tot = torch.zeros(n).index_add_(0, torch.as_tensor(dst), ex)
        alpha = ex / (tot[dst] + 1e-12)
        msg = xl[torch.as_tensor(src), h_] * alpha[:, None]
        out[:, h_].index_add_(0, torch.as_tensor(dst), msg)
    return out.reshape(n, heads * fdim) + bias


def main():
    x_np, src, dst, attr = make_graph()
    n = x_np.shape[0]
    ok = True

    print("Per-layer parity (shared weights), torch edge-list vs JAX dense:")

    # ----- GCNConv ----------------------------------------------------
    conv = GCNConv(features=24)
    g1 = jnp.asarray(x_np)[None]
    adj = gcn_norm_adjacency(dense_adjacency(
        jnp.asarray(src)[None], jnp.asarray(dst)[None],
        jnp.ones((1, len(src))), n))
    vars_ = conv.init(jax.random.PRNGKey(0), g1, adj)
    ours = conv.apply(vars_, g1, adj)[0]
    W = torch.as_tensor(np.asarray(vars_["params"]["Dense_0"]["kernel"]))
    b = torch.as_tensor(np.asarray(vars_["params"]["bias"]))
    theirs = torch_gcn_conv(torch.as_tensor(x_np), src, dst, W, b)
    ok &= check("GCNConv", ours, theirs.numpy())

    # ----- SAGEConv ---------------------------------------------------
    sage = SAGEConv(features=16)
    adj_m = mean_adjacency(dense_adjacency(
        jnp.asarray(src)[None], jnp.asarray(dst)[None],
        jnp.ones((1, len(src))), n))
    vars_ = sage.init(jax.random.PRNGKey(1), g1, adj_m)
    ours = sage.apply(vars_, g1, adj_m)[0]
    Wl = torch.as_tensor(np.asarray(vars_["params"]["lin_l"]["kernel"]))
    bl = torch.as_tensor(np.asarray(vars_["params"]["lin_l"]["bias"]))
    Wr = torch.as_tensor(np.asarray(vars_["params"]["lin_r"]["kernel"]))
    theirs = torch_sage_conv(torch.as_tensor(x_np), src, dst, Wl, bl, Wr)
    ok &= check("SAGEConv", ours, theirs.numpy())

    # ----- GATv2Conv --------------------------------------------------
    heads, fdim = 4, 8
    gat = GATv2Conv(features=fdim, heads=heads)
    es = jnp.asarray(src)[None]
    ed = jnp.asarray(dst)[None]
    ea = jnp.asarray(attr)[None]
    em = jnp.ones((1, len(src)))
    nm = jnp.ones((1, n))
    vars_ = gat.init(jax.random.PRNGKey(2), g1, es, ed, ea, em, nm)
    ours = gat.apply(vars_, g1, es, ed, ea, em, nm)[0]
    p = vars_["params"]
    theirs = torch_gatv2_conv(
        torch.as_tensor(x_np), src, dst, attr,
        torch.as_tensor(np.asarray(p["lin_l"]["kernel"])),
        torch.as_tensor(np.asarray(p["lin_l"]["bias"])),
        torch.as_tensor(np.asarray(p["lin_r"]["kernel"])),
        torch.as_tensor(np.asarray(p["lin_r"]["bias"])),
        torch.as_tensor(np.asarray(p["lin_edge"]["kernel"])),
        torch.as_tensor(np.asarray(p["att"])),
        torch.as_tensor(np.asarray(p["bias"])),
        heads, fdim)
    ok &= check("GATv2Conv", ours, theirs.numpy())

    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
