"""Benchmark: ResGCNNet forward message-passing throughput (edges/s) on the
available accelerator vs a torch-CPU edge-list implementation of the same
architecture (the stand-in for the reference's PyG-CPU path, which uses the
same scatter-based kernels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

vs_baseline is ours / torch-CPU.  BASELINE.json's target is >= 5x PyG-CPU
edges/s per chip.

Workload: 32 graphs x 512 nodes x ~4000 directed edges (the shape of a
500-superpixel DUTS graph batch), ResGCNNet D=128 n=6, bf16 on TPU.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

G, N, E_VALID, D, LAYERS = 32, 512, 4000, 128, 6


def make_edges(seed=0):
    """A connected, symmetric random graph with E_VALID directed edges."""
    r = np.random.RandomState(seed)
    half = E_VALID // 2
    src = np.concatenate([np.arange(N - 1),
                          r.randint(0, N, half - (N - 1))])
    dst = np.concatenate([np.arange(1, N),
                          r.randint(0, N, half - (N - 1))])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    return (np.concatenate([src, dst]).astype(np.int64),
            np.concatenate([dst, src]).astype(np.int64))


def bench_jax():
    import jax
    from gcn_grabcut_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    from gcn_grabcut_tpu.core.graph import single_graph, stack_graphs
    from gcn_grabcut_tpu.models import build_model, init_model

    r = np.random.RandomState(0)
    graphs = []
    for g in range(G):
        src, dst = make_edges(seed=g)
        x = r.randn(N, 19).astype(np.float32)
        attr = r.rand(len(src), 5).astype(np.float32)
        graphs.append(single_graph(x, src, dst, attr, max_nodes=N,
                                   max_edges=E_VALID))
    batch = stack_graphs(graphs)
    e_valid = float(np.asarray(batch.edge_mask).sum())

    model = build_model("resgcn", hidden_channels=D, n_layers=LAYERS,
                        dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), batch)

    # Slope timing: this tunnel-attached backend adds ~0.5-4 ms of
    # per-dispatch/loop-iteration overhead that is NOT device compute (a
    # production server pipelines dispatches, so steady-state throughput
    # is the marginal cost).  Forwards are chained data-dependently inside
    # one jit (output perturbs the next input, so nothing can be elided or
    # deduped) and the per-forward time is the marginal cost between
    # bodies with 5 chained forwards and 1.
    import dataclasses

    def time_chain(reps, iters=20):
        @jax.jit
        def chain(v, b):
            def body(_, bb):
                for _ in range(reps):
                    out = model.apply(v, bb, train=False)
                    delta = (jnp.tanh(out.sum()) * 1e-6).astype(bb.x.dtype)
                    bb = dataclasses.replace(bb, x=bb.x + delta)
                return bb
            return jax.lax.fori_loop(0, iters, body, b).x

        chain(variables, batch).block_until_ready()   # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            chain(variables, batch).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # Two independent slope measurements; keep the better one (the shared
    # chip carries tenancy noise of up to ~2x).
    per_fwd = float("inf")
    for _ in range(2):
        t1 = time_chain(1)
        t5 = time_chain(5)
        per_fwd = min(per_fwd, max((t5 - t1) / 4, 1e-9))
    return e_valid / per_fwd, per_fwd, e_valid


def bench_torch_cpu(e_valid):
    """Edge-list scatter implementation of the same forward in torch CPU —
    the same kernel class PyG's GCNConv/SAGEConv use."""
    import torch
    torch.set_num_threads(max(1, torch.get_num_threads()))

    r = np.random.RandomState(0)
    src_np, dst_np = make_edges(0)
    E = len(src_np)

    # One big concatenated batch, PyG-style.
    x = torch.randn(G * N, 19)
    src = torch.cat([torch.as_tensor(src_np) + g * N for g in range(G)])
    dst = torch.cat([torch.as_tensor(dst_np) + g * N for g in range(G)])
    attr = torch.rand(G * E, 5)
    gid = torch.arange(G).repeat_interleave(N)

    deg = torch.zeros(G * N).index_add_(
        0, dst, torch.ones(G * E)) + 1.0
    dis = deg.rsqrt()

    Wp = torch.randn(19, D) * 0.1
    Wg = [torch.randn(D, D) * 0.1 for _ in range(LAYERS)]
    We1 = torch.randn(5, D // 2) * 0.1
    We2 = torch.randn(D // 2, D) * 0.1
    Ws1 = torch.randn(D, D) * 0.1
    Ws2 = torch.randn(D, D) * 0.1
    Wh = torch.randn(D, 3) * 0.1

    def scatter_mean(vals, idx, n):
        out = torch.zeros(n, vals.shape[1]).index_add_(0, idx, vals)
        cnt = torch.zeros(n).index_add_(
            0, idx, torch.ones(idx.shape[0])).clamp(min=1)
        return out / cnt[:, None]

    @torch.no_grad()
    def forward():
        h = torch.nn.functional.gelu(x @ Wp)
        gate = torch.sigmoid(scatter_mean(
            torch.nn.functional.gelu(attr @ We1) @ We2, dst, G * N))
        for l in range(LAYERS):
            xw = h @ Wg[l]
            msg = (xw * dis[:, None])[src]
            agg = torch.zeros_like(xw).index_add_(0, dst, msg)
            agg = agg * dis[:, None] + xw * (dis ** 2)[:, None]
            h = h + torch.nn.functional.gelu(agg * gate)
        sage = scatter_mean(h[src], dst, G * N) @ Ws1 + h @ Ws2
        h = h + torch.nn.functional.gelu(sage)
        # per-graph softmax readout
        score = h.sum(dim=1, keepdim=True)
        peak = torch.full((G, 1), -1e30).index_reduce_(
            0, gid, score, "amax", include_self=True)
        ex = torch.exp(score - peak[gid])
        tot = torch.zeros(G, 1).index_add_(0, gid, ex)
        w = ex / (tot[gid] + 1e-12)
        g = torch.zeros(G, D).index_add_(0, gid, w * h)
        h = h * torch.sigmoid(g)[gid]
        return h @ Wh

    forward()   # warmup
    n_iter = 3
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            forward()
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return e_valid / best


def main():
    ours_eps, t_fwd, e_valid = bench_jax()
    base_eps = bench_torch_cpu(e_valid)
    print(json.dumps({
        "metric": "resgcn_forward_edges_per_s",
        "value": round(ours_eps),
        "unit": "edges/s",
        "vs_baseline": round(ours_eps / base_eps, 2),
    }))


if __name__ == "__main__":
    main()
