"""Parallel push-relabel min-cut / max-flow on the pixel lattice.

The reference's GrabCut delegates its energy minimisation to OpenCV's C++
Boykov-Kolmogorov max-flow inside ``cv2.grabCut`` (reference:
src/gcn_grabcut/grabcut.py:96-149; README eq 28).  BK is inherently
sequential (augmenting paths over search trees), so the TPU rebuild uses the
*parallel push-relabel* family instead (CUDA-cuts style): every sweep is a
set of dense, data-parallel stencil updates over the grid — exactly what the
VPU wants — with periodic global relabeling (BFS distance-to-sink) to keep
the height function tight.

Formulation
-----------
Terminal arcs are folded into a single signed excess ``e = cap_src -
cap_snk`` (the shared min is saturated immediately); nodes with negative
excess are the distributed sink.  Neighbour arcs are undirected capacities
per lattice direction, stored as a residual pair (r_fwd, r_nbwd).  After
convergence, the min-cut is the set of nodes that cannot reach the sink in
the residual graph (height == INF after an exact global relabel).

All loops are `lax.while_loop`s with on-device convergence tests — no host
round-trips inside the solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Undirected lattice directions: offset (dy, dx) applied to reach the
# neighbour "ahead" of p.  8-connectivity = W, N, NW, NE (each undirected
# pair counted once), matching cv2.grabCut's left/up/upleft/upright arcs.
OFFSETS_4 = ((0, -1), (-1, 0))
OFFSETS_8 = ((0, -1), (-1, 0), (-1, -1), (-1, 1))


def _shift_from(a: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """out[p] = a[p + (dy, dx)], out-of-bounds filled.

    Implemented as slice-of-padded rather than roll + border writes: pad
    and slice fuse into consuming elementwise ops, where each roll/at-set
    lowers to its own data-movement kernel (per-kernel launch overhead
    dominates these 1 MB stencil sweeps)."""
    H, W = a.shape
    ap = jnp.pad(a, 1, constant_values=fill)
    return jax.lax.slice(ap, (1 + dy, 1 + dx), (1 + dy + H, 1 + dx + W))


def _shift_to(a: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """out[p + (dy, dx)] = a[p]  (the inverse scatter of _shift_from)."""
    return _shift_from(a, -dy, -dx, fill)


def _zero_border(cap: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Zero the capacity of arcs that would cross the image border."""
    if dy == -1:
        cap = cap.at[0, :].set(0.0)
    if dx == -1:
        cap = cap.at[:, 0].set(0.0)
    if dx == 1:
        cap = cap.at[:, -1].set(0.0)
    return cap


def _build_solver(H: int, W: int, offsets, max_outer: int,
                  sweeps_per_round: int, relabel_iters: int,
                  unroll: int = 4):
    """Build solve(e, r_fwd, r_bwd) → (fg, e', r_fwd', r_bwd').

    Accepting arbitrary starting residuals enables *flow recycling*
    (Kohli & Torr dynamic graph cuts): across GrabCut iterations the
    neighbour capacities are constant and only terminal capacities move,
    so the previous flow remains a valid preflow — update the excess by
    the terminal delta and resume, instead of solving from scratch.
    """
    INF = jnp.int32(H * W + 1)

    def global_relabel(e, r_fwd, r_bwd):
        """Exact-ish BFS heights: distance to the nearest deficit node along
        residual arcs (iterative min-plus relaxation, bounded)."""
        h0 = jnp.where(e < 0, 0, INF)
        # Residuals are constant throughout the BFS: precompute the arc
        # usability masks once, outside the while loop.
        fwd_ok = tuple(r_fwd[d] > 0 for d in range(len(offsets)))
        bwd_ok = tuple(
            _shift_from(r_bwd[d], -dy, -dx, 0.0) > 0
            for d, (dy, dx) in enumerate(offsets))

        def relax_once(h):
            new_h = h
            for d, (dy, dx) in enumerate(offsets):
                # arc p → p+off usable if r_fwd[d][p] > 0
                nb = _shift_from(h, dy, dx, INF)
                new_h = jnp.minimum(new_h, jnp.where(fwd_ok[d], nb + 1, INF))
                # arc p → p-off usable if r_bwd[d][p-off] > 0
                nb2 = _shift_from(h, -dy, -dx, INF)
                new_h = jnp.minimum(new_h, jnp.where(bwd_ok[d], nb2 + 1,
                                                     INF))
            return new_h

        def body(state):
            h, _, it = state
            # `unroll` relaxation steps per loop iteration: loop-iteration
            # dispatch overhead dominates these sweeps on the tunneled TPU
            # backend, so batching steps inside the body is ~free compute
            # that cuts the iteration count by the unroll factor.
            new_h = h
            for _ in range(unroll):
                new_h = relax_once(new_h)
            changed = jnp.any(new_h < h)
            return new_h, changed, it + unroll

        def cond(state):
            _, changed, it = state
            return changed & (it < relabel_iters)

        h, _, _ = jax.lax.while_loop(
            cond, body, (h0, jnp.bool_(True), jnp.int32(0)))
        return jnp.minimum(h, INF)

    def push_sweep(carry):
        """One lock-step push + relabel over all directions.

        Directed pushes run sequentially per direction (8 steps for
        8-connectivity), so excess updates between steps and no two writes
        conflict; within one directed step every receiver q has exactly one
        sender p (a pure shift), so the update is a stencil, not a scatter.
        """
        e, h, r_fwd, r_bwd = carry
        r_fwd = list(r_fwd)
        r_bwd = list(r_bwd)
        for d, (dy, dx) in enumerate(offsets):
            # Push p → q with q = p + off (residual r_fwd[d][p]).
            nb_h = _shift_from(h, dy, dx, INF)
            can = (e > 0) & (h < INF) & (h == nb_h + 1) & (r_fwd[d] > 0)
            f = jnp.where(can, jnp.minimum(e, r_fwd[d]), 0.0)
            r_fwd[d] = r_fwd[d] - f
            r_bwd[d] = r_bwd[d] + f
            e = e - f + _shift_to(f, dy, dx, 0.0)

            # Push p → q with q = p - off (residual r_bwd[d][q]).
            res = _shift_from(r_bwd[d], -dy, -dx, 0.0)
            nb_h = _shift_from(h, -dy, -dx, INF)
            can = (e > 0) & (h < INF) & (h == nb_h + 1) & (res > 0)
            f = jnp.where(can, jnp.minimum(e, res), 0.0)
            back = _shift_to(f, -dy, -dx, 0.0)   # f re-indexed at q
            r_bwd[d] = r_bwd[d] - back
            r_fwd[d] = r_fwd[d] + back
            e = e - f + back
        # Relabel: overflowing nodes lift to 1 + min reachable neighbour.
        new_h = jnp.full_like(h, INF)
        for d, (dy, dx) in enumerate(offsets):
            nb = _shift_from(h, dy, dx, INF)
            new_h = jnp.minimum(new_h, jnp.where(r_fwd[d] > 0, nb + 1, INF))
            rb = _shift_from(r_bwd[d], -dy, -dx, 0.0)
            nb2 = _shift_from(h, -dy, -dx, INF)
            new_h = jnp.minimum(new_h, jnp.where(rb > 0, nb2 + 1, INF))
        lift = (e > 0) & (h < INF)
        h = jnp.where(lift, jnp.maximum(h, new_h), h)
        h = jnp.where(e < 0, 0, h)
        return e, h, tuple(r_fwd), tuple(r_bwd)

    def outer_body(state):
        e, h, r_fwd, r_bwd, it = state
        h = global_relabel(e, r_fwd, r_bwd)

        def inner(_, carry):
            # Same dispatch-amortisation as the relabel: several push
            # sweeps per loop iteration.
            for _ in range(unroll):
                carry = push_sweep(carry)
            return carry
        e, h, r_fwd, r_bwd = jax.lax.fori_loop(
            0, max(1, sweeps_per_round // unroll), inner,
            (e, h, r_fwd, r_bwd))
        return e, h, r_fwd, r_bwd, it + 1

    def outer_cond(state):
        e, h, _, _, it = state
        active = jnp.any((e > 1e-6) & (h < INF))
        return active & (it < max_outer)

    def solve(e, r_fwd, r_bwd):
        e = e.astype(jnp.float32)
        h0 = global_relabel(e, r_fwd, r_bwd)
        state = (e, h0, r_fwd, r_bwd, jnp.int32(0))
        e, h, r_fwd, r_bwd, _ = jax.lax.while_loop(
            outer_cond, outer_body, state)
        # Final exact reachability: source side = cannot reach the sink.
        h = global_relabel(e, r_fwd, r_bwd)
        return h >= INF, e, r_fwd, r_bwd

    return solve


def _fresh_residuals(caps, offsets):
    r_fwd = tuple(_zero_border(c.astype(jnp.float32), dy, dx)
                  for c, (dy, dx) in zip(caps, offsets))
    r_bwd = tuple(r for r in r_fwd)
    return r_fwd, r_bwd


def _resolve_params(H, W, connectivity, relabel_iters):
    offsets = OFFSETS_8 if connectivity == 8 else OFFSETS_4
    if relabel_iters is None:
        # The BFS must reach the full residual-path diameter; it early-exits
        # at the fixpoint, so the generous cap only costs time on genuinely
        # long-distance instances.  (A tight cap silently yields SUBOPTIMAL
        # cuts: nodes beyond it look sink-disconnected.)
        relabel_iters = 4 * (H + W)
    return offsets, relabel_iters


@functools.partial(jax.jit, static_argnames=(
    "connectivity", "max_outer", "sweeps_per_round", "relabel_iters",
    "unroll"))
def grid_mincut(excess: jnp.ndarray, caps: tuple,
                connectivity: int = 8, max_outer: int = 400,
                sweeps_per_round: int = 48,
                relabel_iters: int | None = None,
                unroll: int = 4) -> jnp.ndarray:
    """Solve the s-t min-cut on an (H, W) lattice.

    Parameters
    ----------
    excess : (H, W) float32 — cap_src - cap_snk per pixel (positive:
        source-connected surplus; negative: sink capacity).
    caps : tuple of (H, W) float32 undirected neighbour capacities, one per
        direction in OFFSETS_4/OFFSETS_8 (capacity of the arc between p and
        p + offset; both directions share it, as in graph cuts).
    Returns
    -------
    (H, W) bool — True where the pixel is on the SOURCE side (foreground).
    """
    H, W = excess.shape
    offsets, relabel_iters = _resolve_params(H, W, connectivity,
                                             relabel_iters)
    assert len(caps) == len(offsets)
    solve = _build_solver(H, W, offsets, max_outer, sweeps_per_round,
                          relabel_iters, unroll)
    r_fwd, r_bwd = _fresh_residuals(caps, offsets)
    fg, _, _, _ = solve(excess, r_fwd, r_bwd)
    return fg


def _coarsen_problem(excess: jnp.ndarray, caps: tuple, connectivity: int):
    """Contract 2x2 pixel blocks into one node (exact graph contraction).

    Terminal arcs sum (block excess = sum of member excesses); each coarse
    neighbour arc is the sum of every fine arc crossing the block boundary,
    assigned by parity so each fine arc lands in exactly one coarse arc
    (intra-block arcs vanish).  The coarse min-cut is the optimal
    block-aligned cut of the fine problem — the coarse stage of a
    Lombaert-style banded ("multilevel") graph cut.
    """
    H, W = excess.shape
    Hp, Wp = H + (H & 1), W + (W & 1)

    def pad(a):
        return jnp.pad(a, ((0, Hp - H), (0, Wp - W)))

    e = pad(excess.astype(jnp.float32))
    offsets = OFFSETS_8 if connectivity == 8 else OFFSETS_4
    c = [pad(_zero_border(x.astype(jnp.float32), dy, dx))
         for x, (dy, dx) in zip(caps, offsets)]
    e_c = e.reshape(Hp // 2, 2, Wp // 2, 2).sum(axis=(1, 3))

    def s(a, oy, ox):
        return a[oy::2, ox::2]

    # Fine-arc parity bookkeeping (offsets order: W, N, NW, NE):
    # W arcs cross at even x; N arcs cross at even y; NW/NE split by parity.
    c_w = s(c[0], 0, 0) + s(c[0], 1, 0)
    c_n = s(c[1], 0, 0) + s(c[1], 0, 1)
    if connectivity == 4:
        return e_c, (c_w, c_n)
    # NW at (odd y, even x) crosses W-wards; at (even y, odd x) N-wards;
    # at (even, even) diagonally; (odd, odd) is intra-block.
    c_w = c_w + s(c[2], 1, 0)
    c_n = c_n + s(c[2], 0, 1) + s(c[3], 0, 0)
    # NE at (odd y, odd x) connects block (Y,X) to (Y,X+1): shift one
    # column right so it lands on the receiving coarse W arc.
    ne_shift = jnp.pad(c[3], ((0, 0), (1, 0)))[:, :-1]
    c_w = c_w + s(ne_shift, 1, 0)
    c_nw = s(c[2], 0, 0)
    c_ne = s(c[3], 0, 1)
    return e_c, (c_w, c_n, c_nw, c_ne)


def _boundary_band(fg: jnp.ndarray, radius: int) -> jnp.ndarray:
    """True within `radius` (Chebyshev) of a label boundary."""
    f = fg.astype(jnp.float32)
    k = 2 * radius + 1
    mx = jax.lax.reduce_window(f, -jnp.inf, jax.lax.max, (k, k), (1, 1),
                               "SAME")
    mn = jax.lax.reduce_window(f, jnp.inf, jax.lax.min, (k, k), (1, 1),
                               "SAME")
    return mx > mn


def _fold_clamps(excess, caps, band, fg_up, offsets):
    """Restrict the problem to the band: clamped (out-of-band) pixels are
    contracted into the terminals.  An arc from a band pixel to a clamped-FG
    neighbour becomes extra source capacity (+cap to the excess); to a
    clamped-BG neighbour, extra sink capacity (−cap).  Arcs not incident to
    the band are zeroed, so out-of-band pixels are inert isolated nodes and
    every push/relabel sweep's active set lives inside the band."""
    e = jnp.where(band, excess, 0.0)
    folded = []
    for (dy, dx), c in zip(offsets, caps):
        c = _zero_border(c.astype(jnp.float32), dy, dx)
        band_q = _shift_from(band, dy, dx, False)
        fg_q = _shift_from(fg_up, dy, dx, False)
        # p in band, q clamped → terminal contribution at p.
        e = e + jnp.where(band & ~band_q, jnp.where(fg_q, c, -c), 0.0)
        # p clamped, q in band → contribution at q (scatter c from p to q).
        contrib = jnp.where(~band & band_q, jnp.where(fg_up, c, -c), 0.0)
        e = e + _shift_to(contrib, dy, dx, 0.0)
        folded.append(jnp.where(band & band_q, c, 0.0))
    return e, tuple(folded)


def grid_mincut_multilevel(excess: jnp.ndarray, caps: tuple,
                           connectivity: int = 8, levels: int = 1,
                           band_radius: int = 8,
                           max_outer: int = 400,
                           sweeps_per_round: int = 48,
                           unroll: int = 4) -> jnp.ndarray:
    """Coarse-to-fine banded min-cut (Lombaert et al. 2005 style).

    Recursively contracts 2x2 blocks `levels` times, solves the coarsest
    problem exactly, then at each finer level re-solves only a band of
    `band_radius` pixels around the upsampled cut, with everything outside
    the band folded into the terminals (see `_fold_clamps`).  Convergence
    of each banded solve is governed by the band width, not the image
    diameter, so large images cost a small multiple of the band area.

    Approximation: the result is the optimal cut among those within
    `band_radius` of the coarse cut — high-resolution deviations further
    than the band from the block-aligned optimum are not recovered.  For
    GrabCut energies (smooth capacities from natural images) agreement with
    the exact cut is typically >99% of pixels; use `grid_mincut` when
    exactness is required.
    """
    if levels <= 0:
        return grid_mincut(excess, caps, connectivity=connectivity,
                           max_outer=max_outer,
                           sweeps_per_round=sweeps_per_round, unroll=unroll)
    H, W = excess.shape
    offsets = OFFSETS_8 if connectivity == 8 else OFFSETS_4
    e_c, caps_c = _coarsen_problem(excess, caps, connectivity)
    fg_c = grid_mincut_multilevel(
        e_c, caps_c, connectivity=connectivity, levels=levels - 1,
        band_radius=band_radius, max_outer=max_outer,
        sweeps_per_round=sweeps_per_round, unroll=unroll)
    fg_up = jnp.repeat(jnp.repeat(fg_c, 2, axis=0), 2, axis=1)[:H, :W]
    band = _boundary_band(fg_up, band_radius)
    e_b, caps_b = _fold_clamps(excess.astype(jnp.float32), caps, band,
                               fg_up, offsets)
    # The banded problem's residual diameter is O(band perimeter); the
    # default relabel cap stays (it early-exits at the BFS fixpoint).
    fg_b = grid_mincut(e_b, caps_b, connectivity=connectivity,
                       max_outer=max_outer,
                       sweeps_per_round=sweeps_per_round, unroll=unroll)
    return jnp.where(band, fg_b, fg_up)


def grid_mincut_stateful(excess: jnp.ndarray, r_fwd: tuple, r_bwd: tuple,
                         connectivity: int = 8, max_outer: int = 400,
                         sweeps_per_round: int = 48,
                         relabel_iters: int | None = None,
                         unroll: int = 4):
    """Warm-start variant: resume from carried residuals (flow recycling).

    `excess` must already be the carried excess (previous post-solve excess
    plus the terminal-capacity delta).  Returns (fg, e', r_fwd', r_bwd').
    Trace-friendly: call inside jit/fori loops.
    """
    H, W = excess.shape
    offsets, relabel_iters = _resolve_params(H, W, connectivity,
                                             relabel_iters)
    solve = _build_solver(H, W, offsets, max_outer, sweeps_per_round,
                          relabel_iters, unroll)
    return solve(excess, tuple(r_fwd), tuple(r_bwd))
