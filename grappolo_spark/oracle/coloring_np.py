"""Oracle twins of the coloring path (engine spec, seeded by ref C14/C6/C12).

Same contract as the engine, implemented independently with dict/loop code:

* ``distance1_coloring_np`` — deterministic Jones–Plassmann with
  priority (xxhash64(v), v); smallest-free-color first-fit for round
  winners (ref first-fit ``coloringDistanceOne.cpp:137-150``; JP priority
  replaces the ref's scheduling-dependent conflict re-queue).
* ``louvain_phase_colored_np`` — Gauss-Seidel color-staged local moves
  (ref ``parallelLouvainWithColoring.cpp:158-262``): singleton init, color
  classes processed in ascending color order with community info refreshed
  after every class, modularity computed after each full sweep over all
  classes, stop when (currMod − prevMod) < thresh or no vertex moved.
  Gain/tie-break/singleton-swap-protection identical to the basic path
  (``utilityClusteringFunctions.cpp:729-762``).
* ``louvain_coloring_np`` — the C12 driver (``runMultiPhaseColoring.cpp:
  51-239``): colored phases at C_thresh while the graph is larger than
  min_graph_size (recoloring every coarse graph), then basic phases at
  threshold; renumber/project/coarsen between phases as in the basic path.
"""

from __future__ import annotations

from .numpy_oracle import (
    _argmax_community,
    adjacency,
    coarsen_np,
    louvain_multiphase_np,
    renumber_np,
    vertex_degrees,
)
from .xxh64 import xxhash64


def distance1_coloring_np(edges, nv, max_rounds=200):
    """Speculative deterministic coloring — engine-spec twin.

    Per round: every uncolored vertex tentatively takes the min free color
    w.r.t. colored neighbours; it keeps it unless an uncolored neighbour
    picked the SAME tentative color with higher xxhash64 priority (the
    hash is bijective on longs, so no ties). Returns (colors, n_colors,
    rounds); no-edge vertices get color 0.
    """
    adj = adjacency(edges, nv)
    prio = {v: xxhash64(v) for v in range(nv)}
    color = [None] * nv
    for v in range(nv):
        if not any(j != v for j, _ in adj[v]):
            color[v] = 0
    rounds = 0
    while any(c is None for c in color) and rounds < max_rounds:
        rounds += 1
        tentative = {}
        for v in range(nv):
            if color[v] is not None:
                continue
            used = {color[j] for j, _ in adj[v] if j != v and color[j] is not None}
            t = 0
            while t in used:
                t += 1
            tentative[v] = t
        for v, t in tentative.items():
            if all(
                prio[v] > prio[j]
                for j, _ in adj[v]
                if j != v and tentative.get(j) == t
            ):
                color[v] = t
    n_colors = max(color) + 1 if nv else 0
    return color, n_colors, rounds


def louvain_phase_colored_np(edges, nv, colors, thresh=1e-2, max_inner=25):
    """One color-staged (Gauss-Seidel) Louvain phase.

    Returns (C, prev_mod, num_iters, change, trajectory) where C is the
    assignment AFTER the final sweep (Gauss-Seidel semantics: moves are
    already applied in place) and prev_mod is the modularity before it.
    """
    adj = adjacency(edges, nv)
    deg = vertex_degrees(edges, nv)
    two_m = sum(deg)
    const = 1.0 / two_m if two_m > 0 else 0.0
    n_colors = (max(colors) + 1) if nv else 0

    curr = list(range(nv))
    c_size = {i: 1 for i in range(nv)}
    c_degree = {i: deg[i] for i in range(nv)}

    prev_mod = -1.0
    change = False
    num_iters = 0
    trajectory = []

    while True:
        num_iters += 1
        moved_total = 0
        for k in range(n_colors):
            moves = []
            for i in range(nv):
                if colors[i] != k or not adj[i]:
                    continue
                sc = curr[i]
                counter = {sc: 0.0}
                self_loop = 0.0
                for j, w in adj[i]:
                    if j == i:
                        self_loop += w
                    counter[curr[j]] = counter.get(curr[j], 0.0) + w
                eix = counter[sc] - self_loop
                ax = c_degree.get(sc, 0.0) - deg[i]
                max_index = _argmax_community(
                    counter, sc, eix, ax, deg[i], const, c_degree
                )
                if (
                    c_size.get(max_index, 0) == 1
                    and c_size.get(sc, 0) == 1
                    and max_index > sc
                ):
                    max_index = sc
                if max_index != sc:
                    moves.append((i, sc, max_index))
            # apply this class's moves, refresh community info (ref :208-217)
            for i, frm, to in moves:
                curr[i] = to
                c_degree[to] = c_degree.get(to, 0.0) + deg[i]
                c_size[to] = c_size.get(to, 0) + 1
                c_degree[frm] = c_degree.get(frm, 0.0) - deg[i]
                c_size[frm] = c_size.get(frm, 0) - 1
            moved_total += len(moves)

        e_xx = 0.0
        for i in range(nv):
            for j, w in adj[i]:
                if curr[i] == curr[j]:
                    e_xx += w
        a2_x = sum(d * d for d in c_degree.values())
        curr_mod = e_xx * const - a2_x * const * const
        trajectory.append(curr_mod)
        if moved_total:
            change = True
        if (
            moved_total == 0
            or (curr_mod - prev_mod) < thresh
            or num_iters >= max_inner
        ):
            break
        prev_mod = curr_mod

    # isolated vertices: -1, matching the basic-path convention
    out = [c if adj[v] else -1 for v, c in enumerate(curr)]
    return out, prev_mod, num_iters, change, trajectory


def distance1_coloring_lu_np(edges, nv, max_rounds=200):
    """Least-used initial coloring — engine-spec twin of
    ``operators.coloring.distance1_coloring(pick="least_used")`` (ref
    ``bColoring/initialColoringLU.cpp:44-183`` ``initColoringLU``): per
    round every uncolored vertex takes the LEAST-USED color among the
    already-used palette that no neighbour holds — argmin (freq, c) over
    used colors minus the neighbourhood (``:113-121``) — falling back to
    the first never-used color when every used color is blocked
    (``:122-123``; neighbour colors are always used, so the fallback is
    conflict-free against the round-start snapshot). freq is the
    round-start assignment histogram (the reference's atomic freq with
    conflict decrements ≡ recount); the reference's racy conflict
    re-queue is the same deterministic bijective-priority rule as the
    first-fit path. Returns (colors, n_colors, rounds).
    """
    adj = adjacency(edges, nv)
    prio = {v: xxhash64(v) for v in range(nv)}
    color = [None] * nv
    for v in range(nv):
        if not any(j != v for j, _ in adj[v]):
            color[v] = 0
    rounds = 0
    while any(c is None for c in color) and rounds < max_rounds:
        rounds += 1
        # palette = edge-incident colored vertices (the engine's working
        # state; no-edge vertices take 0 outside the round loop)
        freq = {}
        for v, c in enumerate(color):
            if c is not None and any(j != v for j, _ in adj[v]):
                freq[c] = freq.get(c, 0) + 1
        min_unused = 0
        while min_unused in freq:
            min_unused += 1
        tentative = {}
        for v in range(nv):
            if color[v] is not None:
                continue
            used = {color[j] for j, _ in adj[v] if j != v and color[j] is not None}
            cands = [c for c in freq if c not in used]
            if cands:
                tentative[v] = min(cands, key=lambda c: (freq[c], c))
            else:
                tentative[v] = min_unused
        for v, t in tentative.items():
            if all(
                prio[v] > prio[j]
                for j, _ in adj[v]
                if j != v and tentative.get(j) == t
            ):
                color[v] = t
    n_colors = max(color) + 1 if nv else 0
    return color, n_colors, rounds


def louvain_coloring_np(
    edges,
    nv,
    c_thresh=1e-2,
    threshold=1e-6,
    min_graph_size=1,
    max_phases=200,
    max_inner=25,
):
    """C12 driver: colored phases at c_thresh while nv > min_graph_size,
    then the basic multi-phase driver at threshold on the coarse graph.
    ``max_inner`` bounds every phase's sweep count (colored and tail) —
    the reference's ``numIters`` cap, shared with the engine twin."""
    g_edges, g_nv = edges, nv
    c_orig = None
    phases = 0
    total_iters = 0
    trajectory = []
    curr_mod = -1.0

    while g_nv > min_graph_size and phases < max_phases:
        colors, _, _ = distance1_coloring_np(g_edges, g_nv)
        c, mod, iters, moved, _traj = louvain_phase_colored_np(
            g_edges, g_nv, colors, thresh=c_thresh, max_inner=max_inner
        )
        phases += 1
        total_iters += iters
        c, n_clusters = renumber_np(c)
        trajectory.append(mod)
        if c_orig is None:
            c_orig = c
        else:
            c_orig = [c[x] if x >= 0 else x for x in c_orig]
        if not moved or n_clusters == g_nv:
            break
        g_edges, _ = coarsen_np(g_edges, c, n_clusters)
        g_edges = [r for r in g_edges]
        g_nv = n_clusters
        curr_mod = mod

    # finish with the basic driver at the fine threshold
    res = louvain_multiphase_np(g_edges, g_nv, threshold=threshold,
                                max_inner=max_inner)
    phases += res["phases"]
    total_iters += res["total_iters"]
    trajectory.extend(res["trajectory"])
    if c_orig is None:
        c_orig = res["C"]
    else:
        cmap = res["C"]
        c_orig = [cmap[x] if x >= 0 else x for x in c_orig]
    final_c, n_clusters = renumber_np(c_orig)
    return {
        "C": final_c,
        "modularity": res["modularity"],
        "phases": phases,
        "total_iters": total_iters,
        "num_clusters": n_clusters,
        "trajectory": trajectory,
    }


def maxmin_coloring_np(edges, nv, n_hash=4, n_itrs=2):
    """Oracle twin of ``operators.coloring.maxmin_coloring`` (ref C15,
    ``coloringMultiHashMaxMin.cpp:60-226``) — Jacobi rounds, shared
    xxhash64(vid, ihash) random values (signed comparisons, like Spark).

    Returns (colors list over nv, n_colored, rounds_run).
    """
    from .xxh64 import xxhash64

    max_color = 2 * n_hash * n_itrs
    nbrs = [set() for _ in range(nv)]
    for s, d, _ in edges:
        s, d = int(s), int(d)
        if s != d:
            nbrs[s].add(d)
    # every vertex starts at the sentinel (the reference colors ALL NVer)
    colors = [max_color] * nv
    rounds = 0
    for itr in range(n_itrs):
        for ihash in range(n_hash):
            cc = 2 * (itr * n_hash + ihash)
            unc = [v for v in range(nv) if colors[v] == max_color]
            if not unc:
                return colors, sum(1 for c in colors if c != max_color), rounds
            rounds += 1
            h = {v: xxhash64(v, ihash) for v in unc}
            snapshot = list(colors)
            for v in unc:
                is_max = True
                is_min = True
                for j in nbrs[v]:
                    if snapshot[j] != max_color:
                        continue  # colored earlier: skipped (ref :143-146)
                    if h[v] <= h[j]:
                        is_max = False
                    if h[v] >= h[j]:
                        is_min = False
                if is_max:
                    colors[v] = cc
                elif is_min:
                    colors[v] = cc + 1
    return colors, sum(1 for c in colors if c != max_color), rounds


MBASE_BUCKET_CAP = 1024    # ref bColoring/mBase.cpp:95-96 (avg clamp)
MBASE_OVERSIZE = 1088      # ref bColoring/mBase.cpp:104-106 (donor gate)


def balanced_coloring_np(edges, nv, colors, ncolors=None,
                         strategy="first_fit", max_rounds=50,
                         variant="vbase",
                         bucket_cap=MBASE_BUCKET_CAP,
                         oversize_thresh=MBASE_OVERSIZE,
                         wbase_ref_constant=False):
    """Oracle twin of ``operators.coloring.balanced_coloring`` (ref C16,
    ``Coloring/vBase.cpp:6-169`` / ``bColoring/cBase.cpp:44-140`` /
    ``bColoring/wBase.cpp:44-201`` / ``bColoring/mBase.cpp:44-213``),
    same deterministic spec per variant: Jacobi rounds, xxhash64-priority
    admission up to per-color capacity avg - freq (load-weighted for
    wbase), adjacent same-target ties to the higher priority. ``cbase``
    drops the target-not-oversize exclusion; ``wbase`` balances Σ degree
    per class with avg = ceil(Σ_v deg(v) / ncolors); ``mbase`` is the
    vbase skeleton with the reference's absolute bin capacities — avg is
    clamped to ``bucket_cap`` when ceil(nv/ncolors) > bucket_cap + 64
    (``mBase.cpp:95-96``) and a class is a donor when its BASE size
    exceeds the hard ``oversize_thresh`` (``:104-106``), not when it
    exceeds avg.

    Returns (colors list, rounds_run).
    """
    from .xxh64 import xxhash64

    nbrs = [set() for _ in range(nv)]
    for s, d, _ in edges:
        s, d = int(s), int(d)
        if s != d:
            nbrs[s].add(d)

    colors = list(colors)
    base = list(colors)
    if ncolors is None:
        ncolors = max(base) + 1 if base else 0
    if variant == "wbase":
        w = [len(nbrs[v]) for v in range(nv)]
        if wbase_ref_constant:
            # wBase.cpp:94 ceil(ne/ncolors) on integer operands = floor
            ne = sum(w) // 2
            avg = ne // ncolors if ncolors else 0
        else:
            avg = -(-sum(w) // ncolors) if ncolors else 0
    else:
        w = [1] * nv
        avg = -(-nv // ncolors) if ncolors else 0
    if variant == "mbase" and avg > bucket_cap + 64:
        avg = bucket_cap

    freq0 = {}
    for v, c in enumerate(base):
        freq0[c] = freq0.get(c, 0) + w[v]
    if variant == "mbase":
        oversize = {c for c, n in freq0.items() if n > oversize_thresh}
    else:
        oversize = {c for c, n in freq0.items() if n > avg}
    if not oversize:
        return colors, 0
    prio = {v: xxhash64(v) for v in range(nv)}

    rounds = 0
    while rounds < max_rounds:
        freq = {}
        for v, c in enumerate(colors):
            freq[c] = freq.get(c, 0) + w[v]
        eligible = [c for c in range(ncolors)
                    if freq.get(c, 0) < avg
                    and (variant == "cbase" or c not in oversize)]
        # mbase keeps the vbase donor rule (base-oversize AND currently
        # above avg) but with the clamped avg and threshold oversize set
        movers = [v for v in range(nv)
                  if base[v] in oversize and freq.get(colors[v], 0) > avg]
        if not eligible or not movers:
            break
        rounds += 1

        pick = {}
        for v in movers:
            nb = {colors[j] for j in nbrs[v]}
            free = [c for c in eligible if c not in nb]
            if not free:
                continue
            if strategy == "least_used":
                pick[v] = min(free, key=lambda c: (freq.get(c, 0), c))
            else:
                pick[v] = min(free)

        admitted = {}
        by_target = {}
        for v, c in pick.items():
            by_target.setdefault(c, []).append(v)
        for c, vs in by_target.items():
            cap = avg - freq.get(c, 0)
            cum = 0
            for v in sorted(vs, key=lambda x: -prio[x]):
                cum += w[v]
                if cum > cap:
                    break
                admitted[v] = c

        moved = False
        new_colors = list(colors)
        for v, c in admitted.items():
            loser = any(
                j in admitted and admitted[j] == c and prio[j] > prio[v]
                for j in nbrs[v]
            )
            if not loser:
                new_colors[v] = c
                moved = True
        if not moved:
            break
        colors = new_colors

    return colors, rounds


def bbase_coloring_np(edges, nv, colors, ncolors=None):
    """Oracle twin of the ``bbase`` batch redistribution (ref C16,
    ``bColoring/bBase.cpp:44-146`` ``schRedistribution``): ONE planned
    batch round. The driver builds a move plan — donors (classes with
    size > avg = ceil(nv/ncolors)) in ascending color order each walk the
    target colors from ``ncolors-1`` DOWNWARD (``:88``, shift = 0),
    shipping ``min(avg - freq[ti], freq[ci] - avg)`` vertices per
    under-avg target while updating the planned freqs — so target
    capacity is consumed globally as donors drain. A donor ships the
    HEAD of its member list (``startPost`` slabs, ``:98-99``); the
    reference's member order is the scheduling-dependent
    ``buildColorsIndex`` fill, made deterministic here as descending
    xxhash64 priority (the family's admission order). A planned vertex
    actually moves iff no neighbour holds the target color (``:125-131``)
    — checked against the BASE coloring snapshot — and, because the
    reference's live-array check is racy for two adjacent movers with
    the same target, the engine adds the family's deterministic
    resolution: the higher priority moves, the lower stays.

    Returns (colors list, rounds_run ∈ {0, 1}).
    """
    nbrs = [set() for _ in range(nv)]
    for s, d, _ in edges:
        s, d = int(s), int(d)
        if s != d:
            nbrs[s].add(d)

    base = list(colors)
    if ncolors is None:
        ncolors = max(base) + 1 if base else 0
    avg = -(-nv // ncolors) if ncolors else 0
    freq0 = {}
    for c in base:
        freq0[c] = freq0.get(c, 0) + 1
    donors = sorted(c for c in freq0 if freq0[c] > avg)
    if not donors:
        return list(base), 0

    # plan: per donor, ordered (target, slab_start, slab_end) intervals
    new_freq = dict(freq0)
    plan = {}
    for ci in donors:
        st_post = 0
        slabs = []
        for ti in range(ncolors - 1, -1, -1):
            if new_freq[ci] <= avg:
                break
            if ti == ci:
                continue
            if new_freq.get(ti, 0) < avg:
                n_move = min(avg - new_freq.get(ti, 0), new_freq[ci] - avg)
                slabs.append((ti, st_post, st_post + n_move))
                st_post += n_move
                new_freq[ci] -= n_move
                new_freq[ti] = new_freq.get(ti, 0) + n_move
        plan[ci] = slabs

    prio = {v: xxhash64(v) for v in range(nv)}
    # rank members of each donor class by descending priority
    target_of = {}
    for ci, slabs in plan.items():
        members = sorted((v for v in range(nv) if base[v] == ci),
                         key=lambda x: -prio[x])
        for ti, st, en in slabs:
            for v in members[st:en]:
                target_of[v] = ti

    out = list(base)
    for v, ti in target_of.items():
        if any(base[j] == ti for j in nbrs[v]):
            continue
        if any(
            j in target_of and target_of[j] == ti and prio[j] > prio[v]
            for j in nbrs[v]
        ):
            continue
        out[v] = ti
    return out, 1


def rbase_coloring_np(edges, nv, colors, ncolors=None, max_rounds=50):
    """Oracle twin of the ``rbase`` capacity-bounded RE-coloring (ref C16,
    ``bColoring/rBase.cpp:44-179`` ``reColor``): every vertex is recolored
    from scratch; a vertex takes the smallest color that is (a) absent
    from its already-recolored neighbourhood and (b) below capacity —
    ``newFreq[c] < avg`` (``:117-122``) — searching PAST ncolors when all
    low colors are full or conflicted (the reference scans up to
    MaxDegree, ``:118``), so the palette may grow. The reference's
    atomic-freq/requeue scheduling is made deterministic exactly like the
    rest of the family: Jacobi rounds over the still-uncolored set,
    per-color admission capacity ``avg - freq`` granted in descending
    xxhash64 priority, adjacent same-tentative movers resolved to the
    higher priority, losers re-queued. The reference's reverse-color
    queue order (``:73-76``) is scheduling metadata with no deterministic
    analogue and is replaced by the priority order. If ``max_rounds``
    ends before every vertex recolors (never on the gate corpora), the
    leftovers keep their base color.

    Returns (colors list, rounds_run).
    """
    nbrs = [set() for _ in range(nv)]
    for s, d, _ in edges:
        s, d = int(s), int(d)
        if s != d:
            nbrs[s].add(d)

    base = list(colors)
    if ncolors is None:
        ncolors = max(base) + 1 if base else 0
    avg = -(-nv // ncolors) if ncolors else 0
    prio = {v: xxhash64(v) for v in range(nv)}

    new = [None] * nv
    freq = {}
    rounds = 0
    while rounds < max_rounds and any(c is None for c in new):
        rounds += 1
        full = {c for c, n in freq.items() if n >= avg}
        tent = {}
        for v in range(nv):
            if new[v] is not None:
                continue
            used = {new[j] for j in nbrs[v] if new[j] is not None}
            t = 0
            while t in used or t in full:
                t += 1
            tent[v] = t
        by_target = {}
        for v, t in tent.items():
            by_target.setdefault(t, []).append(v)
        admitted = {}
        for t, vs in by_target.items():
            cap = avg - freq.get(t, 0)
            for i, v in enumerate(sorted(vs, key=lambda x: -prio[x])):
                if i >= cap:
                    break
                admitted[v] = t
        for v, t in admitted.items():
            if any(
                j in admitted and admitted[j] == t and prio[j] > prio[v]
                for j in nbrs[v]
            ):
                continue
            new[v] = t
            freq[t] = freq.get(t, 0) + 1

    out = [new[v] if new[v] is not None else base[v] for v in range(nv)]
    return out, rounds


def equitable_coloring_np(edges, nv, colors, ncolors=None,
                          pick="first_fit"):
    """Oracle twin of the equitable CFF/CLU redistribution (ref
    ``Coloring/equitableColoringDistanceOne.cpp:90-253``
    ``equitableDistanceOneColorBased``): donor classes (base size >
    avg = ceil(nv/ncolors), the reference's true-ceil
    ``(NVer+numColors-1)/numColors`` at ``:165``) are processed in
    ASCENDING color order (``:173``); each drains toward avg by moving
    members to a color that is below avg (``Mark[i] = colorSize[i] >=
    avg``, ``:190-195``) and absent from the CURRENT neighbourhood
    (``:198-205``), with live class sizes carried across classes
    (``:210-213``). Each donor member is considered exactly ONCE (no
    retry rounds — the reference's single sweep per class), and at most
    ``excess = freq[ci] - avg`` members leave a class.

    ``pick``: ``first_fit`` = smallest allowed color (type 1, the shipped
    scan ``:207-211``); ``least_used`` = smallest-size allowed color,
    ties to the smaller color id (type 2, declared in the reference's
    ``type`` knob ``:90-92`` but never wired in the shipped body — the
    engine implements the declared semantics with initColoringLU's
    least-used rule).

    The reference's inner sweep is an OpenMP loop racing on colorSize
    and vtxColor; like the rest of the family the engine keeps the
    contract deterministic: per donor class one batch — per-target
    admission capacity ``avg - freq[t]`` AND a class-global cap of
    ``excess``, both granted in descending xxhash64 priority; adjacent
    admitted movers with the same target resolve to the higher priority,
    the loser stays (considered once, no backfill).

    Returns (colors list, n_donor_classes_processed).
    """
    nbrs = [set() for _ in range(nv)]
    for s, d, _ in edges:
        s, d = int(s), int(d)
        if s != d:
            nbrs[s].add(d)

    out = list(colors)
    base = list(colors)
    if ncolors is None:
        ncolors = max(base) + 1 if base else 0
    avg = (nv + ncolors - 1) // ncolors if ncolors else 0
    prio = {v: xxhash64(v) for v in range(nv)}

    freq = {}
    for c in base:
        freq[c] = freq.get(c, 0) + 1
    donors = sorted(c for c, n in freq.items() if n > avg)

    processed = 0
    for ci in donors:
        excess = freq.get(ci, 0) - avg
        if excess <= 0:
            continue
        processed += 1
        movers = [v for v in range(nv) if out[v] == ci]
        eligible = [c for c in range(ncolors) if freq.get(c, 0) < avg]
        tent = {}
        for v in movers:
            nb = {out[j] for j in nbrs[v]}
            free = [c for c in eligible if c not in nb]
            if not free:
                continue
            if pick == "least_used":
                tent[v] = min(free, key=lambda c: (freq.get(c, 0), c))
            else:
                tent[v] = min(free)
        # per-target admission capacity avg - freq[t], priority order
        admitted = {}
        by_target = {}
        for v, t in tent.items():
            by_target.setdefault(t, []).append(v)
        for t, vs in by_target.items():
            cap = avg - freq.get(t, 0)
            for i, v in enumerate(sorted(vs, key=lambda x: -prio[x])):
                if i >= cap:
                    break
                admitted[v] = t
        # class-global cap: only the first `excess` admitted (by priority)
        ranked = sorted(admitted, key=lambda x: -prio[x])[:excess]
        kept = {v: admitted[v] for v in ranked}
        # adjacent same-target movers: higher priority wins, loser stays
        for v, t in kept.items():
            if any(
                j in kept and kept[j] == t and prio[j] > prio[v]
                for j in nbrs[v]
            ):
                continue
            out[v] = t
            freq[t] = freq.get(t, 0) + 1
            freq[ci] -= 1

    return out, processed


def louvain_coloring_schedule_np(edges, nv, c_thresh=1e-2, threshold=1e-6,
                                 min_graph_size=1, max_phases=200,
                                 max_inner=25):
    """Unroll schedule of the exact ``louvain_coloring_np`` run — the
    parameters for ``oracle.louvain_sql.louvain_coloring_full_sql``.

    Replays the identical driver loop and records, per colored phase, the
    (num_iters, n_colors) pair, plus the basic tail's per-phase sweep
    counts (``louvain_schedule_np`` on whatever graph the loop handed to
    the tail). ``tail_on_input`` is True when the loop broke via the
    no-move / coarsening-fixpoint guard, in which case the tail runs on
    the last colored phase's INPUT graph rather than its coarse graph
    (``operators/louvain.py:louvain_coloring`` breaks BEFORE coarsening).
    All values are unroll depths only — the SQL twin recomputes every
    coloring, gain, renumber, and coarse weight from the tables.
    """
    from .numpy_oracle import coarsen_np, louvain_schedule_np, renumber_np

    g_edges, g_nv = list(edges), nv
    phases = 0
    colored = []
    tail_on_input = False
    while g_nv > min_graph_size and phases < max_phases:
        colors, _, _ = distance1_coloring_np(g_edges, g_nv)
        c, _mod, iters, moved, _ = louvain_phase_colored_np(
            g_edges, g_nv, colors, thresh=c_thresh, max_inner=max_inner
        )
        phases += 1
        colored.append((iters, (max(colors) + 1) if colors else 1))
        c, n_clusters = renumber_np(c)
        if not moved or n_clusters == g_nv:
            tail_on_input = True
            break
        g_edges, _ = coarsen_np(g_edges, c, n_clusters)
        g_nv = n_clusters
    tail = louvain_schedule_np(g_edges, g_nv, max_inner=max_inner)
    return {"colored": colored, "tail": tail, "tail_on_input": tail_on_input}
