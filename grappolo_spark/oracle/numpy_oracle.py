"""Single-threaded oracle: reference semantics re-stated in plain Python.

This module is the ground truth the Spark engine must match. It is written
as deliberately simple dict/loop code (NOT shared with the engine's
vectorized kernels) so tests are non-circular: engine and oracle implement
the same *contract* twice, independently.

The contract is distilled from the reference's DEFAULT dispatch path —
``runMultiPhaseBasic`` with threadsOpt=1 → ``parallelLouvianMethod_SFP``
("Modified Parallel" in the results CSVs) — verified against the compiled
reference binary on the karate fixture (citations into /root/reference):

* greedy init pass from singletons: each vertex evaluates every neighbor
  as a singleton community, argmax gain with min-cid tie-break; since all
  sizes are 1 the swap protection allows only moves to a SMALLER id;
  community info updated after the pass
  (``utilityClusteringFunctions.cpp:335-397``, init called at
  ``vectorizedLouvainMethod.cpp:194``)
* local-move sweep: Jacobi snapshot reads, post-sweep apply
  (``vectorizedLouvainMethod.cpp:209-322``)
* gain formula ``2*(eiy-eix) - 2*deg_i*(ay-ax)/2m``, tie-break to the
  smaller community id among equal positive gains, singleton swap
  protection (``utilityClusteringFunctions.cpp:835-868``)
* modularity from the iteration-start snapshot
  (``vectorizedLouvainMethod.cpp:281-295``)
* stop when no vertex moved or numItrs >= 25; the phase returns the
  CURRENT assignment (the one the final sweep read) and the modularity of
  the iteration before the last (``vectorizedLouvainMethod.cpp:305-347``)
* first-occurrence-contiguous renumbering (``buildNextPhase.cpp:48-79``)
* coarsening: intra-community weight doubled into a single self-loop,
  inter weights summed once per direction (``buildNextPhase.cpp:145-236``)
* phase caps 200 / total-iteration cap 100000 (``runMultiPhaseBasic.cpp:128``)

The engine standardizes on float64 (the reference SFP path is float32);
with integer edge weights every sum here is exactly representable, so the
float32/float64 trajectories coincide on the test fixtures (SURVEY §1.2).

Graph input convention everywhere: ``edges`` is a list of (src, dst, w)
rows that is ALREADY symmetric (both directions present, self-loops once),
``nv`` the number of vertices (dense ids 0..nv-1).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def adjacency(edges, nv):
    """vertex -> list[(nbr, w)] from symmetric rows."""
    adj = [[] for _ in range(nv)]
    for s, d, w in edges:
        adj[int(s)].append((int(d), float(w)))
    return adj


def vertex_degrees(edges, nv):
    """Weighted degree = sum of row weights per src (self-loop once)."""
    deg = [0.0] * nv
    for s, _, w in edges:
        deg[int(s)] += float(w)
    return deg


# ---------------------------------------------------------------------------
# Louvain
# ---------------------------------------------------------------------------

def _argmax_community(candidates, sc, eix, ax, deg_i, const, c_degree):
    """Reference gain argmax: max over candidate (cid, eiy) pairs, ties to
    the smaller cid among equal positive gains; returns sc if no gain > 0.
    Order-independent: the winner is the smallest cid among the argmax set.
    """
    max_gain = 0.0
    max_index = sc
    for cid in sorted(candidates):
        if cid == sc:
            continue
        eiy = candidates[cid]
        ay = c_degree.get(cid, 0.0)
        cur_gain = 2 * (eiy - eix) - 2 * deg_i * (ay - ax) * const
        if cur_gain > max_gain or (
            cur_gain == max_gain and cur_gain != 0 and cid < max_index
        ):
            max_gain = cur_gain
            max_index = cid
    return max_index


def louvain_init_np(adj, deg, const, nv):
    """Greedy init pass (initCommAssOptVec_SFP): from singletons, each
    vertex targets its best-gain neighbour; swap protection (all sizes 1)
    permits only moves to a smaller vertex id. Returns (curr, c_size,
    c_degree) with community info already updated.
    """
    curr = list(range(nv))
    for v in range(nv):
        if not adj[v]:
            continue
        # every neighbour is its own singleton community; eix = ax = 0
        candidates = {}
        for j, w in adj[v]:
            if j == v:
                continue  # self-loop: recorded but eix = w_self - w_self = 0
            candidates[j] = candidates.get(j, 0.0) + w
        max_index = _argmax_community(candidates, v, 0.0, 0.0, deg[v], const, {j: deg[j] for j in list(candidates) + [v]})
        if max_index > v:  # swap protection: all sizes are 1 at init
            max_index = v
        curr[v] = max_index

    c_size = {i: 1 for i in range(nv)}
    c_degree = {i: deg[i] for i in range(nv)}
    for v in range(nv):
        if curr[v] != v:
            c_degree[v] -= deg[v]
            c_size[v] -= 1
            c_degree[curr[v]] += deg[v]
            c_size[curr[v]] += 1
    return curr, c_size, c_degree


def louvain_phase_np(edges, nv, lower=-1.0, max_inner=25, sample_pct=None):
    """One Louvain phase with exact reference (SFP default path) semantics.

    ``sample_pct``: the Approx variant (ref C5,
    ``parallelLouvainMethodApprox.cpp:139-155``) — only a deterministic
    per-iteration vertex subset evaluates moves (the reference draws
    rand()%NV; the engine spec uses the partition-invariant mask
    xxhash64(v, iter) % 100 < pct, mirrored here exactly).

    Returns (C, prev_mod, num_iters, change, mod_trajectory).
    """
    from .xxh64 import xxhash64

    adj = adjacency(edges, nv)
    deg = vertex_degrees(edges, nv)
    two_m = sum(deg)
    const = 1.0 / two_m if two_m > 0 else 0.0

    curr, c_size, c_degree = louvain_init_np(adj, deg, const, nv)
    prev_mod = -1.0
    change = False
    num_iters = 0
    trajectory = []

    while True:
        num_iters += 1
        target = [0] * nv
        e_xx = 0.0
        moved = False
        moves = []  # (vertex, from, to)

        for i in range(nv):
            if not adj[i]:
                target[i] = -1
                continue
            sc = curr[i]
            counter = {sc: 0.0}
            self_loop = 0.0
            for j, w in adj[i]:
                if j == i:
                    self_loop += w
                counter[curr[j]] = counter.get(curr[j], 0.0) + w
            e_xx += counter[sc]

            if sample_pct is not None and (
                xxhash64(i, num_iters) % 100 >= sample_pct
            ):
                target[i] = sc  # unsampled vertex: no move this iteration
                continue
            eix = counter[sc] - self_loop
            ax = c_degree.get(sc, 0.0) - deg[i]
            max_index = _argmax_community(counter, sc, eix, ax, deg[i], const, c_degree)
            # singleton swap protection
            if (
                c_size.get(max_index, 0) == 1
                and c_size.get(sc, 0) == 1
                and max_index > sc
            ):
                max_index = sc
            target[i] = max_index
            if max_index != sc:
                moved = True
                moves.append((i, sc, max_index))

        a2_x = sum(d * d for d in c_degree.values())
        curr_mod = e_xx * const - a2_x * const * const
        trajectory.append(curr_mod)
        if moved:
            change = True
        if not moved or num_iters >= max_inner:
            break

        prev_mod = curr_mod
        if prev_mod < lower:
            prev_mod = lower
        for i, frm, to in moves:
            c_degree[to] = c_degree.get(to, 0.0) + deg[i]
            c_size[to] = c_size.get(to, 0) + 1
            c_degree[frm] = c_degree.get(frm, 0.0) - deg[i]
            c_size[frm] = c_size.get(frm, 0) - 1

        curr = target  # phase returns the assignment the final sweep read

    return curr, prev_mod, num_iters, change, trajectory


def renumber_np(c):
    """First-occurrence contiguous renumber; -1 entries untouched.

    Returns (new_c, num_clusters).
    """
    seen = {}
    out = []
    for x in c:
        if x < 0:
            out.append(x)
            continue
        if x not in seen:
            seen[x] = len(seen)
        out.append(seen[x])
    return out, len(seen)


def coarsen_np(edges, c, num_clusters):
    """Community-aggregation coarsening over symmetric rows.

    Accumulating every symmetric row into (C[src], C[dst]) reproduces the
    reference exactly: inter-community pairs get the undirected weight in
    each direction; the self-loop pair gets 2x intra weight + old
    self-loops once.
    """
    acc = {}
    for s, d, w in edges:
        key = (c[int(s)], c[int(d)])
        acc[key] = acc.get(key, 0.0) + float(w)
    out = [(cs, cd, w) for (cs, cd), w in sorted(acc.items())]
    return out, num_clusters


def louvain_multiphase_np(
    edges, nv, threshold=1e-6, max_phases=200, max_total_iters=100000,
    max_inner=25, init_mod=-1.0,
):
    """Multi-phase Louvain driver (runMultiPhaseBasic semantics).

    One extra guard beyond the reference: if a phase leaves every vertex in
    its own community (num_clusters == NV) the coarse graph is a fixpoint —
    every further phase would repeat verbatim without changing C_orig, so
    we break early with identical final output (the reference would spin to
    the 200-phase cap).

    Returns dict with C, modularity, phases, total_iters, num_clusters,
    trajectory (per-phase modularity list).
    """
    c_orig = [-1] * nv
    g_edges, g_nv = list(edges), nv
    prev_mod = -1.0
    # init_mod threads the previous phase's modularity in when this driver
    # finishes a run started elsewhere (engine driver-tail fallback)
    curr_mod = init_mod
    phase = 1
    tot_iters = 0
    num_clusters = 0
    phase_mods = []

    while True:
        prev_mod = curr_mod
        c, curr_mod, iters, change, _ = louvain_phase_np(
            g_edges, g_nv, lower=curr_mod, max_inner=max_inner
        )
        tot_iters += iters
        c, num_clusters = renumber_np(c)
        phase_mods.append(curr_mod)

        if phase == 1:
            c_orig = list(c)
        else:
            c_orig = [c[x] if x >= 0 else x for x in c_orig]

        if phase > max_phases or tot_iters > max_total_iters:
            break
        if num_clusters == g_nv:
            break  # coarsening fixpoint — see docstring
        if change:
            g_edges, g_nv = coarsen_np(g_edges, c, num_clusters)
            phase += 1
        else:
            break

    return {
        "C": c_orig,
        "modularity": prev_mod,
        "phases": phase,
        "total_iters": tot_iters,
        "num_clusters": num_clusters,
        "trajectory": phase_mods,
    }


def vertex_following_np(edges, nv):
    """Ref ``Utility/vertexFollowing.cpp:46-86``: isolated -> -1; degree-1
    vertex i with sole neighbour t collapses onto t iff deg(t) > 1 or
    i > t. Degree = adjacency row count (self-loop rows count once)."""
    adj = adjacency(edges, nv)
    c = list(range(nv))
    moved = 0
    for i in range(nv):
        if not adj[i]:
            c[i] = -1
            moved += 1
        elif len(adj[i]) == 1:
            t = adj[i][0][0]
            if t != i and (len(adj[t]) > 1 or i > t):
                c[i] = t
                moved += 1
    return c, moved


def build_new_graph_vf_np(edges, c, num_clusters):
    """Coarsen under c, dropping self-loops (ref buildNewGraphVF)."""
    agg = {}
    for s, d, w in edges:
        cs, cd = c[int(s)], c[int(d)]
        if cs < 0 or cd < 0 or cs == cd:
            continue
        agg[(cs, cd)] = agg.get((cs, cd), 0.0) + float(w)
    return sorted((s, d, w) for (s, d), w in agg.items()), num_clusters


def modularity_np(edges, c, nv):
    """Q = e_in/2m - sum_c (a_c/2m)^2 for a given assignment."""
    deg = vertex_degrees(edges, nv)
    two_m = sum(deg)
    if two_m == 0:
        return 0.0
    e_in = sum(w for s, d, w in edges if c[int(s)] == c[int(d)] and c[int(s)] >= 0)
    a = {}
    for i in range(nv):
        if c[i] >= 0:
            a[c[i]] = a.get(c[i], 0.0) + deg[i]
    return e_in / two_m - sum(x * x for x in a.values()) / (two_m * two_m)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def pagerank_np(edges, nv, alpha=0.85, tol=1e-10, max_iter=100):
    """Weighted PageRank with uniform dangling-mass redistribution.

    r_{k+1}(v) = (1-alpha)/NV + alpha * (sum_u r_k(u) w(u,v)/wdeg(u)
                                         + dangling_mass/NV)
    Converges when max|delta| < tol. Returns (ranks, iters).
    """
    deg = np.array(vertex_degrees(edges, nv))
    r = np.full(nv, 1.0 / nv)
    src = np.array([int(s) for s, _, _ in edges], dtype=np.int64)
    dst = np.array([int(d) for _, d, _ in edges], dtype=np.int64)
    w = np.array([float(x) for _, _, x in edges])
    dangling = deg == 0
    iters = 0
    for _ in range(max_iter):
        iters += 1
        contrib = np.zeros(nv)
        np.add.at(contrib, dst, r[src] * w / deg[src])
        dmass = r[dangling].sum()
        r_new = (1 - alpha) / nv + alpha * (contrib + dmass / nv)
        delta = np.abs(r_new - r).max()
        r = r_new
        if delta < tol:
            break
    return r, iters


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------

def connected_components_np(edges, nv):
    """Union-find; component label = min vertex id in the component."""
    parent = list(range(nv))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in edges:
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    # path-compress to root, which is the min id by construction above
    comp = [0] * nv
    for i in range(nv):
        comp[i] = find(i)
    # ensure min-id labeling
    best = {}
    for i in range(nv):
        r = comp[i]
        best[r] = min(best.get(r, i), i)
    return [best[comp[i]] for i in range(nv)]


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------

def label_propagation_np(edges, nv, max_iter=20):
    """Synchronous weighted LPA, deterministic.

    label_{k+1}(v) = argmax_l sum of w(v,u) over nbrs u with label_k(u)=l,
    ties to the smaller label; isolated vertices keep their own label.
    Stops when no label changes or after max_iter rounds.
    Returns (labels, iters).
    """
    adj = adjacency(edges, nv)
    labels = list(range(nv))
    iters = 0
    for _ in range(max_iter):
        iters += 1
        new_labels = list(labels)
        changed = False
        for i in range(nv):
            if not adj[i]:
                continue
            cnt = {}
            for j, w in adj[i]:
                if j == i:
                    continue  # self-loop carries no label information
                lab = labels[j]
                cnt[lab] = cnt.get(lab, 0.0) + w
            if not cnt:
                continue
            best = min(sorted(cnt), key=lambda l: (-cnt[l], l))
            new_labels[i] = best
            if best != labels[i]:
                changed = True
        labels = new_labels
        if not changed:
            break
    return labels, iters


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------

def triangle_counts_np(edges, nv):
    """Per-vertex triangle counts (self-loops/duplicates ignored).

    Returns (per_vertex_list, total_triangles).
    """
    nbrs = [set() for _ in range(nv)]
    for s, d, _ in edges:
        s, d = int(s), int(d)
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    per = [0] * nv
    total = 0
    for u in range(nv):
        for v in nbrs[u]:
            if v <= u:
                continue
            common = nbrs[u] & nbrs[v]
            for x in common:
                if x > v:
                    per[u] += 1
                    per[v] += 1
                    per[x] += 1
                    total += 1
    return per, total


# ---------------------------------------------------------------------------
# Base-path variants: directed Louvain (C8) + FastTrackResistance (C9)
# ---------------------------------------------------------------------------

def base_phase_np(edges, nv, const_factor=1.0, thresh=1e-6, lower=-1.0,
                  max_inner=1000, resistance_phase=None, force_sweeps=False):
    """One base-path phase — the shared shape of the reference's directed
    (``parallelDirectedLouvainMethod.cpp:47-280``) and FastTrackResistance
    (``parallelLouvainMethodFastTrackResistance.cpp:47-302``) variants:
    plain singleton init (``initCommAss``), modularity-threshold stop, and
    pastCommAss return semantics (the assignment the second-to-last sweep
    read, double-buffer swap ``:236-241``).

    ``edges`` rows are the out-adjacency (symmetric rows -> undirected,
    directed rows -> the directed variant); ``const_factor`` scales
    1/sum(deg) (1.0 -> 1/2m undirected, 2.0 -> 1/m directed, ``:225-227``).
    Candidate communities with id < 0 are skipped (the reference reads
    cInfo[-1] there — UB; engine and oracle share this spec).

    ``resistance_phase``: when set, compute r_min / Q_AFG per iteration
    (``:192-218``) and, for phases > 1, exit when Q_AFG == 0 (``:233-242``).

    Returns dict: C (pastCommAss), modularity (prevMod), num_iters,
    trajectory, r_min, q_afg, fin_mod (currMod at exit).
    """
    adj = adjacency(edges, nv)  # out-adjacency: rows grouped by src
    deg = vertex_degrees(edges, nv)
    sum_deg = sum(deg)
    const = const_factor / sum_deg if sum_deg > 0 else 0.0

    # incremental community info, exactly the reference's cUpdate schedule:
    # every vertex starts as a singleton slot; slots of isolated vertices
    # are never touched (cUpdate skips -1 targets), so sum(size^2) keeps
    # their +1 contribution forever
    c_size = {i: 1 for i in range(nv)}
    c_degree = {i: deg[i] for i in range(nv)}
    past = list(range(nv))
    curr = list(range(nv))

    prev_mod = -1.0
    num_iters = 0
    trajectory = []
    res_traj = []
    r_min = 0.0
    q_afg = -1.0
    curr_mod = -1.0

    while True:
        num_iters += 1
        target = [0] * nv
        e_xx = 0.0
        moves = []
        for i in range(nv):
            if not adj[i]:
                target[i] = -1  # no out-edges: ref :174-176
                continue
            sc = curr[i]
            counter = {sc: 0.0}
            self_loop = 0.0
            for j, w in adj[i]:
                if j == i:
                    self_loop += w
                cj = curr[j]
                counter[cj] = counter.get(cj, 0.0) + w
            e_xx += counter[sc]
            eix = counter[sc] - self_loop
            ax = c_degree.get(sc, 0.0) - deg[i]
            cand = {cid: v for cid, v in counter.items() if cid >= 0}
            max_index = _argmax_community(cand, sc, eix, ax, deg[i], const, c_degree)
            if (
                c_size.get(max_index, 0) == 1
                and c_size.get(sc, 0) == 1
                and max_index > sc
            ):
                max_index = sc
            target[i] = max_index
            if max_index != sc:
                moves.append((i, sc, max_index))

        a2_x = sum(d * d for d in c_degree.values())
        curr_mod = e_xx * const - a2_x * const * const
        trajectory.append(curr_mod)

        if resistance_phase is not None and resistance_phase > 1:
            # guarded by ``if (phase > 1)`` in the reference
            # (parallelLouvainMethodFastTrackResistance.cpp:193): phase 1
            # keeps the -1.0 sentinel and exits on the plain threshold
            w_2 = 1.0 / const if const > 0 else 0.0
            n_c = sum(s * s for s in c_size.values())
            nd = float(nv) - (n_c / float(nv)) if nv > 0 else 0.0
            r_min = (-(w_2) / nd) * curr_mod if nd != 0 else 0.0
            denom = w_2 - float(nv) * r_min
            q_afg = ((w_2 * curr_mod) + (r_min * nd)) / denom if denom != 0 else 0.0
            res_traj.append({
                "it": num_iters,
                "sum_size_sq": int(n_c),
                "curr_mod": curr_mod,
                "r_min": r_min,
                "q_afg": q_afg,
            })
            stop = q_afg == 0
        else:
            stop = (curr_mod - prev_mod) < thresh
        # force_sweeps (gate-only): run exactly max_inner sweeps — see
        # operators/louvain_variants._base_phase
        if (stop and not force_sweeps) or num_iters >= max_inner:
            break

        prev_mod = curr_mod if curr_mod >= lower else lower
        for i, frm, to in moves:
            c_degree[to] = c_degree.get(to, 0.0) + deg[i]
            c_size[to] = c_size.get(to, 0) + 1
            c_degree[frm] = c_degree.get(frm, 0.0) - deg[i]
            c_size[frm] = c_size.get(frm, 0) - 1
        past = curr
        curr = target

    return {
        "C": past, "modularity": prev_mod, "num_iters": num_iters,
        "trajectory": trajectory, "r_min": r_min, "q_afg": q_afg,
        "fin_mod": curr_mod, "res_traj": res_traj,
    }


def directed_louvain_np(edges, nv, thresh=1e-6, lower=-1.0, max_inner=1000):
    """Directed Louvain phase (ref C8): out-view sweep, const = 2/m."""
    return base_phase_np(edges, nv, const_factor=2.0, thresh=thresh,
                         lower=lower, max_inner=max_inner)


def fasttrack_resistance_np(edges, nv, threshold=1e-6, max_phases=200,
                            max_total_iters=10000, max_inner=1000):
    """Multi-phase FastTrackResistance driver
    (``runMultiPhaseBasicFastTrackResistance.cpp:60-160``): phase 1 exits
    on the threshold, later phases on Q_AFG == 0; coarsen while
    Q_AFG != 0; caps 200 phases / 10000 iterations. Engine twin:
    ``operators.louvain_variants.louvain_fasttrack_resistance``.
    """
    g_edges, g_nv = list(edges), nv
    c_orig = None
    phase = 1
    tot_iters = 0
    num_clusters = 0
    trajectory = []
    schedule = []
    res = {"q_afg": -1.0}

    while True:
        res = base_phase_np(
            g_edges, g_nv, const_factor=1.0, thresh=threshold,
            lower=res["q_afg"], max_inner=max_inner, resistance_phase=phase,
        )
        tot_iters += res["num_iters"]
        schedule.append(res["num_iters"])
        c, num_clusters = renumber_np(res["C"])
        trajectory.append(res["fin_mod"])
        if phase == 1:
            c_orig = list(c)
        else:
            c_orig = [c[x] if x >= 0 else x for x in c_orig]
        if phase > max_phases or tot_iters > max_total_iters:
            break
        if res["q_afg"] == 0:
            break
        if num_clusters == g_nv:
            break  # coarsening fixpoint (engine guard)
        g_edges, _ = coarsen_np(g_edges, c, num_clusters)
        g_nv = num_clusters
        phase += 1

    return {
        "C": c_orig, "modularity": res["fin_mod"], "r_min": res["r_min"],
        "q_afg": res["q_afg"], "phases": phase, "total_iters": tot_iters,
        "num_clusters": num_clusters, "trajectory": trajectory,
        # per-phase sweep counts — the unroll schedule for the DuckDB twin
        # (oracle/louvain_sql.resistance_multiphase_sql); depths only, every
        # value is recomputed by DuckDB from the tables
        "schedule": schedule,
    }


# ---------------------------------------------------------------------------
# Reverse Cuthill-McKee ordering (W4/C21)
# ---------------------------------------------------------------------------

def rcm_ordering_np(edges, nv):
    """Deterministic RCM old->new ordering — engine-spec twin.

    Reference seed: ``algoReverseCuthillMcKee(Strict)``
    (``reverseCuthillMcKee.cpp:40-508``). The reference's within-level
    order is scheduling-dependent (atomic fetch-add placement in the plain
    variant; an unstable binary heap fed in racy discovery order — and a
    use-after-free of the degree array — in the Strict variant), so the
    engine keeps the CONTRACT (min-degree-source BFS, degree-ascending
    levels, reversed at the end: ``pOrder[R[i]] = NV-1-i``, ``:227-230``)
    with clean total orders: ties break to the smaller vid, isolated
    vertices enter R first in vid order (``:84-89``), components are
    visited in order of their min-(degree, vid) source (the reference's
    next-unvisited-min-degree heap pop, ``:178-205``).

    Returns (p_order old->new list, n_components).
    """
    adj = [set() for _ in range(nv)]
    degree = [0] * nv
    for s, d, _ in edges:
        s, d = int(s), int(d)
        adj[s].add(d)
        degree[s] += 1  # CSR row length: every stored row counts

    R = [v for v in range(nv) if degree[v] == 0]  # isolated first, vid order
    visited = [degree[v] == 0 for v in range(nv)]

    # component sources in (degree, vid) order
    order = sorted((v for v in range(nv) if degree[v] > 0),
                   key=lambda v: (degree[v], v))
    n_cc = 0
    for src in order:
        if visited[src]:
            continue
        n_cc += 1
        visited[src] = True
        R.append(src)
        frontier = [src]
        while frontier:
            nxt = set()
            for v in frontier:
                for x in adj[v]:
                    if not visited[x]:
                        nxt.add(x)
            level = sorted(nxt, key=lambda v: (degree[v], v))
            for x in level:
                visited[x] = True
                R.append(x)
            frontier = level

    p_order = [0] * nv
    for i, v in enumerate(R):
        p_order[v] = nv - i - 1
    return p_order, n_cc


def louvain_schedule_np(
    edges, nv, max_phases=200, max_total_iters=100000, max_inner=25,
):
    """Per-phase sweep counts of the exact ``louvain_multiphase_np`` run —
    the unroll schedule for ``oracle.louvain_sql.louvain_multiphase_sql``.

    Replays the identical driver loop (phase exits are structural:
    ``change``/fixpoint/caps — never value-thresholded) and records each
    phase's ``num_iters``. The counts parameterize only the SQL twin's
    unroll DEPTH; all values are recomputed by DuckDB from the tables.
    """
    g_edges, g_nv = list(edges), nv
    phase, tot_iters = 1, 0
    sched = []
    while True:
        c, _mod, iters, change, _ = louvain_phase_np(
            g_edges, g_nv, max_inner=max_inner
        )
        tot_iters += iters
        sched.append(iters)
        c, num_clusters = renumber_np(c)
        if phase > max_phases or tot_iters > max_total_iters:
            break
        if num_clusters == g_nv:
            break  # coarsening fixpoint
        if change:
            g_edges, g_nv = coarsen_np(g_edges, c, num_clusters)
            phase += 1
        else:
            break
    return sched
