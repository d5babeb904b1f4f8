"""ANSI-SQL twin of the Louvain phase-1 sweep chain, unrolled.

``louvain_sweeps_sql(k)`` emits the CTE chain computing EXACTLY what
``operators.louvain.louvain_phase(..., max_inner=k)`` returns for the
vertices that have at least one edge row: the greedy init
(``initCommAssOptVec_SFP``, ``vectorizedLouvainMethod.cpp:194``) followed
by ``k-1`` full gain-argmax sweeps applied unconditionally.

Why ``k-1`` and unconditional application are exact:

* the engine returns the assignment the FINAL sweep read, i.e. the state
  after sweeps ``1..k-1`` were applied (sweep ``k``'s target is computed
  only for the stats action and discarded);
* if some sweep ``j < k`` moves nothing the engine exits early and
  returns the state sweep ``j`` read — but a no-move sweep's target IS
  its input (every vertex keeps ``sc``), so applying the remaining
  sweeps unconditionally is the identity and both paths agree.

Float safety: edge weights in the gated corpora are integer-valued, so
every aggregate (``eiy``, ``degree``, ``c_degree``) is an exact float64;
the gain expression keeps the engine's association order
(``2*(eiy-eix) - 2*deg*(ay-ax)*const``, left-associated — see
``operators/louvain.py:_gain``), so engine and DuckDB evaluate the same
IEEE expression on the same exact inputs and every comparison
(``gain > 0``, argmax ordering) is deterministic on both sides.

Requires an ``edges(src, dst, weight)`` CTE in scope (symmetric rows,
like every engine edge table). Emits CTEs named ``lv_*`` / ``lv_s{i}``
and no final SELECT — append ``SELECT vid, comm FROM lv_s{k-1}``.
"""

from __future__ import annotations


def _init_cte(p: str = "lv", edges: str = "edges") -> str:
    return f"""
        {p}_deg AS MATERIALIZED (SELECT src AS vid, SUM(weight) AS degree FROM {edges} GROUP BY src),
        {p}_cf AS (SELECT 1.0 / SUM(weight) AS c FROM {edges}),
        {p}_self AS MATERIALIZED (
            SELECT src AS vid, SUM(weight) AS self_w FROM {edges}
            WHERE src = dst GROUP BY src
        ),
        {p}_g0 AS (
            SELECT e.src, e.dst,
                   (2.0 * (e.weight - 0.0))
                   - (2.0 * d1.degree * (d2.degree - 0.0) * (SELECT c FROM {p}_cf)) AS gain
            FROM {edges} e
            JOIN {p}_deg d1 ON e.src = d1.vid
            JOIN {p}_deg d2 ON e.dst = d2.vid
            WHERE e.src <> e.dst
        ),
        {p}_b0 AS (
            SELECT src, dst AS best FROM (
                SELECT src, dst,
                       ROW_NUMBER() OVER (PARTITION BY src
                                          ORDER BY gain DESC, dst ASC) AS rn
                FROM {p}_g0 WHERE gain > 0
            ) WHERE rn = 1
        ),
        {p}_s0 AS MATERIALIZED (
            SELECT v.vid,
                   CAST(CASE WHEN b.best IS NOT NULL AND b.best < v.vid
                             THEN b.best ELSE v.vid END AS BIGINT) AS comm
            FROM {p}_deg v LEFT JOIN {p}_b0 b ON b.src = v.vid
        )"""


def _sweep_cte(i: int, p: str = "lv", edges: str = "edges") -> str:
    """One full sweep: state ``{p}_s{i-1}`` -> ``{p}_s{i}``.

    Mirrors the engine sweep 1:1 (``operators/louvain.py:486-586``):
    community info off the current assignment, per-(vertex, neighbour
    community) weights, reference gain, max-gain/min-cid argmax, and the
    singleton swap protection (``utilityClusteringFunctions.cpp:757-759``).
    """
    s = f"{p}_s{i - 1}"
    return f"""
        {p}_info{i} AS MATERIALIZED (
            SELECT s.comm, COUNT(*) AS c_size, SUM(d.degree) AS c_degree
            FROM {s} s JOIN {p}_deg d USING (vid) GROUP BY s.comm
        ),
        {p}_cand{i} AS MATERIALIZED (
            SELECT e.src, sd.comm AS comm_dst, SUM(e.weight) AS eiy
            FROM {edges} e JOIN {s} sd ON e.dst = sd.vid
            GROUP BY e.src, sd.comm
        ),
        {p}_base{i} AS MATERIALIZED (
            SELECT s.vid, s.comm AS sc, d.degree, i.c_size AS size_sc,
                   COALESCE(c.eiy, 0.0) - COALESCE(sw.self_w, 0.0) AS eix,
                   i.c_degree - d.degree AS ax
            FROM {s} s
            JOIN {p}_deg d USING (vid)
            JOIN {p}_info{i} i ON i.comm = s.comm
            LEFT JOIN {p}_cand{i} c ON c.src = s.vid AND c.comm_dst = s.comm
            LEFT JOIN {p}_self sw ON sw.vid = s.vid
        ),
        {p}_scored{i} AS (
            SELECT b.vid, b.sc, c.comm_dst, b.size_sc, iy.c_size AS size_y,
                   (2.0 * (c.eiy - b.eix))
                   - (2.0 * b.degree * (iy.c_degree - b.ax)
                      * (SELECT cf.c FROM {p}_cf cf)) AS gain
            FROM {p}_cand{i} c
            JOIN {p}_base{i} b ON b.vid = c.src
            JOIN {p}_info{i} iy ON iy.comm = c.comm_dst
            WHERE c.comm_dst <> b.sc
        ),
        {p}_best{i} AS (
            SELECT vid, cand_comm, cand_size FROM (
                SELECT vid, comm_dst AS cand_comm, size_y AS cand_size,
                       ROW_NUMBER() OVER (PARTITION BY vid
                                          ORDER BY gain DESC, comm_dst ASC) AS rn
                FROM {p}_scored{i} WHERE gain > 0
            ) WHERE rn = 1
        ),
        {p}_s{i} AS MATERIALIZED (
            SELECT b.vid,
                   CAST(CASE WHEN t.cand_comm IS NULL THEN b.sc
                             WHEN t.cand_size = 1 AND b.size_sc = 1
                                  AND t.cand_comm > b.sc THEN b.sc
                             ELSE t.cand_comm END AS BIGINT) AS comm
            FROM {p}_base{i} b LEFT JOIN {p}_best{i} t ON t.vid = b.vid
        )"""


def louvain_sweeps_sql(k: int, prefix: str = "lv",
                       edges: str = "edges") -> tuple[str, str]:
    """Returns (cte_block, final_state_name) for ``max_inner=k``.

    ``prefix``/``edges`` let two independent phase chains coexist in one
    statement (see ``louvain_two_phase_sql``)."""
    if k < 1:
        raise ValueError("k >= 1")
    parts = [_init_cte(prefix, edges)]
    parts += [_sweep_cte(i, prefix, edges) for i in range(1, k)]
    return ",".join(parts), f"{prefix}_s{k - 1}"


def _renumber_cte(state: str, out: str) -> str:
    """First-occurrence (= min-vid) dense renumber of ``state(vid, comm)``
    -> ``{out}_map(comm, new_comm)`` + ``{out}(vid, comm)`` — the SQL twin
    of ``operators.louvain.renumber`` (ref W1, ``buildNextPhase.cpp:
    48-79``). ROW_NUMBER over the per-community MIN(vid) equals the
    engine's dense_rank because first_vid is unique per community."""
    return f"""
        {out}_map AS (
            SELECT comm, ROW_NUMBER() OVER (ORDER BY first_vid) - 1 AS new_comm
            FROM (SELECT comm, MIN(vid) AS first_vid FROM {state} GROUP BY comm)
        ),
        {out} AS MATERIALIZED (
            SELECT s.vid, CAST(m.new_comm AS BIGINT) AS comm
            FROM {state} s JOIN {out}_map m USING (comm)
        )"""


def louvain_two_phase_sql(k1: int, k2: int) -> tuple[str, str]:
    """SQL twin of one fixed-budget multi-phase Louvain step chain
    (``runMultiPhaseBasic.cpp:66-204`` with both phases' sweep budgets
    pinned): phase-1 sweeps (``max_inner=k1``) -> first-occurrence
    renumber -> community-aggregation coarsen (ref C11,
    ``buildNextPhase.cpp:145-236``) -> phase-2 sweeps on the coarse graph
    (``max_inner=k2``) -> renumber -> project C_orig[v] = C2[C1[v]]
    (ref J3, ``runMultiPhaseBasic.cpp:112-124``).

    Exactness carries through the coarsen: coarse weights are sums of the
    corpus's integer-valued weights, so every phase-2 aggregate is an
    exact float64 and the shared gain expression stays bit-deterministic.
    Every phase-1 community appears as a src in the coarse table (each
    member has an edge row, which coarsens to a row with that community
    as src), so the projection join is total. Requires an
    ``edges(src, dst, weight)`` CTE in scope; returns
    (cte_block, final_name) with final columns (vid, comm).
    """
    c1, f1 = louvain_sweeps_sql(k1)
    bridge = _renumber_cte(f1, "tp_c1") + f""",
        tp_edges2 AS MATERIALIZED (
            SELECT cs.comm AS src, cd.comm AS dst, SUM(e.weight) AS weight
            FROM edges e
            JOIN tp_c1 cs ON e.src = cs.vid
            JOIN tp_c1 cd ON e.dst = cd.vid
            GROUP BY cs.comm, cd.comm
        )"""
    c2, f2 = louvain_sweeps_sql(k2, prefix="l2", edges="tp_edges2")
    final = _renumber_cte(f2, "tp_c2") + """,
        tp_out AS (
            SELECT c.vid, r.comm
            FROM tp_c1 c JOIN tp_c2 r ON r.vid = c.comm
        )"""
    return ",".join([c1, bridge, c2, final]), "tp_out"


# ---------------------------------------------------------------------------
# Base-path variant twin (directed Louvain, ref C8) — singleton init,
# pastCommAss return semantics, reference community-slot bookkeeping.
# ---------------------------------------------------------------------------

def _dv_init_cte(const_factor: float, p: str = "dv", edges: str = "dedges",
                 verts: str = "dverts") -> str:
    return f"""
        {p}_deg AS MATERIALIZED (
            SELECT src AS vid, SUM(weight) AS degree FROM {edges} GROUP BY src
        ),
        {p}_cf AS (SELECT {const_factor!r} / SUM(weight) AS c FROM {edges}),
        {p}_self AS MATERIALIZED (
            SELECT src AS vid, SUM(weight) AS self_w FROM {edges}
            WHERE src = dst GROUP BY src
        ),
        {p}_s0 AS MATERIALIZED (
            SELECT CAST(vid AS BIGINT) AS vid, CAST(vid AS BIGINT) AS comm
            FROM {verts}
        )"""


def _dv_sweep_cte(i: int, p: str = "dv", edges: str = "dedges") -> str:
    """One applied base-path sweep: state ``dv_s{i-1}`` -> ``dv_s{i}``.

    Mirrors ``operators.louvain_variants._base_phase`` 1:1: community info
    with the reference's per-vertex SLOT semantics (a -1 vertex still
    occupies its own singleton slot — ``_slots_info``), out-view candidate
    weights, reference gain under const_factor/sum(deg), candidate
    communities with id < 0 skipped (cInfo[-1] UB spec), max-gain/min-cid
    argmax, singleton swap protection, and the -1 fill for vertices with
    no out-rows (ref ``parallelDirectedLouvainMethod.cpp:174-176``).
    """
    s = f"{p}_s{i - 1}"
    return f"""
        {p}_info{i} AS MATERIALIZED (
            SELECT CASE WHEN s.comm < 0 THEN s.vid ELSE s.comm END AS comm,
                   COUNT(*) AS c_size,
                   COALESCE(SUM(d.degree), 0.0) AS c_degree
            FROM {s} s LEFT JOIN {p}_deg d USING (vid)
            GROUP BY 1
        ),
        {p}_cand{i} AS MATERIALIZED (
            SELECT e.src, sd.comm AS comm_dst, SUM(e.weight) AS eiy
            FROM {edges} e JOIN {s} sd ON e.dst = sd.vid
            GROUP BY e.src, sd.comm
        ),
        {p}_base{i} AS MATERIALIZED (
            SELECT s.vid, s.comm AS sc, d.degree, i.c_size AS size_sc,
                   COALESCE(c.eiy, 0.0) - COALESCE(sw.self_w, 0.0) AS eix,
                   i.c_degree - d.degree AS ax
            FROM {s} s
            JOIN {p}_deg d USING (vid)
            JOIN {p}_info{i} i ON i.comm = s.comm
            LEFT JOIN {p}_cand{i} c ON c.src = s.vid AND c.comm_dst = s.comm
            LEFT JOIN {p}_self sw ON sw.vid = s.vid
        ),
        {p}_scored{i} AS (
            SELECT b.vid, b.sc, c.comm_dst, b.size_sc, iy.c_size AS size_y,
                   (2.0 * (c.eiy - b.eix))
                   - (2.0 * b.degree * (iy.c_degree - b.ax)
                      * (SELECT cf.c FROM {p}_cf cf)) AS gain
            FROM {p}_cand{i} c
            JOIN {p}_base{i} b ON b.vid = c.src
            JOIN {p}_info{i} iy ON iy.comm = c.comm_dst
            WHERE c.comm_dst >= 0 AND c.comm_dst <> b.sc
        ),
        {p}_best{i} AS (
            SELECT vid, cand_comm, cand_size FROM (
                SELECT vid, comm_dst AS cand_comm, size_y AS cand_size,
                       ROW_NUMBER() OVER (PARTITION BY vid
                                          ORDER BY gain DESC, comm_dst ASC) AS rn
                FROM {p}_scored{i} WHERE gain > 0
            ) WHERE rn = 1
        ),
        {p}_s{i} AS MATERIALIZED (
            SELECT v.vid, CAST(COALESCE(t.comm, -1) AS BIGINT) AS comm
            FROM {p}_s0 v LEFT JOIN (
                SELECT b.vid,
                       CASE WHEN t.cand_comm IS NULL THEN b.sc
                            WHEN t.cand_size = 1 AND b.size_sc = 1
                                 AND t.cand_comm > b.sc THEN b.sc
                            ELSE t.cand_comm END AS comm
                FROM {p}_base{i} b LEFT JOIN {p}_best{i} t ON t.vid = b.vid
            ) t USING (vid)
        )"""


def directed_sweeps_sql(max_inner: int, const_factor: float = 2.0) -> tuple[str, str]:
    """SQL twin of ``_base_phase(edges, nv, const_factor, thresh=-inf,
    max_inner=max_inner)``: with the threshold stop disabled the phase runs
    exactly ``max_inner`` sweeps and returns pastCommAss — the state the
    second-to-last sweep READ, i.e. after sweeps ``1..max_inner-2`` were
    applied (double-buffer swap, ``parallelDirectedLouvainMethod.cpp:
    236-241``). Requires ``dedges(src, dst, weight)`` (directed out-rows)
    and ``dverts(vid)`` (the full 0..nv-1 vertex universe) CTEs in scope.
    Returns (cte_block, final_state_name).
    """
    if max_inner < 2:
        raise ValueError("max_inner >= 2 (one computed sweep minimum)")
    applied = max_inner - 2
    parts = [_dv_init_cte(const_factor)]
    parts += [_dv_sweep_cte(i) for i in range(1, applied + 1)]
    return ",".join(parts), f"dv_s{applied}"


# ---------------------------------------------------------------------------
# FastTrackResistance bookkeeping twin (ref C9) — per-sweep r_min / Q_AFG
# scalars of the undirected base path, phase>1 semantics.
# ---------------------------------------------------------------------------

def _rs_stat_cte(i: int) -> str:
    """Per-sweep raw aggregates off the state sweep ``i`` READ (the same
    ``dv_info{i}``/``dv_base{i}`` CTEs the sweep itself uses):

    * ``e_xx`` = Σ_v(own community weight) over vertices with out-rows —
      reassembled exactly as Σ eix + Σ self_w (``own_w = eix + self_w``
      per row; every self-loop owner has out-rows, and all terms are
      integer-valued so the regrouped sum is bit-equal);
    * ``a2_x`` = Σ_c c_degree² over the reference's community slots —
      the engine's observed Σ degree·(ax+degree) collapses to the same
      value (non-out slot members carry degree 0);
    * ``sum_size_sq`` = Σ_c c_size² (the Nd term; -1 vertices keep their
      own singleton slot, exactly ``dv_info``'s remap).
    """
    return f"""
        rs_stat{i} AS (
            SELECT CAST({i} AS BIGINT) AS it,
                   (SELECT SUM(x.c_size * x.c_size) FROM dv_info{i} x)
                       AS sum_size_sq,
                   (SELECT SUM(b.eix) FROM dv_base{i} b)
                   + (SELECT COALESCE(SUM(self_w), 0.0) FROM dv_self)
                       AS e_xx,
                   (SELECT SUM(x.c_degree * x.c_degree) FROM dv_info{i} x)
                       AS a2_x
        )"""


def resistance_stats_sql(sweeps: int, const_factor: float = 1.0) -> tuple[str, str]:
    """SQL twin of ``operators.louvain_variants.resistance_sweep_stats``:
    one row per sweep ``1..sweeps`` with (it, sum_size_sq, curr_mod,
    r_min, q_afg), the Granell-Arenas bookkeeping of
    ``parallelLouvainMethodFastTrackResistance.cpp:192-218`` under phase>1
    semantics. Every arithmetic expression keeps the engine's (Python
    float) association order so both sides evaluate the same IEEE
    expression on exact integer-valued aggregate inputs:

    * ``curr_mod = e_xx*c - a2_x*c*c``  (c = const_factor/Σw)
    * ``w_2 = 1.0/c`` (NOT Σw — 1/(1/Σw) may differ in the last ulp)
    * ``nd = nv - sum_size_sq/nv``; ``r_min = (-w_2/nd)*curr_mod``
    * ``q_afg = (w_2*curr_mod + r_min*nd) / (w_2 - nv*r_min)``

    Requires ``dedges(src, dst, weight)`` and ``dverts(vid)`` CTEs in
    scope (symmetric rows for the undirected resistance variant). Returns
    (cte_block, final_name) — final has no guard rows: nd == 0 or a zero
    denominator yields the engine's 0.0 fallbacks via CASE.
    """
    if sweeps < 1:
        raise ValueError("sweeps >= 1")
    parts = [_dv_init_cte(const_factor)]
    # sweep CTEs up to ``sweeps`` so rs_stat{i} can read dv_info/base{i};
    # the final state CTE of sweep ``sweeps`` is simply never referenced
    parts += [_dv_sweep_cte(i) for i in range(1, sweeps + 1)]
    parts += [_rs_stat_cte(i) for i in range(1, sweeps + 1)]
    union = " UNION ALL ".join(
        f"SELECT * FROM rs_stat{i}" for i in range(1, sweeps + 1)
    )
    parts.append(f"""
        rs_k AS (
            SELECT (SELECT c FROM dv_cf) AS c,
                   1.0 / (SELECT c FROM dv_cf) AS w_2,
                   CAST((SELECT COUNT(*) FROM dverts) AS DOUBLE) AS nv
        ),
        rs_mod AS (
            SELECT s.it, s.sum_size_sq, k.w_2, k.nv,
                   s.e_xx * k.c - s.a2_x * k.c * k.c AS curr_mod,
                   k.nv - (CAST(s.sum_size_sq AS DOUBLE) / k.nv) AS nd
            FROM ({union}) s CROSS JOIN rs_k k
        ),
        rs_r AS (
            SELECT it, sum_size_sq, w_2, nv, curr_mod, nd,
                   CASE WHEN nd <> 0 THEN ((-w_2) / nd) * curr_mod
                        ELSE 0.0 END AS r_min
            FROM rs_mod
        ),
        rs_out AS (
            SELECT it, CAST(sum_size_sq AS BIGINT) AS sum_size_sq,
                   curr_mod, r_min,
                   CASE WHEN (w_2 - nv * r_min) <> 0
                        THEN ((w_2 * curr_mod) + (r_min * nd))
                             / (w_2 - nv * r_min)
                        ELSE 0.0 END AS q_afg
            FROM rs_r
        )""")
    return ",".join(parts), "rs_out"


# ---------------------------------------------------------------------------
# Full multi-phase convergence twin (ref C10, ``runMultiPhaseBasic.cpp:
# 66-204``) — the ENTIRE ``louvain()`` driver run unrolled, given the
# observed per-phase sweep counts.
# ---------------------------------------------------------------------------

def louvain_multiphase_sql(schedule, allv: str = "allv",
                           edges: str = "edges") -> tuple[str, str]:
    """SQL twin of the full convergence ``louvain()`` run.

    ``schedule`` = per-phase sweep counts (``PhaseResult.num_iters`` for
    each executed phase). The counts are ONLY unroll depths — every value
    (degrees, gains, argmaxes, renumbers, coarse weights) is recomputed by
    DuckDB from the base tables. The schedule is well-defined because the
    engine's phase exits are purely structural (``moved == 0`` or
    ``max_inner`` inside a phase; ``change``/fixpoint between phases —
    ``operators/louvain.py``), and phase ``p`` returns the state after
    ``schedule[p]-1`` applied sweeps regardless of which exit fired
    (a no-move sweep's target is its input, so the unrolled chain and the
    early-exit chain agree — see ``louvain_sweeps_sql``).

    Chain per phase: sweeps -> full-vertex fill (phase 1 only: isolated
    vertices are -1 when the returned state is a sweep target, their own
    vid when the phase stopped on its first sweep — ``operators/
    louvain.py:702-712``) -> first-occurrence renumber (-1 passthrough)
    -> C_orig projection (ref J3) -> community-aggregation coarsen (ref
    C11) feeding the next phase. Coarse weights are sums of the corpus's
    integer-valued weights, so every aggregate stays an exact float64 and
    the shared gain expression is bit-deterministic (same argument as
    ``louvain_two_phase_sql``).

    Requires ``edges(src, dst, weight)`` (symmetric rows) and
    ``{allv}(vid)`` (the full 0..nv-1 vertex universe) CTEs in scope.
    Returns (cte_block, final_name) with final columns (vid, comm).
    """
    schedule = list(schedule)
    if not schedule or any(k < 1 for k in schedule):
        raise ValueError("schedule must be >= 1 sweeps per phase")
    parts = []
    edges_rel = edges
    corig = None
    for p, k in enumerate(schedule, 1):
        pref = f"mp{p}"
        ctes, fin = louvain_sweeps_sql(k, prefix=pref, edges=edges_rel)
        parts.append(ctes)
        if p == 1:
            # isolated vertices (no edge rows): -1 once any sweep target
            # was returned, own vid if the phase stopped on sweep 1
            iso = "-1" if k >= 2 else "v.vid"
            parts.append(f"""
        {pref}_full AS (
            SELECT v.vid, CAST(COALESCE(s.comm, {iso}) AS BIGINT) AS comm
            FROM {allv} v LEFT JOIN {fin} s USING (vid)
        ),
        {pref}_rmap AS (
            SELECT comm, ROW_NUMBER() OVER (ORDER BY first_vid) - 1 AS new_comm
            FROM (SELECT comm, MIN(vid) AS first_vid FROM {pref}_full
                  WHERE comm >= 0 GROUP BY comm)
        ),
        {pref}_c AS MATERIALIZED (
            SELECT s.vid, CAST(COALESCE(m.new_comm, s.comm) AS BIGINT) AS comm
            FROM {pref}_full s LEFT JOIN {pref}_rmap m USING (comm)
        )""")
            corig = f"{pref}_c"
        else:
            # coarse graphs have no isolated vertices (every community has
            # a member edge row, which coarsens to a row with that
            # community as src) — the sweep state is already total
            parts.append(_renumber_cte(fin, f"{pref}_c"))
            parts.append(f"""
        {pref}_o AS MATERIALIZED (
            SELECT o.vid, CAST(COALESCE(m.comm, o.comm) AS BIGINT) AS comm
            FROM {corig} o LEFT JOIN {pref}_c m ON m.vid = o.comm
        )""")
            corig = f"{pref}_o"
        if p < len(schedule):
            nxt = f"mpe{p + 1}"
            parts.append(f"""
        {nxt} AS MATERIALIZED (
            SELECT cs.comm AS src, cd.comm AS dst, SUM(e.weight) AS weight
            FROM {edges_rel} e
            JOIN {pref}_c cs ON e.src = cs.vid
            JOIN {pref}_c cd ON e.dst = cd.vid
            GROUP BY cs.comm, cd.comm
        )""")
            edges_rel = nxt
    return ",".join(parts), corig


# ---------------------------------------------------------------------------
# Full-convergence base-path twins (ref C8 single phase, ref C9 multi-phase)
# — observed sweep/phase counts as unroll depths, like louvain_multiphase_sql.
# ---------------------------------------------------------------------------

def base_phase_full_sql(num_iters: int, const_factor: float = 2.0,
                        prefix: str = "dv", edges: str = "dedges",
                        verts: str = "dverts") -> tuple[str, str]:
    """SQL twin of a full-convergence ``_base_phase`` run OBSERVED to
    execute ``num_iters`` sweeps (``base_phase_np(...)["num_iters"]``):
    the returned pastCommAss is the state the second-to-last sweep read,
    i.e. after ``max(num_iters - 2, 0)`` applied sweeps (double-buffer
    swap, ``parallelDirectedLouvainMethod.cpp:236-241``; a run stopping on
    sweep 1 or 2 returns the singleton init). The count parameterizes only
    the unroll DEPTH — every value is recomputed from the tables, and a
    wrong count can only surface as a visible hash mismatch (the engine ≡
    numpy equality is pytest-gated). Requires ``{edges}(src, dst, weight)``
    (out-rows) and ``{verts}(vid)`` CTEs in scope. Returns
    (cte_block, final_state_name).
    """
    applied = max(int(num_iters) - 2, 0)
    parts = [_dv_init_cte(const_factor, prefix, edges, verts)]
    parts += [_dv_sweep_cte(i, prefix, edges) for i in range(1, applied + 1)]
    return ",".join(parts), f"{prefix}_s{applied}"


def resistance_multiphase_sql(schedule, edges: str = "edges",
                              verts: str = "allv") -> tuple[str, str]:
    """SQL twin of the ENTIRE ``louvain_fasttrack_resistance()`` run
    (ref C9, ``runMultiPhaseBasicFastTrackResistance.cpp:60-160``).

    ``schedule`` = per-phase observed sweep counts
    (``fasttrack_resistance_np(...)["schedule"]`` — the identical driver
    loop). Counts are unroll depths only; the per-phase chain mirrors the
    engine 1:1:

    * undirected base-path sweeps (const = 1/2m, pastCommAss return —
      ``base_phase_full_sql``), state total over the phase's vertex
      universe with -1 for out-isolated vertices;
    * first-occurrence dense renumber with -1 passthrough
      (``operators.louvain.renumber``);
    * C_orig projection ``c_orig[v] = c_p[c_orig[v]]`` for ``c_orig[v] >=
      0``, -1 rows untouched (``louvain_fasttrack_resistance``'s coalesce
      join ≡ the numpy twin's ``c[x] if x >= 0 else x``);
    * community-aggregation coarsen feeding the next phase; the coarse
      vertex universe is the dense renumbered community ids (``DISTINCT
      comm >= 0`` ≡ ``range(num_clusters)``).

    Coarse weights are sums of integer-valued corpus weights, so every
    aggregate is an exact float64 and the shared gain expression is
    bit-deterministic (same argument as ``louvain_multiphase_sql``).
    Requires ``{edges}(src, dst, weight)`` (symmetric rows) and
    ``{verts}(vid)`` (full 0..nv-1 universe) CTEs in scope. Returns
    (cte_block, final_name) with final columns (vid, comm).
    """
    schedule = list(schedule)
    if not schedule or any(k < 1 for k in schedule):
        raise ValueError("schedule must be >= 1 sweeps per phase")
    parts = []
    edges_rel, verts_rel = edges, verts
    corig = None
    for p, k in enumerate(schedule, 1):
        pref = f"rm{p}"
        ctes, fin = base_phase_full_sql(k, 1.0, pref, edges_rel, verts_rel)
        parts.append(ctes)
        # -1-aware first-occurrence renumber (isolated rows pass through)
        parts.append(f"""
        {pref}_rmap AS (
            SELECT comm, ROW_NUMBER() OVER (ORDER BY first_vid) - 1 AS new_comm
            FROM (SELECT comm, MIN(vid) AS first_vid FROM {fin}
                  WHERE comm >= 0 GROUP BY comm)
        ),
        {pref}_c AS MATERIALIZED (
            SELECT s.vid, CAST(COALESCE(m.new_comm, s.comm) AS BIGINT) AS comm
            FROM {fin} s LEFT JOIN {pref}_rmap m USING (comm)
        )""")
        if p == 1:
            corig = f"{pref}_c"
        else:
            parts.append(f"""
        {pref}_o AS MATERIALIZED (
            SELECT o.vid,
                   CAST(CASE WHEN o.comm >= 0 THEN m.comm
                             ELSE o.comm END AS BIGINT) AS comm
            FROM {corig} o LEFT JOIN {pref}_c m ON m.vid = o.comm
        )""")
            corig = f"{pref}_o"
        if p < len(schedule):
            nxt_e, nxt_v = f"rme{p + 1}", f"rmv{p + 1}"
            parts.append(f"""
        {nxt_e} AS MATERIALIZED (
            SELECT cs.comm AS src, cd.comm AS dst, SUM(e.weight) AS weight
            FROM {edges_rel} e
            JOIN {pref}_c cs ON e.src = cs.vid
            JOIN {pref}_c cd ON e.dst = cd.vid
            GROUP BY cs.comm, cd.comm
        ),
        {nxt_v} AS (SELECT DISTINCT comm AS vid FROM {pref}_c WHERE comm >= 0)""")
            edges_rel, verts_rel = nxt_e, nxt_v
    return ",".join(parts), corig


# ---------------------------------------------------------------------------
# Full coloring-driver twin (ref C12, ``runMultiPhaseColoring.cpp:51-239``)
# — colored Gauss-Seidel phases + the basic-driver tail, fully unrolled.
# ---------------------------------------------------------------------------

def _cp_class_cte(j: int, k: int, p: str, edges: str, colors: str) -> str:
    """One Gauss-Seidel class step: state ``{p}_s{j-1}`` + color class
    ``k`` -> ``{p}_s{j}``. Mirrors ``operators.louvain.louvain_phase_colored``
    1:1 (``parallelLouvainWithColoring.cpp:158-262``): community info off
    the CURRENT state (refreshed after every class), class-restricted
    candidate weights, reference gain, max-gain/min-cid argmax, singleton
    swap protection, moves applied in place."""
    s = f"{p}_s{j - 1}"
    return f"""
        {p}_info{j} AS MATERIALIZED (
            SELECT s.comm, COUNT(*) AS c_size, SUM(d.degree) AS c_degree
            FROM {s} s JOIN {p}_deg d USING (vid) GROUP BY s.comm
        ),
        {p}_cand{j} AS MATERIALIZED (
            SELECT e.src, sd.comm AS comm_dst, SUM(e.weight) AS eiy
            FROM {edges} e
            JOIN {colors} cs ON cs.vid = e.src AND cs.color = {k}
            JOIN {s} sd ON e.dst = sd.vid
            GROUP BY e.src, sd.comm
        ),
        {p}_base{j} AS MATERIALIZED (
            SELECT s.vid, s.comm AS sc, d.degree, i.c_size AS size_sc,
                   COALESCE(c.eiy, 0.0) - COALESCE(sw.self_w, 0.0) AS eix,
                   i.c_degree - d.degree AS ax
            FROM {s} s
            JOIN {colors} cl ON cl.vid = s.vid AND cl.color = {k}
            JOIN {p}_deg d ON d.vid = s.vid
            JOIN {p}_info{j} i ON i.comm = s.comm
            LEFT JOIN {p}_cand{j} c ON c.src = s.vid AND c.comm_dst = s.comm
            LEFT JOIN {p}_self sw ON sw.vid = s.vid
        ),
        {p}_scored{j} AS (
            SELECT b.vid, b.sc, c.comm_dst, b.size_sc, iy.c_size AS size_y,
                   (2.0 * (c.eiy - b.eix))
                   - (2.0 * b.degree * (iy.c_degree - b.ax)
                      * (SELECT cf.c FROM {p}_cf cf)) AS gain
            FROM {p}_cand{j} c
            JOIN {p}_base{j} b ON b.vid = c.src
            JOIN {p}_info{j} iy ON iy.comm = c.comm_dst
            WHERE c.comm_dst <> b.sc
        ),
        {p}_best{j} AS (
            SELECT vid, cand_comm, cand_size FROM (
                SELECT vid, comm_dst AS cand_comm, size_y AS cand_size,
                       ROW_NUMBER() OVER (PARTITION BY vid
                                          ORDER BY gain DESC, comm_dst ASC) AS rn
                FROM {p}_scored{j} WHERE gain > 0
            ) WHERE rn = 1
        ),
        {p}_s{j} AS MATERIALIZED (
            SELECT s.vid, CAST(COALESCE(m.new_comm, s.comm) AS BIGINT) AS comm
            FROM {s} s LEFT JOIN (
                SELECT b.vid, t.cand_comm AS new_comm
                FROM {p}_base{j} b JOIN {p}_best{j} t USING (vid)
                WHERE NOT (t.cand_size = 1 AND b.size_sc = 1
                           AND t.cand_comm > b.sc)
            ) m USING (vid)
        )"""


def colored_phase_sql(num_iters: int, n_colors: int, prefix: str,
                      edges: str, colors: str) -> tuple[str, str]:
    """One color-staged phase unrolled: ``num_iters`` full sweeps, each
    processing color classes 0..n_colors-1 in ascending order (an empty or
    absent class step is the identity, so unrolling every class is safe —
    the engine's live-colors skip is a pure optimization). The returned
    state is POST-sweep (Gauss-Seidel in-place semantics), so all
    ``num_iters * n_colors`` class steps apply — no pastCommAss offset.
    State covers the edge-incident vertices (singleton init off degrees).
    """
    if num_iters < 1 or n_colors < 1:
        raise ValueError("num_iters and n_colors must be >= 1")
    parts = [f"""
        {prefix}_deg AS MATERIALIZED (
            SELECT src AS vid, SUM(weight) AS degree FROM {edges} GROUP BY src
        ),
        {prefix}_cf AS (SELECT 1.0 / SUM(weight) AS c FROM {edges}),
        {prefix}_self AS MATERIALIZED (
            SELECT src AS vid, SUM(weight) AS self_w FROM {edges}
            WHERE src = dst GROUP BY src
        ),
        {prefix}_s0 AS MATERIALIZED (
            SELECT vid, CAST(vid AS BIGINT) AS comm FROM {prefix}_deg
        )"""]
    j = 0
    for _ in range(num_iters):
        for k in range(n_colors):
            j += 1
            parts.append(_cp_class_cte(j, k, prefix, edges, colors))
    return ",".join(parts), f"{prefix}_s{j}"


def louvain_coloring_full_sql(colored, tail, edges: str = "edges",
                              allv: str = "allv",
                              tail_on_input: bool = False) -> tuple[str, str]:
    """SQL twin of the ENTIRE ``louvain_coloring()`` run (ref C12).

    ``colored`` = per-colored-phase (num_iters, n_colors) pairs and
    ``tail`` = the basic driver's per-phase sweep counts, both observed by
    replaying the identical loop in the numpy oracle
    (``oracle.coloring_np.louvain_coloring_schedule_np``). As everywhere in
    this module the counts are unroll DEPTHS only — the coloring itself is
    recomputed per phase by DuckDB (``coloring_sql.distance1_cte``, the
    proven JP twin), as are all gains/renumbers/coarse weights; the whole
    statement must run under ``WITH RECURSIVE``.

    Chain: per colored phase — JP coloring of the current graph -> colored
    Gauss-Seidel phase (``colored_phase_sql``) -> full-vertex -1 fill ->
    -1-aware first-occurrence renumber -> C_orig projection -> coarsen;
    then the basic driver (``louvain_multiphase_sql``) on the final coarse
    graph, its result projected into C_orig, and a final -1-aware renumber
    (exactly ``operators/louvain.py:louvain_coloring``).
    """
    from .coloring_sql import distance1_cte

    colored = list(colored)
    parts = []
    edges_rel, verts_rel = edges, allv
    prev_edges, prev_verts = edges, allv
    corig = None
    for p, (iters, ncol) in enumerate(colored, 1):
        prev_edges, prev_verts = edges_rel, verts_rel
        parts.append(distance1_cte(edges_rel, p=f"cl{p}"))
        # materialize the recursive coloring's result: every class step
        # references it, and re-running the whole recursive CTE per
        # reference is O(class steps) full recolorings
        parts.append(f"""
        cl{p}colors AS MATERIALIZED (SELECT vid, color FROM cl{p}final)""")
        pref = f"cp{p}"
        ctes, fin = colored_phase_sql(iters, ncol, pref, edges_rel,
                                      f"cl{p}colors")
        parts.append(ctes)
        # full fill (isolated -> -1) + -1-aware first-occurrence renumber
        parts.append(f"""
        {pref}_full AS (
            SELECT v.vid, CAST(COALESCE(s.comm, -1) AS BIGINT) AS comm
            FROM {verts_rel} v LEFT JOIN {fin} s USING (vid)
        ),
        {pref}_rmap AS (
            SELECT comm, ROW_NUMBER() OVER (ORDER BY first_vid) - 1 AS new_comm
            FROM (SELECT comm, MIN(vid) AS first_vid FROM {pref}_full
                  WHERE comm >= 0 GROUP BY comm)
        ),
        {pref}_c AS MATERIALIZED (
            SELECT s.vid, CAST(COALESCE(m.new_comm, s.comm) AS BIGINT) AS comm
            FROM {pref}_full s LEFT JOIN {pref}_rmap m USING (comm)
        )""")
        if p == 1:
            corig = f"{pref}_c"
        else:
            parts.append(f"""
        {pref}_o AS MATERIALIZED (
            SELECT o.vid,
                   CAST(CASE WHEN o.comm >= 0 THEN m.comm
                             ELSE o.comm END AS BIGINT) AS comm
            FROM {corig} o LEFT JOIN {pref}_c m ON m.vid = o.comm
        )""")
            corig = f"{pref}_o"
        nxt_e, nxt_v = f"cpe{p + 1}", f"cpv{p + 1}"
        parts.append(f"""
        {nxt_e} AS MATERIALIZED (
            SELECT cs.comm AS src, cd.comm AS dst, SUM(e.weight) AS weight
            FROM {edges_rel} e
            JOIN {pref}_c cs ON e.src = cs.vid
            JOIN {pref}_c cd ON e.dst = cd.vid
            GROUP BY cs.comm, cd.comm
        ),
        {nxt_v} AS (SELECT DISTINCT comm AS vid FROM {pref}_c WHERE comm >= 0)""")
        edges_rel, verts_rel = nxt_e, nxt_v

    # a no-move / fixpoint break hands the UNcoarsened last-phase input
    # to the basic tail (the driver breaks before coarsening)
    t_edges = prev_edges if tail_on_input else edges_rel
    t_verts = prev_verts if tail_on_input else verts_rel
    mp_ctes, mp_fin = louvain_multiphase_sql(tail, allv=t_verts,
                                             edges=t_edges)
    parts.append(mp_ctes)
    if corig is None:
        # no colored phase ran (nv <= min_graph_size): the driver is the
        # basic tail on the original graph plus the final renumber
        parts.append(f"""
        cpt AS (SELECT vid, comm FROM {mp_fin})""")
    else:
        parts.append(f"""
        cpt AS (
            SELECT o.vid,
                   CAST(CASE WHEN o.comm >= 0 THEN m.comm
                             ELSE o.comm END AS BIGINT) AS comm
            FROM {corig} o LEFT JOIN {mp_fin} m ON m.vid = o.comm
        )""")
    parts.append("""
        cpf_rmap AS (
            SELECT comm, ROW_NUMBER() OVER (ORDER BY first_vid) - 1 AS new_comm
            FROM (SELECT comm, MIN(vid) AS first_vid FROM cpt
                  WHERE comm >= 0 GROUP BY comm)
        ),
        cpfinal AS (
            SELECT s.vid, CAST(COALESCE(m.new_comm, s.comm) AS BIGINT) AS comm
            FROM cpt s LEFT JOIN cpf_rmap m USING (comm)
        )""")
    return ",".join(parts), "cpfinal"
