"""DuckDB recursive-CTE twins of the coloring operators (C14/C15/C16).

Each function returns the FULL oracle SQL for the matching
``__spark_entry__`` query, given the name of an ``edges`` relation
(symmetric (src, dst, weight)) and the SQL for the dense vertex space.
Priorities are Spark's ``xxhash64`` computed inside SQL via
``oracle.xxh64_sql`` (bit-exact, see tests/test_oracle_sql.py).

These oracles re-run the engine's deterministic round structure:

* ``distance1``: speculative first-fit + bijective-priority conflict
  resolution (operators/coloring.py:distance1_coloring) — recursion until
  no vertex is uncolored;
* ``maxmin``: nItrs×nHash bounded-palette MaxMin rounds
  (operators/coloring.py:maxmin_coloring);
* ``balanced``: vBase redistribution rounds on top of the distance-1
  coloring (operators/coloring.py:balanced_coloring, first_fit strategy).
"""

from __future__ import annotations

from .xxh64_sql import xxh64_sql


def _tent_sql(p: str = "c") -> str:
    """Tentative first-fit colors for currently-uncolored vertices.

    min-free color via the sorted-distinct-gap trick: with a vertex's
    distinct colored-neighbour colors c_0 < c_1 < ... the smallest free
    color is the first rank where c_rn != rn, else the count — identical
    to the engine's sequence(0, n_colored) anti-join.
    """
    return f"""
        SELECT u.vid, u.prio, COALESCE(mf.minfree, 0) AS t
        FROM (SELECT vid, prio FROM {p}st WHERE color IS NULL) u
        LEFT JOIN (
            SELECT src AS vid,
                   CAST(COALESCE(MIN(CASE WHEN color <> rn THEN rn END),
                                 COUNT(*)) AS INTEGER) AS minfree
            FROM (
                SELECT src, color,
                       ROW_NUMBER() OVER (PARTITION BY src ORDER BY color) - 1 AS rn
                FROM (
                    SELECT DISTINCT e.src, s2.color
                    FROM {p}nbr e
                    JOIN {p}st uu ON uu.vid = e.src AND uu.color IS NULL
                    JOIN {p}st s2 ON s2.vid = e.dst
                    WHERE s2.color IS NOT NULL
                )
            )
            GROUP BY src
        ) mf ON mf.vid = u.vid
    """


def distance1_cte(edges_rel: str, p: str = "c") -> str:
    """Shared WITH-body (no leading WITH RECURSIVE) computing ``{p}final``:
    the last-round (vid, color) state of the distance-1 coloring over the
    edge-incident vertices. ``p`` prefixes every CTE name so several
    colorings (one per colored Louvain phase) can coexist in one
    statement."""
    prio_rel = xxh64_sql(f"{p}verts", ["vid"], "vid", "42", "prio")
    tent = _tent_sql(p)
    return f"""
        {p}nbr AS MATERIALIZED (
            SELECT src, dst FROM {edges_rel} WHERE src <> dst
        ),
        {p}verts AS (SELECT DISTINCT src AS vid FROM {p}nbr),
        {p}prio AS MATERIALIZED (SELECT vid, prio FROM {prio_rel}),
        {p}st(rnd, vid, color, prio) AS (
            SELECT 0, vid, CAST(NULL AS INTEGER), prio FROM {p}prio
            UNION ALL
            SELECT s.rnd + 1, s.vid, COALESCE(s.color, a.new_color), s.prio
            FROM {p}st s
            LEFT JOIN (
                SELECT t.vid, t.t AS new_color
                FROM ({tent}) t
                LEFT JOIN (
                    SELECT t1.vid, MAX(t2.prio) AS mx
                    FROM {p}nbr e
                    JOIN ({tent}) t1 ON t1.vid = e.src
                    JOIN ({tent}) t2 ON t2.vid = e.dst AND t2.t = t1.t
                    GROUP BY t1.vid
                ) c ON c.vid = t.vid
                WHERE c.mx IS NULL OR t.prio > c.mx
            ) a ON a.vid = s.vid
            WHERE EXISTS (SELECT 1 FROM {p}st u WHERE u.color IS NULL)
              AND s.rnd < 200
        ),
        {p}final AS (
            SELECT vid, color FROM {p}st
            WHERE rnd = (SELECT MAX(rnd) FROM {p}st)
        )
    """


def distance1_sql(edges_cte: str, all_vids_rel: str) -> str:
    """(vid, color) over the full dense vertex space; isolated → 0."""
    return f"""
        WITH RECURSIVE {edges_cte},
        {distance1_cte('edges')}
        SELECT v.vid, CAST(COALESCE(f.color, 0) AS INTEGER) AS color
        FROM {all_vids_rel} v LEFT JOIN cfinal f USING (vid)
    """


def _tent_lu_sql(p: str = "c") -> str:
    """Tentative LEAST-USED colors for currently-uncolored vertices — twin
    of ``distance1_coloring(pick="least_used")`` (ref
    ``bColoring/initialColoringLU.cpp:113-123``): argmin (freq, c) over
    the round-start palette minus the colored neighbourhood, falling back
    to the first never-used color (gap trick over the distinct palette)."""
    palette = (f"SELECT color AS c, COUNT(*) AS fc FROM {p}st "
               "WHERE color IS NOT NULL GROUP BY color")
    min_unused = f"""
        SELECT CAST(COALESCE(MIN(CASE WHEN c <> rn THEN rn END),
                             COUNT(*)) AS INTEGER)
        FROM (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c) - 1 AS rn
            FROM (SELECT DISTINCT color AS c FROM {p}st
                  WHERE color IS NOT NULL)
        )
    """
    return f"""
        SELECT u.vid, u.prio,
               COALESCE(pk.t, ({min_unused})) AS t
        FROM (SELECT vid, prio FROM {p}st WHERE color IS NULL) u
        LEFT JOIN (
            SELECT vid, t FROM (
                SELECT cand.vid, pal.c AS t,
                       ROW_NUMBER() OVER (PARTITION BY cand.vid
                                          ORDER BY pal.fc, pal.c) AS rn
                FROM (SELECT vid FROM {p}st WHERE color IS NULL) cand
                CROSS JOIN ({palette}) pal
                WHERE NOT EXISTS (
                    SELECT 1 FROM {p}nbr e JOIN {p}st s2 ON s2.vid = e.dst
                    WHERE e.src = cand.vid AND s2.color = pal.c
                )
            ) WHERE rn = 1
        ) pk ON pk.vid = u.vid
    """


def distance1_lu_sql(edges_cte: str, all_vids_rel: str, p: str = "lu") -> str:
    """(vid, color) least-used initial coloring over the full dense
    vertex space; isolated → 0. Same recursion skeleton as
    ``distance1_cte`` with the LU tentative rule."""
    prio_rel = xxh64_sql(f"{p}verts", ["vid"], "vid", "42", "prio")
    tent = _tent_lu_sql(p)
    return f"""
        WITH RECURSIVE {edges_cte},
        {p}nbr AS MATERIALIZED (
            SELECT src, dst FROM edges WHERE src <> dst
        ),
        {p}verts AS (SELECT DISTINCT src AS vid FROM {p}nbr),
        {p}prio AS MATERIALIZED (SELECT vid, prio FROM {prio_rel}),
        {p}st(rnd, vid, color, prio) AS (
            SELECT 0, vid, CAST(NULL AS INTEGER), prio FROM {p}prio
            UNION ALL
            SELECT s.rnd + 1, s.vid, COALESCE(s.color, a.new_color), s.prio
            FROM {p}st s
            LEFT JOIN (
                SELECT t.vid, t.t AS new_color
                FROM ({tent}) t
                LEFT JOIN (
                    SELECT t1.vid, MAX(t2.prio) AS mx
                    FROM {p}nbr e
                    JOIN ({tent}) t1 ON t1.vid = e.src
                    JOIN ({tent}) t2 ON t2.vid = e.dst AND t2.t = t1.t
                    GROUP BY t1.vid
                ) c ON c.vid = t.vid
                WHERE c.mx IS NULL OR t.prio > c.mx
            ) a ON a.vid = s.vid
            WHERE EXISTS (SELECT 1 FROM {p}st u WHERE u.color IS NULL)
              AND s.rnd < 200
        ),
        {p}final AS (
            SELECT vid, color FROM {p}st
            WHERE rnd = (SELECT MAX(rnd) FROM {p}st)
        )
        SELECT v.vid, CAST(COALESCE(f.color, 0) AS INTEGER) AS color
        FROM {all_vids_rel} v LEFT JOIN {p}final f USING (vid)
    """


def color_stats_sql(edges_cte: str, all_vids_rel: str) -> str:
    """n_colors/max_class/avg_class/var_class over the distance-1 colors."""
    return f"""
        WITH RECURSIVE {edges_cte},
        {distance1_cte('edges')},
        allc AS (
            SELECT CAST(COALESCE(f.color, 0) AS INTEGER) AS color
            FROM {all_vids_rel} v LEFT JOIN cfinal f USING (vid)
        ),
        sizes AS (SELECT color, COUNT(*) AS class_size FROM allc GROUP BY color)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_colors,
               CAST(MAX(class_size) AS BIGINT) AS max_class,
               ROUND(AVG(class_size), 6) AS avg_class,
               ROUND(var_pop(class_size), 6) AS var_class
        FROM sizes
    """


def maxmin_sql(edges_cte: str, all_vids_rel: str,
               n_hash: int = 4, n_itrs: int = 2) -> str:
    """(vid, color) MaxMin coloring over the full dense vertex space.

    Round r (0-indexed, r < n_itrs*n_hash) uses hash index r % n_hash and
    base color 2*r; the per-vertex per-hash value is Spark's chained
    ``xxhash64(vid, ihash)``. All nv vertices start at the sentinel
    2*n_hash*n_itrs, exactly like the engine.
    """
    max_color = 2 * n_hash * n_itrs
    rounds = n_hash * n_itrs
    # per-vertex hash chain: h_base = xxh64(vid, 42); h_i = xxh64(i, h_base)
    rel = xxh64_sql("mmverts", ["vid"], "vid", "42", "hb")
    cols = ["vid", "hb"]
    for i in range(n_hash):
        rel = xxh64_sql(rel, cols, str(i), "hb", f"h{i}")
        cols = cols + [f"h{i}"]
    # state at rnd=r carries the hash for round r's ihash (= r % n_hash);
    # the transition producing rnd=r+1 must therefore install the hash for
    # ihash = (r+1) % n_hash
    h_case = "CASE ((s.rnd + 1) % " + str(n_hash) + ") " + " ".join(
        f"WHEN {i} THEN p.h{i}" for i in range(n_hash)
    ) + " END"
    return f"""
        WITH RECURSIVE {edges_cte},
        mmnbr AS MATERIALIZED (
            SELECT src, dst FROM edges WHERE src <> dst
        ),
        mmverts AS ({all_vids_rel}),
        mmh AS MATERIALIZED (SELECT * FROM {rel}),
        mst(rnd, vid, color, h) AS (
            SELECT 0, vid, {max_color}, h0 FROM mmh
            UNION ALL
            SELECT s.rnd + 1, s.vid,
                   CASE WHEN s.color <> {max_color} THEN s.color
                        WHEN c.not_max IS NULL OR c.not_max = 0 THEN 2 * s.rnd
                        WHEN c.not_min = 0 THEN 2 * s.rnd + 1
                        ELSE {max_color} END,
                   {h_case}
            FROM mst s
            JOIN mmh p ON p.vid = s.vid
            LEFT JOIN (
                SELECT e.src AS vid,
                       MAX(CASE WHEN u1.h <= u2.h THEN 1 ELSE 0 END) AS not_max,
                       MAX(CASE WHEN u1.h >= u2.h THEN 1 ELSE 0 END) AS not_min
                FROM mmnbr e
                JOIN mst u1 ON u1.vid = e.src AND u1.color = {max_color}
                JOIN mst u2 ON u2.vid = e.dst AND u2.color = {max_color}
                GROUP BY e.src
            ) c ON c.vid = s.vid
            WHERE s.rnd < {rounds}
              AND EXISTS (SELECT 1 FROM mst u WHERE u.color = {max_color})
        )
        SELECT vid, CAST(color AS INTEGER) AS color
        FROM mst WHERE rnd = (SELECT MAX(rnd) FROM mst)
    """


MBASE_BUCKET_CAP = 1024    # ref bColoring/mBase.cpp:95-96 (avg clamp)
MBASE_OVERSIZE = 1088      # ref bColoring/mBase.cpp:104-106 (donor gate)

#: variants sharing the Jacobi-round redistribution skeleton
_ROUND_VARIANTS = ("vbase", "cbase", "wbase", "mbase")


def _shared_base_ctes(all_vids_rel: str) -> str:
    """CTEs shared by every balanced-family variant: the base coloring
    joined to the dense vertex space (``ball``), neighbour degree counts
    (``bdeg``) and the xxhash64 priorities (``bprio``). Assumes
    ``distance1_cte('edges')`` (``cnbr``/``cfinal``) precedes."""
    prio_rel = xxh64_sql("ball", ["vid"], "vid", "42", "prio")
    return f"""
        ball AS MATERIALIZED (
            SELECT v.vid, CAST(COALESCE(f.color, 0) AS INTEGER) AS base_color
            FROM {all_vids_rel} v
            LEFT JOIN cfinal f USING (vid)
        ),
        bdeg AS MATERIALIZED (
            SELECT src AS vid, COUNT(*) AS w FROM cnbr GROUP BY src
        ),
        bprio AS MATERIALIZED (SELECT vid, prio FROM {prio_rel})
    """


def _balanced_variant_ctes(p: str, variant: str, nv_expr: str,
                           max_rounds: int,
                           bucket_cap: int = MBASE_BUCKET_CAP,
                           oversize_thresh: int = MBASE_OVERSIZE) -> str:
    """Prefixed WITH-body for one Jacobi-round variant computing
    ``{p}final`` (vid, color); see ``balanced_sql`` for the spec."""
    not_oversize = ("" if variant == "cbase"
                    else f"AND g.c NOT IN (SELECT c FROM {p}over)")
    rounds = []
    for i in range(max_rounds):
        rounds.append(f"""
        {p}freq{i} AS MATERIALIZED (
            SELECT color AS c, SUM(w) AS n FROM {p}st{i} GROUP BY color
        ),
        {p}elig{i} AS MATERIALIZED (
            SELECT g.c FROM (SELECT UNNEST(range((SELECT ncolors FROM {p}param))) AS c) g
            LEFT JOIN {p}freq{i} fr ON fr.c = g.c
            WHERE COALESCE(fr.n, 0) < (SELECT avg_cap FROM {p}param)
              {not_oversize}
        ),
        {p}mv{i} AS MATERIALIZED (
            SELECT st.vid, st.prio, st.w FROM {p}st{i} st
            JOIN {p}over ob ON st.base_color = ob.c
            JOIN {p}freq{i} oc ON st.color = oc.c
            WHERE oc.n > (SELECT avg_cap FROM {p}param)
        ),
        {p}pick{i} AS MATERIALIZED (
            SELECT f2.vid, f2.prio, f2.w, MIN(f2.t) AS t FROM (
                SELECT mv.vid, mv.prio, mv.w, el.c AS t
                FROM {p}mv{i} mv CROSS JOIN {p}elig{i} el
                WHERE NOT EXISTS (
                    SELECT 1 FROM cnbr e JOIN {p}st{i} nb ON nb.vid = e.dst
                    WHERE e.src = mv.vid AND nb.color = el.c
                )
            ) f2 GROUP BY f2.vid, f2.prio, f2.w
        ),
        {p}adm{i} AS MATERIALIZED (
            SELECT vid, prio, t FROM (
                SELECT pk.vid, pk.prio, pk.t,
                       SUM(pk.w) OVER (PARTITION BY pk.t ORDER BY pk.prio DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cw,
                       (SELECT avg_cap FROM {p}param)
                       - COALESCE((SELECT n FROM {p}freq{i} f WHERE f.c = pk.t), 0) AS cap
                FROM {p}pick{i} pk
            ) WHERE cw <= cap
        ),
        {p}mov{i} AS MATERIALIZED (
            SELECT a.vid, a.t FROM {p}adm{i} a
            WHERE NOT EXISTS (
                SELECT 1 FROM cnbr e JOIN {p}adm{i} o ON o.vid = e.dst
                WHERE e.src = a.vid AND o.t = a.t AND o.prio > a.prio
            )
        ),
        {p}st{i + 1} AS MATERIALIZED (
            SELECT s.vid, CAST(COALESCE(m.t, s.color) AS INTEGER) AS color,
                   s.prio, s.base_color, s.w
            FROM {p}st{i} s LEFT JOIN {p}mov{i} m ON m.vid = s.vid
        )""")
    round_ctes = ",".join(rounds)
    if variant == "wbase":
        load_expr = "CAST(COALESCE(d.w, 0) AS BIGINT)"
        cap_sql = f"""
        {p}param AS MATERIALIZED (
            -- ceil(total_w/ncolors) with truncating //
            SELECT MAX(base_color) + 1 AS ncolors,
                   ((SELECT SUM(w) FROM {p}load) + MAX(base_color))
                   // (MAX(base_color) + 1) AS avg_cap
            FROM ball
        ),"""
    else:
        # ceil(nv/ncolors); DuckDB // truncates toward zero, so the
        # python -(-a//b) idiom would floor here — use (a+b-1)//b.
        # mbase clamps avg to the reference's absolute bin capacity
        # (mBase.cpp:95-96).
        load_expr = "CAST(1 AS BIGINT)"
        avg_raw = f"({nv_expr} + MAX(base_color)) // (MAX(base_color) + 1)"
        avg_expr = (
            f"CASE WHEN {avg_raw} > {bucket_cap + 64} THEN {bucket_cap} "
            f"ELSE {avg_raw} END" if variant == "mbase" else avg_raw
        )
        cap_sql = f"""
        {p}param AS MATERIALIZED (
            SELECT MAX(base_color) + 1 AS ncolors,
                   {avg_expr} AS avg_cap
            FROM ball
        ),"""
    over_bound = (str(oversize_thresh) if variant == "mbase"
                  else f"(SELECT avg_cap FROM {p}param)")
    return f"""
        {p}load AS MATERIALIZED (
            SELECT b.vid, b.base_color, {load_expr} AS w
            FROM ball b LEFT JOIN bdeg d USING (vid)
        ),{cap_sql}
        {p}over AS MATERIALIZED (
            SELECT base_color AS c FROM {p}load
            GROUP BY base_color
            HAVING SUM(w) > {over_bound}
        ),
        {p}st0 AS MATERIALIZED (
            SELECT b.vid, b.base_color AS color, x.prio, b.base_color, b.w
            FROM {p}load b JOIN bprio x USING (vid)
        ),
        {round_ctes},
        {p}final AS (SELECT vid, color FROM {p}st{max_rounds})
    """


def _bbase_ctes(p: str, nv_expr: str) -> str:
    """Prefixed WITH-body for the bBase batch plan computing ``{p}final``
    — twin of ``operators.coloring.bbase_coloring`` (ref
    ``bColoring/bBase.cpp:44-146``). The sequential donor→target walk is
    expressed as interval overlap: donors (ascending color) own
    cumulative-surplus offsets, targets (DESCENDING color, the ``:88``
    walk direction) own cumulative-deficit offsets, and donor-class
    member r (descending-priority rank) ships to the target whose
    deficit interval contains its global offset — exactly the walk's
    fixpoint because each target fills to avg before the cursor moves."""
    return f"""
        {p}freq AS MATERIALIZED (
            SELECT base_color AS c, COUNT(*) AS n FROM ball GROUP BY 1
        ),
        {p}param AS MATERIALIZED (
            SELECT MAX(base_color) + 1 AS ncolors,
                   ({nv_expr} + MAX(base_color)) // (MAX(base_color) + 1) AS avg_cap
            FROM ball
        ),
        {p}don AS MATERIALIZED (
            SELECT c, n - avg_cap AS surplus,
                   SUM(n - avg_cap) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - (n - avg_cap) AS s_prev
            FROM {p}freq, {p}param WHERE n > avg_cap
        ),
        {p}tgt AS MATERIALIZED (
            SELECT c, deficit,
                   SUM(deficit) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - deficit AS d_prev
            FROM (
                SELECT g.c, (SELECT avg_cap FROM {p}param) - COALESCE(f.n, 0) AS deficit
                FROM (SELECT UNNEST(range((SELECT ncolors FROM {p}param))) AS c) g
                LEFT JOIN {p}freq f ON f.c = g.c
                WHERE COALESCE(f.n, 0) < (SELECT avg_cap FROM {p}param)
            )
        ),
        {p}rank AS MATERIALIZED (
            SELECT b.vid, b.base_color, x.prio,
                   ROW_NUMBER() OVER (PARTITION BY b.base_color
                                      ORDER BY x.prio DESC) - 1 AS r
            FROM ball b JOIN bprio x USING (vid)
            WHERE b.base_color IN (SELECT c FROM {p}don)
        ),
        {p}plan AS MATERIALIZED (
            SELECT rk.vid, rk.prio, t.c AS t
            FROM {p}rank rk
            JOIN {p}don d ON d.c = rk.base_color AND rk.r < d.surplus
            JOIN {p}tgt t ON (d.s_prev + rk.r) >= t.d_prev
                         AND (d.s_prev + rk.r) < t.d_prev + t.deficit
        ),
        {p}mov AS MATERIALIZED (
            SELECT pl.vid, pl.t FROM {p}plan pl
            WHERE NOT EXISTS (
                SELECT 1 FROM cnbr e JOIN ball nb ON nb.vid = e.dst
                WHERE e.src = pl.vid AND nb.base_color = pl.t
            )
              AND NOT EXISTS (
                SELECT 1 FROM cnbr e JOIN {p}plan o ON o.vid = e.dst
                WHERE e.src = pl.vid AND o.t = pl.t AND o.prio > pl.prio
            )
        ),
        {p}final AS (
            SELECT b.vid, CAST(COALESCE(m.t, b.base_color) AS INTEGER) AS color
            FROM ball b LEFT JOIN {p}mov m USING (vid)
        )
    """


def _rbase_ctes(p: str, nv_expr: str, max_rounds: int) -> str:
    """Prefixed WITH-body for the rBase capacity-bounded re-coloring
    computing ``{p}final`` — twin of ``operators.coloring.rbase_coloring``
    (ref ``bColoring/rBase.cpp:44-179``). Unrolled Jacobi rounds; the min
    free color excludes recolored-neighbour colors AND at-capacity colors
    via the sorted-gap trick over their union; per-color admission
    ``avg - freq`` in descending priority; adjacent same-tentative movers
    to the higher priority; converged rounds are no-ops."""
    rounds = []
    for i in range(max_rounds):
        rounds.append(f"""
        {p}freq{i} AS MATERIALIZED (
            SELECT nc AS c, COUNT(*) AS n FROM {p}st{i}
            WHERE nc IS NOT NULL GROUP BY 1
        ),
        {p}blk{i} AS MATERIALIZED (
            -- blocked colors = recolored-neighbour colors ∪ at-capacity
            -- colors; outer DISTINCT (not bare UNION) because inside a
            -- WITH RECURSIVE statement DuckDB does not reliably dedup a
            -- UNION-shaped CTE body (observed: identical INTEGER rows
            -- surviving), and duplicates break the sorted-gap trick
            SELECT DISTINCT vid, c FROM (
                SELECT e.src AS vid, s2.nc AS c
                FROM cnbr e
                JOIN {p}st{i} uu ON uu.vid = e.src AND uu.nc IS NULL
                JOIN {p}st{i} s2 ON s2.vid = e.dst
                WHERE s2.nc IS NOT NULL
                UNION ALL
                SELECT uu.vid, f.c
                FROM {p}st{i} uu
                CROSS JOIN (SELECT c FROM {p}freq{i}, {p}param
                            WHERE n >= avg_cap) f
                WHERE uu.nc IS NULL
            )
        ),
        {p}tent{i} AS MATERIALIZED (
            SELECT u.vid, u.prio, COALESCE(mf.minfree, 0) AS t
            FROM (SELECT vid, prio FROM {p}st{i} WHERE nc IS NULL) u
            LEFT JOIN (
                SELECT vid,
                       CAST(COALESCE(MIN(CASE WHEN c <> rn THEN rn END),
                                     COUNT(*)) AS INTEGER) AS minfree
                FROM (
                    SELECT vid, c,
                           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY c) - 1 AS rn
                    FROM {p}blk{i}
                )
                GROUP BY vid
            ) mf ON mf.vid = u.vid
        ),
        {p}adm{i} AS MATERIALIZED (
            SELECT vid, prio, t FROM (
                SELECT tn.vid, tn.prio, tn.t,
                       ROW_NUMBER() OVER (PARTITION BY tn.t
                                          ORDER BY tn.prio DESC) AS rn,
                       (SELECT avg_cap FROM {p}param)
                       - COALESCE((SELECT n FROM {p}freq{i} f
                                   WHERE f.c = tn.t), 0) AS cap
                FROM {p}tent{i} tn
            ) WHERE rn <= cap
        ),
        {p}mov{i} AS MATERIALIZED (
            SELECT a.vid, a.t FROM {p}adm{i} a
            WHERE NOT EXISTS (
                SELECT 1 FROM cnbr e JOIN {p}adm{i} o ON o.vid = e.dst
                WHERE e.src = a.vid AND o.t = a.t AND o.prio > a.prio
            )
        ),
        {p}st{i + 1} AS MATERIALIZED (
            SELECT s.vid, s.prio, s.base_color,
                   CAST(COALESCE(s.nc, m.t) AS INTEGER) AS nc
            FROM {p}st{i} s LEFT JOIN {p}mov{i} m ON m.vid = s.vid
        )""")
    round_ctes = ",".join(rounds)
    return f"""
        {p}param AS MATERIALIZED (
            SELECT MAX(base_color) + 1 AS ncolors,
                   ({nv_expr} + MAX(base_color)) // (MAX(base_color) + 1) AS avg_cap
            FROM ball
        ),
        {p}st0 AS MATERIALIZED (
            SELECT b.vid, x.prio, b.base_color, CAST(NULL AS INTEGER) AS nc
            FROM ball b JOIN bprio x USING (vid)
        ),
        {round_ctes},
        {p}final AS (
            SELECT vid, CAST(COALESCE(nc, base_color) AS INTEGER) AS color
            FROM {p}st{max_rounds}
        )
    """


def _equitable_ctes(p: str, nv_expr: str, pick: str = "first_fit",
                    n_blocks: int = 8) -> str:
    """Prefixed WITH-body for the equitable CFF/CLU redistribution
    computing ``{p}final`` — twin of
    ``operators.coloring.equitable_coloring`` (ref
    ``Coloring/equitableColoringDistanceOne.cpp:90-253``). Donor classes
    (base size > avg = true-ceil(nv/ncolors)) drain in ascending color
    order, one deterministic batch per class with live sizes carried
    across classes; ``n_blocks`` unrolled blocks cover up to that many
    donor classes (blocks past the donor count are no-ops — the donor
    set is fixed by the BASE histogram, so the unroll is a static bound,
    not an observed schedule). ``pick`` = first_fit | least_used."""
    if pick == "least_used":
        pick_sel = f"""
            SELECT vid, prio, t FROM (
                SELECT f2.vid, f2.prio, f2.t,
                       ROW_NUMBER() OVER (PARTITION BY f2.vid
                                          ORDER BY f2.fc, f2.t) AS pr
                FROM %(cand)s f2
            ) WHERE pr = 1"""
    else:
        pick_sel = """
            SELECT f2.vid, f2.prio, MIN(f2.t) AS t
            FROM %(cand)s f2 GROUP BY f2.vid, f2.prio"""
    blocks = []
    for i in range(n_blocks):
        cand = f"""(
                SELECT mv.vid, mv.prio, el.c AS t, el.fc
                FROM {p}mv{i} mv CROSS JOIN {p}elig{i} el
                WHERE NOT EXISTS (
                    SELECT 1 FROM cnbr e JOIN {p}st{i} nb ON nb.vid = e.dst
                    WHERE e.src = mv.vid AND nb.color = el.c
                )
            )"""
        blocks.append(f"""
        {p}d{i} AS MATERIALIZED (SELECT c FROM {p}donors WHERE r = {i + 1}),
        {p}freq{i} AS MATERIALIZED (
            SELECT color AS c, COUNT(*) AS n FROM {p}st{i} GROUP BY color
        ),
        {p}exc{i} AS MATERIALIZED (
            SELECT f.n - (SELECT avg_cap FROM {p}param) AS e
            FROM {p}freq{i} f WHERE f.c = (SELECT c FROM {p}d{i})
        ),
        {p}elig{i} AS MATERIALIZED (
            SELECT g.c, COALESCE(fr.n, 0) AS fc
            FROM (SELECT UNNEST(range((SELECT ncolors FROM {p}param))) AS c) g
            LEFT JOIN {p}freq{i} fr ON fr.c = g.c
            WHERE COALESCE(fr.n, 0) < (SELECT avg_cap FROM {p}param)
        ),
        {p}mv{i} AS MATERIALIZED (
            SELECT vid, prio FROM {p}st{i}
            WHERE color = (SELECT c FROM {p}d{i})
              AND COALESCE((SELECT e FROM {p}exc{i}), 0) > 0
        ),
        {p}pick{i} AS MATERIALIZED ({pick_sel % {"cand": cand}}
        ),
        {p}adm{i} AS MATERIALIZED (
            SELECT vid, prio, t FROM (
                SELECT pk.vid, pk.prio, pk.t,
                       ROW_NUMBER() OVER (PARTITION BY pk.t
                                          ORDER BY pk.prio DESC) AS rn,
                       (SELECT avg_cap FROM {p}param)
                       - COALESCE((SELECT n FROM {p}freq{i} f
                                   WHERE f.c = pk.t), 0) AS cap
                FROM {p}pick{i} pk
            ) WHERE rn <= cap
        ),
        {p}kept{i} AS MATERIALIZED (
            SELECT vid, prio, t FROM (
                SELECT a.*, ROW_NUMBER() OVER (ORDER BY a.prio DESC) AS gr
                FROM {p}adm{i} a
            ) WHERE gr <= COALESCE((SELECT e FROM {p}exc{i}), 0)
        ),
        {p}mov{i} AS MATERIALIZED (
            SELECT k.vid, k.t FROM {p}kept{i} k
            WHERE NOT EXISTS (
                SELECT 1 FROM cnbr e JOIN {p}kept{i} o ON o.vid = e.dst
                WHERE e.src = k.vid AND o.t = k.t AND o.prio > k.prio
            )
        ),
        {p}st{i + 1} AS MATERIALIZED (
            SELECT s.vid, CAST(COALESCE(m.t, s.color) AS INTEGER) AS color,
                   s.prio
            FROM {p}st{i} s LEFT JOIN {p}mov{i} m ON m.vid = s.vid
        )""")
    block_ctes = ",".join(blocks)
    return f"""
        {p}param AS MATERIALIZED (
            -- true ceil (nv + ncolors - 1) // ncolors, the reference's
            -- (NVer+numColors-1)/numColors (equitableColoring...cpp:165)
            SELECT MAX(base_color) + 1 AS ncolors,
                   ({nv_expr} + MAX(base_color)) // (MAX(base_color) + 1)
                       AS avg_cap
            FROM ball
        ),
        {p}donors AS MATERIALIZED (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS r FROM (
                SELECT base_color AS c FROM ball
                GROUP BY base_color
                HAVING COUNT(*) > (SELECT avg_cap FROM {p}param)
            )
        ),
        {p}st0 AS MATERIALIZED (
            SELECT b.vid, b.base_color AS color, x.prio
            FROM ball b JOIN bprio x USING (vid)
        ),
        {block_ctes},
        {p}final AS (SELECT vid, color FROM {p}st{n_blocks})
    """


def _variant_ctes(p: str, variant: str, nv_expr: str, max_rounds: int) -> str:
    if variant in _ROUND_VARIANTS:
        return _balanced_variant_ctes(p, variant, nv_expr, max_rounds)
    if variant == "bbase":
        return _bbase_ctes(p, nv_expr)
    if variant == "rbase":
        return _rbase_ctes(p, nv_expr, max_rounds)
    if variant in ("ecff", "eclu"):
        return _equitable_ctes(
            p, nv_expr,
            pick="least_used" if variant == "eclu" else "first_fit")
    raise ValueError(f"unknown balanced-coloring variant: {variant}")


def balanced_sql(edges_cte: str, all_vids_rel: str, nv_expr: str,
                 max_rounds: int = 50, variant: str = "vbase") -> str:
    """Balanced redistribution over the distance-1 base coloring — twin of
    ``operators.coloring.balanced_coloring`` (Jacobi-round variants vbase
    | cbase | wbase | mbase), ``bbase_coloring`` and ``rbase_coloring``;
    see those docstrings for the per-variant semantics, the wbase
    avg-capacity deviation and the mbase absolute bin constants.

    Unrolled (not recursive): engine rounds are bounded by ``max_rounds``
    and a converged round is a no-op here (no movers -> no moves -> state
    unchanged), so the last unrolled state equals the engine's fixed
    point for any actual round count <= max_rounds. Every per-round CTE
    is MATERIALIZED — DuckDB inlines CTEs by default and each state is
    referenced ~5x per round, which would otherwise expand the plan
    exponentially.

    Per Jacobi round, from the working state: freq = Σ load per current
    color (load = 1 per vertex, or degree for wbase); movers = base class
    oversize AND current class above avg; first-fit smallest eligible
    color not used by any neighbour (cbase admits oversize targets);
    per-color admission capacity avg - freq consumed by cumulative load
    in xxhash64-priority order (≡ ROW_NUMBER in the unit-load case);
    adjacent same-target movers resolved to the higher priority.
    """
    p = "bv"
    return f"""
        WITH RECURSIVE {edges_cte},
        {distance1_cte('edges')},
        {_shared_base_ctes(all_vids_rel)},
        {_variant_ctes(p, variant, nv_expr, max_rounds)}
        SELECT vid, color FROM {p}final
    """


def balanced_family_sql(edges_cte: str, all_vids_rel: str, nv_expr: str,
                        max_rounds: int, variants: tuple) -> str:
    """ALL balanced-coloring strategy families in ONE statement: the
    distance-1 base coloring and the shared base CTEs are computed once,
    each variant's redistribution chain runs under its own CTE prefix,
    and the result is the UNION ALL tagged with a ``strategy`` column —
    the driver-gate shape (one query, six reference strategies)."""
    bodies = ",".join(
        _variant_ctes(f"x{i}_", v, nv_expr, max_rounds)
        for i, v in enumerate(variants)
    )
    union = "\n        UNION ALL ".join(
        f"SELECT vid, color, '{v}' AS strategy FROM x{i}_final"
        for i, v in enumerate(variants)
    )
    return f"""
        WITH RECURSIVE {edges_cte},
        {distance1_cte('edges')},
        {_shared_base_ctes(all_vids_rel)},
        {bodies}
        {union}
    """
