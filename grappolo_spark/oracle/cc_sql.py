"""DuckDB-SQL twin of the engine's pointer-jumping connected components.

The first-round oracles computed components with a full-reachability
recursive CTE — ``reach(v, r)`` enumerates every (vertex, member) pair of
each component, O(Σ comp_size²) rows, and re-joins the whole set per
fixpoint pass. On the gate corpus (one ~2000-vertex quasi-clique
component) that is millions of rows and tens of seconds of DuckDB time
per query — the dominant cost of the driver's correctness sweep for the
CC and RCM entries.

This module instead unrolls the ENGINE's own algorithm (min-label over
neighbours + one pointer jump per round, ``operators/components.py``):
each round is two cheap MATERIALIZED CTEs over |V| rows, and K rounds
cover any diameter ≤ 2^K thanks to the jump. A converged round is a
no-op, so ``{p}cc{rounds}`` equals the fixpoint for any actual round
count ≤ rounds — the same unroll-safety argument every other unrolled
twin in this repo uses.
"""

from __future__ import annotations


def cc_unrolled_cte(seed_rel: str, nbr_rel: str, rounds: int = 16,
                    prefix: str = "cc") -> str:
    """WITH-body fragment computing ``{prefix}final`` (vid, comp).

    ``seed_rel``: relation with one ``vid`` column — EVERY vertex that
    must appear in the output (isolated ones keep their own id).
    ``nbr_rel``: relation (src, dst) of self-loop-free symmetric edges.
    """
    p = prefix
    parts = [f"""
        {p}cc0 AS MATERIALIZED (
            SELECT vid, vid AS comp FROM {seed_rel}
        )"""]
    for i in range(rounds):
        parts.append(f"""
        {p}mn{i} AS MATERIALIZED (
            SELECT s.vid, LEAST(s.comp, COALESCE(n.mn, s.comp)) AS comp
            FROM {p}cc{i} s
            LEFT JOIN (
                SELECT e.src AS vid, MIN(x.comp) AS mn
                FROM {nbr_rel} e JOIN {p}cc{i} x ON x.vid = e.dst
                GROUP BY e.src
            ) n USING (vid)
        ),
        {p}cc{i + 1} AS MATERIALIZED (
            SELECT a.vid, b.comp
            FROM {p}mn{i} a JOIN {p}mn{i} b ON a.comp = b.vid
        )""")
    parts.append(f"""
        {p}final AS (SELECT vid, comp FROM {p}cc{rounds})""")
    return ",".join(parts)


def bfs_levels_unrolled_cte(seed_rel: str, nbr_rel: str, rounds: int = 64,
                            prefix: str = "lv") -> str:
    """WITH-body fragment computing ``{prefix}final`` (vid, level).

    ``seed_rel``: relation (vid, level) with level = 0 on the BFS
    source(s), NULL elsewhere (multi-source across components works —
    each component expands from its own source). Replaces the old
    recursive-CTE BFS that carried EVERY vertex through every round with
    an EXISTS fixpoint probe (~160 s on the gate corpus); here each round
    is one frontier join over |V| rows, a no-op once the frontier is
    empty, so ``rounds`` bounds the reachable ECCENTRICITY (≤ graph
    diameter), not the vertex count — 64 covers any gate corpus by orders
    of magnitude.
    """
    p = prefix
    parts = [f"""
        {p}0 AS MATERIALIZED (SELECT vid, level FROM {seed_rel})"""]
    for i in range(rounds):
        parts.append(f"""
        {p}{i + 1} AS MATERIALIZED (
            SELECT s.vid,
                   COALESCE(s.level,
                            CASE WHEN h.vid IS NOT NULL THEN {i + 1} END) AS level
            FROM {p}{i} s
            LEFT JOIN (
                SELECT DISTINCT e.dst AS vid
                FROM {p}{i} f JOIN {nbr_rel} e ON e.src = f.vid
                WHERE f.level = {i}
            ) h ON h.vid = s.vid
        )""")
    parts.append(f"""
        {p}final AS (SELECT vid, level FROM {p}{rounds})""")
    return ",".join(parts)
