"""Graph sinks (SURVEY §2.1 S13-S17).

The canonical engine sinks are Parquet (``df.write.parquet`` — S11/S13/S16);
these writers cover the reference's text interchange formats, driver-side
(they exist for tool interop, not the 100 TB path):

* ``write_metis`` — ``writeGraphMetisSimpleFormat`` (``writeSimple.cpp:2-47``)
* ``write_pajek`` — ``writeGraphPajekFormat(WithCommunityInfo)``
  (``writeSimple.cpp:49-118``)
* ``write_matrix_market`` — ``writeGraphMatrixMarketFormatSymmetric
  (/Reordered)`` (``writeMatrixMarket.cpp:2-130``), optional vertex
  permutation applied before writing
* ``write_edge_list`` — plain src dst weight
* ``append_results_csv`` — the reference's run-metrics CSV
  (``runMultiPhaseBasic.cpp:162-182``) with the same column schema
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# These interchange writers collect to the driver by design (tool interop
# only). Guard against accidental use on a production-scale graph: raise
# before collecting when the table exceeds this many rows (override via
# the GRAPPOLO_WRITER_MAX_ROWS env var).
MAX_DRIVER_ROWS = int(os.environ.get("GRAPPOLO_WRITER_MAX_ROWS", 10_000_000))


def _guard_rows(df: DataFrame, what: str) -> None:
    n = df.count()
    if n > MAX_DRIVER_ROWS:
        raise ValueError(
            f"{what}: {n} rows exceeds the driver-side writer ceiling "
            f"({MAX_DRIVER_ROWS}); these text sinks are for tool interop "
            "only — use df.write.parquet for production graphs, or raise "
            "GRAPPOLO_WRITER_MAX_ROWS explicitly"
        )


def _collect_adj(edges: DataFrame, nv: int):
    _guard_rows(edges, "write adjacency")
    adj = [[] for _ in range(nv)]
    for r in edges.collect():
        adj[int(r["src"])].append((int(r["dst"]), float(r["weight"])))
    for a in adj:
        a.sort()
    return adj


def write_metis(edges: DataFrame, nv: int, path: str, weighted: bool = False) -> None:
    adj = _collect_adj(edges, nv)
    ne = sum(len([1 for j, _ in a if j != i]) for i, a in enumerate(adj)) // 2
    with open(path, "w") as f:
        f.write(f"{nv} {ne}{' 1' if weighted else ''}\n")
        for i in range(nv):
            if weighted:
                f.write(" ".join(f"{j + 1} {int(w)}" for j, w in adj[i] if j != i) + "\n")
            else:
                f.write(" ".join(str(j + 1) for j, w in adj[i] if j != i) + "\n")


def write_pajek(
    edges: DataFrame, nv: int, path: str, communities: DataFrame | None = None
) -> None:
    """Pajek .net; with ``communities`` each vertex line carries its cluster
    id (the WithCommunityInfo variant)."""
    comm = {}
    if communities is not None:
        comm = {r["vid"]: r["comm"] for r in communities.collect()}
    _guard_rows(edges, "write_pajek")
    canon = edges.filter(F.col("src") <= F.col("dst")).collect()
    with open(path, "w") as f:
        f.write(f"*Vertices {nv}\n")
        for i in range(nv):
            label = f' "{comm[i]}"' if comm else f' "{i + 1}"'
            f.write(f"{i + 1}{label}\n")
        f.write("*Edges\n")
        for r in sorted((int(r["src"]), int(r["dst"]), float(r["weight"])) for r in canon):
            f.write(f"{r[0] + 1} {r[1] + 1} {r[2]:g}\n")


def write_matrix_market(
    edges: DataFrame, nv: int, path: str, permutation: DataFrame | None = None
) -> None:
    """Symmetric coordinate MM; ``permutation`` is (vid, new_vid) — the
    reordered variant used by the matrix-reordering driver (SURVEY §3.3)."""
    e = edges
    if permutation is not None:
        p1 = permutation.select(F.col("vid").alias("src"), F.col("new_vid").alias("ns"))
        p2 = permutation.select(F.col("vid").alias("dst"), F.col("new_vid").alias("nd"))
        e = (
            e.join(p1, "src").join(p2, "dst")
            .select(F.col("ns").alias("src"), F.col("nd").alias("dst"), "weight")
        )
    _guard_rows(e, "write_matrix_market")
    canon = sorted(
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in e.filter(F.col("src") <= F.col("dst")).collect()
    )
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write(f"{nv} {nv} {len(canon)}\n")
        for u, v, w in canon:
            # MM symmetric stores the LOWER triangle: row >= col
            f.write(f"{v + 1} {u + 1} {w:g}\n")


def write_edge_list(edges: DataFrame, path: str) -> None:
    """Each undirected edge once (canonical src <= dst), so re-reading via
    ``read_edge_list`` + symmetrize reconstructs the exact same table."""
    _guard_rows(edges, "write_edge_list")
    rows = sorted(
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in edges.filter(F.col("src") <= F.col("dst")).collect()
    )
    with open(path, "w") as f:
        for u, v, w in rows:
            f.write(f"{u} {v} {w:g}\n")


RESULTS_CSV_HEADER = (
    "GraphName,Version,Threads,Phases,TotalIterations,Clusters,Modularity,"
    "ClusteringTIme,CoarseningTime,TotalTime,Threshold,DataType\n"
)


def append_results_csv(
    path: str,
    graph_name: str,
    version: str,
    threads: int,
    phases: int,
    total_iters: int,
    clusters: int,
    modularity: float,
    clustering_time: float,
    coarsening_time: float,
    total_time: float,
    threshold: float,
    data_type: int = 8,
) -> None:
    """Reference results-CSV sink, same schema incl. the 'TIme' typo
    (``runMultiPhaseBasic.cpp:175``); DataType = sizeof weight (8=float64)."""
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write(RESULTS_CSV_HEADER)
        f.write(
            f"{graph_name},{version},{threads},{phases},{total_iters},"
            f"{clusters},{modularity},{clustering_time},{coarsening_time},"
            f"{total_time},{threshold},{data_type}\n"
        )
