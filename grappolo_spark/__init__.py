"""grappolo_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the Grappolo parallel Louvain library
(reference: /root/reference, C++/OpenMP) as idiomatic Spark DataFrame
programs: the graph is a symmetrized ``(src, dst, weight)`` edge DataFrame,
algorithm state is a vertex DataFrame, and every algorithm runs as
deterministic join→groupBy→window supersteps with vectorized numpy/Arrow
inner kernels (no per-row Python).

Public surface:
    session            SparkSession factory (Arrow on, AQE on)
    synth              deterministic transcript corpus generator (seed=42)
    etl                transcripts → symmetrized edge table
    graph              graph-core ops: symmetrize, dedup, degree, stats, renumber
    operators.pagerank PageRank (dangling-mass, float64, allclose-1e-6 gate)
    operators.components  connected components (large-star/small-star)
    operators.labelprop   label propagation (deterministic tie-breaks)
    operators.triangles   triangle counting (degree-oriented self-join)
    operators.louvain     multi-phase Louvain (exact reference semantics)
    operators.coloring    distance-1 coloring (Jones-Plassmann superstep)
    operators.metrics     modularity, F-score, Gini, degree stats
    oracle             single-threaded numpy re-implementation of the
                       reference semantics — the correctness oracle
"""

__version__ = "0.1.0"
