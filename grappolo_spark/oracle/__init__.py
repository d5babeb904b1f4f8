from .numpy_oracle import (  # noqa: F401
    louvain_multiphase_np,
    louvain_phase_np,
    pagerank_np,
    connected_components_np,
    label_propagation_np,
    triangle_counts_np,
    modularity_np,
    renumber_np,
    coarsen_np,
    base_phase_np,
    directed_louvain_np,
    fasttrack_resistance_np,
)
from .coloring_np import (  # noqa: F401
    distance1_coloring_np,
    louvain_phase_colored_np,
    louvain_coloring_np,
    maxmin_coloring_np,
    balanced_coloring_np,
)
from .xxh64 import xxhash64  # noqa: F401
