from .loaders import (  # noqa: F401
    read_dimacs9,
    read_edge_list,
    read_matrix_market,
    read_metis,
    read_pajek,
    read_snap,
)
from .writers import (  # noqa: F401
    append_results_csv,
    write_edge_list,
    write_matrix_market,
    write_metis,
    write_pajek,
)
