"""Numpy oracle vs the compiled reference binary's golden outputs.

tests/golden/*.json are captured by scripts/capture_reference_golden.py
from the reference built out-of-tree (default dispatch =
``parallelLouvianMethod_SFP``, "Modified Parallel"). This test closes the
exactness chain SURVEY §8 claims: Spark engine ≡ numpy oracle (the other
test files) ≡ reference binary (here) — per-vertex communities exact,
modularity to the 6 decimals the binary prints.
"""

import json
import pathlib

import pytest

from grappolo_spark import fixtures as fx
from grappolo_spark.oracle import louvain_multiphase_np

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
NAMES = sorted(p.stem for p in GOLDEN_DIR.glob("*.json"))


@pytest.mark.parametrize("name", NAMES)
def test_oracle_matches_reference_binary(name):
    golden = json.loads((GOLDEN_DIR / f"{name}.json").read_text())
    edges, nv = fx.GOLDEN_CASES[name]()
    assert nv == golden["nv"]
    got = louvain_multiphase_np(fx.symmetric_rows(edges), nv)
    assert got["C"] == golden["communities"], name
    assert got["num_clusters"] == golden["num_clusters"]
    assert got["phases"] == golden["phases"]
    assert got["total_iters"] == golden["total_iters"]
    assert round(got["modularity"], 6) == golden["modularity"]
