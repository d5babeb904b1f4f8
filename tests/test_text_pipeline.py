"""Invariants for the training-pipeline text ops (hash_split,
token_chunks) beyond the driver's DuckDB hash gate."""

from pyspark.sql import functions as F

from grappolo_spark.functions import text as TX


def _docs(spark, n=400):
    rows = [
        (i, " ".join(f"tok{i}_{j}" for j in range(i % 97)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_split_deterministic_and_total(spark):
    docs = _docs(spark)
    a = {r.doc_id: r.split for r in TX.hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in TX.hash_split(docs.repartition(7)).collect()}
    assert a == b  # partition-invariant
    assert len(a) == 400 and set(a.values()) <= {"train", "valid", "test"}
    # uniform hash: train share within a loose binomial envelope
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.80 * 400 <= n_train <= 0.97 * 400
    # stability under corpus growth: adding docs never moves existing ones
    grown = {r.doc_id: r.split for r in TX.hash_split(_docs(spark, 600)).collect()}
    assert all(grown[d] == s for d, s in a.items())


def test_token_chunks_nonoverlapping_reconstruct(spark):
    docs = _docs(spark, 120)
    out = TX.token_chunks(docs, chunk_tokens=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert all(r.n_chunk_tokens == 16 for r in rows[:-1])
        joined = " ".join(r.chunk_text for r in rows if r.chunk_text)
    # reconstruction check on one representative long doc
    src = {r.doc_id: r.text for r in docs.collect()}
    for d, rows in by_doc.items():
        toks = [t for t in src[d].split(" ") if t]
        rebuilt = " ".join(r.chunk_text for r in sorted(rows, key=lambda r: r.chunk_idx))
        assert rebuilt.split() == toks
    # every doc (even empty text) yields >= 1 chunk
    assert len(by_doc) == 120


def test_token_chunks_overlap_windows(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{j}" for j in range(50)))], "doc_id long, text string"
    )
    rows = sorted(
        TX.token_chunks(docs, chunk_tokens=32, stride=24).collect(),
        key=lambda r: r.chunk_idx,
    )
    toks = [f"w{j}" for j in range(50)]
    # ceil((50-32)/24)+1 = 2 windows: [0:32], [24:50]
    assert len(rows) == 2
    assert rows[0].chunk_text.split() == toks[0:32]
    assert rows[1].chunk_text.split() == toks[24:50]
    assert rows[1].n_chunk_tokens == 26
