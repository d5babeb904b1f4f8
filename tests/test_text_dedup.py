"""End-to-end near-dup removal pipeline vs a brute-force replication.

``functions/text.near_dup_clusters`` composes shingle → MinHash → banded
LSH candidates → candidate-restricted Jaccard verify → connected
components → canonical pick. Every hash in the pipeline is md5-derived,
so the whole composition is exactly replayable in pure Python
(hashlib.md5): this test plants exact-dup groups, near-dup edit chains
and unique docs, runs the Spark pipeline, and compares the per-document
(canonical_id, is_dup) assignment against the replication — including
that transitive chains (A~B, B~C, A!~C) land in ONE cluster, which is
what the component step adds over pairwise verification.
"""

import hashlib

import pytest

from grappolo_spark.functions import text as TX

NUM_HASHES = 8
BANDS = 4
K = 3
THRESHOLD = 0.5


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def _shingles(text: str) -> set[str]:
    toks = _tokens(text)
    if len(toks) < K:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}


def _expected(corpus: dict[int, str]) -> dict[int, tuple[int, bool]]:
    sh = {d: _shingles(t) for d, t in corpus.items()}
    sigs = {
        d: [min(_md5(f"{h}|{s}") for s in shs) for h in range(NUM_HASHES)]
        for d, shs in sh.items()
    }
    r = NUM_HASHES // BANDS
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, sig in sigs.items():
        for b in range(BANDS):
            bh = _md5("#".join(sig[b * r : (b + 1) * r]))
            buckets.setdefault((b, bh), []).append(d)
    cands = {
        (a, b)
        for docs in buckets.values()
        for a in docs
        for b in docs
        if a < b
    }
    parent = {d: d for d in corpus}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in cands:
        common = len(sh[a] & sh[b])
        if common and common / (len(sh[a]) + len(sh[b]) - common) >= THRESHOLD:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    canon = {d: find(d) for d in corpus}
    return {d: (c, c != d) for d, c in canon.items()}


@pytest.fixture(scope="module")
def corpus() -> dict[int, str]:
    base = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    docs = {}
    # exact-dup group (same shingle set -> jaccard 1.0)
    docs[0] = base
    docs[1] = base
    # near-dup edit chain: 0~2 and 2~3 overlap heavily; 0 and 3 may not —
    # the component step must still merge them transitively
    docs[2] = base + " at dawn"
    docs[3] = base + " at dawn every single day"
    # a second independent cluster
    docs[10] = "pack my box with five dozen liquor jugs before the long trip south"
    docs[11] = "pack my box with five dozen liquor jugs before the long trip north"
    # uniques, incl. a short doc (< K tokens -> single-shingle path)
    docs[20] = "completely unrelated text about spark dataframe aggregation plans"
    docs[21] = "tiny doc"
    for i in range(30, 50):
        docs[i] = f"filler document number {i} with distinct content token{i} marker{i * 7}"
    return docs


def test_near_dup_clusters_match_bruteforce(spark, corpus):
    docs_df = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        int(r.doc_id): (int(r.canonical_id), bool(r.is_dup))
        for r in TX.near_dup_clusters(
            spark, docs_df, threshold=THRESHOLD, num_hashes=NUM_HASHES,
            bands=BANDS, k=K,
        ).collect()
    }
    exp = _expected(corpus)
    assert got == exp
    # the planted structure actually exercised what it claims to:
    # both clusters merged, transitive chain in one component, uniques kept
    assert exp[1] == (0, True) and exp[2][0] == 0 and exp[3][0] == 0
    assert exp[11] == (10, True)
    assert exp[20] == (20, False) and exp[21] == (21, False)


def test_near_dup_clusters_no_pairs(spark):
    docs_df = spark.createDataFrame(
        [(i, f"totally unique document {i} alpha{i} beta{i * 3} gamma{i * 5}")
         for i in range(8)],
        "doc_id long, text string",
    )
    out = TX.near_dup_clusters(spark, docs_df).collect()
    assert len(out) == 8
    assert all(r.canonical_id == r.doc_id and not r.is_dup for r in out)


# ---------------------------------------------------------------------------
# simhash_near_pairs completeness (round-2 fix: banding vs prefix bucket)
# ---------------------------------------------------------------------------

def test_simhash_near_pairs_complete_vs_bruteforce(spark):
    """The banded candidate set must find EVERY Hamming<=3 pair —
    pigeonhole over max_hamming+1 bands — including pairs that differ
    inside the top 20 bits (the round-1 prefix bucket's recall hole)."""
    import random

    rng = random.Random(7)
    hashes = {}
    base = rng.getrandbits(59)
    hashes[0] = base
    # flips in the TOP bits only (old prefix bucketing missed these)
    hashes[1] = base ^ (1 << 59)
    hashes[2] = base ^ (1 << 59) ^ (1 << 58) ^ (1 << 57)
    # flips spread across all four bands (still <= 3 total)
    hashes[3] = base ^ (1 << 50) ^ (1 << 30) ^ (1 << 10)
    # exactly 4 flips -> NOT a pair with 0
    hashes[4] = base ^ (1 << 59) ^ (1 << 44) ^ (1 << 29) ^ (1 << 14)
    # random background docs
    for i in range(5, 40):
        hashes[i] = rng.getrandbits(60)

    exp = {
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a in hashes for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    assert (0, 1, 1) in exp and (0, 2, 3) in exp and (0, 3, 3) in exp
    assert not any(a == 0 and b == 4 for a, b, _ in exp)

    sim = spark.createDataFrame(
        [(d, h) for d, h in hashes.items()], "doc_id long, simhash long"
    )
    got = {
        (int(r.doc_a), int(r.doc_b), int(r.hamming))
        for r in TX.simhash_near_pairs(sim).collect()
    }
    assert got == exp
