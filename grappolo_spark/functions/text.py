"""Text analysis + deduplication over a documents table (doc_id, text).

All operators are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen, zero Python in the hot path. Each has an
exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` (DuckDB), so the
driver value-hashes Spark vs DuckDB per query.

Design notes for 100 TB:
* tokenization/shingling stay inside codegen (split/transform); the
  explode for shingle-level ops multiplies rows ~|tokens| — partitioned by
  doc_id, no shuffle until the aggregation.
* MinHash-LSH dedup is the scale path: candidate generation is a
  band-signature groupBy (shuffle keyed on the band hash — bounded
  fan-out), never an all-pairs join. The n-gram Jaccard verifier only runs
  on candidate pairs.
* hashes are md5-derived (deterministic, partition-invariant, identical
  across engines); min() over md5 hex strings is a binary-collation min in
  both Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

_HEX = "0123456789abcdef"


def md5_prefix_long(col: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative bigint (60 bits).

    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped.

    DuckDB twin: ``list_filter(regexp_split_to_array(x, ' +'), t -> t <> '')``.
    """
    return F.filter(F.split(text, " +"), lambda t: t != "")


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_chars, stopword_ratio, punct_ratio, quality,
    pred_lang columns (SURVEY brief: token counting, quality scoring,
    language-ID heuristic)."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    n_punct = F.regexp_count(F.col(text_col), F.lit("[^A-Za-z0-9 ]"))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    quality = (
        stop_ratio * F.lit(0.4)
        + F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.2)
    )
    pred_lang = F.when(stop_ratio > 0.03, F.lit("en")).otherwise(F.lit("und"))
    return docs.select(
        "*",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_m"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
        pred_lang.alias("pred_lang"),
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token proxy: count of [A-Za-z]+ | [0-9]+ | single other
    non-space runs (same regex in Java and RE2 basic syntax)."""
    return F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint (rolling-hash flavor):
    bit_xor over tokens of md5_long('pos:token') — position-salted so
    reorderings change the fingerprint; associative so the aggregation is
    shuffle-partial-friendly.

    DuckDB twin uses ``list_transform(toks, (t, i) -> i || ':' || t)``
    (1-based index — the Spark side uses i+1 to match).
    """
    salted = F.transform(
        tokens(F.col(text_col)),
        lambda t, i: F.concat((i + 1).cast("string"), F.lit(":"), t),
    )
    ex = docs.select("doc_id", F.explode(salted).alias("salted_tok"))
    return (
        ex.select("doc_id", md5_prefix_long(F.col("salted_tok")).alias("h"))
        .groupBy("doc_id")
        .agg(F.bit_xor("h").alias("fingerprint"))
    )


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5(text) groups → (text_hash, n_docs, canonical_doc_id)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles.

    DuckDB twin: list_distinct(list_transform(range(1, len-k+2),
    i -> toks[i] || ' ' || ... )).
    """
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    grams = F.when(F.size(toks) >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(grams)


def doc_shingles(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles."""
    return docs.select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("shingle"))


def minhash_signatures(
    doc_sh: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """(doc_id, sig_0..sig_{H-1}): per-salt minimum of md5('h|shingle').

    One groupBy over the exploded shingles computes all H minima at once
    (map-side partial min → tiny shuffle).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}|"), F.col("shingle")))).alias(f"sig_{h}")
        for h in range(num_hashes)
    ]
    return doc_sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band signature.

    Band b hashes rows [b*r, (b+1)*r) of the signature; candidates are
    generated with a band-keyed self-grouping (shuffle on the band hash),
    NEVER an all-pairs join — this is what survives 10^10 documents.
    Returns distinct (doc_a, doc_b), doc_a < doc_b.
    """
    r = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * r + j}") for j in range(r)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("#", *parts)).alias("bh"))
        )
    exploded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    a = exploded.select("band", "bh", F.col("doc_id").alias("doc_a"))
    b = exploded.select("band", "bh", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    doc_sh: DataFrame, threshold: float = 0.5, restrict_pairs: DataFrame | None = None
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard over distinct shingles.

    Candidates = pairs sharing ≥1 shingle (or ``restrict_pairs``);
    J = common / (|A| + |B| − common). Returns (doc_a, doc_b, jaccard).
    """
    counts = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = doc_sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = doc_sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    if restrict_pairs is not None:
        # candidate-driven plan: never self-join on the shingle key (a hot
        # shingle shared by k docs emits k² rows there). Instead expand
        # each candidate pair by doc_a's shingles and probe doc_b's set on
        # (doc_b, shingle) — cost Σ_pairs |A|, bounded by the candidate
        # generator (LSH bands), independent of shingle hotness.
        common = (
            restrict_pairs.select("doc_a", "doc_b")
            .join(a, "doc_a")
            .join(b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("common"))
        )
    else:
        common = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("common"))
        )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_clusters(
    spark,
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    max_iter: int = 50,
) -> DataFrame:
    """End-to-end near-dup removal: the full production composition
    shingle → MinHash → banded LSH candidates → exact Jaccard verify on
    candidates only → connected components over the verified pair graph
    → canonical = min doc_id per cluster.

    Returns one row per input document: (doc_id, canonical_id, is_dup)
    with is_dup = true iff the doc is a non-canonical member of a
    near-dup cluster — i.e. ``filter(~is_dup)`` IS the deduplicated
    corpus.

    Every stage is the scale path: candidates come from the band-keyed
    self-grouping (never all-pairs), the verifier probes only candidate
    pairs, and the component step runs min-label propagation with
    pointer jumping over the (tiny) verified-pair graph — no stage is
    ever quadratic in corpus size, so the composition survives 10^10
    documents.
    """
    from ..operators.components import connected_components

    sh = doc_shingles(docs, text_col, k)
    cands = lsh_candidate_pairs(minhash_signatures(sh, num_hashes), num_hashes, bands)
    pairs = ngram_jaccard_pairs(sh, threshold=threshold, restrict_pairs=cands)
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    verts = sym.select(F.col("src").alias("vid"))
    labels, _ = connected_components(
        spark, sym, nv=0, max_iter=max_iter, vertices=verts
    )
    canon = labels.select(F.col("vid").alias("doc_id"), F.col("component").alias("_canon"))
    return docs.select("doc_id").join(canon, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_canon"), F.col("doc_id")).alias("canonical_id"),
        (F.coalesce(F.col("_canon"), F.col("doc_id")) != F.col("doc_id")).alias("is_dup"),
    )


def clean_corpus(
    spark,
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    min_quality: float = 0.35,
    lang: str = "en",
    threshold: float = 0.5,
) -> DataFrame:
    """Flagship training-data cleaning pipeline — the composition a real
    corpus build runs end-to-end:

    1. **quality/lang gate**: token stats + heuristic language id
       (``with_token_stats``); keep ``pred_lang == lang``,
       ``n_tokens >= min_tokens``, ``round(quality, 6) >= min_quality``
       (the 6-dp round keeps the float threshold comparison identical
       across engines).
    2. **exact dedup**: one doc per ``md5(text)`` group (min doc_id
       canonical) — a single window shuffle keyed on the text hash.
    3. **near-dup removal**: ``near_dup_clusters`` over the exact-dedup
       survivors (MinHash-LSH candidates → verified-pair components);
       keep cluster canonicals only.

    Returns surviving (doc_id, n_tokens, quality). Every stage is the
    scale path: the gate is pure codegen, both dedup stages shuffle on
    bounded keys (text hash / band hash), nothing is quadratic.
    """
    from pyspark.sql import Window

    st = with_token_stats(docs, text_col)
    kept = st.filter(
        (F.col("pred_lang") == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.round(F.col("quality"), 6) >= min_quality)
    )
    w = Window.partitionBy(F.md5(F.col(text_col)))
    exact = kept.withColumn("_canon_exact", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("_canon_exact")
    )
    ndc = near_dup_clusters(spark, exact, text_col=text_col, threshold=threshold)
    return (
        exact.join(ndc.filter(~F.col("is_dup")).select("doc_id"), "doc_id")
        .select("doc_id", "n_tokens", F.round("quality", 6).alias("quality"))
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.90), ("valid", 0.05), ("test", 0.05),
    ),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment by id hash.

    u = first 60 bits of md5(salt '|' id) as a uniform fraction of 2^60;
    the split is the first bucket whose cumulative fraction exceeds u.
    Pure codegen, partition-invariant, stable across runs/engines — the
    property a reproducible corpus build needs (a random split re-rolls
    on every retry/backfill; a hash split never does, and doc additions
    never move existing docs between splits).

    Returns docs' id column + ``split``. DuckDB twin of the hash:
    ``('0x' || substr(md5(...), 1, 15))::BIGINT / 2^60``.
    """
    u = md5_prefix_long(
        F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
    ).cast("double") / F.lit(float(1 << 60))
    expr = F.lit(fractions[-1][0])
    cum = 0.0
    conds = []
    for name, frac in fractions[:-1]:
        cum += frac
        conds.append((name, cum))
    for name, threshold in reversed(conds):
        expr = F.when(u < F.lit(threshold), F.lit(name)).otherwise(expr)
    return docs.select(id_col, expr.alias("split"))


def token_chunks(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 32,
    stride: int | None = None,
) -> DataFrame:
    """Sequence packing: split each document's token stream into
    fixed-size training chunks.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens); the last
    chunk may be short; a doc shorter than one chunk yields exactly one
    chunk. ``stride`` defaults to ``chunk_tokens`` (non-overlapping);
    smaller strides give overlapping context windows.

    Pure codegen (sequence + posexplode + slice): the explode multiplies
    rows by ~n_tokens/stride with no shuffle at all — chunking 100 TB is
    a map-only stage.

    Returns (doc_id, chunk_idx, n_chunk_tokens, chunk_text).
    """
    if stride is None:
        stride = chunk_tokens
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # windows covering every token: ceil((n - chunk)/stride) + 1 for
    # n > chunk, else exactly one (possibly short) chunk
    n_chunks = F.when(
        n > chunk_tokens,
        F.floor((n - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)).cast("long")
        + F.lit(1),
    ).otherwise(F.lit(1))
    chunked = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks.cast("int") - 1),
                lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 60) -> DataFrame:
    """SimHash fingerprint from token md5 bits (first ``bits`` bits ≤ 60 so
    the result stays a non-negative bigint).

    For bit j: nibble = hex value of md5(token)[j/4], bit = (nibble >>
    (3 − j%4)) & 1; score_j = Σ_tokens (2·bit − 1); output bit j = score_j
    > 0. Exploding (token × bit) keeps everything in codegen; the
    (doc, j) aggregation is one shuffle.
    """
    toks = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("tok"))
    toks = toks.withColumn("h", F.md5(F.col("tok")))
    j = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    tb = toks.select("doc_id", "h", j)
    bit = F.expr(
        "shiftright(instr('0123456789abcdef', substr(h, cast(j/4 as int)+1, 1)) - 1,"
        " cast(3 - j % 4 as int)) & 1"
    )
    scored = tb.select("doc_id", "j", (bit * 2 - 1).alias("s"))
    return (
        scored.groupBy("doc_id", "j")
        .agg(F.sum("s").alias("score"))
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN score > 0 THEN shiftleft(CAST(1 AS BIGINT),"
                f" CAST({bits - 1} - j AS INT)) ELSE CAST(0 AS BIGINT) END"
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("simhash"))
    )


def ngrams_all(text: Column, k: int = 3) -> Column:
    """ALL word k-grams (duplicates kept — unlike ``shingles``); texts
    shorter than k tokens yield the single whole-text gram.

    DuckDB twin: the ``shingles`` list_transform WITHOUT list_distinct.
    """
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    return F.when(F.size(toks) >= k, grams).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def repetition_stats(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Intra-document n-gram repetition (Gopher-style quality signal):
    (doc_id, n_grams, n_distinct, rep_ratio = 1 − distinct/total).

    Pure codegen column math — size() over the gram array and its
    array_distinct; no explode, no shuffle, map-only at any scale.
    """
    grams = ngrams_all(F.col(text_col), k)
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        n_grams.cast("long").alias("n_grams"),
        n_distinct.cast("long").alias("n_distinct"),
        F.when(
            n_grams > 0,
            1.0 - n_distinct.cast("double") / n_grams.cast("double"),
        ).otherwise(F.lit(0.0)).alias("rep_ratio"),
    )


def contamination_hits(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per TRAIN doc, how many eval docs /
    distinct shingles it collides with on word k-gram shingles.

    Returns (doc_id, n_eval_docs, n_shingles). The eval side is an eval
    *benchmark* set — tiny relative to a 100 TB corpus — so it is
    broadcast (map-side hash join against the exploded train shingles:
    zero shuffle of the big side; the only shuffle is the per-doc agg,
    keyed on doc_id). Set ``broadcast_eval=False`` for an oversized eval
    set; the plan degrades to a shuffle hash join on the shingle key.
    """
    tr_sh = doc_shingles(train, text_col, k)
    ev_sh = (
        doc_shingles(eval_docs, text_col, k)
        .select(F.col("doc_id").alias("eval_doc_id"), "shingle")
    )
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
    return (
        tr_sh.join(ev_sh, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
            F.countDistinct("shingle").alias("n_shingles"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training rows that share NO word k-gram shingle with the eval set
    (left-anti join against ``contamination_hits`` doc ids — the standard
    n-gram-collision decontamination pass of an LLM data pipeline)."""
    hits = contamination_hits(train, eval_docs, text_col, k, broadcast_eval)
    return train.join(hits.select("doc_id"), "doc_id", "left_anti")


def simhash_bands(bits: int = 60, max_hamming: int = 3) -> list[tuple[int, int, int]]:
    """(band_idx, right_shift, mask) for splitting a ``bits``-bit simhash
    into ``max_hamming + 1`` contiguous bands. Pigeonhole: a pair with
    Hamming distance ≤ max_hamming differs in at most max_hamming bands,
    so it matches EXACTLY on at least one — band-bucketed candidate
    generation is therefore complete, unlike a single top-prefix bucket."""
    n_bands = max_hamming + 1
    base, rem = divmod(bits, n_bands)
    out, used = [], 0
    for i in range(n_bands):
        w = base + (1 if i < rem else 0)
        used += w
        out.append((i, bits - used, (1 << w) - 1))
    return out


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3, bits: int = 60) -> DataFrame:
    """ALL SimHash pairs with Hamming distance ≤ ``max_hamming``.

    Complete AND bucketed: the hash is split into ``max_hamming + 1``
    bands; any qualifying pair shares ≥ 1 exact band (pigeonhole), so
    banding loses no pair, while candidates are still generated by a
    band-keyed self-join — never all-pairs. bit_count(xor) verifies
    inside the bucket; DISTINCT collapses pairs that match on several
    bands. (Round-2 fix: the old top-20-bit prefix bucket silently
    dropped pairs differing in the prefix.)
    """
    band_cols = [
        F.shiftright(F.col("simhash"), sh).bitwiseAND(F.lit(mask))
        for _, sh, mask in simhash_bands(bits, max_hamming)
    ]
    banded = sim.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*band_cols)).alias("band", "band_val"),
    )
    a = banded.select(
        "band", "band_val",
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = banded.select(
        "band", "band_val",
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
