"""Deduplication operators for large-scale training-data pipelines.

The reference dedups at two levels — per-crawler visited-URL sets
(crawler/main.go:194-199, crawler/safe_lists.go:32-45) and a global
before-insert set (crawler/main.go:337-343) — i.e. exact identity dedup. A
100 TB corpus pipeline needs content-level near-dup removal too; these
operators extend the same F2/F3 semantics to content space:

- exact_dedup            — hash-groupBy on md5(content), keep min doc_id
- shingles / minhash_lsh — MinHash signatures + LSH banding → candidate pairs
- ngram_jaccard_pairs    — exact Jaccard over shingle sets (verifier for LSH)
- simhash               — 64-bit SimHash fingerprints + hamming-band buckets
- embedding_neardup_pairs — cosine ≥ τ pairs over an embedding column

Portability: MinHash uses min(md5(shingle||':'||i)) over *hex strings* and
Jaccard uses plain set algebra — both expressible identically in DuckDB, so
the driver's oracle can replay them (see __spark_entry__.oracle_sql).

Scale posture: every operator is a shuffle on a bounded key (hash, band,
bucket); candidate verification happens only within buckets, never all-pairs.
The only all-pairs op is embedding_neardup_pairs', gated behind an explicit
block-join keyed by LSH bucket when `bucketed=True`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 3
DEFAULT_HASHES = 16
DEFAULT_BANDS = 4  # rows per band = DEFAULT_HASHES / DEFAULT_BANDS = 4


def tokenize_terms(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("_toks", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0))


def _bind(expr, fn):
    """Let-binding for Column expressions: evaluate `expr` ONCE per row and
    hand it to `fn` as a bound lambda variable. HOF lambda variables are
    materialized; outer column references inside lambdas are re-evaluated on
    every use (Catalyst collapses projections and does no CSE across them)."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest id per identical content (hash-groupBy — the shuffle
    replacement for the reference's shared-memory sets)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


def shingle_set_col(toks_col, n: int = DEFAULT_SHINGLE) -> "F.Column":
    """Distinct n-token shingles of a token-array column as a pure array
    expression — no explode, no shuffle."""
    return F.array_distinct(
        F.when(
            F.size(toks_col) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks_col) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks_col, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Distinct n-token shingles per doc in relational (exploded) form —
    feeds the inverted-index self-join of ngram_jaccard_pairs."""
    toks = tokenize_terms(df, text_col)
    sh = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = DEFAULT_HASHES) -> DataFrame:
    """(doc_id, hash_id, minhash): minhash_i = min over shingles of
    md5(shingle || ':' || i) — hex-string min, portable to the SQL oracle.
    Relational view over minhash_signature_arrays (shuffle-free)."""
    arrays = minhash_signature_arrays(df, id_col, text_col, num_hashes)
    return arrays.select("doc_id", F.posexplode("minhashes").alias("hash_id", "minhash"))


def minhash_signature_arrays(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_HASHES,
    hash_kind: str = "md5",
    shingle_n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(doc_id, minhashes array) as ONE shuffle-free projection:
    tokens → distinct shingles → per-hash array_min — the num_hashes×
    fan-out lives inside the expression tree, never in the shuffle.

    hash_kind='md5'  — hex-string minhashes, bit-identical to the DuckDB
                       oracle (the correctness-gated variant);
    hash_kind='xx64' — 64-bit xxhash64 longs, the production fast path:
                       no hex formatting, 8-byte shuffle keys instead of
                       32-char strings, same LSH guarantees.

    Execution shape (r7): the num_hashes× fan-out runs as `explode(shingles)
    → groupBy(doc_id).agg(num_hashes × min(hash(shingle, i)))`, NOT as nested
    transform/array_min higher-order functions. HOF lambdas are interpreted
    per element (no whole-stage codegen), which made the old expression tree
    the suite's hot spot (measured r7 @sf1.0: 4.70 s → 0.33 s, identical
    values); min() aggregates over exploded rows stay inside codegen. The
    exchange cost is unchanged: partial (map-side) aggregation collapses each
    doc — whose shingles all live in one task — to ONE row before any
    shuffle, and after the widening repartition on doc_id the groupBy reuses
    that partitioning outright (zero extra exchange)."""
    # the hash fan-out is the CPU hot spot: make sure it runs at full width
    # even when the source has few partitions (e.g. one small parquet file);
    # project to (id, text) first so the exchange moves only those bytes
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par, F.col("doc_id"))

    # Catalyst collapses projections, and higher-order-function lambdas
    # re-evaluate OUTER column references per use (no CSE) — so the regexp
    # tokenizer would run once per reference. _bind() makes the tokens (and
    # the shingle set) a lambda VARIABLE, which IS materialized once per row.
    raw_toks = F.regexp_extract_all(F.lower(F.col("_text")), F.lit("[a-z0-9]+"), 0)

    if hash_kind == "xx64":
        # fast path, two standard MinHash tricks on top of the binding:
        # 1. never BUILD shingle strings — hash the token triple directly
        #    (one xxhash64 over 3 string cols), distinct the 64-bit values;
        # 2. hash each shingle ONCE; derive the num_hashes family by
        #    rehashing the 8-byte value (xxhash64(long, i)).
        def tri_of(toks):
            n = F.size(toks)
            return F.when(
                n >= shingle_n,
                F.array_distinct(F.transform(
                    F.sequence(F.lit(1), n - F.lit(shingle_n - 1)),
                    lambda i: F.xxhash64(*[F.element_at(toks, i + j) for j in range(shingle_n)]),
                )),
            ).otherwise(F.array().cast("array<long>"))

        shingle_arr = _bind(raw_toks, tri_of)
        aggs = [F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"_m{i}") for i in range(num_hashes)]
    else:
        shingle_arr = _bind(raw_toks, lambda toks: shingle_set_col(toks, shingle_n))
        aggs = [
            F.min(F.md5(F.concat_ws(":", F.col("_h"), F.lit(str(i))))).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    # docs with an empty shingle set produce no exploded rows and drop out
    # here — the same set the old `minhashes[0] IS NOT NULL` filter kept
    exploded = src.select("doc_id", F.explode(shingle_arr).alias("_h"))
    return (
        exploded.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("minhashes"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = DEFAULT_SHINGLE,
    hash_kind: str = "md5",
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b): docs sharing ≥1 identical band.

    band key = hash of the band's minhashes in hash_id order; pairs are
    emitted per (band_id, band_key) BUCKET — one groupBy + a per-bucket pair
    expansion, never all-pairs. r7: this replaced a self-join on the band key,
    which recomputed the whole signature pipeline on both join branches
    whenever exchange reuse failed to kick in — and under AQE the ~MB-sized
    banded side was runtime-converted to a BROADCAST hash join (collecting a
    corpus-sized relation to the driver and leaving only the non-equi
    doc_a < doc_b condition), which is exactly the wrong plan at scale and
    was measured 2-6x slower and erratic at sf1.0. The bucket expansion runs
    the signatures ONCE and shuffles one row per (doc, band).
    Skew note: a boilerplate-hot bucket expands m² pairs in one task; the
    band key is a full-width hash so buckets are near-dup clusters, not Zipf
    heads (measured max bucket 4 at sf1.0), and the expansion is array-local.
    hash_kind: 'md5' = oracle-portable hex strings; 'xx64' = 64-bit fast path.
    """
    if bands <= 0 or num_hashes % bands:
        # silent truncation would band over only (num_hashes // bands) *
        # bands of the computed minhashes (weaker LSH than requested), and
        # bands > num_hashes would give every doc IDENTICAL empty band
        # keys — the full O(N^2) cross product the docstring rules out
        raise ValueError(f"bands ({bands}) must evenly divide num_hashes ({num_hashes})")
    sig = minhash_signature_arrays(df, id_col, text_col, num_hashes,
                                   hash_kind=hash_kind, shingle_n=shingle_n)
    rows_per_band = num_hashes // bands
    # band key = hash of the band's minhashes in hash_id order
    # (array slice preserves order; mirrors ORDER BY hash_id in the SQL oracle)
    if hash_kind == "xx64":
        band_keys = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.slice("minhashes", b * rows_per_band + F.lit(1), rows_per_band)),
        )
    else:
        band_keys = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.md5(F.concat_ws("|", F.slice("minhashes", b * rows_per_band + F.lit(1), rows_per_band))),
        )
    banded = sig.select("doc_id", F.posexplode(band_keys).alias("band_id", "band_key"))
    buckets = (
        banded.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # all (i < j) pairs of the sorted bucket members; ids are distinct within
    # a bucket (one row per doc per band), so doc_a < doc_b is strict
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .dropDuplicates()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = DEFAULT_SHINGLE,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold pairs via shingle-inverted join:
    explode shingles → self-join on shingle (each shingle is a bucket) →
    |A∩B| per pair → |A∪B| = |A|+|B|−|A∩B|. O(Σ bucket²), not O(N²).

    max_shingle_df caps the hot-shingle hazard: a boilerplate shingle shared
    by 10⁵ docs makes its bucket contribute 10¹⁰ pairs while carrying no
    Jaccard signal. With the cap, shingles whose document frequency exceeds
    it are dropped from the shingle SPACE — both the intersections and the
    per-doc sizes are computed over the filtered space, so the result is the
    exact Jaccard of the capped representation (the standard stopword-shingle
    treatment), not a biased estimate. None (default) = uncapped exact —
    safe only when no shingle is boilerplate-hot (the oracle-checked query);
    at 100 TB always set a cap (or verify only within LSH candidate
    clusters, operators.dedup.lsh_candidate_pairs)."""
    sh = shingles(df, id_col, text_col, shingle_n)
    raw = None
    if max_shingle_df is not None:
        # persist the raw shingles BEFORE deriving `hot`, or the corpus-wide
        # shingle explode runs twice (once for the df aggregate, once to
        # materialize the filtered set)
        raw = sh.persist()
        hot = (
            raw.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = raw.join(hot, "shingle", "left_anti")
    sh = sh.persist()
    if raw is not None:
        sh.count()  # materialize the filtered cache, then drop the raw one
        raw.unpersist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from tf-weighted term hashes.

    Term bits come from the first 15 hex chars of md5 (60 bits, portable);
    per-bit votes are Σ(tf if bit set else −tf); fingerprint packs the sign
    bits. ONE groupBy("doc_id") with 60 conditional-sum aggregate expressions
    over the un-fanned (doc_id, term, tf, h) rows — the previous ×60 bit
    crossJoin fed the exchange 60× the posting count; map-side combine
    bounded the shuffle but not the exchange input. Same result, 1/60 the
    rows through the plan.
    """
    toks = tokenize_terms(df, text_col).select(
        F.col(id_col).alias("doc_id"), F.explode("_toks").alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    hashed = tf.withColumn("h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"))
    vote_cols = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"v{b}")
        for b in range(60)
    ]
    votes = hashed.groupBy("doc_id").agg(*vote_cols)
    packed = reduce(
        lambda acc, b: acc + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
        range(60),
        F.lit(0).cast("long"),
    )
    return votes.select("doc_id", packed.alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, found by banding the
    64-bit fingerprint into (max_hamming+1) chunks — pigeonhole: any pair within
    the radius shares at least one exact chunk, so the join is bucket-local."""
    sh = simhash(df, id_col, text_col).persist()
    n_chunks = max_hamming + 1
    chunk_bits = 60 // n_chunks
    spark = df.sparkSession
    chunks = F.broadcast(spark.range(n_chunks).select(F.col("id").cast("int").alias("chunk")))
    keyed = sh.crossJoin(chunks).withColumn(
        "chunk_val",
        F.expr(f"shiftright(simhash, chunk * {chunk_bits}) & {(1 << chunk_bits) - 1}"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.chunk_val") == F.col("b.chunk_val")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _normed(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("v"),
        F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))).alias("norm"),
    )


def _pair_cosine(pairs: DataFrame, normed: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b) candidates → verified cosine ≥ τ pairs. Vectors are
    fetched by two hash joins AFTER candidate generation, so the LSH key
    explode never carries the embedding payload."""
    av = normed.select(F.col("doc_id").alias("doc_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    bv = normed.select(F.col("doc_id").alias("doc_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    return (
        pairs.join(av, "doc_a")
        .join(bv, "doc_b")
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: bool = False,
    n_tables: int = 8,
    bits_per_table: int = 3,
) -> DataFrame:
    """Cosine ≥ τ pairs. JVM-side dot products via aggregate(zip_with(...)).

    bucketed=False — exact all-pairs; the test ORACLE only (O(N²), never run
    at scale).
    bucketed=True — the 100 TB path: banded hyperplane LSH (n_tables tables ×
    bits_per_table sign bits, deterministic planes from operators/ann). Each
    vector gets n_tables (table_id, bucket) keys from ONE 24-plane signature
    pass; candidates come from a self-HASH-join on the key (bucket-local,
    O(Σ bucket²) per table, AQE-splittable), verified by exact cosine within
    buckets. Recall = 1-(1-(1-θ/π)^bits)^tables — ≥0.95 for true near-dups
    (τ ≥ 0.8) at the defaults, asserted in tests/test_ann_dedup.py.
    """
    normed = _normed(emb, id_col, vec_col)
    if not bucketed:
        a, b = normed.alias("a"), normed.alias("b")
        return (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .withColumn(
                "dot",
                F.aggregate(
                    F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            .withColumn("cosine", F.col("dot") / (F.col("a.norm") * F.col("b.norm")))
            .filter(F.col("cosine") >= threshold)
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.round("cosine", 6).alias("cosine"),
            )
        )

    from .ann import _planes, lsh_bucket_col

    dim = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    planes = _planes(dim, n_tables * bits_per_table)
    mask = (1 << bits_per_table) - 1
    sigs = normed.select("doc_id", lsh_bucket_col(F.col("v"), planes).alias("_sig"))
    keyed = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.expr(f"shiftright(_sig, {t * bits_per_table}) & {mask}") for t in range(n_tables)])
        ).alias("table_id", "bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.table_id") == F.col("b.table_id")) & (F.col("a.bucket") == F.col("b.bucket")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates()
    )
    return _pair_cosine(cand, normed, threshold)


def dedup_keep_best(df: DataFrame, key_col: str, order_col: str, id_col: str = "doc_id") -> DataFrame:
    """F9: keep the best row per key (web/elastic_interaction.py:60) —
    row_number window, ties broken by id."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
