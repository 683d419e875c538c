"""Similarity search over embedding columns (W2 generalized, driver-mandated
ANN extension).

  cosine_topk     — brute-force exact top-k: native cosine + TakeOrdered
                    (per-partition heap, no global sort) — the baseline
  lsh_topk        — random-hyperplane bucketed ANN over an in-memory /
                    ad-hoc frame: probe the query's bucket across several
                    independent bands, exact re-rank inside the union of
                    probed buckets. Signatures are computed at query time —
                    fine for one-off scans, wrong for a served index.
  write_lsh_index — materialize the signature index partitioned by
                    (band, key): the 100 TB layout where a query's probes
                    become PARTITION FILTERS and only the matching bucket
                    directories are scanned (pinned by a plan-shape test).
  lsh_topk_indexed— ANN against that stored index: partition-pruned
                    candidate read → re-join vectors from the base table →
                    exact re-rank. Per-query work is O(probed buckets + k),
                    independent of corpus size.
  knn_self_join   — k nearest neighbors for EVERY row via banded blocking
  tfidf_topk_related — sparse LEXICAL top-k: tf-idf cosine via the term
                    inverted-index dot-product join, integer weights so a
                    SQL oracle reproduces it exactly
  ivf_build/ivf_assign/ivf_topk/write_ivf_index — IVF ANN: deterministic
                    Lloyd coarse quantizer (md5-seeded init, decimal-sum
                    centroid updates), literal-expression assignment (one
                    narrow scan, no row explosion), nprobe cluster scan
                    with exact re-rank; stored layout partitions by
                    cluster so probes are partition filters
  pq_train/pq_encode/pq_topk/write_pq_index — product quantization:
                    m sub-quantizers compress each vector to m small
                    codes; queries scan ONLY the code table via an ADC
                    lookup-table expression (m bytes/vector instead of
                    4*dim — the memory factor for billion-scale serving)
                    with an exact re-rank on the rerank*k leaders
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.embed import cosine_col


def _query_lit(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine_col(F.col(vec_col), _query_lit(query_vec)).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    bands: int = 8,
    band_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN: candidates = rows sharing ≥1 hyperplane-signature band with the
    query; exact cosine re-rank on candidates only. One Arrow pass computes
    all band signatures; the query's keys are literal filters, so when the
    table is stored bucketed by signature only the matching buckets scan."""
    from knowledge_nexus_spark.operators.dedup import _banded, query_band_keys

    dim = dim or len(query_vec)
    qkeys = query_band_keys(query_vec, dim, bands, band_planes, seed)

    banded = _banded(df, id_col, vec_col, dim, bands, band_planes, seed)
    match = F.lit(False)
    for i, key in enumerate(qkeys):
        match = match | ((F.col("band") == i) & (F.col("key") == key))
    cand = banded.filter(match).dropDuplicates(["id"])
    return (
        cand.withColumn("score", cosine_col(F.col("vec"), _query_lit(query_vec)))
        .select("id", "score")
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def write_lsh_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    dim: int,
    bands: int = 8,
    band_planes: int = 8,
    seed: int = 42,
) -> None:
    """Materialize the hyperplane-signature index as a (band, key)-
    partitioned parquet table of (id) rows.

    This is the storage layout `lsh_topk`'s docstring promises: a query's
    band keys become partition filters, so only bands×1 bucket directories
    are ever read — at 10^12 rows the scan cost is the bucket size, not
    the corpus. Vectors are deliberately NOT duplicated into the index
    (that would store every embedding ``bands`` times); the query re-joins
    them from the base table AFTER candidate dedup, a k-sized lookup."""
    from knowledge_nexus_spark.operators.dedup import _banded

    banded = _banded(df, id_col, vec_col, dim, bands, band_planes, seed).select(
        "id", "band", "key"
    )
    banded.write.mode("overwrite").partitionBy("band", "key").parquet(path)


def lsh_topk_indexed(
    base: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    bands: int = 8,
    band_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k against a stored ``write_lsh_index`` layout: the candidate
    read is partition-pruned to the query's (band, key) probes — no
    signature recomputation over the corpus at query time (the round-2
    `lsh_topk` gap). ``base`` supplies the vectors for the exact re-rank;
    the candidate set is tiny, so AQE broadcasts it into the base join."""
    from knowledge_nexus_spark.operators.dedup import query_band_keys

    spark = base.sparkSession
    dim = dim or len(query_vec)
    qkeys = query_band_keys(query_vec, dim, bands, band_planes, seed)

    idx = spark.read.parquet(index_path)
    match = F.lit(False)
    for i, key in enumerate(qkeys):
        match = match | ((F.col("band") == i) & (F.col("key") == key))
    cand = idx.filter(match).select("id").dropDuplicates(["id"])

    vecs = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return (
        cand.join(vecs, "id")
        .withColumn("score", cosine_col(F.col("vec"), _query_lit(query_vec)))
        .select("id", "score")
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def _dot_lit(vec_col, centroid: list[float]):
    """JVM-side dot product of an array column with a literal vector —
    delegates to functions.embed.dot_col (one dot-product definition in
    the repo; dot_col casts operands to double, so float32 embedding
    columns hit the same precision path as everywhere else)."""
    from knowledge_nexus_spark.functions.embed import dot_col

    return dot_col(vec_col, F.array(*[F.lit(float(x)) for x in centroid]))


def _normalize(c: list[float]) -> list[float]:
    n = sum(x * x for x in c) ** 0.5
    return [x / n for x in c] if n > 0 else c


def ivf_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    iters: int = 2,
):
    """IVF coarse quantizer: deterministic Lloyd k-means, returning
    (centroids, assignment DataFrame (id, cluster)).

    Everything that could wobble is pinned:
      - init: the ``n_clusters`` rows with the smallest md5 of their id —
        a content-independent deterministic sample (collect is K-sized);
      - assignment: argmax over K literal normalized-centroid dot
        expressions via array_max + array_position (first index wins
        ties) — ONE narrow scan per iteration, no crossJoin, no K-way
        row explosion, fully JVM;
      - update: element-wise mean per cluster with DECIMAL(38,12) sums
        (posexplode → groupBy (cluster, idx)), so partial-sum order
        cannot change low bits; the K×dim result collects to the driver.

    At 100 TB: train the quantizer on a bounded md5-sample (pass the
    sampled frame here), then assign the full corpus with ONE pass of
    the same literal expressions — the shape `ivf_assign` provides."""
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seeds = (
        keyed.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h")
        .limit(n_clusters)
        .select("vec")
        .collect()
    )
    centroids = [list(map(float, r["vec"])) for r in seeds]
    # fewer rows than requested clusters: clamp K to the rows actually
    # seeded — range(n_clusters) below would otherwise index past the
    # centroid list (code-review finding, round 4)
    n_clusters = len(centroids)
    if n_clusters == 0:
        raise ValueError("ivf_build: input frame has no rows")

    for _ in range(iters):
        assign = ivf_assign(keyed, "id", "vec", centroids)
        sums = (
            assign.join(keyed, "id")
            .select("cluster", F.posexplode("vec").alias("idx", "val"))
            .groupBy("cluster", "idx")
            .agg(
                F.sum(F.col("val").cast("decimal(38,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["idx"]] = float(r["s"]) / r["n"]
        centroids = [
            [by_cluster[c][i] for i in sorted(by_cluster[c])]
            if c in by_cluster
            else centroids[c]  # empty cluster keeps its centroid
            for c in range(n_clusters)
        ]
    return centroids, ivf_assign(keyed, "id", "vec", centroids)


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, cluster): nearest centroid by cosine — |v| is a common factor,
    so argmax of dot with the NORMALIZED centroids suffices."""
    scores = F.array(
        *[_dot_lit(F.col(vec_col), _normalize(c)) for c in centroids]
    )
    return df.select(
        F.col(id_col).alias("id"),
        (F.array_position(scores, F.array_max(scores)) - 1)
        .cast("int")
        .alias("cluster"),
    )


def ivf_topk(
    df: DataFrame,
    assign: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """ANN through the IVF index: rank centroids against the query on the
    driver (K-sized, no job), scan only the ``nprobe`` nearest clusters,
    exact cosine re-rank inside them. With the assignment stored
    ``partitionBy(cluster)`` (write_ivf_index) the cluster filter is a
    partition filter and the probe reads nprobe/K of the index."""
    import math

    qn = _normalize([float(x) for x in query_vec])
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (
            -sum(a * b for a, b in zip(_normalize(centroids[i]), qn)),
            i,
        ),
    )
    probe = ranked[:nprobe]
    cand = assign.filter(F.col("cluster").isin([int(c) for c in probe]))
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return (
        cand.join(vecs, "id")
        .withColumn("score", cosine_col(F.col("vec"), _query_lit(query_vec)))
        .select("id", "score")
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def write_ivf_index(assign: DataFrame, path: str) -> None:
    """Store the (id, cluster) assignment partitioned by cluster — the
    nprobe filter of ``ivf_topk`` becomes a partition filter, mirroring
    the (band, key) layout of ``write_lsh_index``."""
    assign.write.mode("overwrite").partitionBy("cluster").parquet(path)


def knn_self_join(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    bands: int = 6,
    band_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN per row: banded candidate join + per-id window top-k.

    Shuffle-width note (mirrors ``dedup.embedding_neardup_pairs``): the
    banded explode and the (band, key) self-join carry ONLY (id, band, key)
    — the bands×rows explosion and bucket shuffle move ~16 bytes/row, not
    two embedding arrays per candidate. Vectors re-join once per side
    AFTER the (id, neighbor) dedup, so each embedding crosses the wire
    once per side of a surviving pair instead of ``bands`` times per row.
    Pinned by test_plan_shapes (no array column below the band Exchange)."""
    from knowledge_nexus_spark.operators.dedup import _banded

    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    banded = _banded(keyed, "id", "vec", dim, bands, band_planes, seed).select(
        "id", "band", "key"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("neighbor"))
        .dropDuplicates(["id", "neighbor"])
    )
    va = keyed.select(F.col("id").alias("id"), F.col("vec").alias("va"))
    vb = keyed.select(F.col("id").alias("neighbor"), F.col("vec").alias("vb"))
    scored = (
        cand.join(va, "id")
        .join(vb, "neighbor")
        .withColumn("score", cosine_col(F.col("va"), F.col("vb")))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("neighbor"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("id", "neighbor", "score")
    )


# --- sparse lexical similarity (tf-idf cosine) -----------------------------


def tfidf_topk_related(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_df_ratio: float = 1.0,
    dimsum_gamma: float | None = None,
) -> DataFrame:
    """Top-``k`` most similar documents per document under tf-idf cosine,
    computed as a SPARSE dot-product join over the term inverted index —
    the lexical sibling of the dense-embedding ANN ops above, and the
    classic related-documents / semantic-dedup-candidate query
    (reference's similarity surface: graph_rag Q1/W2 generalized to
    weighted bags of words).

    Shape (all JVM-native, no Python):
      1. tf(doc, term) — one groupBy over the exploded tokens;
      2. df(term) — vocabulary-sized aggregate over the SAME frame;
      3. integer weight w = tf·10^6 DIV df (BIGINT both engines truncate
         identically; same surrogate as the oracled ``docs_tfidf``) —
         keeping weights integral makes the dot products and norms EXACT
         and aggregation-order-independent, so a SQL oracle reproduces
         them bit-for-bit; the only floats are one CAST, two IEEE sqrt
         and one divide at the very end, each correctly rounded and
         hence deterministic cross-engine;
      4. pair numerators: postings self-join on term (id_a < id_b) +
         groupBy pair — the standard sparse-matrix-product plan (the
         inverted index IS the blocking: pairs sharing no term never
         meet);
      5. symmetrize, join the two norms, window top-k per doc.

    Scale: the term join's fan-out is Σ_t df(t)² — corpus-universal
    terms make it quadratic, so at web scale pruning them with
    ``max_df_ratio`` is mandatory (their idf ≈ 0 contribution doesn't
    justify quadratic buckets). Integer headroom: sums stay < 2^63
    while Σ_shared tf_a·tf_b < ~9·10^6 per pair — thousands of repeated
    tokens per doc; re-scale the 10^6 weight factor for longer docs.

    ``dimsum_gamma`` enables DIMSUM-style magnitude sampling (Zadeh &
    Carlsson, "Dimension Independent Matrix Square using MapReduce",
    2013 — the algorithm behind Spark MLlib's
    RowMatrix.columnSimilarities(threshold)): posting (doc i, term t)
    is kept with probability p_i = min(1, sqrt(γ)/‖c_i‖) and its weight
    rescaled by 1/p_i, making Σ_t w'_a·w'_b an unbiased estimator of
    the dot product while bounding expected per-term pair fan-out by
    ~γ·(df(t)/Σdf)… independent of the worst doc norm — the knob that
    tames corpus-universal terms when max_df pruning alone can't.
    Sampling is DETERMINISTIC (xxhash64(term, id) uniform vs p_i), so
    results are reproducible and property-testable; norms (and thus
    the cosine denominators) are computed on the UNSAMPLED postings,
    exactly as DIMSUM prescribes. With γ ≥ max_i ‖c_i‖² every p_i
    saturates at 1 and the output is BIT-IDENTICAL to the exact path
    (integer-valued doubles < 2^53 sum exactly in any order) — pinned
    by tests/test_tfidf_related.py."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    post = tf.join(dfreq, "term").withColumn(
        "w", F.expr("tf * CAST(1000000 AS BIGINT) DIV df")
    )
    if max_df_ratio < 1.0:
        # scalar max-df bound: 1-row aggregate, broadcast — not a data join
        nd = df.select(F.count(F.lit(1)).alias("n_docs"))
        post = post.crossJoin(F.broadcast(nd)).filter(
            F.col("df") <= F.col("n_docs") * F.lit(max_df_ratio)
        )
    post = post.select("id", "term", "w")
    norms = post.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("norm2"))
    if dimsum_gamma is not None:
        import math

        sqrt_g = math.sqrt(float(dimsum_gamma))
        # p_i from the UNSAMPLED norm (one narrow id-keyed join); the
        # uniform is a pure hash of (term, id) — executor-side, seedless,
        # reproducible. Kept weights carry the 1/p_i inflation as DOUBLE
        # (integer-valued when p_i = 1, so the saturated case stays exact).
        pairs_in = (
            post.join(norms, "id")
            .withColumn(
                "_p",
                F.least(
                    F.lit(1.0),
                    F.lit(sqrt_g) / F.sqrt(F.col("norm2").cast("double")),
                ),
            )
            .withColumn(
                "_u",
                (
                    F.xxhash64(F.col("term"), F.col("id")).cast("double")
                    / F.lit(float(2**63))
                    + F.lit(1.0)
                )
                / F.lit(2.0),
            )
            .filter(F.col("_u") < F.col("_p"))
            .select(
                "id", "term", (F.col("w").cast("double") / F.col("_p")).alias("w")
            )
        )
    else:
        pairs_in = post
    a, b = pairs_in.alias("a"), pairs_in.alias("b")
    num = (
        a.join(b, "term")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("num"))
    )
    sym = num.select(
        F.col("doc_a").alias("id"), F.col("doc_b").alias("neighbor"), "num"
    ).unionByName(
        num.select(
            F.col("doc_b").alias("id"), F.col("doc_a").alias("neighbor"), "num"
        )
    )
    na = norms.select(F.col("id"), F.col("norm2").alias("norm_a"))
    nb = norms.select(F.col("id").alias("neighbor"), F.col("norm2").alias("norm_b"))
    sim = (
        sym.join(na, "id")
        .join(nb, "neighbor")
        .withColumn(
            "cosim",
            F.col("num").cast("double")
            / (F.sqrt(F.col("norm_a").cast("double")) * F.sqrt(F.col("norm_b").cast("double"))),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("cosim").desc(), "neighbor")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias("doc_id"),
            "neighbor",
            F.round("cosim", 6).alias("sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# --------------------------------------------------------------- PQ / ADC --

def _pq_shapes(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    return dim // m


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
) -> list[list[list[float]]]:
    """Train a product quantizer: ``m`` independent sub-quantizers of
    ``k`` centroids over the m equal slices of the vector (Jégou,
    Douze & Schmid, "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011 — the codebook behind FAISS's IVFPQ). Returns
    ``codebooks[m][k][dim//m]``.

    Same determinism discipline as ``ivf_build`` (everything that could
    wobble is pinned): init = the k rows with the smallest md5(id),
    sliced per subspace; assignment = argmin L2 via k literal
    ``<v_j,c> - |c|²/2`` expressions per subspace (ONE narrow scan, no
    explosion, fully JVM); update = per-(subspace, code, component)
    element mean with DECIMAL(38,12) sums so partial-sum order cannot
    change low bits. One assignment pass + one k*dim-sized collect per
    iteration for ALL m sub-quantizers together.

    At 100 TB: train on a bounded md5-sample, encode the full corpus
    with one pass of the same literal expressions (``pq_encode``) — the
    stored index is m BYTES per vector instead of 4*dim, the memory
    factor that makes billion-scale ANN serving fit."""
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seeds = (
        keyed.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h")
        .limit(k)
        .select("vec")
        .collect()
    )
    if not seeds:
        raise ValueError("pq_train: input frame has no rows")
    dim = len(seeds[0]["vec"])
    sub = _pq_shapes(dim, m)
    k = min(k, len(seeds))  # tiny frames: clamp like ivf_build
    codebooks = [
        [[float(x) for x in r["vec"][j * sub : (j + 1) * sub]] for r in seeds[:k]]
        for j in range(m)
    ]

    for _ in range(iters):
        enc = pq_encode(keyed, "id", "vec", codebooks)
        sums = (
            enc.join(keyed, "id")
            .select("codes", F.posexplode("vec").alias("idx", "val"))
            .select(
                (F.col("idx") / sub).cast("int").alias("j"),
                (F.col("idx") % sub).alias("w"),
                F.element_at(
                    F.col("codes"), (F.col("idx") / sub).cast("int") + 1
                ).alias("code"),
                "val",
            )
            .groupBy("j", "code", "w")
            .agg(
                F.sum(F.col("val").cast("decimal(38,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in sums:
            acc.setdefault((r["j"], r["code"]), {})[r["w"]] = float(r["s"]) / r["n"]
        codebooks = [
            [
                [acc[(j, c)][w] for w in range(sub)]
                if (j, c) in acc
                else codebooks[j][c]  # empty cell keeps its centroid
                for c in range(k)
            ]
            for j in range(m)
        ]
    return codebooks


def _pq_code_expr(vec, codebooks: list[list[list[float]]], j: int):
    """argmin-L2 code for subspace j: argmax of <v_j, c> - |c|^2/2 over
    the k literal centroids (first index wins ties, like ivf_assign)."""
    sub = len(codebooks[j][0])
    slice_j = F.slice(vec, j * sub + 1, sub)
    scores = F.array(
        *[
            _dot_lit(slice_j, c) - F.lit(sum(x * x for x in c) / 2.0)
            for c in codebooks[j]
        ]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(id, codes ARRAY<INT>[m]): one narrow fully-JVM scan — m*k literal
    dot expressions inside whole-stage codegen, no shuffle, no Python."""
    m = len(codebooks)
    vec = F.col(vec_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.array(*[_pq_code_expr(vec, codebooks, j) for j in range(m)]).alias(
            "codes"
        ),
    )


def write_pq_index(codes: DataFrame, path: str) -> None:
    """Persist the PQ code table — m bytes/vector logical payload (codes
    are INT here for parquet friendliness; k<=256 fits a byte on disk via
    parquet's bit-packing), the serving-layout counterpart of
    write_lsh_index/write_ivf_index."""
    codes.write.mode("overwrite").parquet(path)


def pq_topk(
    codes: DataFrame,
    base: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 4,
) -> DataFrame:
    """ANN top-k by Asymmetric Distance Computation: the driver builds the
    m*k lookup table LUT[j][c] = <q_j, c_jc> (a k*m-sized pure-Python
    step, no job), every row's approximate inner product is then ONE
    whole-stage-codegen expression — sum over j of
    element_at(lut, j*k + codes[j]) — over the m-byte codes, never the
    float vectors. The rerank*k ADC leaders re-join the base table for an
    exact cosine re-rank (the FAISS IVFADC pattern; candidate set is
    k-sized, so AQE broadcasts it).

    Scale shape: the scan reads ONLY the code table (m bytes/vector);
    the float vectors are touched for rerank*k rows total."""
    m = len(codebooks)
    kk = len(codebooks[0])
    sub = len(codebooks[0][0])
    lut = [
        sum(float(query_vec[j * sub + w]) * c[w] for w in range(sub))
        for j in range(m)
        for c in codebooks[j]
    ]
    lut_lit = F.array(*[F.lit(x) for x in lut])
    jidx = F.sequence(F.lit(0), F.lit(m - 1))
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            jidx,
            lambda c, j: F.element_at(lut_lit, (j * kk + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        codes.withColumn("adc", adc)
        .orderBy(F.col("adc").desc(), F.col("id"))
        .limit(k * rerank)
        .select("id")
    )
    vecs = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return (
        cand.join(vecs, "id")
        .withColumn("score", cosine_col(F.col("vec"), _query_lit(query_vec)))
        .select("id", "score")
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def ivfpq_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 8,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
):
    """IVF + residual PQ (the FAISS IVFADC layout, Jégou et al. 2011
    §IV): the coarse quantizer routes each vector to a cluster, PQ then
    encodes the RESIDUAL v - centroid[cluster]. Residual encoding is
    what makes ADC discriminative WITHIN a cluster — flat PQ
    reconstructs every member of a tight cluster to nearly the same
    point, so intra-cluster ranking degenerates (measured: recall@10
    0.3 on the clustered corpus at m=4, k=16); the residual codebook
    spends its entire resolution on exactly the within-cluster
    variation the exact top-k is ranked by.

    Returns (centroids, codebooks, codes DataFrame (id, cluster,
    codes)). All stages inherit the determinism pins of ivf_build /
    pq_train; the residual computation is one zip_with against a
    K x dim literal — JVM-native, no shuffle beyond ivf_build's own."""
    cents, assign = ivf_build(df, id_col, vec_col, n_clusters, iters)
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).join(
        assign, "id"
    )
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    cvec = F.element_at(cent_lit, F.col("cluster") + 1)
    rdf = keyed.select(
        "id",
        "cluster",
        F.zip_with(
            F.col("vec"), cvec, lambda a, b: a.cast("double") - b
        ).alias("rvec"),
    )
    codebooks = pq_train(rdf, "id", "rvec", m=m, k=k, iters=iters)
    codes = pq_encode(rdf, "id", "rvec", codebooks).join(assign, "id")
    return cents, codebooks, codes


def write_ivfpq_index(codes: DataFrame, path: str) -> None:
    """Store (id, codes) partitioned by cluster: the nprobe filter is a
    partition filter AND the per-vector payload is m codes — the two
    scale levers (probe fraction, bytes/vector) composed."""
    codes.write.mode("overwrite").partitionBy("cluster").parquet(path)


def ivfpq_topk(
    codes: DataFrame,
    base: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    rerank: int = 4,
) -> DataFrame:
    """ANN through the IVFADC index. Driver side (all K/k*m-sized, no
    jobs): rank centroids by cosine against the query, keep ``nprobe``;
    ADC decomposes <q, v> = <q, centroid_c> + <q, residual>, so ONE
    residual LUT serves every probed cluster and the centroid term is a
    per-cluster scalar looked up from a literal. Executor side: scan
    the probed clusters' code rows (a partition filter under
    write_ivfpq_index), one codegen expression per row, exact cosine
    re-rank on the rerank*k leaders only."""
    m = len(codebooks)
    kk = len(codebooks[0])
    sub = len(codebooks[0][0])
    q = [float(x) for x in query_vec]
    qn = _normalize(q)
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (
            -sum(a * b for a, b in zip(_normalize(centroids[i]), qn)),
            i,
        ),
    )
    probe = [int(c) for c in ranked[:nprobe]]
    qcent = [
        sum(a * b for a, b in zip(q, centroids[c])) for c in range(len(centroids))
    ]
    qcent_lit = F.array(*[F.lit(x) for x in qcent])
    lut = [
        sum(q[j * sub + w] * c[w] for w in range(sub))
        for j in range(m)
        for c in codebooks[j]
    ]
    lut_lit = F.array(*[F.lit(x) for x in lut])
    jidx = F.sequence(F.lit(0), F.lit(m - 1))
    adc = F.element_at(qcent_lit, F.col("cluster") + 1) + F.aggregate(
        F.zip_with(
            F.col("codes"),
            jidx,
            lambda c, j: F.element_at(lut_lit, (j * kk + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        codes.filter(F.col("cluster").isin(probe))
        .withColumn("adc", adc)
        .orderBy(F.col("adc").desc(), F.col("id"))
        .limit(k * rerank)
        .select("id")
    )
    vecs = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return (
        cand.join(vecs, "id")
        .withColumn("score", cosine_col(F.col("vec"), _query_lit(query_vec)))
        .select("id", "score")
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )
