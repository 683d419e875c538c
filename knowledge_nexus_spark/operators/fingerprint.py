"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
— the rolling-hash fingerprinting stage of a training-data pipeline,
expressed entirely in native DataFrame ops so a SQL oracle reproduces
every fingerprint bit-for-bit.

Algorithm (local winnowing, guarantee-preserving):
  1. tokens   = lower(trim(text)) split on \\s+            (corpus tokenizer)
  2. shingles = every k consecutive tokens, joined by ' '  (k-grams)
  3. h_i      = md5_hash64(shingle_i)                      (dual-engine hash,
                operators/dedup.md5_hash64)
  4. windows  = every w consecutive hashes; fingerprint = min(h) per window
  5. fingerprints(doc) = DISTINCT window minima

Guarantees (the reason winnowing beats "every n-th hash" sampling):
  * density — expected fingerprints per hash position is 2/(w+1), so the
    selected set is ~2/(w+1) of the shingle count regardless of content;
  * coverage — any two documents sharing a token run of length >= w+k-1
    share at least one fingerprint (every length-w window of a shared run
    selects the same minimum in both documents).

Scale shape (10^12 docs): tokenise/shingle/hash are pure projections
(whole-stage codegen, zero Python). The window min partitions by doc id
— ONE hash exchange on the document key — and the per-doc DISTINCT and
summary aggregation reuse that same partitioning (HashPartitioning(doc)
satisfies ClusteredDistribution(doc, fp)), so the whole operator is a
single shuffle whose rows are (doc, pos, h) triples, never the text.
Reference parity: the reference engine has no fingerprinting stage; this
is part of the driver-mandated training-data extension surface
(SURVEY.md extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.dedup import md5_hash64

K_SHINGLE = 3  # tokens per shingle (k-gram size)
W_WINDOW = 4  # hashes per winnowing window
FP_CHECK_MOD = 1_000_003  # per-doc checksum modulus (keeps sums overflow-free)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = K_SHINGLE,
    w: int = W_WINDOW,
) -> DataFrame:
    """(id_col, fp BIGINT) — the DISTINCT winnowing fingerprints per doc.

    Documents with fewer than ``k`` tokens have no shingles and are
    excluded (no fingerprint is defined). Documents with fewer than
    ``w`` shingles yield exactly one fingerprint: the minimum over all
    their hashes (the single truncated window at position 0).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_sh = F.size(toks) - F.lit(k - 1)
    shingles = F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    hashed = (
        df.filter(F.size(toks) >= k)
        .select(
            F.col(id_col),
            n_sh.alias("n_sh"),
            F.posexplode(shingles).alias("pos", "shingle"),
        )
        .select(
            id_col, "n_sh", "pos", md5_hash64(F.col("shingle")).alias("h")
        )
    )
    # min over the w-hash window starting at pos; ROWS ... FOLLOWING
    # truncates at the partition edge, which is exactly the single-window
    # semantics we want for docs with n_sh < w once we keep only window
    # START positions (pos <= max(n_sh - w, 0)).
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        hashed.select(
            id_col,
            "pos",
            "n_sh",
            F.min("h").over(win).alias("fp"),
        )
        .filter(F.col("pos") <= F.greatest(F.col("n_sh") - w, F.lit(0)))
        .select(id_col, "fp")
        .distinct()
    )


def fingerprint_summary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = K_SHINGLE,
    w: int = W_WINDOW,
) -> DataFrame:
    """Per-document fingerprint digest:
    (id, n_fps BIGINT, fp_min BIGINT, fp_max BIGINT, fp_check BIGINT)
    where fp_check = sum(fp mod FP_CHECK_MOD) — an order-independent
    checksum of the fingerprint set that stays well inside BIGINT."""
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    return fps.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
        F.sum(F.col("fp") % FP_CHECK_MOD).alias("fp_check"),
    )


def fingerprint_summary_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = K_SHINGLE,
    w: int = W_WINDOW,
) -> str:
    """DuckDB oracle for ``fingerprint_summary`` — independent derivation
    of the same tokenizer, hash, window min, and checksum."""
    return f"""
    WITH toks AS (
      SELECT {id_col},
             regexp_split_to_array(lower(trim({text_col})), '\\s+') AS tk
      FROM {table}),
    sh AS (
      SELECT {id_col}, tk, len(tk) - {k - 1} AS n_sh,
             unnest(range(0, len(tk) - {k - 1})) AS pos
      FROM toks WHERE len(tk) >= {k}),
    hashed AS (
      SELECT {id_col}, n_sh, pos,
             CAST(('0x' || substr(md5(
               array_to_string(tk[pos + 1 : pos + {k}], ' ')), 1, 15))
               AS BIGINT) AS h
      FROM sh),
    wm AS (
      SELECT {id_col}, pos, n_sh,
             min(h) OVER (PARTITION BY {id_col} ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
      FROM hashed),
    fps AS (
      SELECT DISTINCT {id_col}, fp FROM wm
      WHERE pos <= greatest(n_sh - {w}, 0))
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_fps,
           min(fp) AS fp_min,
           max(fp) AS fp_max,
           CAST(sum(fp % {FP_CHECK_MOD}) AS BIGINT) AS fp_check
    FROM fps GROUP BY {id_col}
    """
