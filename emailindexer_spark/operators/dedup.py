"""Deduplication operators for large-scale text pipelines.

Beyond the reference's ingest dedup (S4, DatabaseGenerator.java:43-55 —
exact MESSAGE_ID match), a 100 TB training-data pipeline needs content
dedup.  All hashes here are md5-derived so the DuckDB oracle can compute
bit-identical values (md5 exists in both engines; no Spark-private hash
functions in any correctness-checked path).

* exact duplicates — hash-groupBy on normalized text (one shuffle),
* word-shingle MinHash signatures + banded LSH candidate pairs
  (shingle → minhash → band → bucket self-join; band join is the only
  shuffle and scales by bucket, not by n²),
* SimHash (64-bit, tf-weighted; vectorized numpy UDF) with hamming
  near-dup pairs,
* exact n-gram Jaccard for verification of LSH candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_int32(col: Column) -> Column:
    """First 8 hex digits of md5 as an int — same value as python
    ``int(hashlib.md5(s).hexdigest()[:8], 16)`` and DuckDB
    ``CAST(('0x' || substr(md5(s),1,8)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def normalized(col: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_ids: int = 20
) -> DataFrame:
    """Exact dedup: groups of ids sharing identical normalized text.

    ``ids`` holds only the first ``max_ids`` (ascending) members — a
    boilerplate document duplicated 10^8 times must not become one
    giant array row; ``n_dups`` + ``keep_id`` carry the full-group
    facts.  Pass ``max_ids=None`` to keep every id (small corpora)."""
    ids = F.sort_array(F.collect_list(F.col(id_col)))
    if max_ids is not None:
        ids = F.slice(ids, 1, max_ids)
    return (
        df.withColumn("_norm", normalized(F.col(text_col)))
        .groupBy("_norm")
        .agg(
            F.count("*").alias("n_dups"),
            ids.alias("ids"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_dups") > 1)
        .drop("_norm")
    )


def deduplicate(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The APPLY step of exact dedup: keep one canonical row (min id)
    per normalized-text group, preserving every column.

    One hash shuffle on md5(normalized text); the survivor is picked
    with ``min_by`` over the whole-row struct, so the aggregation gets
    map-side partial combine — a key duplicated 10^8 times reduces to
    one candidate row per map partition before the exchange (no window
    sort, no skew hotspot, no join back)."""
    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    return (
        df.groupBy(F.md5(normalized(F.col(text_col))).alias("_k"))
        .agg(F.min_by(row, F.col(id_col)).alias("_r"))
        .select(*[F.col("_r")[c].alias(c) for c in cols])
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (array<string>)."""
    words = F.split(normalized(col), " ")
    return F.array_distinct(
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


def minhash_signature(col: Column, n_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature (array<string>, length n_hashes): per seed i the
    lexicographic min over shingles of md5(i || ':' || shingle).

    String-min instead of int-min so the DuckDB oracle computes the
    identical signature (md5 hex + min(varchar) behave the same in both
    engines; permutation quality is unchanged)."""
    sh = word_shingles(col, shingle_n)

    def seeded(i: int):
        # NB: a 2-parameter lambda (e.g. `lambda x, i=i`) would make
        # F.transform pass the ARRAY INDEX as the second arg, silently
        # clobbering the seed — close over it instead.
        prefix = f"{i}:"
        return lambda x: F.md5(F.concat(F.lit(prefix), x))

    sigs = [F.array_min(F.transform(sh, seeded(i))) for i in range(n_hashes)]
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate pairs: ids whose signatures agree on ≥1 full
    band.  rows_per_band = n_hashes // bands; collision probability per
    band = sim^rows_per_band.  Output: (id_a, id_b, n_bands) with
    id_a < id_b."""
    rows_per_band = n_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), n_hashes, shingle_n).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard per CANDIDATE pair — the scale path.

    ``pairs`` is (id_a, id_b[, ...]) — typically ``minhash_lsh_pairs``
    output.  Two id-keyed joins attach each side's distinct shingle set;
    the intersection is an in-row ``array_intersect``.  Cost is linear in
    the candidate count (never a raw-shingle self-join, which is
    quadratic inside common-shingle buckets — a stopword trigram shared
    by m docs would contribute m² join rows)."""
    sh = docs.select(
        F.col(id_col).alias("_jid"), word_shingles(F.col(text_col), n).alias("_sh")
    )
    return (
        pairs.select("id_a", "id_b")
        .join(
            sh.select(F.col("_jid").alias("id_a"), F.col("_sh").alias("_sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("_jid").alias("id_b"), F.col("_sh").alias("_sh_b")), "id_b"
        )
        .withColumn("_i", F.size(F.array_intersect("_sh_a", "_sh_b")))
        .withColumn(
            "jaccard",
            F.col("_i") / (F.size("_sh_a") + F.size("_sh_b") - F.col("_i")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity over all candidate pairs that
    share ≥1 shingle (explode + self-join on shingle; |A∩B| by count,
    |A∪B| = |A|+|B|−|A∩B|).

    EXHAUSTIVE small-corpus tool: the shingle self-join is quadratic
    inside common-shingle buckets, so at pipeline scale use
    ``minhash_lsh_pairs`` + :func:`jaccard_verify` instead."""
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    sizes = ex.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, "sh")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------- simhash

def _simhash_batch(texts: pd.Series, bits: int = 64) -> pd.Series:
    """Vectorized 64-bit tf-weighted SimHash — no per-ROW Python.

    The whole Arrow batch's tokens are factorized once, each UNIQUE word
    is md5-hashed once (the only Python-level loop — vocabulary-sized,
    not token- or row-sized), and the per-doc signed bit sums come from
    one ``np.add.reduceat`` over the contiguous per-doc token runs.
    Docs are processed in token-bounded chunks so the (tokens × bits)
    sign matrix stays within a fixed memory budget.  md5-based token
    hashes keep the signature bit-identical to the DuckDB oracle."""
    import hashlib

    toks = texts.fillna("").str.lower().str.split()
    nlens = toks.str.len().to_numpy(dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    total = int(nlens.sum())
    if total == 0:
        return pd.Series(out)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks.to_numpy() if len(t)])
    codes, uniq = pd.factorize(flat)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") for w in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    signed = (
        ((hs[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int8)
        * 2
        - 1
    )  # (n_uniq, bits) in {-1, +1}
    weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
    doc_starts = np.concatenate(([0], np.cumsum(nlens)))[:-1]
    nz = np.nonzero(nlens > 0)[0]
    chunk_tokens = 1 << 21  # ≤ 2M tokens × 64 int8 = 128 MB per chunk
    lo = 0
    while lo < nz.size:
        hi = lo
        tok0 = doc_starts[nz[lo]]
        while hi < nz.size and doc_starts[nz[hi]] + nlens[nz[hi]] - tok0 <= chunk_tokens:
            hi += 1
        hi = max(hi, lo + 1)  # a single huge doc still goes through
        docs = nz[lo:hi]
        tok1 = doc_starts[docs[-1]] + nlens[docs[-1]]
        tok_bits = signed[codes[tok0:tok1]]  # (chunk_tokens, bits)
        sums = np.add.reduceat(tok_bits.astype(np.int32), doc_starts[docs] - tok0, axis=0)
        sigs = ((sums > 0).astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
        out[docs] = sigs.view(np.int64)
        lo = hi
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    # single-parameter wrapper: pandas_udf rejects extra defaulted params
    sim = F.pandas_udf(lambda texts: _simhash_batch(texts, 64), "long")
    return df.select(F.col(id_col).alias("id"), sim(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit
    chunks: two 64-bit hashes within hamming ≤3 agree exactly on ≥1 of 4
    chunks (pigeonhole) — the self-join is per chunk bucket, not n²."""
    sigs = simhash(df, text_col, id_col)
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
            for c in range(4)
        ]
    )
    chunks = sigs.select("id", "simhash", F.explode(chunk_structs).alias("cc")).select(
        "id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.key").alias("key")
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, ["chunk", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def duplicate_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    check_every: int = 3,
    status: dict | None = None,
    method: str = "label_prop",
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: (id, rep) for
    every id appearing in a pair, rep = the component's minimum id —
    the canonical copy a training pipeline keeps while dropping the
    rest.  Pairs chain transitively (A~B, B~C puts A and C in one
    cluster even when A~C itself is below threshold).

    ``method="label_prop"`` (default) — min-label propagation: each
    round every node takes the min of its own and its neighbors'
    labels — converges in O(component diameter) rounds of one join +
    one aggregation (no driver-side graph state).
    Convergence is checked every ``check_every`` rounds, not every
    round: the intermediate rounds stay LAZY (one Spark ACTION — a
    changed-row probe — per check, executing the whole k-round plan as
    one job), so at 10^12 scale the driver round-trips and job-scheduling
    barriers drop ~3× while the converged result is identical (label
    propagation is monotone: extra rounds past convergence are no-ops).
    Raises after ``max_iters`` non-converged rounds rather than
    returning partial clusters.  Diameters of near-dup clusters are
    tiny in practice (dup chains are short).

    ``method="star"`` — alternating large-star / small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): O(log² n) rounds worst-case instead of O(diameter), the
    answer for ADVERSARIAL long-path dup graphs at 10^12 scale where a
    diameter-bound method would need thousands of rounds.  Same
    join+aggregate shape per round (no driver-side graph state), edge
    set shrinks toward stars rooted at each component's min id.

    ``status``, when given, is filled with {"rounds": R, "checks": C}
    so callers/tests can verify C ≤ ceil(R / check_every) (label_prop)
    or R ≪ diameter (star).
    """
    if method == "star":
        return _star_components(pairs, id_a, id_b, max_iters, status)
    if method != "label_prop":
        raise ValueError(f"unknown method {method!r} (label_prop | star)")
    check_every = max(1, int(check_every))
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    # label state at the last convergence check.  localCheckpoint, not
    # persist: ``cur`` is referenced twice per round (join + union), so
    # the LOGICAL plan doubles every round — persist truncates
    # re-execution but not re-analysis, and Catalyst analysis of a
    # 2^rounds-node tree hangs long before max_iters raises.  Cutting
    # lineage at every convergence check keeps the analyzed plan
    # O(check_every) deep; the eager materialization rides the same job
    # the changed-count probe needs anyway.  (Use reliable
    # ``checkpoint()`` instead on a cluster that must survive executor
    # loss mid-algorithm.)
    ref = (
        edges.select(F.col("a").alias("id")).distinct().withColumn("rep", F.col("id"))
    ).localCheckpoint(eager=True)
    rounds = checks = 0
    try:
        while rounds < max_iters:
            cur = ref
            for _ in range(min(check_every, max_iters - rounds)):
                prop = edges.join(
                    cur.withColumnRenamed("id", "a"), "a"
                ).select(F.col("b").alias("id"), "rep")
                cur = (
                    cur.unionByName(prop).groupBy("id").agg(F.min("rep").alias("rep"))
                )
                rounds += 1
            cur = cur.localCheckpoint(eager=True)
            changed = (
                cur.alias("n")
                .join(ref.withColumnRenamed("rep", "_old"), "id")
                .where(F.col("rep") != F.col("_old"))
                .limit(1)
                .count()
            )
            checks += 1
            ref = cur
            if changed == 0:
                return ref
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iters} rounds"
        )
    finally:
        edges.unpersist(blocking=False)
        if status is not None:
            status.update(rounds=rounds, checks=checks)


def _star_components(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iters: int,
    status: dict | None,
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    SoCC 2014, Algorithm 2 "two-phase").  Each round is two
    join+groupBy passes over the edge set; the fixed point is a forest
    of stars whose center is each component's minimum id, reached in
    O(log² n) rounds regardless of component diameter.

    large-star(u): every neighbor v > u re-attaches to
    m = min(Γ(u) ∪ {u}).  small-star (on edges directed high→low):
    every low neighbor — and u itself — re-attaches to m = min(Γ⁻(u)).
    Both emit only (child > parent) pairs, so the edge set stays in
    canonical high→low form between phases; connectivity is invariant
    (every emitted edge is within the component; every dropped edge is
    implied through m).
    """
    all_ids = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
        .persist()
    )
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).where(
        F.col("a") != F.col("b")
    )
    # canonical high→low
    cur = (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    # edge count carried across rounds: nxt's count becomes next round's
    # n_old, so convergence needs ONE count job per round, not two
    n_old = cur.count()
    try:
        while rounds < max_iters:
            sym = cur.unionByName(
                cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            # large-star: m(u) = min(Γ(u) ∪ {u}); re-attach v > u to m
            lmin = (
                sym.groupBy("a")
                .agg(F.min("b").alias("_mb"))
                .select("a", F.least("_mb", F.col("a")).alias("m"))
            )
            large = (
                sym.join(lmin, "a")
                .where(F.col("b") > F.col("a"))
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .distinct()
            )  # a > b invariant: b = m ≤ u < a
            # small-star on high→low edges: m(u) = min of u's low
            # neighborhood; re-attach the others AND u itself to m
            smin = large.groupBy("a").agg(F.min("b").alias("m"))
            # localCheckpoint CUTS LINEAGE, not just caches: ``cur`` is
            # referenced ~8× per round (sym twice, lmin/smin once each
            # through their joins), so without truncation the LOGICAL
            # plan grows 8×/round — Catalyst re-analysis goes
            # exponential long before the data does.  Iterative
            # DataFrame algorithms must checkpoint each round (use
            # reliable ``checkpoint()`` on a cluster that needs
            # fault-tolerance across executor loss).
            nxt = (
                large.join(smin, "a")
                .where(F.col("b") != F.col("m"))
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .unionByName(smin.select("a", F.col("m").alias("b")))
                .distinct()
                .localCheckpoint(eager=True)
            )
            rounds += 1
            # fixed point: edge set unchanged (both sets are distinct
            # high→low pairs, so ⊆ + equal count ⇒ equal)
            n_new = nxt.count()
            grew = (
                nxt.join(cur, ["a", "b"], "left_anti").limit(1).count() > 0
            )
            # superseded checkpointed rounds are freed by the
            # ContextCleaner once unreferenced (a localCheckpointed RDD
            # cannot be unpersisted safely: its lineage is cut, so a
            # later reader could not recompute it)
            cur = nxt
            converged = not grew and n_new == n_old
            n_old = n_new
            if converged:
                stars = cur.select(
                    F.col("a").alias("id"), F.col("b").alias("rep")
                ).groupBy("id").agg(F.min("rep").alias("rep"))
                return (
                    all_ids.join(stars, "id", "left")
                    .select("id", F.coalesce("rep", "id").alias("rep"))
                )
        raise RuntimeError(
            f"duplicate_components(method='star') did not converge "
            f"in {max_iters} rounds"
        )
    finally:
        all_ids.unpersist(blocking=False)
        if status is not None:
            status.update(rounds=rounds, checks=rounds, method="star")
