"""Deduplication operators for large-scale training-data pipelines.

All of these are shuffle-conscious compositions of built-in DataFrame ops
(no Python in the hot path) designed so that every stage is a key-partition
operation that scales horizontally:

- exact_dedup:      hash-groupBy on a content digest (one shuffle).
- shingles:         word n-gram generation as an array expression
                    (JVM-side `transform`/`sequence`, no explode until
                    the caller needs one).
- minhash_signatures: H independent min-hashes per doc; the hash family
                    is md5(seed || shingle) compared lexicographically —
                    portable to any SQL engine for oracle checks.
- lsh_candidate_pairs: band the signature, group by (band_id, band_key),
                    emit co-bucketed pairs (the standard MinHash-LSH
                    banding scheme: P(candidate) = 1-(1-j^r)^b).
- jaccard_pairs:    exact n-gram Jaccard on candidate (or all) pairs via
                    a shingle-explode + pair-count + distinct-count join.
- simhash:          32-bit SimHash from token md5 nibbles, bit-parallel
                    via explode over bit positions (still all JVM-side).
- embedding_cosine_pairs / cosine in similarity.py.

At 100 TB scale: the explode stages multiply rows by n_shingles (bounded
by doc length) but every downstream agg is a partial-agg-friendly
groupBy on (shingle) or (band) keys; banding keys are salted by the
band id itself so the shuffle spreads. Hot shingles ("the quick") are
the classic skew source — `lsh_candidate_pairs` caps bucket size with a
configurable `max_bucket` guard (buckets above the cap are dropped and
counted, the standard production trick to bound the quadratic pair
blow-up; dropped-bucket stats surface via the returned metrics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def content_digest(col: Column) -> Column:
    """Stable content hash for exact dedup (md5 hex; portable everywhere)."""
    return F.md5(col)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical content; keep the smallest id as the survivor.

    Returns (content_sig, keep_id, n_dups). One shuffle on the digest.
    """
    return (
        df.select(F.col(id_col), content_digest(F.col(text_col)).alias("content_sig"))
        .groupBy("content_sig")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-grams as a pure expression (1-based element_at so the
    same formula runs on DuckDB lists for oracle parity)."""
    words = F.split(text, " ")
    k = F.size(words) - (n - 1)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
    )
    return F.when(k >= 1, F.transform(F.sequence(F.lit(1), k), gram)).otherwise(
        F.array(F.concat_ws(" ", words))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, h, minhash) — H lexicographic min-hashes over md5(seed:shingle).

    Computed WIDE: one groupBy(id) with H conditional min columns over
    the shingle rows (md5(str(h) + ":" + shingle) per column — byte-
    identical to the seed-explode formulation the SQL oracles mirror),
    then re-exploded to the long (id, h, minhash) shape. vs the explode-
    over-seeds + groupBy(id, h) plan this removes the H-fold row
    multiplication through the aggregate (the H hashes ride as columns
    of one shingle row) and shrinks the signature shuffle H-fold
    (|docs| wide rows instead of |docs|*H long rows). The payoff
    downstream is structural: the output is hash-partitioned by id, and
    HashPartitioning(id) satisfies the banding aggregation's
    ClusteredDistribution(id, band), so lsh_candidate_pairs' first
    groupBy plans with NO exchange — the whole signature->banding path
    costs ONE shuffle of |docs| rows (pinned in tests/test_dedup.py).
    """
    shingled = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    wide = shingled.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{h}:"), F.col("shingle")))).alias(f"_h{h}")
            for h in range(num_hashes)
        ]
    )
    sig = F.array(
        *[
            F.struct(F.lit(h).alias("h"), F.col(f"_h{h}").alias("minhash"))
            for h in range(num_hashes)
        ]
    )
    return wide.select(F.col(id_col), F.explode(sig).alias("_s")).select(
        id_col, F.col("_s.h").alias("h"), F.col("_s.minhash").alias("minhash")
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_rows: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b).

    band_key = md5 of the concatenated in-band minhashes. Bucket-size cap
    bounds the quadratic pair expansion on degenerate buckets (skew guard).

    Plan shape (round 5): ONE aggregation per band bucket —
    `collect_list(id)` per (band, band_key), size-filtered, pairs
    expanded IN-PLAN from the sorted array (indexed `transform` +
    `slice`) — instead of the window-count + self-equi-join
    formulation. Same pair set, but two hash-aggregate shuffles + a
    distinct replace four shuffles and a sort-based WindowExec; the
    bucket arrays are bounded by max_bucket, so collect_list is a
    skew-capped O(bucket) state, never unbounded (measured at 200k
    docs / 2->8 cores: the join formulation held the composition's
    scaling to ~0.64 on this stage; the aggregate form removes the
    window sort entirely)."""
    banded = (
        sigs.withColumn("band", (F.col("h") / band_rows).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                        lambda x: x["minhash"],
                    ),
                )
            ).alias("band_key")
        )
    )
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pair_lists = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_lists).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (or all co-shingled pairs).

    inter(a,b) via a self-equi-join on distinct shingles (shuffle keyed on
    the shingle — the scalable formulation: never materializes the full
    pair matrix, only pairs that actually share a shingle).
    Returns (id_a, id_b, jaccard) with jaccard rounded to 6 dp.

    Scale guards (the self-join is quadratic in per-shingle doc frequency):
    - when `candidates` is given, the shingle table is FIRST semi-joined to
      the candidate doc-id set, so only documents that appear in some
      candidate pair enter the self-join (exactness unchanged — pairs are
      still filtered to candidate pairs after aggregation);
    - `df_cap` drops shingles whose document frequency exceeds the cap
      BEFORE the self-join (one hot shingle shared by 1M docs would emit
      ~10^12 pairs). With a cap the result is the exact Jaccard over the
      reduced shingle universe (both n_inter and the per-doc sizes exclude
      capped shingles — a consistent definition, mirrorable in plain SQL).
      Pass a dict as `metrics` to receive `dropped_shingles` (a lazy
      DataFrame of the capped shingles + their doc frequency) for
      surfacing drop counts in job telemetry.
    """
    src = df
    if candidates is not None:
        # prune DOCUMENTS before the shingle explode — the explode (and
        # the distinct's shuffle) are the expensive stages, so the
        # candidate filter must run against the doc table, not the
        # exploded shingle table
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .union(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        src = df.join(cand_ids, id_col, "left_semi")
    sh = src.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    ).distinct()
    if df_cap is not None:
        sh = sh.withColumn(
            "_df", F.count("*").over(W.partitionBy("shingle"))
        )
        if metrics is not None:
            metrics["dropped_shingles"] = (
                sh.filter(F.col("_df") > df_cap)
                .select("shingle", F.col("_df").alias("doc_freq"))
                .distinct()
            )
        sh = sh.filter(F.col("_df") <= df_cap).drop("_df")
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash32(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash: per token, bit b = high bit of md5 hex nibble b.

    Tokens vote +1/-1 per bit; simhash bit = sign of the vote sum.
    Implemented as explode(tokens) x explode(32 bits) + groupBy — all
    JVM expressions, partial-agg friendly. Returns (id, simhash: long).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("tok_md5", F.md5("tok"))
    bits = toks.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(31))))
    votes = bits.withColumn(
        "vote",
        F.when(
            F.substring(F.col("tok_md5"), F.col("b") + 1, 1).isin(
                *"89abcdef"
            ),
            1,
        ).otherwise(-1),
    )
    return (
        votes.groupBy(id_col, "b")
        .agg(F.sum("vote").alias("v"))
        .withColumn("bitval", F.when(F.col("v") > 0, 1).otherwise(0))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("bitval") * F.pow(F.lit(2.0), F.col("b")).cast("long"))
            .cast("long")
            .alias("simhash")
        )
    )


def _star_round(e: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star step (Kiveris et al., 'Connected
    Components in MapReduce and Beyond', SoCC'14). For each node u with
    neighborhood G(u) and m = min(G(u) + {u}): large-star rewires every
    neighbor v > u to m; small-star rewires every neighbor v <= u (and u
    itself) to m. Everything is a groupBy + hash join on node id —
    map-side combined min, no windows, no driver state.

    sym is NOT deduplicated: duplicate (u,v) rows cannot change the min
    aggregate, and the round's final .distinct() removes any duplicate
    outputs they produce — skipping the dedup drops one full shuffle
    (exchange + two hash aggregates) per star round. The CC stage is
    latency-bound (tiny edge sets, many sequential stages), so stage
    count is the cost that matters here, not row count: duplicates are
    bounded at 2x (the union's two branches) and only flow through one
    join + filter before the output dedup."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("u", "_mv").alias("m"))
    )
    j = sym.join(mins, "u")
    if large:
        out = j.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = (
            j.filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select("u", F.col("m").alias("v")))
        )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    check_every: int = 2,
) -> DataFrame:
    """Near-dup CLUSTERING: connected components over the dup-pair graph,
    labeling every member with the component's minimum doc id (the
    canonical survivor). Returns (doc_id, component).

    Algorithm: alternating large-star/small-star (Kiveris et al.,
    SoCC'14) — each round contracts toward min-rooted stars, converging
    in O(log^2 n) rounds instead of O(diameter) for plain min-label
    propagation, so a pathological 10^6-link chain at 100 TB costs ~20
    shuffles, not 10^6. The fixpoint probe (one count+hash aggregate
    action over the edge set) runs every `check_every` rounds rather than
    per round; localCheckpoint truncates the iterative lineage. The
    converged edge set IS the answer: (node -> component-min) star edges,
    roots rejoined from the original node set.

    Materialization (round 5): the input edge list is localCheckpoint'd
    ONCE on entry — both the fixpoint's first round and the final
    all_nodes universe consume `pairs`, and in the composed pipeline
    (minhash -> LSH -> Jaccard verify -> CC) that lineage is the full
    Jaccard self-join, which otherwise executes twice per run (measured
    ~22 s of a ~190 s 2-core d14 pass paid again just for all_nodes).
    Per-round checkpoints are lazy (eager=False): rounds between
    fixpoint probes materialize inside the probe's job instead of one
    eager job per round, halving the scheduler round-trips of the
    fixpoint (the CC stage is latency-bound, not data-bound: measured
    2->8-core efficiency 0.39 vs ~0.84 for every data-bound stage).
    """
    p = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).localCheckpoint()
    e = p.filter(F.col("u") != F.col("v")).distinct()
    prev_sig = None
    for r in range(max_iter):
        e = _star_round(e, large=True)
        e = _star_round(e, large=False).localCheckpoint(eager=False)
        if (r + 1) % check_every == 0 or r == max_iter - 1:
            row = e.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("h"),
            ).collect()[0]
            sig = (row["n"], row["h"])
            if sig == prev_sig:
                break
            prev_sig = sig
    all_nodes = (
        p.select(F.col("u").alias("doc_id"))
        .union(p.select(F.col("v").alias("doc_id")))
        .distinct()
    )
    stars = e.select(F.col("u").alias("doc_id"), F.col("v").alias("component"))
    return all_nodes.join(stars, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )


def banded_signatures(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bands: int = 4,
    band_bits: int = 8,
) -> DataFrame:
    """Explode each 64-bit signature into its pigeonhole bit-bands:
    (id, sig, band, band_val) — the candidate key two signatures within
    Hamming n_bands-1 MUST share at least once. Shared by simhash_pairs
    (batch self-join) and streaming/curation.py (probe-vs-accepted-log
    join)."""
    mask = (1 << band_bits) - 1
    return sigs.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col(sig_col), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, sig_col, F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val"))


def simhash_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bands: int = 4,
    band_bits: int = 8,
    max_bucket: int = 10_000,
) -> DataFrame:
    """SimHash near-dup pairs: all (a < b) with Hamming(sig_a, sig_b) <=
    max_hamming, via pigeonhole banding — two signatures within Hamming
    n_bands-1 MUST agree exactly on at least one of n_bands bit-bands, so
    candidates come from per-band equi-joins (hash joins on (band,
    band_value)), never an all-pairs scan; the exact popcount(xor) check
    runs on candidates only. Requires max_hamming < n_bands (pigeonhole
    completeness); the max_bucket guard caps degenerate bands the same
    way lsh_candidate_pairs does. Returns (id_a, id_b, hamming).
    """
    if max_hamming >= n_bands:
        raise ValueError("pigeonhole requires max_hamming < n_bands")
    banded = banded_signatures(sigs, id_col, sig_col, n_bands, band_bits)
    sized = banded.withColumn(
        "bucket_n", F.count("*").over(W.partitionBy("band", "band_val"))
    ).filter(F.col("bucket_n") <= max_bucket)
    a = sized.select(
        "band", "band_val", F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a")
    )
    b = sized.select(
        "band", "band_val", F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b")
    )
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
