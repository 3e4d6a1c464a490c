"""Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame.

The sketch IS a DataFrame of ``(r, b, cnt)`` rows — one row per non-empty
cell of the depth x width counter table. That representation makes every
CMS property a relational operation:

- **build** = explode tokens -> d bucket rows each -> groupBy(r, b).count().
  One shuffle whose map-side partial aggregation caps any partition's
  output at ``depth * width`` rows regardless of input size — the whole
  point of a sketch: at 100 TB the shuffle moves at most
  ``partitions * depth * width`` pre-aggregated cells, not tokens.
- **merge** = union + re-aggregate (CMS linearity) — executor-side, no
  driver round-trip, and exactly how per-day / per-shard sketches combine
  in an incremental corpus pipeline.
- **point query** = compute the candidate's d buckets, equi-join the
  sketch, take ``min(cnt)`` — the classic CMS estimate, never below the
  true count, above it only on all-d-rows collisions.

Hashing is JVM-side ``xxhash64(seed_lit, token)``; Python never touches a
token. Width/depth defaults give eps ~ 2e/width ~ 3e-4 overestimate of
the stream length at ~1e-2 failure odds — tune per corpus size.

No reference twin: the reference engine has no sketches; this extends the
histogram family (SURVEY §2.4) with the canonical frequency sketch a
training-data pipeline uses for vocabulary / heavy-hitter passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from compute_histogram_spark.functions.texthash import tokens
from compute_histogram_spark.sources.tables import ensure_parallelism

DEPTH = 4
WIDTH = 1 << 14


def _bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row``'s bucket for a value: seeded xxhash64, folded to [0, width)."""
    return F.pmod(F.xxhash64(F.lit(row), col), F.lit(width)).cast("int")


def cms_build(
    values: DataFrame,
    value_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Sketch a value stream into ``(r, b, cnt)`` cells.

    ``values`` is one row per occurrence (pre-exploded); weights are not
    supported — this is the counting form.
    """
    cells = values.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.col(value_col), r, width).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy(F.col("cell.r").alias("r"), F.col("cell.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_build_tokens(
    docs: DataFrame, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Sketch the corpus token stream of ``documents.text``."""
    docs = ensure_parallelism(docs)
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    return cms_build(toks, "token", depth, width)


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """CMS linearity: the sketch of a union stream is the cell-wise sum."""
    return (
        a.unionByName(b)
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-query estimates for a candidate set: min over the d cells.

    The sketch side is at most ``depth * width`` rows — Spark's planner
    broadcasts it, so estimation is a map-side join against candidates of
    any cardinality. A bucket with no cell row means count 0 (coalesce).
    """
    probes = candidates.select(
        value_col,
        *[
            _bucket(F.col(value_col), r, width).alias(f"b{r}")
            for r in range(depth)
        ],
    )
    out = probes
    for r in range(depth):
        cells_r = (
            sketch.where(F.col("r") == r)
            .select(F.col("b").alias(f"b{r}"), F.col("cnt").alias(f"cnt{r}"))
        )
        out = out.join(F.broadcast(cells_r), on=f"b{r}", how="left")
    est = F.least(*[F.coalesce(F.col(f"cnt{r}"), F.lit(0)) for r in range(depth)])
    return out.select(value_col, est.cast("bigint").alias("est"))


def cms_heavy_hitters(
    docs: DataFrame,
    min_count: int = 50,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Tokens whose estimated frequency is >= ``min_count``.

    Candidates here are the distinct tokens (exact two-pass form). In a
    100 TB deployment the candidate set comes from a per-partition local
    top-k (``mapInPandas`` or a sampled scan) so the distinct-shuffle of
    the full vocabulary is avoided; the estimate join is unchanged. CMS
    guarantees no false negatives at this threshold (estimates never
    undercount), only possible false positives from collisions.
    """
    docs = ensure_parallelism(docs)
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    sketch = cms_build(toks, "token", depth, width)
    cands = toks.distinct()
    return (
        cms_estimate(sketch, cands, "token", depth, width)
        .where(F.col("est") >= min_count)
        .orderBy(F.desc("est"), F.asc("token"))
    )


# ---------------------------------------------------------------------------
# Bottom-k (KMV) sketch: mergeable distinct-count + uniform distinct-sample
# ---------------------------------------------------------------------------

def kmv_build(
    values: DataFrame, value_col: str, k: int = 256
) -> DataFrame:
    """Bottom-k / K-Minimum-Values sketch (Bar-Yossef et al. 2002) of a
    column: the k smallest ``xxhash64`` values over the column's DISTINCT
    values, as a k-row DataFrame ``(h, v)``.

    The complement to the CMS: CMS answers "how often", KMV answers "how
    many distinct" — with a bonus: because the hash is uniform, the kept
    values are a UNIFORM SAMPLE of the distinct domain (hash-order
    sampling), unlike anything rand()-based: deterministic, mergeable,
    layout-independent.

    Plan shape: map-side hash + map-side partial dedup (dropDuplicates
    plans a partial aggregate before its exchange, so the shuffle carries
    each partition's DISTINCT (h, v) pairs, never raw occurrences) ->
    global dedup -> rank filter. The ``row_number <= k`` on the
    unpartitioned window compiles to a partial-limit operator
    (TakeOrderedAndProject via LimitPushDownThroughWindow): every
    post-dedup partition forwards at most k rows, so the final
    single-partition step sees ``partitions * k`` candidates, never the
    distinct domain. Total
    cost at 100 TB: one distinct-domain-sized shuffle (the unavoidable
    dedup) + a k-sized tail — if even that shuffle is too hot, pre-filter
    ``h < t`` with a threshold from a previous run's k-th minimum and the
    dedup input shrinks to ~k rows per partition.
    """
    from pyspark.sql import Window

    h = values.select(
        F.xxhash64(F.col(value_col)).alias("h"),
        F.col(value_col).alias("v"),
    ).dropDuplicates(["h", "v"])
    w = Window.orderBy("h")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Union two sketches and keep the global bottom-k — associative and
    commutative, so per-shard sketches fold in any order (same contract as
    ``cms_merge`` / the histogram state merge)."""
    from pyspark.sql import Window

    u = a.unionByName(b).dropDuplicates(["h"])
    w = Window.orderBy("h")
    return (
        u.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 256) -> float:
    """(k-1) / normalized k-th minimum — the classic KMV estimator.

    xxhash64 is uniform over [-2^63, 2^63); normalize to (0, 1] before
    inverting. If the sketch holds fewer than k rows the count is EXACT
    (every distinct value is present). Driver receives k scalars.
    """
    rows = sketch.select("h").orderBy("h").collect()
    if len(rows) < k:
        return float(len(rows))
    kth = (rows[k - 1]["h"] + 2.0**63 + 1.0) / 2.0**64
    return (k - 1) / kth


def hll_build(
    values: DataFrame, value_col: str, p: int = 12
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): ``2^p`` rows of
    ``(reg, max_rank)`` — the third classic sketch beside the CMS ("how
    often") and KMV ("how many distinct, plus a sample"): HLL answers "how
    many distinct" in O(2^p) space with no stored values at all, and
    merges by per-register max, so per-partition/per-day sketches roll up
    losslessly (the same partial/final discipline as the histogram merge).

    Register = low ``p`` bits of ``xxhash64``; rank = leading-zero count
    of the remaining ``64 - p`` bits + 1, via ``log2`` integer arithmetic
    on the shifted hash (pure JVM expressions — no UDF). The aggregation
    is a plain partial->final ``max`` groupBy: the shuffle carries at most
    ``partitions x 2^p`` rows. Empty registers are absent (rank 0 implied);
    :func:`hll_estimate` densifies driver-side over 2^p scalars.
    """
    m = 1 << p
    h = F.xxhash64(F.col(value_col))
    # hash is signed; mask to the register, then shift away the p low bits
    reg = F.pmod(h, F.lit(m)).cast("int")
    rest = F.expr(f"CAST((CAST(xxhash64({value_col}) AS DECIMAL(28,0)) "
                  f"+ 9223372036854775808) / {m} AS BIGINT)")
    # rank = (64 - p) - floor(log2(rest)) for rest > 0, else 64 - p + 1.
    # floor(log2(n)) == bit_length(n) - 1, computed exactly via the base-2
    # string length (conv) — float log2 rounds up for n just below 2^k
    # (e.g. 2^52 - 1), which would inflate the rank by 1.
    rank = F.when(
        rest > 0,
        F.lit(64 - p + 1) - F.length(F.conv(rest, 10, 2)).cast("int"),
    ).otherwise(F.lit(64 - p + 1))
    return (
        values.select(reg.alias("reg"), rank.cast("int").alias("rank"))
        .groupBy("reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register tables, keep the per-register max — associative,
    commutative, idempotent (the CRDT property that makes HLL the
    rollup-friendly distinct counter)."""
    return (
        a.unionByName(b)
        .groupBy("reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )


def hll_estimate(sketch: DataFrame, p: int = 12) -> float:
    """Driver-side estimate from the (<= 2^p)-row register table: raw HLL
    harmonic mean with the standard small-range (linear counting) and
    alpha corrections. O(2^p) scalars to the driver — like the CMS point
    query, the collect is sketch-sized, never data-sized."""
    import math

    m = 1 << p
    regs = {r["reg"]: r["max_rank"] for r in sketch.collect()}
    zeros = m - len(regs)
    s = zeros * 1.0 + sum(2.0 ** -v for v in regs.values())
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / s
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)  # linear counting regime
    return raw


def kmv_distinct_portable(
    df: DataFrame, value_col: str, k: int = 64, round_to: int = 6
) -> DataFrame:
    """One-row KMV distinct estimate with PORTABLE hashing -> the
    cross-engine-checkable face of the KMV family.

    The production sketch (:func:`kmv_build`) hashes with JVM xxhash64,
    which no other engine reproduces; this variant uses the repo's
    portable-digest convention (functions/texthash.py) — ``md5('kmv:' ||
    value)``, k smallest in LEXICOGRAPHIC hex order (order-isomorphic to
    uniform integers), estimate ``(k-1)/u_k`` with ``u_k`` from the
    first 48 digest bits — so a SQL twin replicates the estimate to the
    digit and the sketch family gets a value-exact oracle instead of
    bounds-only pytest coverage. With fewer than k distinct values the
    estimate IS the exact count (standard KMV degenerate case; hit at
    the small test SF, while the larger SF exercises the estimator path
    — both sides of the CASE see coverage).

    Plan shape: map-side digest -> partial dedup -> global dedup ->
    ``orderBy(h).limit(k)``, which Spark compiles to
    TakeOrderedAndProject — each partition forwards at most k digests,
    never the distinct domain. NULLs are dropped explicitly (engines
    disagree on NULL sort placement).
    """
    h = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.md5(
                F.concat(F.lit("kmv:"), F.col(value_col).cast("string"))
            ).alias("h")
        )
        .dropDuplicates(["h"])
    )
    topk = h.orderBy("h").limit(k)
    agg = topk.agg(F.max("h").alias("kth_hex"), F.count(F.lit(1)).alias("n"))
    u = (
        F.conv(F.substring("kth_hex", 1, 12), 16, 10).cast("bigint") + 1
    ) / F.lit(float(2**48))
    return agg.select(
        F.col("n").cast("int").alias("k_used"),
        "kth_hex",
        F.round(
            F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
                (k - 1) / u
            ),
            round_to,
        ).alias("distinct_est"),
    )


def hll_register_table_portable(
    values: DataFrame, value_col: str, p: int = 12
) -> DataFrame:
    """Portable-hash face of :func:`hll_build` — the HLL register table
    from the repo's md5 digest convention (``md5('hll:' || value)``,
    functions/texthash.py), so a SQL twin reproduces every register
    value exactly (staged rotation twin, VERDICT r10 #7).

    Register = first ``p/4`` hex digits (``p`` must be a multiple of 4
    so the register boundary falls on a hex digit); rank = number of
    leading zero bits in the NEXT 52 bits (13 hex digits) + 1, i.e.
    ``53 - bit_length(rest)`` with the all-zeros case pinned to 53.
    bit_length is the base-2 string length (``conv``) — exact integer
    arithmetic, no float log anywhere. Same partial->final max groupBy
    shape as the production xxhash64 build: the shuffle carries at most
    ``partitions x 2^p`` rows; output is <= 2^p integer rows.
    """
    if p % 4:
        raise ValueError(f"p must be a multiple of 4, got {p}")
    h = F.md5(F.concat(F.lit("hll:"), F.col(value_col).cast("string")))
    reg = F.conv(F.substring(h, 1, p // 4), 16, 10).cast("int")
    rest = F.conv(
        F.substring(h, p // 4 + 1, 13), 16, 10
    ).cast("bigint")
    rank = F.when(
        rest > 0, F.lit(53) - F.length(F.conv(rest, 10, 2)).cast("int")
    ).otherwise(F.lit(53))
    return (
        values.where(F.col(value_col).isNotNull())
        .select(reg.alias("reg"), rank.alias("rank"))
        .groupBy("reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def _bucket_portable(col: Column, row: int, width: int) -> Column:
    """Portable twin of :func:`_bucket`: first 32 digest bits of
    ``md5('cms<row>:' || value)`` folded to [0, width) — replicable in
    any engine with md5 (the texthash convention)."""
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cms{row}:"), col)), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(v, F.lit(width)).cast("int")


def cms_point_estimates_portable(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    top_n: int = 10,
) -> DataFrame:
    """CMS point queries with PORTABLE hashing, next to the exact counts
    -> ``(tok, n_exact, cms_est)`` for the ``top_n`` most frequent
    tokens (exact top by (count desc, token asc) — a deterministic probe
    set both engines derive identically).

    Same role as :func:`kmv_distinct_portable`: the production sketch
    (:func:`cms_build`) hashes JVM-side xxhash64; this md5 variant makes
    every cell count and every min-over-rows estimate engine-neutral
    arithmetic, so the CMS family gets a value-exact oracle on top of
    its pytest error bounds. The CMS overestimate-only invariant
    (``cms_est >= n_exact``) is also visible to the oracle as data.

    Plan shape: one token scan feeds BOTH the d-row cell explode
    (groupBy (r, b): d*width cells max, the mergeable sketch state) and
    the exact top-n (token groupBy + TakeOrderedAndProject); the probe
    join is a broadcast of top_n rows against the cell table.
    """
    from compute_histogram_spark.functions.texthash import tokens

    toks = ensure_parallelism(
        docs.select(F.explode(tokens(text_col)).alias("tok"))
    )
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket_portable(F.col("tok"), r, width).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    cms = cells.groupBy(
        F.col("cell.r").alias("r"), F.col("cell.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("tok"))
        .limit(top_n)
    )
    probes = top.select(
        "tok",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket_portable(F.col("tok"), r, width).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select("tok", "n_exact", F.col("p.r").alias("r"), F.col("p.b").alias("b"))
    return (
        F.broadcast(probes)
        .join(cms, ["r", "b"])
        .groupBy("tok", "n_exact")
        .agg(F.min("cnt").alias("cms_est"))
        .orderBy("tok")
    )


def bloom_word_table_portable(
    values: DataFrame, value_col: str, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """Bloom filter as a DataFrame — the fourth classic mergeable sketch
    (CMS: how often, KMV: how many, HLL: how many cheap, Bloom: HAVE I
    SEEN IT), in the repo's portable md5 convention so a SQL twin
    reproduces every word exactly (registry.TOKEN_BLOOM_ORACLE).

    The filter is ``m_bits/64`` int64 words: for each value, k bit
    positions ``('0x'||md5('bf<i>:'||v)[:8]) % m_bits``; word index =
    pos div 64, bit = pos mod 64; per-word state is ``bit_or`` of the
    shifted bits — commutative/idempotent, so the table is a CRDT like
    the HLL registers: shards build independently and merge by
    :func:`bloom_merge`. Shuffle carries at most partitions x m/64
    rows; output <= m/64 integer rows (bounded model state).
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    # r16 optimization round: the k per-hash row sets were a k-way
    # unionAll, each branch referencing ``values`` — and when the caller
    # passes a derived frame (token_bloom's explode+distinct vocabulary)
    # every branch re-ran that subtree (before-plan: 4 corpus scans +
    # 4 distinct shuffles for k=4). All k positions are row-local
    # expressions, so one explode(array(pos_0..pos_{k-1})) emits the
    # identical multiset from a SINGLE pass (guide §1.2: fewer passes
    # beats per-task tuning; no cache needed).
    pos_exprs = []
    for i in range(k):
        h = F.md5(F.concat(F.lit(f"bf{i}:"), F.col(value_col).cast("string")))
        pos_exprs.append(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % m_bits
        )
    rows = (
        values.where(F.col(value_col).isNotNull())
        .select(F.explode(F.array(*pos_exprs)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # shiftleft's bit count must be a column here (pos % 64),
            # which the Python API only takes as an int literal
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
    )
    return (
        rows.groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two word tables (distributive CRDT rollup)."""
    return (
        a.unionAll(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_contains(
    probes: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Membership test for each probe value: ALL k bits set -> maybe
    present (false positives at the standard Bloom rate, NEVER false
    negatives — pinned in tests). The word table is bounded (m/64
    rows), so each of the k lookups is a broadcast join; the plan is
    map + k broadcast probes, no data-scaled shuffle.

    -> (value, member BOOLEAN)"""
    out = probes.select(F.col(value_col).alias("value")).distinct()
    for i in range(k):
        h = F.md5(F.concat(F.lit(f"bf{i}:"), F.col("value").cast("string")))
        pos = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % m_bits
        w = bloom.withColumnsRenamed(
            {"word_idx": f"wi{i}", "word": f"w{i}"}
        )
        out = out.withColumn(f"p{i}", pos).join(
            F.broadcast(w),
            (F.col(f"p{i}") / 64).cast("int") == F.col(f"wi{i}"),
            "left",
        ).withColumn(
            f"hit{i}",
            F.coalesce(
                F.expr(
                    f"shiftright(w{i}, CAST(p{i} % 64 AS INT)) & 1"
                ) == 1,
                F.lit(False),
            ),
        ).drop(f"wi{i}", f"w{i}", f"p{i}")
    member = None
    for i in range(k):
        member = F.col(f"hit{i}") if member is None else member & F.col(f"hit{i}")
    return out.select("value", member.alias("member"))


def corpus_overlap_kmv(
    docs_a: DataFrame,
    docs_b: DataFrame,
    k: int = 64,
    gram: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Cross-corpus overlap estimated from two mergeable KMV sketches —
    dedup/contamination PLANNING at 100 TB without ever joining the
    corpora: each side is sketched independently (k digests, shippable
    bytes), and Jaccard/intersection are estimated from sketch algebra
    alone (Beyer et al. 2007).

    rho = |K(A u B) ∩ K(A) ∩ K(B)| / |K(A u B)| estimates J(A, B);
    intersection ~= rho x D(A u B) with the union cardinality from the
    standard (k-1)/u_k estimator. Portable md5 digest convention
    (functions/texthash.py) and lexicographic k-minima, so a SQL twin
    reproduces every number to the digit; when the union has fewer than
    k distinct shingles the sketches ARE the sets and the Jaccard is
    exact (degenerate branch, same CASE as
    :func:`kmv_distinct_portable`).

    Plan: two TakeOrderedAndProject sketch builds (each partition
    forwards <= k digests), then all algebra on <= 2k broadcast rows.
    -> one row (k_used, n_common, jaccard_est, union_distinct_est,
    intersection_est).

    r16 optimization round: the three sketch frames are persisted —
    each is referenced up to three times downstream (``u`` by the
    common-filter semi-joins and the kth-value scalar; ``ska``/``skb``
    by the union and both semi-joins), and without a cache every
    reference re-ran the full shingle+hash+dedup corpus scan
    (before-plan: 6 documents scans for a <=64-row result). The cached
    frames are bounded by k rows — guide §5's cache-when-reused case at
    its most extreme — and the corpus is now scanned exactly twice
    (once per side), the structural floor for two disjoint inputs.
    """
    from pyspark import StorageLevel

    from compute_histogram_spark.operators.dedup import shingle_table

    def sketch(docs: DataFrame) -> DataFrame:
        sh = shingle_table(docs, n=gram, distinct=False)
        h = sh.select(
            F.md5(F.concat(F.lit("kmv:"), F.col("s"))).alias("h")
        ).dropDuplicates(["h"])
        return h.orderBy("h").limit(k).persist(StorageLevel.MEMORY_AND_DISK)

    ska, skb = sketch(docs_a), sketch(docs_b)
    u = (
        ska.union(skb).dropDuplicates(["h"]).orderBy("h").limit(k)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    common = (
        u.join(F.broadcast(ska), "h", "left_semi")
        .join(F.broadcast(skb), "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ua = u.agg(F.max("h").alias("kth_hex"), F.count(F.lit(1)).alias("n"))
    row = ua.crossJoin(common)  # two 1-row scalars
    u_k = (
        F.conv(F.substring("kth_hex", 1, 12), 16, 10).cast("bigint") + 1
    ) / F.lit(float(2**48))
    d_union = F.round(
        F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
            (k - 1) / u_k
        ),
        round_to,
    )
    # empty/too-short corpora: n = 0 would make the ratio NULL (0/0) —
    # the overlap of empty sketch sets is DEFINED as zero, not an
    # accident of NULL-division alignment between engines (ADVICE r13)
    jac = F.when(
        F.col("n") > 0, F.round(F.col("n_common") / F.col("n"), round_to)
    ).otherwise(F.lit(0.0))
    from compute_histogram_spark.session import defer_release

    # tag the k-bounded sketch caches for deterministic release by the
    # caller after its action (r17, VERDICT r16 #3)
    return defer_release(
        row.select(
            F.col("n").cast("int").alias("k_used"),
            F.col("n_common").cast("int").alias("n_common"),
            jac.alias("jaccard_est"),
            d_union.alias("union_distinct_est"),
            F.round(jac * d_union, round_to).alias("intersection_est"),
        ),
        ska,
        skb,
        u,
    )
