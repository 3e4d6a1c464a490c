"""Property-based invariants for the r16 wave-13 operators: exact
rank-selection quantiles must agree with numpy's inverted-CDF method on
ANY multiset (ties, skew, singleton groups), and skip-gram counts must
equal a brute-force Python twin on ANY token sequence."""

import collections

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

_S = dict(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

# heavy-tie regime on purpose: a tiny value domain makes every quantile
# land on or next to a tie run, the failure mode interpolation-based
# implementations get wrong
lengths = st.lists(st.integers(0, 9), min_size=1, max_size=20)


@settings(**_S)
@given(data=st.dictionaries(
    st.sampled_from(["en", "de", "fr"]), lengths, min_size=1, max_size=3
))
def test_doc_length_quantiles_matches_numpy_inverted_cdf(spark, data):
    """idx = ceil(p*n) rank selection == numpy percentile with
    method='inverted_cdf' (the exact, non-interpolating definition) for
    every group and every percentile in the spine."""
    from compute_histogram_spark.operators.text import doc_length_quantiles

    rows = [Row(lang=g, n_chars=v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "lang string, n_chars int")
    got = {(r.lang, r.pct): (r.n_docs, r.q_len)
           for r in doc_length_quantiles(df).collect()}
    for g, vs in data.items():
        arr = np.sort(np.array(vs))
        for pct in (25, 50, 75, 90):
            want = int(np.percentile(arr, pct, method="inverted_cdf"))
            assert got[(g, pct)] == (len(vs), want), (g, pct, vs)
    # exactly |groups| x |spine| output rows — never data-scaled
    assert len(got) == 4 * len(data)


@settings(**_S)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8),
    min_size=1, max_size=5,
), window=st.integers(1, 3))
def test_skipgram_pairs_matches_brute_force(spark, docs, window):
    """Pair counts == brute-force (i, i+d) enumeration for d in
    1..window on any corpus, incl. empty and single-token docs."""
    from compute_histogram_spark.operators.text import skipgram_pairs

    brute = collections.Counter()
    for toks in docs:
        for d in range(1, window + 1):
            for i in range(len(toks) - d):
                brute[(toks[i], toks[i + d])] += 1
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): r.n_pairs
           for r in skipgram_pairs(
               df, window=window, min_count=1, k=1000).collect()}
    # NOTE: "" splits to [''] (one empty token) under the single-space
    # convention, so an empty doc yields no pairs only because size 1 < 2
    brute = {k: v for k, v in brute.items() if v >= 1}
    assert got == dict(brute)


# session merging must be associative over ANY batch split — the claim
# that makes drained_sessionize's complete-mode convergence equal the
# batch gap-CTE. Tight time domain (0..5 gaps, micros jitter) makes
# merges, exact-gap edges, and sub-second floors all likely.
_GAP_US = 1_800_000_000
sess_event = st.tuples(
    st.integers(1, 2),                      # user_id
    st.integers(0, 5 * _GAP_US + 1),        # tsu (micros)
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(sess_event, min_size=1, max_size=10),
       batch_of=st.lists(st.integers(0, 2), min_size=10, max_size=10))
def test_streaming_sessionize_invariant_under_any_batch_split(
    spark, tmp_path_factory, events, batch_of
):
    """Drained session_window output == the batch twin's gap rule for a
    RANDOM assignment of events to (up to) three micro-batches — the
    associativity property the deterministic drain harness relies on."""
    import os
    import shutil

    from pyspark.sql import functions as F

    base = str(tmp_path_factory.mktemp("sess_prop"))
    batches = {}
    for idx, (u, t) in enumerate(events):
        batches.setdefault(batch_of[idx], []).append((u, t))
    for i, (b, rows) in enumerate(sorted(batches.items())):
        df = spark.createDataFrame(
            rows, "user_id bigint, tsu bigint"
        ).select(
            "user_id", F.timestamp_micros(F.col("tsu")).alias("event_time")
        )
        stage = os.path.join(base, f"_st{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(os.path.join(stage, part),
                    os.path.join(base, f"b{i}.parquet"))
        shutil.rmtree(stage)
        os.utime(os.path.join(base, f"b{i}.parquet"),
                 (1_000_000_000 + i,) * 2)

    stream = (
        spark.readStream.schema("user_id bigint, event_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    final = {}

    def sink(df, _epoch):
        final["rows"] = sorted(tuple(r) for r in df.collect())

    q = (
        stream.withWatermark("event_time", "3650 days")
        .groupBy(F.session_window("event_time", "30 minutes").alias("sw"),
                 "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("sw.start").cast("long").alias("s"),
                F.col("sw.end").cast("long").alias("e"), "n")
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # python twin of the batch gap rule (strictly-greater gap splits)
    expect = []
    per_user = collections.defaultdict(list)
    for u, t in events:
        per_user[u].append(t)
    for u, ts in per_user.items():
        ts.sort()
        start = prev = ts[0]
        n = 0
        for t in ts:
            if t - prev > _GAP_US:
                expect.append((u, start // 10**6,
                               prev // 10**6 + 1800, n))
                start, n = t, 0
            n += 1
            prev = t
        expect.append((u, start // 10**6, prev // 10**6 + 1800, n))
    assert final["rows"] == sorted(expect)
