"""WARC source: record framing, HTTP split, HTML text, Spark scan."""

import gzip

import pytest

from compute_histogram_spark.sources.warc import (
    WarcDocsDataSource,
    build_http_response,
    build_warc,
    build_warc_record,
    html_to_text,
    iter_warc_records,
    read_warc,
    split_http_response,
)

HTML = (
    b"<html><head><title>T</title><style>p{color:red}</style>"
    b"<script>var x=1;</script></head>"
    b"<body><h1>Head&amp;line</h1><p>one  two</p><p>three</p></body></html>"
)


def _resp_record(body=HTML, uri="http://example.com/a", **http_kw):
    return build_warc_record(
        warc_type="response",
        uri=uri,
        content=build_http_response(body, **http_kw),
    )


# ------------------------------------------------------------ record layer


def test_roundtrip_plain_and_gzip_layouts():
    recs = [
        build_warc_record(warc_type="warcinfo", uri=None, content=b"k: v"),
        _resp_record(),
        _resp_record(uri="http://example.com/b"),
    ]
    for raw in (
        build_warc(recs),
        build_warc(recs, gzip_per_record=True),
        gzip.compress(build_warc(recs)),  # single-member whole file
    ):
        got = list(read_warc(raw))
        assert [h["warc-type"] for _, h, _ in got] == [
            "warcinfo", "response", "response",
        ]
        # offsets are into the DECOMPRESSED stream: strictly increasing
        assert [o for o, _, _ in got] == sorted({o for o, _, _ in got})


def test_header_folding_and_case_insensitivity():
    rec = build_warc_record(
        content=b"xy", extra_headers={"X-Long": "part1\r\n  part2"}
    )
    [(_, h, c)] = list(iter_warc_records(rec))
    assert h["x-long"] == "part1 part2"
    assert "content-length" in h  # lower-cased names
    assert c == b"xy"


def test_final_record_tolerates_missing_terminator():
    rec = build_warc_record(content=b"abc")
    assert list(iter_warc_records(rec[:-4]))[0][2] == b"abc"


@pytest.mark.parametrize(
    "mutate",
    [
        lambda raw: b"WARC/9.9" + raw[8:],             # bad version
        lambda raw: raw[:-7],                          # truncated content
        lambda raw: raw.replace(b"Content-Length", b"X-L", 1),  # missing CL
        lambda raw: raw + b"garbage-after-terminator",  # trailing junk
    ],
)
def test_malformed_archives_raise(mutate):
    raw = mutate(build_warc([_resp_record(), _resp_record()]))
    with pytest.raises(ValueError, match="malformed WARC"):
        list(iter_warc_records(raw))


# -------------------------------------------------------------- HTTP layer


def test_http_split_content_length_trims():
    payload = build_http_response(b"hello") + b"over-read-tail"
    status, headers, body = split_http_response(payload)
    assert (status, body) == (200, b"hello")
    assert headers["content-type"].startswith("text/html")


def test_http_split_chunked():
    payload = build_http_response(b"hello world", chunked=True)
    status, headers, body = split_http_response(payload)
    assert (status, body) == (200, b"hello world")


def test_http_split_rejects_junk():
    with pytest.raises(ValueError, match="malformed HTTP"):
        split_http_response(b"not an http message at all")
    with pytest.raises(ValueError, match="chunk"):
        split_http_response(
            b"HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\n"
        )


# -------------------------------------------------------------- HTML layer


def test_html_to_text_strips_and_collapses():
    text = html_to_text(HTML.decode())
    assert "var x=1" not in text and "color:red" not in text
    assert "Head&line" in text          # entity decoded
    assert "one two" in text            # intra-line whitespace collapsed
    lines = text.split("\n")
    assert "one two" in lines and "three" in lines  # block boundaries


def test_html_to_text_charset_header():
    from compute_histogram_spark.sources.warc import _decode_charset

    body = "héllo".encode("latin-1")
    assert "héllo" in _decode_charset(body, "text/html; charset=latin-1")
    # unknown label falls back instead of raising
    assert _decode_charset(b"abc", "text/html; charset=bogus-enc") == "abc"


# ------------------------------------------------------------ Spark source


@pytest.fixture()
def warc_dir(tmp_path):
    a = build_warc(
        [
            build_warc_record(warc_type="warcinfo", uri=None, content=b"k: v"),
            _resp_record(uri="http://example.com/a"),
            _resp_record(
                b"plain body", uri="http://example.com/t",
                content_type="text/plain",
            ),
        ]
    )
    b = build_warc(
        [_resp_record(uri="http://example.com/gz", chunked=True)],
        gzip_per_record=True,
    )
    (tmp_path / "seg-00000.warc").write_bytes(a)
    (tmp_path / "seg-00001.warc.gz").write_bytes(b)
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    return str(tmp_path)


def test_source_reads_responses_with_text(spark, warc_dir):
    spark.dataSource.register(WarcDocsDataSource)
    df = spark.read.format("warcdocs").option("path", warc_dir).load()
    rows = {r["target_uri"]: r for r in df.collect()}
    # warcinfo filtered out by the default types=response
    assert set(rows) == {
        "http://example.com/a", "http://example.com/t", "http://example.com/gz",
    }
    a = rows["http://example.com/a"]
    assert a["http_status"] == 200 and a["parsed"]
    assert "Head&line" in a["text"] and "var x=1" not in a["text"]
    assert rows["http://example.com/t"]["text"] == "plain body"
    assert rows["http://example.com/gz"]["content_length"] == len(HTML)
    # one partition per archive file
    assert df.rdd.getNumPartitions() == 2


def test_source_type_filter_and_no_extract(spark, warc_dir):
    spark.dataSource.register(WarcDocsDataSource)
    df = (
        spark.read.format("warcdocs")
        .option("path", warc_dir)
        .option("types", "warcinfo")
        .option("extract", "false")
        .load()
    )
    rows = df.collect()
    assert [r["warc_type"] for r in rows] == ["warcinfo"]
    assert rows[0]["payload"] == b"k: v" and rows[0]["text"] is None


def test_source_marks_unparseable_file(spark, tmp_path):
    (tmp_path / "bad.warc").write_bytes(b"WARC/9.9\r\njunk")
    spark.dataSource.register(WarcDocsDataSource)
    df = spark.read.format("warcdocs").option("path", str(tmp_path)).load()
    [row] = df.collect()
    assert row["parsed"] is False and row["target_uri"] is None


def test_source_feeds_text_pipeline(spark, warc_dir):
    """The point of the source: crawl text drops straight into the
    existing operators (here: the fused text profile)."""
    from pyspark.sql import functions as F

    from compute_histogram_spark.operators.text import text_profile

    spark.dataSource.register(WarcDocsDataSource)
    docs = (
        spark.read.format("warcdocs").option("path", warc_dir).load()
        .where(F.col("text").isNotNull())
        .select(
            F.abs(F.xxhash64("target_uri")).alias("doc_id"),
            F.col("text"),
        )
    )
    out = text_profile(docs)
    assert out.count() == 3
    assert {"doc_id", "n_tokens"} <= set(out.columns)


# ---------------------------------------------------------------- WET sink


def _corpus(spark, n=40):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(uri=f"http://ex.com/{i}", text=f"doc {i} body " * (i % 5 + 1))
         for i in range(n)]
    )


def test_wet_sink_roundtrips_through_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from compute_histogram_spark.sources.sinks import write_wet_shards

    out = str(tmp_path / "wet")
    write_wet_shards(_corpus(spark), out, n_shards=4)
    spark.dataSource.register(WarcDocsDataSource)
    back = (
        spark.read.format("warcdocs")
        .option("path", out)
        .option("types", "conversion")
        .load()
    )
    rows = back.collect()
    assert len(rows) == 40
    got = {r["target_uri"]: r["text"] for r in rows}
    assert got["http://ex.com/7"] == "doc 7 body " * 3  # trailing space kept
    assert all(r["warc_type"] == "conversion" for r in rows)
    # deterministic record ids derive from the uri digest, never RNG/clock
    assert all(r["record_id"].startswith("<urn:md5:") for r in rows)


def test_wet_sink_byte_deterministic(spark, tmp_path):
    import os

    from compute_histogram_spark.sources.sinks import write_wet_shards

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # different ingest order, same corpus
    write_wet_shards(_corpus(spark), a, n_shards=3)
    write_wet_shards(_corpus(spark).orderBy("text"), b, n_shards=3)
    fa = sorted(os.listdir(a))
    assert fa == sorted(os.listdir(b)) and fa
    for f in fa:
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        ), f"shard {f} not rerun-invariant"


# ------------------------------------------------------------- properties


def test_framing_survives_adversarial_bodies():
    """Content-Length framing must carry bodies containing CRLFs, version
    lines, header-lookalikes and terminator byte sequences verbatim."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    evil = st.binary(max_size=200) | st.sampled_from(
        [b"\r\n\r\n", b"WARC/1.0\r\n", b"Content-Length: 0\r\n\r\n\r\n\r\n"]
    )

    @given(st.lists(evil, min_size=1, max_size=5), st.booleans())
    @settings(max_examples=60, deadline=None)
    def check(bodies, per_record_gzip):
        recs = [
            build_warc_record(
                warc_type="resource", uri=f"http://e/{i}", content=b
            )
            for i, b in enumerate(bodies)
        ]
        got = list(read_warc(build_warc(recs, gzip_per_record=per_record_gzip)))
        assert [c for _, _, c in got] == bodies

    check()


def test_corrupt_warc_bytes_never_crash_weirdly():
    """Arbitrary junk raises ValueError (or parses, for junk that happens
    to be valid) — never IndexError/KeyError/UnboundLocal (the multimodal
    parser contract, tests/test_properties.py)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seed = build_warc([_resp_record()])

    @given(st.data())
    @settings(max_examples=120, deadline=None)
    def check(data):
        mode = data.draw(st.sampled_from(["junk", "mutate", "truncate"]))
        if mode == "junk":
            raw = data.draw(st.binary(max_size=120))
        elif mode == "truncate":
            raw = seed[: data.draw(st.integers(0, len(seed)))]
        else:
            pos = data.draw(st.integers(0, len(seed) - 1))
            byte = data.draw(st.integers(0, 255))
            raw = seed[:pos] + bytes([byte]) + seed[pos + 1 :]
        try:
            list(read_warc(raw))
        except ValueError:
            pass
        except Exception as e:  # gzip junk after magic bytes
            import gzip

            assert isinstance(e, (EOFError, gzip.BadGzipFile)), repr(e)

    check()


# ------------------------------------------------------------ composition


def test_crawl_corpus_end_to_end(spark, tmp_path):
    """crawl archives -> dedup'd corpus -> WET export -> re-ingest."""
    from compute_histogram_spark.operators.pipeline import crawl_corpus

    body_long = b"<p>" + b"interesting training text " * 4 + b"</p>"
    recs = [
        _resp_record(body_long, uri="http://a/1"),
        _resp_record(body_long, uri="http://a/1-recrawl"),   # exact dup
        _resp_record(b"<p>short</p>", uri="http://a/2"),     # too short
        _resp_record(body_long, uri="http://a/404", status=404),
        _resp_record(
            b"other page content that is long enough to keep around",
            uri="http://a/3", content_type="text/plain",
        ),
    ]
    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg.warc.gz").write_bytes(build_warc(recs, gzip_per_record=True))
    out = str(tmp_path / "wet")

    corpus = crawl_corpus(spark, str(src), out, min_chars=30, n_shards=2)
    rows = {r["uri"]: r for r in corpus.collect()}
    # dup collapsed to first capture, short + 404 dropped
    assert set(rows) == {"http://a/1", "http://a/3"}
    # html_to_text collapses the trailing whitespace, hence .strip()
    assert rows["http://a/1"]["n_chars"] == len(("interesting training text " * 4).strip())

    back = (
        spark.read.format("warcdocs")
        .option("path", out).option("types", "conversion").load()
    )
    assert back.count() == 2


# ------------------------------------------------------------- streaming


def test_stream_reader_tails_directory_exactly_once(spark, tmp_path):
    """readStream over warcdocs: each segment lands in exactly one
    micro-batch; files added while the query runs are picked up; the
    name-watermark offset never re-reads a processed segment."""
    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg-00000.warc").write_bytes(
        build_warc([_resp_record(uri="http://s/0")])
    )
    spark.dataSource.register(WarcDocsDataSource)
    seen = []

    def sink(df, epoch):
        seen.extend(r["target_uri"] for r in df.collect())

    q = (
        spark.readStream.format("warcdocs")
        .option("path", str(src))
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert seen == ["http://s/0"]
        (src / "seg-00001.warc.gz").write_bytes(
            build_warc([_resp_record(uri="http://s/1"),
                        _resp_record(uri="http://s/2")], gzip_per_record=True)
        )
        q.processAllAvailable()
        assert sorted(seen) == ["http://s/0", "http://s/1", "http://s/2"]
        q.processAllAvailable()  # no new files -> no re-reads
        assert len(seen) == 3
    finally:
        q.stop()


def test_stream_reader_restarts_from_checkpoint(spark, tmp_path):
    src = tmp_path / "crawl"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(WarcDocsDataSource)
    seen = []

    def sink(df, epoch):
        seen.extend(r["target_uri"] for r in df.collect())

    def run_once():
        q = (
            spark.readStream.format("warcdocs")
            .option("path", str(src)).load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    (src / "seg-00000.warc").write_bytes(build_warc([_resp_record(uri="http://s/0")]))
    run_once()
    (src / "seg-00001.warc").write_bytes(build_warc([_resp_record(uri="http://s/1")]))
    run_once()  # restart: watermark comes from the checkpoint
    assert sorted(seen) == ["http://s/0", "http://s/1"]


def test_crawl_corpus_stream_dedups_across_batches(spark, tmp_path):
    """Streaming crawl -> cross-batch content dedup -> WET append; the
    output dir (monotonic batch-prefixed names) is itself re-readable."""
    from compute_histogram_spark.operators.pipeline import crawl_corpus_stream

    src = tmp_path / "crawl"
    src.mkdir()
    out, ckpt = str(tmp_path / "wet"), str(tmp_path / "ckpt")
    long_a = b"<p>" + b"first corpus document body " * 3 + b"</p>"
    long_b = b"<p>" + b"second corpus document body " * 3 + b"</p>"

    (src / "seg-00000.warc").write_bytes(build_warc([
        _resp_record(long_a, uri="http://s/a"),
        _resp_record(long_a, uri="http://s/a-dup"),   # in-batch dup
    ]))
    q = crawl_corpus_stream(spark, str(src), out, ckpt, min_chars=30)
    try:
        q.processAllAvailable()
        (src / "seg-00001.warc").write_bytes(build_warc([
            _resp_record(long_a, uri="http://s/a-again"),  # cross-batch dup
            _resp_record(long_b, uri="http://s/b"),
        ]))
        q.processAllAvailable()
    finally:
        q.stop()

    spark.dataSource.register(WarcDocsDataSource)
    back = (
        spark.read.format("warcdocs")
        .option("path", out).option("types", "conversion").load()
    )
    texts = [r["text"] for r in back.collect()]
    assert len(texts) == 2  # one survivor per distinct content
    assert {t.split()[0] for t in texts} == {"first", "second"}


def test_fast_extractor_matches_parser_on_wellformed():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from compute_histogram_spark.sources.warc import html_to_text_fast

    # deterministic well-formed pages from generated fragments
    word = st.text("abcdefg &", min_size=1, max_size=8).map(
        lambda s: s.replace("&", "&amp;"))
    frag = st.sampled_from(
        ["<p>{w} one</p>", "<div><h2>{w}</h2>two</div>",
         "<li>{w}</li>", "<span>{w} inline</span>",
         "<script>var a = 1 &amp;&amp; 2;</script>", "<pre>{w}</pre>"]
    )

    @given(st.lists(st.tuples(frag, word), min_size=1, max_size=12))
    @settings(max_examples=80, deadline=None)
    def check(parts):
        page = ("<html><head><title>t</title><style>a{color:red}</style>"
                "</head><body>"
                + "".join(f.format(w=w) for f, w in parts)
                + "</body></html>")
        assert html_to_text_fast(page) == html_to_text(page)

    check()


def test_fast_extractor_source_option(spark, warc_dir):
    spark.dataSource.register(WarcDocsDataSource)
    fast = (
        spark.read.format("warcdocs").option("path", warc_dir)
        .option("extractor", "fast").load()
    )
    slow = spark.read.format("warcdocs").option("path", warc_dir).load()
    f = {r["target_uri"]: r["text"] for r in fast.collect()}
    s = {r["target_uri"]: r["text"] for r in slow.collect()}
    assert f == s  # identical on the (well-formed) fixtures
    with pytest.raises(Exception):
        (spark.read.format("warcdocs").option("path", warc_dir)
         .option("extractor", "bogus").load().collect())


# ------------------------------------------------- streaming record layer


def test_stream_parser_bounded_buffer():
    """iter_warc_stream must hold at most one record + one refill chunk:
    a reader that counts its max outstanding read window proves the
    O(largest record) contract (ADVICE r9: the old reader slurped the
    whole archive)."""
    import io

    from compute_histogram_spark.sources.warc import iter_warc_stream

    recs = [
        build_warc_record(
            warc_type="response",
            uri=f"http://example.com/{i}",
            content=build_http_response(b"x" * 10_000),
        )
        for i in range(50)
    ]
    raw = build_warc(recs)

    src = io.BytesIO(raw)
    it = iter_warc_stream(src, chunk_size=4096)
    next(it)
    # after ONE record the reader must not have slurped the archive: the
    # underlying position stays within one record + one refill chunk
    assert src.tell() < 11_000 + 4096 + 4096 < len(raw)
    out = list(iter_warc_stream(io.BytesIO(raw), chunk_size=4096))
    assert len(out) == 50
    # value parity with the in-memory parser
    assert [(o, h.get("warc-target-uri")) for o, h, _ in out] == [
        (o, h.get("warc-target-uri")) for o, h, _ in iter_warc_records(raw)
    ]


def test_stream_parser_gzip_incremental():
    """Per-record gzip members decode through GzipFile member-walking in
    the streaming path, matching the bytes-level reader exactly."""
    import io

    from compute_histogram_spark.sources.warc import (
        iter_warc_stream,
        open_warc_stream,
    )

    raw = build_warc(
        [_resp_record(uri=f"http://example.com/{i}") for i in range(8)],
        gzip_per_record=True,
    )
    stream = open_warc_stream(io.BufferedReader(io.BytesIO(raw)))
    got = [(h.get("warc-target-uri"), c) for _, h, c in iter_warc_stream(stream)]
    want = [(h.get("warc-target-uri"), c) for _, h, c in read_warc(raw)]
    assert got == want


def test_duplicate_header_continuation_dropped():
    """A continuation line folding a DUPLICATE header must not corrupt
    the stored first occurrence (ADVICE r9 warc.py:74)."""
    from compute_histogram_spark.sources.warc import _parse_header_block

    block = (
        b"WARC-Type: response\r\n"
        b"X-Multi: first\r\n"
        b"X-Multi: second\r\n"
        b"\tsecond-continued\r\n"
        b"Content-Length: 0"
    )
    h = _parse_header_block(block)
    assert h["x-multi"] == "first"  # first occurrence wins, uncorrupted
    assert h["warc-type"] == "response"


def test_crawl_corpus_url_dedup_first(spark, tmp_path):
    """crawl_corpus(url_dedup_first=True): URL variants of one page
    collapse BEFORE content hashing; distinct-content pages survive."""
    import os

    from compute_histogram_spark.operators.pipeline import crawl_corpus

    page = b"<html><p>stable page body content here</p></html>"
    other = b"<html><p>a different page body entirely okay</p></html>"
    recs = [
        build_warc_record(
            warc_type="response", uri=u, content=build_http_response(page)
        )
        for u in (
            "https://www.example.com/p?utm_source=a",
            "https://example.com/p?utm_source=b",
            "https://example.com/p/",
        )
    ] + [
        build_warc_record(
            warc_type="response",
            uri="https://example.com/q",
            content=build_http_response(other),
        )
    ]
    d = str(tmp_path / "warc")
    os.makedirs(d)
    with open(os.path.join(d, "seg-00000.warc.gz"), "wb") as f:
        f.write(build_warc(recs, gzip_per_record=True))
    out = crawl_corpus(spark, d, min_chars=10, url_dedup_first=True)
    rows = out.collect()
    assert len(rows) == 2
    uris = sorted(r.uri for r in rows)
    # the earliest capture of the variant group survives
    assert uris == [
        "https://example.com/q",
        "https://www.example.com/p?utm_source=a",
    ]


def test_crawl_corpus_url_dedup_keeps_null_uri_docs(spark, tmp_path):
    """Records with NO WARC-Target-URI must pass THROUGH the URL-dedup
    pre-stage untouched (per-row fallback key), not collapse into one
    NULL group — distinct null-URI contents all reach content dedup
    (r10 advice finding). The composed plan also must not pay a global
    sort (the oracle-only orderBy stays out of the pipeline path)."""
    import os

    from compute_histogram_spark.operators.pipeline import crawl_corpus

    bodies = [
        b"<html><p>first distinct anonymous body text</p></html>",
        b"<html><p>second distinct anonymous body text</p></html>",
        b"<html><p>third distinct anonymous body text</p></html>",
    ]
    recs = [
        build_warc_record(
            warc_type="response", uri=None, content=build_http_response(b)
        )
        for b in bodies
    ] + [
        # plus one URI'd pair that must still collapse
        build_warc_record(
            warc_type="response",
            uri=u,
            content=build_http_response(
                b"<html><p>shared page body content</p></html>"
            ),
        )
        for u in (
            "https://example.com/p?utm_source=a",
            "https://example.com/p#frag",
        )
    ]
    d = str(tmp_path / "warc")
    os.makedirs(d)
    with open(os.path.join(d, "seg-00000.warc.gz"), "wb") as f:
        f.write(build_warc(recs, gzip_per_record=True))
    out = crawl_corpus(spark, d, min_chars=10, url_dedup_first=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan  # no global sort when composed
    rows = out.collect()
    # 3 distinct null-URI docs survive + 1 collapsed URI group
    assert len(rows) == 4
    assert sum(1 for r in rows if r.uri is None) == 3
