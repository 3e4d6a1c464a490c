"""Throughput-prove the crawl ingestion chain at protocol scale.

VERDICT r9 #6: ``pipeline.crawl_corpus`` was pytest-proven (round-trip
byte equality, exactly-once restart) but never WALL-CLOCK measured at
bench scale. This tool builds a multi-GB synthetic crawl (executor-side,
32-way — the driver never holds archive bytes), then times the full
Common-Crawl-shaped chain on local[32]:

    1. crawl_corpus: warcdocs scan -> HTTP 200 + length filter -> HTML
       text extraction -> exact content dedup -> WET shard export
    2. re-ingest: warcdocs over the WET output (conversion records)
    3. text_stats + dedup_exact over the re-ingested corpus

and prints one JSON line with wall-clock + MB/s per stage. Results land
in BASELINE.md's crawl-pipeline section next to the per-core numbers.

Usage: python tools/crawl_bench.py [n_segments] [records_per_segment]
Defaults build ~2 GB of gzip'd tag-dense HTML across 64 segments.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window filter join shuffle codec stream record corpus "
    "token quality language duplicate extract crawl archive segment"
).split()


def _doc_html(seg: int, rec: int, dup_every: int = 11) -> tuple[str, bytes]:
    """Deterministic tag-dense HTML ~30 KB; every ``dup_every``-th record
    shares an earlier record's EXTRACTED text (only script content —
    stripped by extraction — differs), so content dedup has real work
    (~9% of records collapse)."""
    base = (seg * 7919 + rec) if rec % dup_every else (seg * 7919 // 2)
    paras = []
    for p in range(60):
        ws = [WORDS[(base + p * 13 + k) % len(WORDS)] for k in range(40)]
        paras.append(
            "<p class=\"c%d\"><span>%s</span> <a href=\"/l%d\">%s</a></p>"
            % (p % 7, " ".join(ws[:20]), p, " ".join(ws[20:]))
        )
    html = (
        "<html><head><title>doc %d</title><style>p{margin:0}</style>"
        "<script>var unused=%d;</script></head><body><nav>home</nav>%s"
        "<footer>end</footer></body></html>"
        % (base, seg * 100000 + rec, "".join(paras))
    )
    return f"http://bench.example/{seg}/{rec}", html.encode()


def _doc_html_recrawl(
    seg: int, rec: int, dup_every: int = 11, recrawl_every: int = 4
) -> tuple[str, bytes]:
    """Fixture with a realistic re-crawl mix (VERDICT r10 #5): every
    ``recrawl_every``-th record is a RE-CRAWL of an earlier URL — the
    URI is a canonicalization variant (scheme/host case, www., :80,
    tracking params, fragment, trailing slash) and the body carries a
    mutated crawl-tick paragraph, so the pair is INVISIBLE to exact
    content dedup and only the URL stage can collapse it. The
    ``dup_every`` exact-content dups (different URL, same extracted
    text) stay from the base fixture, so the two dedup stages have
    disjoint, countable work."""
    is_recrawl = recrawl_every and rec % recrawl_every == recrawl_every - 1
    base_rec = rec - (recrawl_every - 1) if is_recrawl else rec
    uri, html = _doc_html(seg, base_rec, dup_every=dup_every)
    if is_recrawl:
        path = uri.removeprefix("http://bench.example")
        uri = (
            "HTTP://WWW.bench.example:80%s/?utm_source=recrawl&ref=x#frag"
            % path
        )
        html = html.replace(
            b"<footer>end</footer>",
            b"<footer>end</footer><p>crawl tick %d</p>" % rec,
        )
    return uri, html


def build_crawl(
    spark, out_dir: str, n_segments: int, n_records: int,
    doc_fn=_doc_html,
) -> int:
    """Write the synthetic archive set executor-side; returns total bytes."""
    os.makedirs(out_dir, exist_ok=True)

    def _one(seg: int) -> int:
        from compute_histogram_spark.sources.warc import (
            build_http_response,
            build_warc,
            build_warc_record,
        )

        recs = []
        for r in range(n_records):
            uri, body = doc_fn(seg, r)
            recs.append(
                build_warc_record(
                    warc_type="response",
                    uri=uri,
                    content=build_http_response(body),
                )
            )
        blob = build_warc(recs, gzip_per_record=True)
        p = os.path.join(out_dir, f"seg-{seg:05d}.warc.gz")
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, p)
        return len(blob)

    sizes = (
        spark.sparkContext.parallelize(range(n_segments), n_segments)
        .map(_one)
        .collect()
    )
    return sum(sizes)


def main_url() -> None:
    """URL-dedup pre-stage proof at protocol scale (VERDICT r10 #5):
    times crawl_corpus WITHOUT and WITH url_dedup_first on a fixture
    whose dup mix is realistic and split-countable — 25% re-crawl URL
    variants (canonicalization hazards + mutated body: only the URL
    stage can remove them) on top of the base fixture's ~9%
    exact-content dups (different URL, same text: only the content
    stage can). Prints one JSON line with wall/MB/s per configuration
    and the removal split.

    Usage: python tools/crawl_bench.py --url-dedup [n_segments] [records]
    """
    import shutil

    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_records = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    from compute_histogram_spark.operators.pipeline import crawl_corpus
    from compute_histogram_spark.session import get_session

    spark = get_session("crawl-bench-url")
    spark.sparkContext.setLogLevel("ERROR")

    base = os.environ.get("SPARK_GRAFT_CRAWL_DIR", "/tmp/crawl_bench") + "_url"
    raw_dir = os.path.join(base, "raw")
    out: dict = {
        "mode": "url_dedup",
        "n_segments": n_segments,
        "records_per_segment": n_records,
        "recrawl_every": 4,
        "content_dup_every": 11,
    }
    if not os.path.exists(
        os.path.join(raw_dir, f"seg-{n_segments - 1:05d}.warc.gz")
    ):
        t0 = time.time()
        out["input_bytes"] = build_crawl(
            spark, raw_dir, n_segments, n_records, doc_fn=_doc_html_recrawl
        )
        out["build_s"] = round(time.time() - t0, 2)
    else:
        out["input_bytes"] = sum(
            os.path.getsize(os.path.join(raw_dir, f))
            for f in os.listdir(raw_dir)
            if f.endswith(".warc.gz")
        )

    import gzip

    sample = os.path.join(raw_dir, f"seg-{0:05d}.warc.gz")
    with open(sample, "rb") as f:
        ratio = len(gzip.decompress(f.read())) / os.path.getsize(sample)
    out["decompressed_bytes"] = int(out["input_bytes"] * ratio)

    n_in = n_segments * n_records
    # two alternating rounds per configuration (min): the first pass of a
    # fresh session is systematically slower, and a single A-then-B order
    # would gift the later config the warm JVM
    walls: dict = {"content_only": [], "url_first": []}
    for _ in range(2):
        for label, url_first in (("content_only", False), ("url_first", True)):
            wet_dir = os.path.join(base, f"wet_{label}")
            shutil.rmtree(wet_dir, ignore_errors=True)
            t0 = time.time()
            crawl_corpus(
                spark, raw_dir, out_path=wet_dir, n_shards=32,
                url_dedup_first=url_first,
            )
            walls[label].append(time.time() - t0)
    for label in ("content_only", "url_first"):
        wet_dir = os.path.join(base, f"wet_{label}")
        wall = min(walls[label])
        from compute_histogram_spark.sources.warc import WarcDocsDataSource

        spark.dataSource.register(WarcDocsDataSource)
        n_out = (
            spark.read.format("warcdocs")
            .option("path", wet_dir)
            .option("types", "conversion")
            .load()
            .count()
        )
        out[label] = {
            "wall_s": round(wall, 2),
            "runs": [round(w, 2) for w in walls[label]],
            "gz_mb_per_s": round(out["input_bytes"] / 1e6 / wall, 1),
            "raw_mb_per_s": round(
                out["decompressed_bytes"] / 1e6 / wall, 1
            ),
            "n_docs_out": n_out,
            "removed": n_in - n_out,
        }
    # the split: URL-stage-only dups are exactly the extra removals the
    # url_first run achieves over content-only
    out["url_stage_removed"] = (
        out["content_only"]["n_docs_out"] - out["url_first"]["n_docs_out"]
    )
    out["content_stage_removed"] = out["content_only"]["removed"]
    print(json.dumps(out))


def main() -> None:
    n_segments = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_records = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import functions as F

    from compute_histogram_spark.operators.pipeline import crawl_corpus
    from compute_histogram_spark.operators.text import text_profile
    from compute_histogram_spark.session import get_session
    from compute_histogram_spark.sources.warc import WarcDocsDataSource

    spark = get_session("crawl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = os.environ.get("SPARK_GRAFT_CRAWL_DIR", "/tmp/crawl_bench")
    raw_dir = os.path.join(base, "raw")
    wet_dir = os.path.join(base, "wet")

    out: dict = {"n_segments": n_segments, "records_per_segment": n_records}

    if not os.path.exists(os.path.join(raw_dir, f"seg-{n_segments - 1:05d}.warc.gz")):
        t0 = time.time()
        out["input_bytes"] = build_crawl(spark, raw_dir, n_segments, n_records)
        out["build_s"] = round(time.time() - t0, 2)
    else:
        out["input_bytes"] = sum(
            os.path.getsize(os.path.join(raw_dir, f))
            for f in os.listdir(raw_dir)
            if f.endswith(".warc.gz")
        )

    # decompressed payload is the honest throughput denominator for the
    # extraction stage; gzip'd size for the IO stage. Report both.
    import gzip

    sample = os.path.join(raw_dir, f"seg-{0:05d}.warc.gz")
    with open(sample, "rb") as f:
        ratio = len(gzip.decompress(f.read())) / os.path.getsize(sample)
    out["decompressed_bytes"] = int(out["input_bytes"] * ratio)

    import shutil

    shutil.rmtree(wet_dir, ignore_errors=True)

    extractor = os.environ.get("SPARK_GRAFT_CRAWL_EXTRACTOR", "parser")
    t0 = time.time()
    crawl_corpus(
        spark, raw_dir, out_path=wet_dir, n_shards=32, extractor=extractor
    )
    # the WET sink IS the materialization — no second pipeline run;
    # n_docs_out comes from the cheap re-scan of the output below
    t_pipeline = time.time() - t0
    out["crawl_corpus"] = {
        "extractor": extractor,
        "wall_s": round(t_pipeline, 2),
        "gz_mb_per_s": round(out["input_bytes"] / 1e6 / t_pipeline, 1),
        "raw_mb_per_s": round(out["decompressed_bytes"] / 1e6 / t_pipeline, 1),
        "raw_mb_per_s_per_core": round(
            out["decompressed_bytes"] / 1e6 / t_pipeline / 32, 2
        ),
    }

    t0 = time.time()
    spark.dataSource.register(WarcDocsDataSource)
    wet = (
        spark.read.format("warcdocs")
        .option("path", wet_dir)
        .option("types", "conversion")
        .load()
        .select(
            F.abs(F.xxhash64("text")).alias("doc_id"),
            F.col("text"),
            F.length("text").alias("n_chars"),
        )
    )
    stats = text_profile(wet)
    n_stats = stats.count()
    uniq = wet.select(F.sha2("text", 256)).distinct().count()
    t_downstream = time.time() - t0
    out["wet_reingest_plus_stats"] = {
        "wall_s": round(t_downstream, 2),
        "n_docs": n_stats,
        "n_unique": uniq,
    }
    out["crawl_corpus"]["n_docs_out"] = n_stats
    out["dedup_removed"] = n_segments * n_records - n_stats
    out["end_to_end_s"] = round(t_pipeline + t_downstream, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--url-dedup":
        main_url()
    else:
        main()
