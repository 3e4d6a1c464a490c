from pyspark.sql import Row

from compute_histogram_spark.operators import text as TX


def docs_df(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="the cat and the hat"),
            Row(doc_id=1, lang="de", text="der hund und die katze"),
            Row(doc_id=2, lang="en", text="abc123 def!"),
        ]
    )


def test_text_stats(spark):
    out = {r["doc_id"]: r for r in TX.text_stats(docs_df(spark)).collect()}
    r0 = out[0]
    assert r0["n_tokens"] == 5
    assert r0["n_chars"] == 19
    assert r0["stopword_ratio"] == 0.6  # the, and, the
    assert 0 < r0["quality_score"] <= 1.0


def test_lang_id(spark):
    out = {r["doc_id"]: r for r in TX.lang_id(docs_df(spark)).collect()}
    assert out[0]["lang_pred"] == "en" and out[0]["s_en"] == 3
    assert out[1]["lang_pred"] == "de" and out[1]["s_de"] == 3
    # no markers at all -> en wins by >= tie-break priority
    assert out[2]["lang_pred"] == "en"


def test_token_counts_bpe_split(spark):
    out = {r["doc_id"]: r for r in TX.token_counts(docs_df(spark)).collect()}
    # "abc123 def!" -> ws: 2; bpe: abc|123|def|! = 4
    assert out[2]["n_ws_tokens"] == 2
    assert out[2]["n_bpe_tokens"] == 4


def test_doc_fingerprint_deterministic(spark):
    a = TX.doc_fingerprint(docs_df(spark)).collect()
    b = TX.doc_fingerprint(docs_df(spark)).collect()
    assert a == b
    assert all(len(r["fingerprint"]) == 32 for r in a)


def test_top_tokens(spark):
    out = TX.top_tokens(docs_df(spark), k=2).collect()
    assert out[0]["token"] == "the" and out[0]["n"] == 2


def test_normalize_text(spark):
    from pyspark.sql import Row

    from compute_histogram_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [Row(doc_id=0, text="Hello,   WORLD!! 42 的 --- ok")]
    )
    out = normalize_text(df).first()
    assert out["norm_text"] == "hello world 42 的 ok"
    assert out["norm_len"] == len("hello world 42 的 ok")
    assert out["text"].startswith("Hello")  # original untouched
