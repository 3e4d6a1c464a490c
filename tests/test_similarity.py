from pyspark.sql import Row

from compute_histogram_spark.operators import similarity as SIM


def emb_df(spark):
    rows = [
        Row(vec_id=0, label=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, label=0, embedding=[0.9, 0.1]),
        Row(vec_id=2, label=1, embedding=[0.0, 1.0]),
        Row(vec_id=3, label=1, embedding=[0.1, 0.9]),
        Row(vec_id=4, label=0, embedding=[-1.0, 0.0]),
    ]
    return spark.createDataFrame(rows)


def test_cosine_topk_ordering(spark):
    out = SIM.cosine_topk(emb_df(spark), k=2, query_filter="vec_id = 0").collect()
    assert [(r["rnk"], r["vec_id"]) for r in out] == [(1, 1), (2, 3)]
    assert out[0]["cosine"] > 0.99


def test_cosine_topk_excludes_self(spark):
    out = SIM.cosine_topk(emb_df(spark), k=4, query_filter="vec_id = 0").collect()
    assert all(r["vec_id"] != 0 for r in out)


def test_ivf_restricts_to_partition(spark):
    out = SIM.cosine_topk_ivf(emb_df(spark), k=4, query_filter="vec_id = 0").collect()
    # label-0 block: only vec 1 and 4 are candidates
    assert {r["vec_id"] for r in out} == {1, 4}
