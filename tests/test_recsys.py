"""Item-item collaborative filtering (operators/recsys.py)."""


def test_item_item_topk_hand_case(spark):
    """Baskets {1,2,3}, {1,2}, {1,4}: co(1,2)=2, co(1,3)=co(2,3)=
    co(1,4)=1; supports n1=3, n2=2, n3=1, n4=1. cosine(1,2) =
    2/sqrt(6); item 1's best neighbour is 2; symmetry holds (both
    directions present with equal cosine); min_co=2 drops the
    singletons."""
    import math

    from etl_capnz_spark.operators.recsys import item_item_topk

    rows = [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2), (30, 1), (30, 4)]
    df = spark.createDataFrame(rows, "b long, i long")
    out = item_item_topk(df, "b", "i", k=5, min_co=1).collect()
    got = {(r["item"], r["neighbor"]): r for r in out}
    assert got[(1, 2)]["n_co"] == 2
    assert abs(got[(1, 2)]["cosine"] - round(2 / math.sqrt(6), 6)) < 1e-12
    assert got[(1, 2)]["cosine"] == got[(2, 1)]["cosine"]
    assert got[(1, 2)]["rank"] == 1  # item 1's best neighbour is 2
    assert (3, 1) in got and (4, 1) in got

    strict = {
        (r["item"], r["neighbor"])
        for r in item_item_topk(df, "b", "i", k=5, min_co=2).collect()
    }
    assert strict == {(1, 2), (2, 1)}
