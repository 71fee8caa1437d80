import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_exact():
    from osm_sidewalkreator_ray.pipelines import vectors as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{SF}/embeddings.parquet'")
    exact = set(con.sql(V.ANN_TOPK_SQL).df()["vec_id"])
    approx_df = V.ivf_topk(SF)
    assert len(approx_df) == 10
    # approximate: require recall@10 >= 0.5 on random vectors, and the
    # true nearest (vec_id 0 itself, sim 1.0) must always be found
    recall = len(exact & set(approx_df["vec_id"])) / 10
    assert recall >= 0.5
    assert 0 in set(approx_df["vec_id"])
    # deterministic
    import pandas as pd
    pd.testing.assert_frame_equal(approx_df, V.ivf_topk(SF))
