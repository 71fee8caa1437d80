"""Unit tests for shared function helpers: pairgen, blocks, joins."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


class TestPairsSharingKey:
    def test_basic_groups(self):
        from osm_sidewalkreator_ray.functions.pairgen import \
            pairs_sharing_key
        keys = np.array([5, 5, 5, 9, 9, 7])
        ids = np.array([30, 10, 20, 2, 1, 99])
        a, b = pairs_sharing_key(keys, ids)
        pairs = sorted(zip(a, b))
        assert pairs == [(1, 2), (10, 20), (10, 30), (20, 30)]

    def test_max_group_cap(self):
        from osm_sidewalkreator_ray.functions.pairgen import \
            pairs_sharing_key
        keys = np.array([1, 1, 1, 2, 2])
        ids = np.array([1, 2, 3, 4, 5])
        a, b = pairs_sharing_key(keys, ids, max_group=2)
        assert sorted(zip(a, b)) == [(4, 5)]  # size-3 group dropped

    def test_empty(self):
        from osm_sidewalkreator_ray.functions.pairgen import \
            pairs_sharing_key
        a, b = pairs_sharing_key(np.empty(0, dtype=np.int64),
                                 np.empty(0, dtype=np.int64))
        assert len(a) == 0 and len(b) == 0

    def test_matches_naive_groupby(self):
        from osm_sidewalkreator_ray.functions.pairgen import \
            pairs_sharing_key
        rng = np.random.RandomState(3)
        keys = rng.randint(0, 50, 500)
        ids = rng.permutation(500)
        a, b = pairs_sharing_key(keys, ids)
        df = pd.DataFrame({"k": keys, "i": ids})
        want = set()
        for _, sub in df.groupby("k"):
            s = np.sort(sub["i"].to_numpy())
            ii, jj = np.triu_indices(len(s), k=1)
            want |= set(zip(s[ii], s[jj]))
        assert set(zip(a, b)) == want


@pytest.mark.usefixtures("ray_session")
class TestCoalesceSlim:
    def test_coalesces_many_tiny_blocks(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.blocks import coalesce_slim
        ds = rd.range(10_000, override_num_blocks=200).materialize()
        out = coalesce_slim(ds)
        assert out.num_blocks() < 200
        assert out.count() == 10_000

    def test_noop_when_already_coarse(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.blocks import coalesce_slim
        ds = rd.range(1000, override_num_blocks=2).materialize()
        out = coalesce_slim(ds)
        assert out.num_blocks() == 2  # untouched


@pytest.mark.usefixtures("ray_session")
class TestJoinGroupFn:
    def test_group_fn_aggregate_pushdown_is_exact(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import \
            hash_partition_join
        left = rd.from_pandas(pd.DataFrame(
            {"k": [1, 1, 2, 3], "l": [10, 11, 20, 30]}))
        right = rd.from_pandas(pd.DataFrame(
            {"k": [1, 2, 2, 4], "r": [1.0, 2.0, 2.5, 4.0]}))

        def agg(df):
            return df.groupby("k", as_index=False)["r"].sum()

        out = hash_partition_join(left, right, on="k", num_buckets=4,
                                  group_fn=agg).to_pandas()
        got = dict(zip(out["k"], out["r"]))
        # k=1: two left rows x r=1.0 -> 2.0; k=2: one left x (2+2.5)=4.5
        assert got == {1: 2.0, 2: 4.5}


@pytest.mark.usefixtures("ray_session")
class TestHyperLogLog:
    def test_error_within_bound(self):
        import duckdb
        from osm_sidewalkreator_ray.pipelines.relational import \
            events_user_count_approx
        est = events_user_count_approx(
            SF)["approx_users"].iloc[0]
        exact = duckdb.sql(
            "SELECT COUNT(DISTINCT user_id) FROM "
            f"'{SF}/events.parquet'").fetchone()[0]
        assert abs(est - exact) / exact < 0.05  # ~3 sigma at b=12

    def test_merge_equals_single_pass(self):
        # mergeability: sketch of the union == max-merge of partials
        from osm_sidewalkreator_ray.functions.aggregates import (
            _hll_estimate, _hll_registers)
        a = np.arange(0, 60_000, dtype=np.int64)
        b_ = np.arange(40_000, 100_000, dtype=np.int64)
        merged = np.maximum(_hll_registers(a, 12), _hll_registers(b_, 12))
        single = _hll_registers(np.arange(100_000, dtype=np.int64), 12)
        assert np.array_equal(merged, single)
        est = _hll_estimate(single)
        assert abs(est - 100_000) / 100_000 < 0.05

    def test_deterministic(self):
        from osm_sidewalkreator_ray.pipelines.relational import \
            events_user_count_approx
        e1 = events_user_count_approx(SF_SMALL)
        e2 = events_user_count_approx(SF_SMALL)
        pd.testing.assert_frame_equal(e1, e2)

    def test_grouped_sketch_error_bound(self):
        import duckdb
        from osm_sidewalkreator_ray.pipelines.relational import \
            events_user_count_approx_by_type
        got = events_user_count_approx_by_type(SF)
        # the grouped export leads with the global sketch as '*'
        total_row = got[got["event_type"] == "*"]
        assert len(total_row) == 1
        got = got[got["event_type"] != "*"].reset_index(drop=True)
        exact = duckdb.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
            f"'{SF}/events.parquet' "
            "GROUP BY event_type ORDER BY event_type").df()
        assert list(got["event_type"]) == list(exact["event_type"])
        rel = np.abs(got["approx_distinct"].to_numpy()
                     - exact["n"].to_numpy()) / exact["n"].to_numpy()
        assert (rel < 0.05).all()
        exact_total = duckdb.sql(
            "SELECT COUNT(DISTINCT user_id) AS n FROM "
            f"'{SF}/events.parquet'").df()["n"].iloc[0]
        assert abs(float(total_row["approx_distinct"].iloc[0])
                   - exact_total) / exact_total < 0.05


@pytest.mark.usefixtures("ray_session")
def test_bloom_prefilter_no_false_negatives():
    """Runtime-filter pushdown: survivors superset of true matches;
    join output unchanged; big non-matching majority dropped."""
    import ray.data as rd
    import numpy as np
    import pandas as pd
    from osm_sidewalkreator_ray.functions.joins import (
        bloom_prefilter, build_key_bloom, _bloom_contains,
        hash_partition_join)

    rng = np.random.RandomState(5)
    keys = rng.choice(100_000, 500, replace=False).astype(np.int64)
    small = rd.from_pandas(pd.DataFrame(
        {"k": keys, "attr": np.arange(500)})).materialize()
    big_df = pd.DataFrame({"k": np.arange(100_000, dtype=np.int64),
                           "v": np.arange(100_000)})
    big = rd.from_pandas(big_df).repartition(8)

    filtered = bloom_prefilter(big, small, on="k")
    n_kept = filtered.count()
    # all 500 true matches survive; FPR keeps the reduction large
    kept = set(filtered.to_pandas()["k"])
    assert set(keys) <= kept
    assert n_kept < 5_000, n_kept  # >95% of non-matches dropped

    out = hash_partition_join(filtered, small, on="k",
                              num_buckets=8).to_pandas()
    expect = big_df.merge(pd.DataFrame({"k": keys,
                                        "attr": np.arange(500)}), on="k")
    assert len(out) == len(expect) == 500
    assert set(out["k"]) == set(keys)

    # membership kernel: no false negatives by construction
    bloom = build_key_bloom(small, "k")
    assert _bloom_contains(pd.Series(keys), bloom).all()


@pytest.mark.usefixtures("ray_session")
def test_salted_hash_join_equals_unsalted():
    """Hot-key salting: identical join output, hot key spread over
    dedicated salt buckets instead of one reducer."""
    import ray.data as rd
    import numpy as np
    import pandas as pd
    from osm_sidewalkreator_ray.functions.joins import (
        detect_hot_keys, hash_partition_join)

    rng = np.random.RandomState(11)
    # zipf head: key 7 carries half the rows
    k = np.where(rng.rand(20_000) < 0.5, 7,
                 rng.randint(0, 1000, 20_000)).astype(np.int64)
    left = pd.DataFrame({"k": k, "v": np.arange(20_000)})
    right = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                          "w": np.arange(1000) * 10})
    lds = rd.from_pandas(left).repartition(8)
    rds = rd.from_pandas(right).repartition(2)

    hot = detect_hot_keys(lds, "k", frac=0.2)
    assert hot == {7}

    expect = left.merge(right, on="k").sort_values(
        ["k", "v"]).reset_index(drop=True)
    for hk in (None, hot):
        got = hash_partition_join(
            rd.from_pandas(left).repartition(8), rds, on="k",
            num_buckets=8, hot_keys=hk).to_pandas()
        got = got.sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "v", "w"]], expect)

    # left-join form keeps unmatched hot rows exactly once
    left2 = left.copy()
    left2.loc[left2.index[:5], "k"] = 5000  # no right match
    got = hash_partition_join(
        rd.from_pandas(left2).repartition(8), rds, on="k",
        num_buckets=8, how="left", hot_keys={7}).to_pandas()
    assert len(got) == len(left2)


@pytest.mark.usefixtures("ray_session")
class TestJoinStreamsIntoShuffle:
    """Round-4 verdict item 1: the partitioned hash join must stream
    into its shuffle — no full-input materialize/repartition epoch
    ahead of the sort."""

    def test_no_repartition_or_materialize_in_plan(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import hash_partition_join
        l = rd.range(5000).map_batches(
            lambda t: t.rename_columns(["k"]), batch_format="pyarrow")
        r = rd.range(5000).map_batches(
            lambda t: t.rename_columns(["k"]).append_column(
                "w", t["id"]), batch_format="pyarrow")
        out = hash_partition_join(l, r, on="k", num_buckets=8).materialize()
        assert out.count() == 5000
        st = out.stats()
        assert "Repartition" not in st
        # exactly one all-to-all (the groupby sort), nothing pinned ahead
        assert "Sort" in st

    def test_lazy_pass_through_coalesce(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.blocks import coalesce_slim
        ds = rd.range(10_000, override_num_blocks=100)  # LAZY
        out = coalesce_slim(ds)
        assert out is ds  # never forces execution on a lazy stream

    def test_int_dtypes_survive_join_exactly(self):
        import pyarrow as pa
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import hash_partition_join
        big = 2**53 + 111  # corrupted by any float64 round-trip
        lt = pa.table({
            "k": pa.array([1, 2, 3, big], type=pa.int64()),
            "a32": pa.array([10, 20, 30, 40], type=pa.int32()),
            "u64": pa.array([2**63 + 5, 7, 8, 9], type=pa.uint64())})
        rt = pa.table({"k": pa.array([2, 3, big], type=pa.int64()),
                       "b": pa.array([200, 300, 999], type=pa.int64())})
        out = hash_partition_join(rd.from_arrow(lt), rd.from_arrow(rt),
                                  on="k", num_buckets=4).to_pandas()
        out = out.sort_values("k").reset_index(drop=True)
        assert out["k"].tolist() == [2, 3, big]
        assert out["a32"].dtype == np.int32
        assert out["u64"].dtype == np.uint64
        assert out.loc[2, "u64"] == 9


@pytest.mark.usefixtures("ray_session")
def test_bloom_dtype_mismatch_no_false_negatives():
    """ADVICE r3: a float64 probe side against an int64 build side
    must not silently drop true matches (hash_array is
    dtype-sensitive; both sides now cast to the build key type)."""
    import ray.data as rd
    from osm_sidewalkreator_ray.functions.joins import bloom_prefilter
    keys = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64)}))
    probe = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(200).astype(np.float64)}))
    surv = set(bloom_prefilter(probe, keys, on="k").to_pandas()["k"])
    assert set(np.arange(100).astype(float)).issubset(surv)


@pytest.mark.usefixtures("ray_session")
def test_mg_heavy_hitters_by_tolerates_empty_blocks():
    """ADVICE r3: zero-row blocks (e.g. downstream of a filter) must
    not crash the grouped Misra-Gries partial."""
    import ray.data as rd
    from osm_sidewalkreator_ray.functions.sketches import mg_heavy_hitters_by
    df = pd.DataFrame({"g": ["a"] * 50 + ["b"] * 50,
                       "v": ["x"] * 60 + ["y"] * 40})
    ds = rd.from_pandas(df).repartition(8).filter(
        lambda r: r["g"] != "zzz")  # keeps all rows, may yield empties
    # force some genuinely empty blocks
    ds2 = rd.from_pandas(df.head(0))
    out = mg_heavy_hitters_by(ds.union(ds2), "g", "v", topk=2)
    assert set(out["g"]) == {"a", "b"}


@pytest.mark.usefixtures("ray_session")
def test_stats_frame_parses_operators():
    """stats_frame turns Dataset.stats() text into one row per
    operator with sane totals."""
    import ray.data as rd
    from osm_sidewalkreator_ray.functions.stats import (dominant_operator,
                                                        stats_frame)
    ds = (rd.range(20000, override_num_blocks=4)
          .map_batches(lambda b: b, batch_format="pyarrow")
          .materialize())
    df = stats_frame(ds)
    assert len(df) >= 1
    assert df["tasks"].sum() >= 4
    assert (df["wall_s"] >= 0).all()
    assert df["rows_out"].iloc[-1] == 20000
    assert df["udf_s"].notna().any()
    assert dominant_operator(ds) in set(df["name"])


@pytest.mark.usefixtures("ray_session")
class TestNewOpsEmptyInputs:
    """Ray Data can deliver empty datasets/blocks (e.g. downstream of
    a filter); every r4 op must return its typed empty result."""

    def test_range_join_empty_sides(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import range_join
        ep = rd.from_pandas(pd.DataFrame(
            {"p": pd.Series([], dtype="float64"),
             "pid": pd.Series([], dtype="int64")}))
        iv = rd.from_pandas(pd.DataFrame(
            {"lo": [0.0], "hi": [1.0], "iid": [1]}))
        assert len(range_join(ep, iv, "p", "lo", "hi",
                              cell_width=1.0).to_pandas()) == 0
        pts = rd.from_pandas(pd.DataFrame({"p": [0.5], "pid": [1]}))
        ei = rd.from_pandas(pd.DataFrame(
            {"lo": pd.Series([], dtype="float64"),
             "hi": pd.Series([], dtype="float64"),
             "iid": pd.Series([], dtype="int64")}))
        assert len(range_join(pts, ei, "p", "lo",
                              "hi").to_pandas()) == 0

    def test_windows_empty(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.windows import \
            running_sum, global_rank
        e = rd.from_pandas(pd.DataFrame(
            {"k": pd.Series([], dtype="float64"),
             "v": pd.Series([], dtype="float64")}))
        assert len(running_sum(e, "k", "v", "cs").to_pandas()) == 0
        r, n = global_rank(e, ["k"])
        assert len(r.to_pandas()) == 0 and n == 0

    def test_edit_distance_empty(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines.textops import \
            edit_distance_join_ds
        e = rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "s": pd.Series([], dtype="object")}))
        out = edit_distance_join_ds(e)
        # Dataset-level schema is the contract (Ray's to_pandas drops
        # columns from any empty dataset — same quirk _collect_small
        # documents)
        assert out.schema().names == ["doc_a", "doc_b", "dist"]
        assert out.count() == 0

    def test_graph_ops_empty(self):
        from osm_sidewalkreator_ray.functions.graph import \
            pagerank, triangle_count
        e = pd.DataFrame({"src": [], "dst": []}).astype("int64")
        assert len(pagerank(e)) == 0
        assert triangle_count(e) == 0


@pytest.mark.usefixtures("ray_session")
class TestWeightedSample:
    def test_equals_single_process_reference(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sampling import \
            weighted_sample, es_keys
        rng = np.random.RandomState(1)
        df = pd.DataFrame({"id": np.arange(5000),
                           "w": rng.uniform(0.1, 10, 5000)})
        got = weighted_sample(rd.from_pandas(df).repartition(13),
                              "id", "w", n=200)
        k = es_keys(df["id"].to_numpy(), df["w"].to_numpy(), 42)
        want = df.iloc[np.lexsort((df["id"].to_numpy(), k))[:200]] \
            .sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_weight_proportional_inclusion(self):
        # two weight classes 1:9 -> heavy ids ~9x more likely; pool
        # over seeds for a tight bound
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sampling import \
            weighted_sample
        df = pd.DataFrame({"id": np.arange(2000),
                           "w": np.where(np.arange(2000) < 1000,
                                         1.0, 9.0)})
        heavy = 0
        for seed in range(5):
            s = weighted_sample(rd.from_pandas(df), "id", "w",
                                n=100, seed=seed)
            heavy += (s["id"] >= 1000).sum()
        assert heavy / 500 > 0.8  # expected ~0.9

    def test_zero_and_negative_weights_excluded(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sampling import \
            weighted_sample
        df = pd.DataFrame({"id": [1, 2, 3, 4],
                           "w": [0.0, -5.0, np.nan, 2.0]})
        s = weighted_sample(rd.from_pandas(df), "id", "w", n=4)
        assert s["id"].tolist() == [4]


@pytest.mark.usefixtures("ray_session")
class TestDistanceJoin:
    def test_matches_sql_cross_join(self):
        import duckdb
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import distance_join
        rng = np.random.RandomState(8)
        a = pd.DataFrame({"x": rng.uniform(0, 20, 200),
                          "y": rng.uniform(0, 20, 200),
                          "aid": range(200)})
        b = pd.DataFrame({"x2": rng.uniform(0, 20, 150),
                          "y2": rng.uniform(0, 20, 150),
                          "bid": range(150)})
        got = distance_join(rd.from_pandas(a), rd.from_pandas(b),
                            d=1.5).to_pandas() \
            .sort_values(["aid", "bid"]).reset_index(drop=True)
        c = duckdb.connect()
        c.register("a", a)
        c.register("b", b)
        want = c.sql(
            "SELECT aid, bid FROM a, b WHERE "
            "(x-x2)*(x-x2) + (y-y2)*(y-y2) <= 1.5*1.5 "
            "ORDER BY aid, bid").df()
        assert got["aid"].tolist() == want["aid"].tolist()
        assert got["bid"].tolist() == want["bid"].tolist()
        assert not got.duplicated(["aid", "bid"]).any()

    def test_boundary_negatives_nulls(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import distance_join
        a = pd.DataFrame({"x": [0.0, -5.0, None],
                          "y": [0.0, -5.0, 1.0], "aid": [1, 2, 3]})
        b = pd.DataFrame({"x2": [1.0, -5.0, 100.0],
                          "y2": [0.0, -6.0, 100.0], "bid": [10, 20, 30]})
        got = distance_join(rd.from_pandas(a), rd.from_pandas(b),
                            d=1.0).to_pandas() \
            .sort_values(["aid", "bid"]).reset_index(drop=True)
        # (1,10) exactly at d; (2,20) at distance 1 across negative
        # cells; NULL row never matches
        assert list(zip(got["aid"], got["bid"])) == [(1, 10), (2, 20)]


@pytest.mark.usefixtures("ray_session")
class TestMergeInto:
    def test_upsert_insert_delete_vs_sql(self):
        import duckdb
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import merge_into
        base = pd.DataFrame({"k": [1, 2, 3, 4],
                             "v": ["a", "b", "c", "d"]})
        upd = pd.DataFrame({"k": [2, 5, 3],
                            "v": ["B", "E", None],
                            "is_del": [False, False, True]})
        got = merge_into(rd.from_pandas(base), rd.from_pandas(upd),
                         on="k", delete_col="is_del").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        c = duckdb.connect()
        c.register("base", base)
        c.register("upd", upd)
        want = c.sql("""
            SELECT k, v FROM base WHERE k NOT IN (SELECT k FROM upd)
            UNION ALL
            SELECT k, v FROM upd WHERE NOT is_del
            ORDER BY k""").df()
        assert got["k"].tolist() == want["k"].tolist()
        assert got["v"].tolist() == want["v"].tolist()

    def test_pure_upsert_without_delete_col(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import merge_into
        base = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
        upd = pd.DataFrame({"k": [2, 3], "v": [99, 30]})
        got = merge_into(rd.from_pandas(base), rd.from_pandas(upd),
                         on="k").to_pandas().sort_values("k")
        assert got["v"].tolist() == [10, 99, 30]


def test_no_library_module_calls_ray_init():
    """Driver contract: the driver owns the Ray session — no library
    module (or __ray_entry__) may call ray.init()/shutdown()."""
    import ast
    import pathlib
    root = pathlib.Path("/root/repo")
    files = list((root / "osm_sidewalkreator_ray").rglob("*.py"))
    files.append(root / "__ray_entry__.py")
    offenders = []
    for f in files:
        tree = ast.parse(f.read_text())
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr in ("init", "shutdown")
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id in ("ray", "_ray")):
                offenders.append(f"{f.name}:{node.lineno}")
    assert not offenders, offenders


@pytest.mark.usefixtures("ray_session")
def test_distance_join_dense_cluster_exact():
    """All points piled into one cell (worst skew): the single big
    group stays correct, pairs still exact and dup-free."""
    import duckdb
    import ray.data as rd
    from osm_sidewalkreator_ray.functions.joins import distance_join
    rng = np.random.RandomState(12)
    a = pd.DataFrame({"x": rng.uniform(0, 0.5, 300),
                      "y": rng.uniform(0, 0.5, 300),
                      "aid": range(300)})
    b = pd.DataFrame({"x2": rng.uniform(0, 0.5, 300),
                      "y2": rng.uniform(0, 0.5, 300),
                      "bid": range(300)})
    got = distance_join(rd.from_pandas(a), rd.from_pandas(b),
                        d=5.0).to_pandas()
    # every pair is within d=5 of each other in a 0.5-side box
    assert len(got) == 300 * 300
    assert not got.duplicated(["aid", "bid"]).any()


@pytest.mark.usefixtures("ray_session")
class TestWeightedSampleBy:
    def test_equals_single_process_reference(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sampling import (
            es_keys, weighted_sample_by)
        rng = np.random.RandomState(3)
        df = pd.DataFrame({"id": np.arange(3000),
                           "g": rng.randint(0, 7, 3000),
                           "w": rng.uniform(0.1, 10, 3000)})
        got = weighted_sample_by(rd.from_pandas(df).repartition(11),
                                 "g", "id", "w", n=20)
        k = es_keys(df["id"].to_numpy(), df["w"].to_numpy(), 42)
        ref = df.assign(__es=k).sort_values(["__es", "id"],
                                            kind="mergesort")
        want = (ref.groupby("g", sort=False).head(20)
                .drop(columns="__es").sort_values(["g", "id"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_group_counts_capped(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sampling import \
            weighted_sample_by
        df = pd.DataFrame({"id": np.arange(100),
                           "g": np.where(np.arange(100) < 95, 0, 1),
                           "w": np.ones(100)})
        got = weighted_sample_by(rd.from_pandas(df), "g", "id", "w",
                                 n=10)
        counts = got.groupby("g").size()
        assert counts[0] == 10 and counts[1] == 5

    def test_zero_weights_excluded_per_group(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sampling import \
            weighted_sample_by
        df = pd.DataFrame({"id": [1, 2, 3, 4],
                           "g": [0, 0, 1, 1],
                           "w": [0.0, 1.0, np.nan, 3.0]})
        got = weighted_sample_by(rd.from_pandas(df), "g", "id", "w",
                                 n=5)
        assert got["id"].tolist() == [2, 4]


@pytest.mark.usefixtures("ray_session")
class TestGroupedConvexHull:
    @staticmethod
    def _ref_hull(pts):
        from osm_sidewalkreator_ray.geom.core import convex_hull_xy
        return convex_hull_xy(pts)

    def test_distributed_equals_local(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.aggregates import \
            grouped_convex_hull
        rng = np.random.RandomState(9)
        df = pd.DataFrame({"g": rng.randint(0, 5, 4000),
                           "x": rng.normal(0, 3, 4000),
                           "y": rng.normal(0, 3, 4000)})
        got = grouped_convex_hull(rd.from_pandas(df).repartition(13),
                                  "g", "x", "y", vertices=True)
        for g, sub in df.groupby("g"):
            want = self._ref_hull(
                np.column_stack([sub["x"], sub["y"]]))
            have = got[got["g"] == g][["x", "y"]].to_numpy()
            np.testing.assert_allclose(have, want, atol=1e-12)

    def test_square_metrics(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.aggregates import \
            grouped_convex_hull
        df = pd.DataFrame({
            "g": [1] * 6 + [2] * 3,
            "x": [0, 2, 2, 0, 1, 0.5, 0, 1, 2],
            "y": [0, 0, 2, 2, 1, 1.2, 0, 1, 2]})  # g2 collinear
        got = grouped_convex_hull(rd.from_pandas(df).repartition(4),
                                  "g", "x", "y")
        r1 = got[got["g"] == 1].iloc[0]
        assert r1["n_vertices"] == 4
        assert np.isclose(r1["hull_area"], 4.0)
        assert np.isclose(r1["hull_perimeter"], 8.0)
        r2 = got[got["g"] == 2].iloc[0]
        assert r2["hull_area"] == 0.0
        assert np.isclose(r2["hull_perimeter"],
                          2 * np.sqrt(8))  # degenerate out-and-back

    def test_hull_kernel_properties(self):
        from osm_sidewalkreator_ray.geom.core import convex_hull_xy
        rng = np.random.RandomState(17)
        for _ in range(20):
            p = rng.uniform(-10, 10, size=(rng.randint(1, 300), 2))
            h = convex_hull_xy(p)
            if len(h) < 3:
                continue
            # CCW and all points inside
            x, y = p[:, 0], p[:, 1]
            for i in range(len(h)):
                a, b = h[i], h[(i + 1) % len(h)]
                cr = ((b[0] - a[0]) * (y - a[1])
                      - (b[1] - a[1]) * (x - a[0]))
                assert (cr >= -1e-9).all()
            # idempotent
            np.testing.assert_allclose(convex_hull_xy(h), h)


@pytest.mark.usefixtures("ray_session")
class TestSkewReport:
    def test_block_and_key_skew(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.stats import skew_report
        # 10k rows, one key holds 60%
        k = np.concatenate([np.zeros(6000, dtype=np.int64),
                            np.arange(1, 4001, dtype=np.int64)])
        df = pd.DataFrame({"k": k, "v": np.arange(10000)})
        rep = skew_report(rd.from_pandas(df).repartition(8), key="k")
        b = rep["blocks"].iloc[0]
        assert b["rows_total"] == 10000
        assert b["n_blocks"] == 8
        hot = rep["hot_keys"]
        assert int(hot.iloc[0]["value"]) == 0
        assert hot.iloc[0]["share"] >= 0.55
        assert hot.iloc[0]["count_low"] <= 6000 \
            <= hot.iloc[0]["count_high"]

    def test_no_key_and_empty(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.stats import skew_report
        df = pd.DataFrame({"x": np.arange(100)})
        rep = skew_report(rd.from_pandas(df))
        assert rep["hot_keys"] is None
        assert rep["blocks"].iloc[0]["rows_total"] == 100
        empty = rd.from_pandas(df).filter(lambda r: r["x"] < 0)
        rep2 = skew_report(empty)
        assert rep2["blocks"].iloc[0]["rows_total"] == 0
