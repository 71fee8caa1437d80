"""Mergeable sketches: Misra-Gries heavy hitters + merging t-digest."""

import numpy as np
import pandas as pd
import pytest

from osm_sidewalkreator_ray.functions.sketches import (
    TDigest, _mg_compress, mg_heavy_hitters, tdigest_quantiles)


def test_mg_compress_invariants():
    v = np.array(list("abcdef"), dtype=object)
    c = np.array([100, 50, 40, 3, 2, 1], dtype=np.int64)
    kv, kc, err = _mg_compress(v, c, 3)
    # survivors are the top-3 minus the 4th count; err = that count
    assert err == 3
    assert dict(zip(kv, kc)) == {"a": 97, "b": 47, "c": 37}
    # no-op when already within k
    kv2, kc2, e2 = _mg_compress(kv, kc, 8)
    assert e2 == 0 and len(kv2) == 3


@pytest.mark.usefixtures("ray_session")
def test_mg_heavy_hitters_guarantee():
    import ray.data as rd
    rng = np.random.RandomState(0)
    # zipf-ish: token_i appears ~ 5000/i times
    toks = np.concatenate([np.full(5000 // (i + 1), f"t{i}")
                           for i in range(200)])
    rng.shuffle(toks)
    ds = rd.from_pandas(pd.DataFrame({"tok": toks})).repartition(8)
    got = mg_heavy_hitters(ds, "tok", k_counters=64, topk=10)
    exact = pd.Series(toks).value_counts()
    # every true count is inside [count_low, count_high]
    for _, r in got.iterrows():
        t = int(exact[r["value"]])
        assert r["count_low"] <= t <= r["count_high"], r["value"]
    # the unambiguous heavy items all survive
    assert {"t0", "t1", "t2", "t3"} <= set(got["value"])
    assert int(got["n_total"].iloc[0]) == len(toks)


@pytest.mark.usefixtures("ray_session")
def test_mg_matches_exact_topk_on_documents():
    """On the documents corpus, MG top-5 tokens == the exact groupby
    top-5 (well-separated counts at this scale)."""
    import ray.data as rd
    from osm_sidewalkreator_ray.pipelines.textops import token_topk
    sf = "/root/testdata/sf0.01"
    exact = token_topk(sf, k=5)
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    got = mg_heavy_hitters(ds, "text", k_counters=512, topk=5,
                           split_tokens=True)
    assert list(got["value"]) == list(exact.iloc[:, 0])


def test_tdigest_accuracy_and_merge():
    rng = np.random.RandomState(1)
    x = rng.lognormal(0, 1, 200_000)
    d = TDigest.of(x)
    for q in (0.25, 0.5, 0.75, 0.95, 0.99):
        est = d.quantile(q)
        # rank error: where does the estimate land in the true CDF
        rank = (x <= est).mean()
        assert abs(rank - q) < 0.01, (q, rank)
    # mergeability: digest of halves ~= digest of the whole
    m = TDigest.of(x[:100_000]).merge(TDigest.of(x[100_000:]))
    for q in (0.5, 0.95):
        rank = (x <= m.quantile(q)).mean()
        assert abs(rank - q) < 0.01, (q, rank)
    # serialization round-trip
    r = TDigest.from_bytes(m.to_bytes())
    assert r.quantile(0.5) == m.quantile(0.5)


@pytest.mark.usefixtures("ray_session")
def test_tdigest_dataset_path():
    import ray.data as rd
    rng = np.random.RandomState(2)
    x = rng.standard_normal(50_000)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(16)
    got = tdigest_quantiles(ds, "v")
    for name, q in (("p25", .25), ("p50", .5), ("p75", .75), ("p95", .95)):
        est = got[name].iloc[0]
        rank = (x <= est).mean()
        assert abs(rank - q) < 0.015, (name, rank)


@pytest.mark.usefixtures("ray_session")
def test_tdigest_grouped():
    import ray.data as rd
    from osm_sidewalkreator_ray.functions.sketches import (
        tdigest_quantiles_by)
    rng = np.random.RandomState(3)
    # three groups with different scales
    parts = []
    for g, scale in (("a", 1.0), ("b", 10.0), ("c", 100.0)):
        parts.append(pd.DataFrame({"g": g,
                                   "v": rng.standard_normal(30_000) * scale}))
    df = pd.concat(parts, ignore_index=True).sample(
        frac=1.0, random_state=0).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(12)
    got = tdigest_quantiles_by(ds, "g", "v").set_index("g")
    for g, scale in (("a", 1.0), ("b", 10.0), ("c", 100.0)):
        sub = df.loc[df["g"] == g, "v"].to_numpy()
        for name, q in (("p50", 0.5), ("p95", 0.95)):
            est = got.loc[g, name]
            rank = (sub <= est).mean()
            assert abs(rank - q) < 0.015, (g, name, rank)


@pytest.mark.usefixtures("ray_session")
def test_mg_heavy_hitters_grouped():
    import ray.data as rd
    from osm_sidewalkreator_ray.functions.sketches import (
        mg_heavy_hitters_by)
    rng = np.random.RandomState(9)
    rows = []
    for g in ("en", "de"):
        # per-group head token carries 40% of that group's rows
        toks = np.where(rng.rand(8000) < 0.4, f"{g}_head",
                        np.array([f"{g}_t{i}" for i in
                                  rng.randint(0, 300, 8000)]))
        rows.append(pd.DataFrame({"lang": g, "tok": toks}))
    df = pd.concat(rows, ignore_index=True).sample(
        frac=1.0, random_state=1).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(8)
    got = mg_heavy_hitters_by(ds, "lang", "tok", k_counters=64, topk=3)
    for g in ("en", "de"):
        sub = got[got["lang"] == g]
        assert sub["value"].iloc[0] == f"{g}_head"
        true = int((df.loc[df["lang"] == g, "tok"] == f"{g}_head").sum())
        assert sub["count_low"].iloc[0] <= true <= sub["count_high"].iloc[0]


@pytest.mark.usefixtures("ray_session")
class TestExactQuantile:
    def test_matches_duckdb_quantile_cont(self):
        import duckdb
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sketches import \
            exact_quantile
        sf = "/root/testdata/sf0.01"
        ds = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_extendedprice"])
        con = duckdb.connect()
        for q in (0.5, 0.9, 0.01, 1.0, 0.0):
            got = exact_quantile(ds, "l_extendedprice", q,
                                 max_collect=512)
            want = con.sql(
                f"SELECT quantile_cont(l_extendedprice, {q}) FROM "
                f"'{sf}/lineitem.parquet'").fetchone()[0]
            assert abs(got - want) < 1e-9, (q, got, want)

    def test_massive_ties(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sketches import \
            exact_quantile
        df = pd.DataFrame({"x": np.concatenate(
            [np.full(50_000, 7.0), np.array([1.0, 2.0, 100.0])])})
        got = exact_quantile(rd.from_pandas(df), "x", 0.5,
                             max_collect=64)
        assert got == 7.0

    def test_nan_ignored(self):
        import duckdb
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sketches import \
            exact_quantile
        rng = np.random.RandomState(9)
        x = rng.normal(size=20_000)
        x[::7] = np.nan
        df = pd.DataFrame({"x": x})
        got = exact_quantile(rd.from_pandas(df), "x", 0.25,
                             max_collect=256)
        c = duckdb.connect()
        c.register("t", df)
        want = c.sql("SELECT quantile_cont(x, 0.25) FROM t "
                     "WHERE NOT isnan(x)").fetchone()[0]
        assert abs(got - want) < 1e-12


@pytest.mark.usefixtures("ray_session")
class TestCountMin:
    def test_never_undercounts_and_bounded_overcount(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sketches import \
            count_min, cm_estimate
        rng = np.random.RandomState(6)
        keys = rng.zipf(1.3, 200_000).astype(np.int64) % 10_000
        ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
        sk = count_min(ds, "k", width=16384, depth=5)
        true = pd.Series(keys).value_counts()
        probe = true.index.to_numpy()[:500]
        est = cm_estimate(sk, probe)
        tr = true.loc[probe].to_numpy()
        assert (est >= tr).all()          # CM never undercounts
        # eps ~ e/width -> overcount <= ~3 * e*N/width w.h.p.
        bound = 3 * np.e * len(keys) / 16384
        assert (est - tr).max() <= bound

    def test_merge_equals_single_pass(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sketches import count_min
        df = pd.DataFrame({"k": np.arange(50_000) % 1000})
        one = count_min(rd.from_pandas(df).repartition(1), "k")
        many = count_min(rd.from_pandas(df).repartition(16), "k")
        assert np.array_equal(one, many)


@pytest.mark.usefixtures("ray_session")
class TestCorpusJSDivergence:
    @staticmethod
    def _ref_js(df, a, b):
        import numpy as np

        def dist(side):
            vc = (df.loc[df["lang"] == side, "text"].str.split()
                  .explode().dropna().value_counts())
            return vc / vc.sum()

        p, q = dist(a), dist(b)
        vocab = p.index.union(q.index)
        pv = p.reindex(vocab, fill_value=0.0).to_numpy()
        qv = q.reindex(vocab, fill_value=0.0).to_numpy()
        m = 0.5 * (pv + qv)
        with np.errstate(divide="ignore", invalid="ignore"):
            js = (0.5 * np.where(pv > 0, pv * np.log2(pv / m), 0)
                  + 0.5 * np.where(qv > 0, qv * np.log2(qv / m), 0))
        return float(js.sum())

    def test_matches_local_reference(self):
        import pyarrow.parquet as pq
        from osm_sidewalkreator_ray.pipelines.textops import \
            corpus_js_divergence
        sf = "/root/testdata/sf0.001"
        df = pq.read_table(f"{sf}/documents.parquet",
                           columns=["text", "lang"]).to_pandas()
        got = corpus_js_divergence(sf)
        assert np.isclose(got["js_bits"][0],
                          self._ref_js(df, "en", "es"), atol=1e-6)
        assert got["tokens_a"][0] == \
            df.loc[df["lang"] == "en", "text"].str.split().explode() \
            .dropna().size

    def test_identical_is_zero_disjoint_is_one(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines.textops import \
            corpus_js_divergence_ds
        same = pd.DataFrame({
            "text": ["x y z", "x y"] * 2,
            "lang": ["en", "en", "es", "es"]})
        got = corpus_js_divergence_ds(rd.from_pandas(same))
        assert got["js_bits"][0] == 0.0
        disj = pd.DataFrame({
            "text": ["a b c", "d e f"],
            "lang": ["en", "es"]})
        got = corpus_js_divergence_ds(rd.from_pandas(disj))
        assert np.isclose(got["js_bits"][0], 1.0)

    def test_empty_side_raises(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines.textops import \
            corpus_js_divergence_ds
        df = pd.DataFrame({"text": ["a b"], "lang": ["en"]})
        with pytest.raises(ValueError):
            corpus_js_divergence_ds(rd.from_pandas(df))


@pytest.mark.usefixtures("ray_session")
class TestQuantileHistogram:
    def test_equals_selection_path(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sketches import (
            exact_quantile, exact_quantile_histogram)
        ds = rd.read_parquet(
            "/root/testdata/sf0.001/lineitem.parquet",
            columns=["l_extendedprice"])
        for q in (0.1, 0.5, 0.9):
            a = exact_quantile_histogram(ds, "l_extendedprice",
                                         [q])[0]
            b = exact_quantile(ds, "l_extendedprice", q)
            assert np.isclose(a, b), (q, a, b)

    def test_nan_and_cap(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.sketches import \
            exact_quantile_histogram
        df = pd.DataFrame({"v": [1.0, np.nan, 2.0, 3.0, np.nan]})
        got = exact_quantile_histogram(rd.from_pandas(df), "v",
                                       [0.5])[0]
        assert got == 2.0
        with pytest.raises(ValueError):
            exact_quantile_histogram(
                rd.from_pandas(pd.DataFrame(
                    {"v": np.arange(100.0)})), "v", [0.5],
                max_distinct=10)


@pytest.mark.usefixtures("ray_session")
class TestHLLSetOps:
    def test_union_intersection_estimates(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.aggregates import (
            hll_intersection_count, hll_sketch, hll_union_count)
        a_vals = np.arange(0, 60000, dtype=np.int64)
        b_vals = np.arange(40000, 100000, dtype=np.int64)
        sa = hll_sketch(rd.from_pandas(pd.DataFrame({"v": a_vals}))
                        .repartition(4), "v")
        sb = hll_sketch(rd.from_pandas(pd.DataFrame({"v": b_vals})),
                        "v")
        u = hll_union_count(sa, sb)
        i = hll_intersection_count(sa, sb)
        assert abs(u - 100000) / 100000 < 0.05
        assert abs(i - 20000) / 20000 < 0.25  # compounded error band
        # disjoint sets: intersection clamps near zero
        sc = hll_sketch(rd.from_pandas(pd.DataFrame(
            {"v": np.arange(200000, 260000, dtype=np.int64)})), "v")
        assert hll_intersection_count(sa, sc) < 6000


@pytest.mark.usefixtures("ray_session")
def test_exact_quantile_straddle_pivot_fractional_h():
    """Regression: a pivot landing BETWEEN the two interpolation order
    statistics (fractional h; rows-below == k_hi) used to narrow the
    bracket past the upper statistic and crash at the collect step."""
    import ray.data as rd
    from osm_sidewalkreator_ray.functions.sketches import exact_quantile

    rng = np.random.RandomState(0)
    for n, q in [(200, 0.5), (1000, 0.25), (1000, 0.99)]:
        v = rng.permutation(np.arange(n, dtype=np.float64))
        ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(8)
        # tiny max_collect forces the bisection path at any n
        got = exact_quantile(ds, "x", q, max_collect=10)
        assert got == pytest.approx(float(np.quantile(v, q)), abs=1e-9)
    # massive ties still resolve via the collapsed-bracket branch
    v = np.repeat([1.0, 2.0, 2.0, 3.0], 500)
    ds = rd.from_pandas(
        pd.DataFrame({"x": rng.permutation(v)})).repartition(8)
    assert exact_quantile(ds, "x", 0.5, max_collect=10) == 2.0
