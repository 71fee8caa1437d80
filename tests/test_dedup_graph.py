"""Exact n-gram Jaccard dedup + connected-components decisions.

Brute-force oracles computed in-process on sf0.001/sf0.01 documents.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def _brute_jaccard_pairs(sf_dir, threshold=0.5, k=3):
    import pyarrow.parquet as pq
    from osm_sidewalkreator_ray.pipelines.textops import (_shingle_hashes,
                                                          _tokens)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    sh = {int(d): _shingle_hashes(_tokens(s), k)
          for d, s in zip(t["doc_id"], t["text"])}
    ids = sorted(sh)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sh[a], sh[b]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                rows.append((a, b, round(jac, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]) \
        if rows else pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                   "doc_b": pd.Series([], dtype="int64"),
                                   "jaccard": pd.Series([], dtype="float64")})


@pytest.mark.usefixtures("ray_session")
class TestNgramJaccard:
    def test_matches_brute_force(self):
        from osm_sidewalkreator_ray.pipelines import textops as T
        got = T.ngram_jaccard_pairs(SF_SMALL)
        want = _brute_jaccard_pairs(SF_SMALL).sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"doc_a": "int64", "doc_b": "int64"}), want,
            check_dtype=False)

    def test_superset_of_minhash(self):
        # exact all-pairs Jaccard must contain every LSH-found pair
        from osm_sidewalkreator_ray.pipelines import textops as T
        exact = T.ngram_jaccard_pairs(SF)
        lsh = T.minhash_dedup_pairs(SF)
        ek = set(zip(exact["doc_a"], exact["doc_b"]))
        lk = set(zip(lsh["doc_a"], lsh["doc_b"]))
        assert lk <= ek
        assert len(exact) > 0


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_chain_propagates(self):
        # a-b, b-c, c-d chain (no shortcut edges) + isolated pair
        from osm_sidewalkreator_ray.functions.graph import \
            connected_components
        edges = pd.DataFrame({"src": [10, 20, 30, 70],
                              "dst": [20, 30, 40, 80]})
        df = connected_components(edges)
        comp = dict(zip(df["vertex"], df["component"]))
        assert comp == {10: 10, 20: 10, 30: 10, 40: 10, 70: 70, 80: 70}

    def test_empty_edges(self):
        from osm_sidewalkreator_ray.functions.graph import \
            connected_components
        df = connected_components(
            pd.DataFrame({"src": pd.Series([], dtype="int64"),
                          "dst": pd.Series([], dtype="int64")}))
        assert len(df) == 0

    def test_near_dup_components(self):
        from osm_sidewalkreator_ray.pipelines import textops as T
        comp = T.near_dup_components(SF)
        pairs = T.ngram_jaccard_pairs(SF)  # the oracled pair source
        # every doc in a pair gets a component row
        docs = set(pairs["doc_a"]) | set(pairs["doc_b"])
        assert set(comp["doc_id"]) == docs
        # exactly one keeper per component, and it's the min doc_id
        for c, sub in comp.groupby("component"):
            assert sub["keep"].sum() == 1
            assert sub.loc[sub["keep"], "doc_id"].iloc[0] == sub["doc_id"].min()
        # paired docs always share a component
        cmap = dict(zip(comp["doc_id"], comp["component"]))
        for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
            assert cmap[a] == cmap[b]
        # minhash pairs (same threshold, exact-Jaccard verified) are a
        # subset of the exact pairs, so they never cross components
        mh = T.minhash_dedup_pairs(SF)
        for a, b in zip(mh["doc_a"], mh["doc_b"]):
            assert cmap[a] == cmap[b]

    def test_prefix_filter_equals_full_index(self):
        """ppjoin-style prefix filtering is LOSSLESS: identical pair
        set + jaccards as the full inverted-index exact variant."""
        from osm_sidewalkreator_ray.pipelines import textops as T
        full = T.ngram_jaccard_pairs_fullindex(SF).reset_index(drop=True)
        pref = T.ngram_jaccard_pairs(SF).reset_index(drop=True)
        pd.testing.assert_frame_equal(pref, full)

    def test_near_dup_components_matches_sql_oracle(self):
        """The full decision chain (pairs -> components -> keep) vs the
        DuckDB recursive-closure oracle."""
        import duckdb
        from osm_sidewalkreator_ray.pipelines import textops as T
        got = T.near_dup_components(SF).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        want = con.execute(T.NEAR_DUP_COMPONENTS_SQL).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["component"].tolist() == want["component"].tolist()
        assert got["keep"].tolist() == want["keep"].tolist()

    def test_nonconvergence_raises(self):
        """ADVICE r2: a component whose diameter exceeds max_iters must
        fail loud, not silently split into several components."""
        from osm_sidewalkreator_ray.functions.graph import \
            connected_components
        chain = pd.DataFrame({"src": list(range(0, 12)),
                              "dst": list(range(1, 13))})
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iters=3)
        # and with enough rounds the same chain is one component
        df = connected_components(chain, max_iters=20)
        assert set(df["component"]) == {0}


@pytest.mark.usefixtures("ray_session")
class TestSimhashNearDups:
    def test_exact_recall_vs_bruteforce(self):
        """The banded plan must return EXACTLY the brute-force
        hamming<=3 pair set (pigeonhole recall guarantee, 4x16-bit
        bands)."""
        import numpy as np
        from osm_sidewalkreator_ray.pipelines import textops as T
        got = T.simhash_near_dups(SF, max_hamming=3)
        fp = T.simhash_fingerprints(SF)
        sims = fp["simhash"].to_numpy().view(np.uint64)
        ids = fp["doc_id"].to_numpy()
        x = sims[:, None] ^ sims[None, :]
        ham = T._popcount64(x)
        iu = np.triu_indices(len(ids), 1)
        want = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])),
                 int(ham[i, j]))
                for i, j in zip(*iu) if ham[i, j] <= 3}
        have = {(int(a), int(b), int(h)) for a, b, h in
                zip(got["doc_a"], got["doc_b"], got["hamming"])}
        assert have == want
        assert len(want) > 0  # non-trivial on the synthetic corpus

    def test_planted_near_dup(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from osm_sidewalkreator_ray.pipelines import textops as T
        d = tmp_path / "sf"
        d.mkdir()
        base = "the quick brown fox jumps over the lazy dog " * 20
        near = base.replace("lazy", "sleepy", 1)
        far = "completely different text about databases and rays"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, near, far], pa.string())}),
            str(d / "documents.parquet"))
        got = T.simhash_near_dups(str(d), max_hamming=8, bands=16)
        assert (1, 2) in set(zip(got["doc_a"], got["doc_b"]))
        assert 3 not in set(got["doc_a"]) | set(got["doc_b"])


@pytest.mark.usefixtures("ray_session")
class TestSimhashEdgeCases:
    def test_trailing_empty_doc_regression(self, tmp_path):
        """An empty doc at batch END must not truncate the previous
        doc's token range (reduceat boundary clamp regression)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from osm_sidewalkreator_ray.pipelines import textops as T
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hello world foo", ""], pa.string())}),
            str(d / "documents.parquet"))
        got = T.simhash_fingerprints(str(d))
        d2 = tmp_path / "sf2"
        d2.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["hello world foo"], pa.string())}),
            str(d2 / "documents.parquet"))
        alone = T.simhash_fingerprints(str(d2))
        assert got.loc[got["doc_id"] == 0, "simhash"].iloc[0] == \
            alone["simhash"].iloc[0]
        assert got.loc[got["doc_id"] == 1, "simhash"].iloc[0] == 0


def test_geojson_reader_robustness(tmp_path):
    import json as _json
    from osm_sidewalkreator_ray.sources.geojson import read_streets_geojson
    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "LineString",
                      "coordinates": [[0.0, 0.0], [0.001, 0.0]]},
         "properties": {"way_id": None, "highway": "residential",
                        "width": 2.5}},  # null id + numeric width
        {"type": "Feature", "geometry": {"type": "Point",
                                         "coordinates": [0, 0]},
         "properties": {}},
    ]}
    t = read_streets_geojson(_json.dumps(gj))
    assert t.num_rows == 1
    assert t["width"][0].as_py() == "2.5"
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        read_streets_geojson(str(tmp_path / "nope.geojson"))


@pytest.mark.usefixtures("ray_session")
def test_sample_documents():
    from osm_sidewalkreator_ray.pipelines import textops as T
    s1 = T.sample_documents(SF, n=50)
    s2 = T.sample_documents(SF, n=50)
    pd.testing.assert_frame_equal(s1, s2)  # deterministic
    assert len(s1) == 50 and s1["doc_id"].is_unique
    s3 = T.sample_documents(SF, n=50, seed=7)
    # a different seed draws a (almost surely) different sample
    assert set(s3["doc_id"]) != set(s1["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_matches_duckdb():
    import duckdb
    from osm_sidewalkreator_ray.pipelines import textops as T
    got = T.stratified_sample(SF)  # 20 per lang
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(T.STRATIFIED_SAMPLE_SQL).df()
    pd.testing.assert_frame_equal(got, want)
    assert (got.groupby("lang").size() == 20).all()
    # deterministic through the distributed partial-top-n path
    pd.testing.assert_frame_equal(got, T.stratified_sample(SF))


@pytest.mark.usefixtures("ray_session")
def test_grouped_length_quantiles_matches_duckdb():
    import duckdb
    from osm_sidewalkreator_ray.pipelines import textops as T
    got = T.grouped_length_quantiles(SF)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(T.GROUPED_LENGTH_QUANTILES_SQL).df()
    got["n_docs"] = got["n_docs"].astype(want["n_docs"].dtype)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_incremental_exact_dedup():
    """New-batch dedup vs an existing corpus: dups dropped, fresh docs
    kept, bloom false positives exactly confirmed, result equals the
    naive recompute."""
    import ray.data as rd
    from osm_sidewalkreator_ray.pipelines.textops import (
        incremental_exact_dedup)

    existing = pd.DataFrame({
        "doc_id": np.arange(1000, dtype=np.int64),
        "text": [f"existing document number {i}" for i in range(1000)]})
    new = pd.DataFrame({
        "doc_id": np.arange(5000, 5300, dtype=np.int64),
        "text": (
            # 100 exact dups of existing docs
            [f"existing document number {i}" for i in range(100)]
            # 180 genuinely new
            + [f"fresh document {i}" for i in range(180)]
            # 20 new docs duplicated within the batch (10 distinct)
            + [f"fresh dup {i % 10}" for i in range(20)])})

    got = incremental_exact_dedup(
        rd.from_pandas(existing).repartition(4),
        rd.from_pandas(new).repartition(4))
    # naive recompute: new texts not in existing, first doc_id per text
    seen = set(existing["text"])
    expect = (new[~new["text"].isin(seen)]
              .sort_values("doc_id").groupby("text", sort=False).head(1))
    assert set(got["doc_id"]) == set(expect["doc_id"])
    assert len(got) == 190  # 180 fresh + 10 distinct in-batch


class TestStreamingScorerForms:
    """The per-doc scorers' library forms return lazy Datasets a 100 TB
    pipeline can compose; the collecting query wrappers match them."""

    def test_ds_forms_are_datasets_and_match(self):
        import ray.data as rd
        from ray.data import Dataset
        from osm_sidewalkreator_ray.pipelines import textops as T
        SF = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
        pairs = [
            (T.doc_quality_ds(docs), T.doc_quality(SF)),
            (T.doc_fingerprint_ds(docs), T.doc_fingerprint(SF)),
            (T.lang_id_ds(docs), T.lang_id(SF)),
            (T.doc_token_counts_ds(docs), T.doc_token_counts(SF)),
            (T.exact_dedup_ds(docs), T.exact_dedup(SF)),
            (T.corpus_clean_ds(docs), T.corpus_clean(SF)),
        ]
        for ds, want in pairs:
            assert isinstance(ds, Dataset)  # lazy, composable
            got = (ds.to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got[sorted(got.columns)], want[sorted(want.columns)])

    def test_graph_ds_forms_are_datasets_and_match(self):
        """Per-vertex graph outputs are corpus-sized at 100 TB (one
        row per doc/host), so the library exposes Dataset forms that
        compose into the next stage; wrappers must agree exactly."""
        from ray.data import Dataset
        from osm_sidewalkreator_ray.functions.graph import (
            connected_components, connected_components_ds, pagerank,
            pagerank_ds)
        edges = pd.DataFrame({"src": [1, 2, 5, 9, 9],
                              "dst": [2, 3, 6, 1, 9]})
        cds = connected_components_ds(edges)
        assert isinstance(cds, Dataset)
        got = (cds.to_pandas().sort_values("vertex")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, connected_components(edges))
        pds = pagerank_ds(edges, iters=5)
        assert isinstance(pds, Dataset)
        got = (pds.to_pandas().sort_values("vertex")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, pagerank(edges, iters=5))


@pytest.mark.usefixtures("ray_session")
class TestPageRank:
    @staticmethod
    def _local_pagerank(edges, d=0.85, iters=20):
        import numpy as np
        src = np.array([e[0] for e in edges])
        dst = np.array([e[1] for e in edges])
        verts = np.unique(np.concatenate([src, dst]))
        idx = {v: i for i, v in enumerate(verts)}
        n = len(verts)
        deg = np.zeros(n)
        for s in src:
            deg[idx[s]] += 1
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            contrib = np.zeros(n)
            for s, t in edges:
                contrib[idx[t]] += r[idx[s]] / deg[idx[s]]
            dangling = r[deg == 0].sum()
            r = (1 - d) / n + d * (contrib + dangling / n)
        return verts, r

    def _check(self, edges, iters=20):
        import pandas as pd
        from osm_sidewalkreator_ray.functions.graph import pagerank
        got = pagerank(pd.DataFrame(edges, columns=["src", "dst"]),
                       iters=iters)
        verts, want = self._local_pagerank(edges, iters=iters)
        assert got["vertex"].tolist() == list(verts)
        assert np.allclose(got["rank"].to_numpy(), want, atol=1e-12)
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_star_with_dangling(self):
        # hub -> leaves; leaves dangle (no out-edges)
        self._check([(0, 1), (0, 2), (0, 3)])

    def test_cycle_uniform(self):
        import pandas as pd
        from osm_sidewalkreator_ray.functions.graph import pagerank
        edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
        got = pagerank(pd.DataFrame(edges, columns=["src", "dst"]))
        assert np.allclose(got["rank"], 0.25, atol=1e-12)

    def test_multigraph_and_authority(self):
        # many pages linking one target; parallel edges count per-edge
        edges = [(i, 99) for i in range(10)] + [(99, 0), (3, 4), (3, 4)]
        self._check(edges)

    def test_matches_reference_random_digraph(self):
        rng = np.random.RandomState(7)
        edges = [(int(a), int(b)) for a, b in
                 rng.randint(0, 40, size=(300, 2)) if a != b]
        self._check(edges, iters=15)


@pytest.mark.usefixtures("ray_session")
class TestTriangleCount:
    @staticmethod
    def _oracle(edges) -> int:
        # DuckDB 3-way self-join on canonical (u<v, distinct) edges
        import duckdb
        df = pd.DataFrame(edges, columns=["src", "dst"])
        c = duckdb.connect()
        c.register("raw", df)
        return c.sql("""
            WITH e AS (SELECT DISTINCT LEAST(src, dst) u,
                                       GREATEST(src, dst) v
                       FROM raw WHERE src <> dst)
            SELECT COUNT(*) FROM e a
            JOIN e b ON b.u = a.u AND b.v > a.v
            JOIN e c ON c.u = a.v AND c.v = b.v
        """).fetchone()[0]

    def _check(self, edges):
        from osm_sidewalkreator_ray.functions.graph import triangle_count
        got = triangle_count(pd.DataFrame(edges,
                                          columns=["src", "dst"]))
        assert got == self._oracle(edges), edges[:10]

    def test_k4_has_four(self):
        self._check([(a, b) for a in range(4) for b in range(4) if a < b])

    def test_hub_star_no_triangles(self):
        self._check([(0, i) for i in range(1, 30)])

    def test_duplicates_reverses_selfloops(self):
        self._check([(1, 2), (2, 1), (1, 2), (2, 3), (1, 3),
                     (3, 3), (4, 5)])

    def test_random_graph_matches_sql(self):
        rng = np.random.RandomState(11)
        edges = [(int(a), int(b)) for a, b in
                 rng.randint(0, 60, size=(500, 2))]
        self._check(edges)

    def test_hub_plus_rim(self):
        # hub connected to all rim vertices + rim cycle: n triangles
        n = 20
        edges = [(100, i) for i in range(n)] + \
            [(i, (i + 1) % n) for i in range(n)]
        self._check(edges)


@pytest.mark.usefixtures("ray_session")
class TestStarComponents:
    def test_equals_minlabel_random(self):
        from osm_sidewalkreator_ray.functions.graph import \
            connected_components, connected_components_star
        rng = np.random.RandomState(13)
        edges = pd.DataFrame(rng.randint(0, 80, size=(120, 2)),
                             columns=["src", "dst"])
        a = connected_components(edges)
        b = connected_components_star(edges)
        pd.testing.assert_frame_equal(a, b)

    def test_long_chain_beyond_minlabel_budget(self):
        # a 300-node path: min-label needs 300 rounds (raises at its
        # default 50); star contraction converges in O(log n)
        from osm_sidewalkreator_ray.functions.graph import \
            connected_components, connected_components_star
        edges = pd.DataFrame({"src": range(299),
                              "dst": range(1, 300)})
        with pytest.raises(RuntimeError):
            connected_components(edges, max_iters=20)
        got = connected_components_star(edges)
        assert len(got) == 300
        assert (got["component"] == 0).all()

    def test_two_components_and_selfloops(self):
        from osm_sidewalkreator_ray.functions.graph import \
            connected_components_star
        edges = pd.DataFrame({"src": [5, 6, 10, 11, 7, 3],
                              "dst": [6, 7, 11, 12, 5, 3]})
        got = connected_components_star(edges)
        comp = dict(zip(got["vertex"], got["component"]))
        assert comp[5] == comp[6] == comp[7] == 5
        assert comp[10] == comp[11] == comp[12] == 10
        assert comp[3] == 3  # self-loop-only vertex is its own comp


@pytest.mark.usefixtures("ray_session")
class TestWeightedPersonalizedPageRank:
    @staticmethod
    def _local(edges, weights=None, pers=None, d=0.85, iters=20):
        src = np.array([e[0] for e in edges])
        dst = np.array([e[1] for e in edges])
        w = (np.asarray(weights, dtype=float) if weights is not None
             else np.ones(len(edges)))
        verts = np.unique(np.concatenate([src, dst]))
        idx = {v: i for i, v in enumerate(verts)}
        n = len(verts)
        wout = np.zeros(n)
        for s, ww in zip(src, w):
            wout[idx[s]] += ww
        if pers:
            tot = sum(pers.values())
            base = np.array([pers.get(int(v), 0.0) / tot
                             for v in verts])
        else:
            base = np.full(n, 1.0 / n)
        r = base.copy()
        for _ in range(iters):
            contrib = np.zeros(n)
            for (s, t), ww in zip(edges, w):
                contrib[idx[t]] += r[idx[s]] * ww / wout[idx[s]]
            dangling = r[wout == 0].sum()
            r = (1 - d) * base + d * (contrib + dangling * base)
        return verts, r

    def test_weighted_matches_reference(self):
        from osm_sidewalkreator_ray.functions.graph import pagerank
        rng = np.random.RandomState(21)
        edges = [(int(a), int(b)) for a, b in
                 rng.randint(0, 30, size=(150, 2)) if a != b]
        w = rng.uniform(0.1, 5.0, len(edges))
        df = pd.DataFrame(edges, columns=["src", "dst"])
        df["w"] = w
        import ray.data as rd
        got = pagerank(rd.from_pandas(df), iters=6, weight_col="w")
        verts, want = self._local(edges, weights=w, iters=6)
        assert got["vertex"].tolist() == list(verts)
        assert np.allclose(got["rank"], want, atol=1e-12)

    def test_personalized_restarts_on_seeds(self):
        from osm_sidewalkreator_ray.functions.graph import pagerank
        rng = np.random.RandomState(22)
        edges = [(int(a), int(b)) for a, b in
                 rng.randint(0, 40, size=(200, 2)) if a != b]
        pers = {0: 1.0, 1: 3.0}
        got = pagerank(pd.DataFrame(edges, columns=["src", "dst"]),
                       iters=6, personalization=pers)
        verts, want = self._local(edges, pers=pers, iters=6)
        assert got["vertex"].tolist() == list(verts)
        assert np.allclose(got["rank"], want, atol=1e-12)
        # mass concentrated near the seeds vs the uniform variant
        uni = pagerank(pd.DataFrame(edges, columns=["src", "dst"]),
                       iters=6)
        g = dict(zip(got["vertex"], got["rank"]))
        u = dict(zip(uni["vertex"], uni["rank"]))
        assert g[1] > u[1]

    def test_unweighted_unchanged(self):
        # the weight generalization must not perturb the plain op
        from osm_sidewalkreator_ray.functions.graph import pagerank
        edges = pd.DataFrame({"src": [0, 0, 0], "dst": [1, 2, 3]})
        got = pagerank(edges, iters=10)
        base = self._local([(0, 1), (0, 2), (0, 3)], iters=10)[1]
        assert np.allclose(got["rank"], base, atol=1e-12)


@pytest.mark.usefixtures("ray_session")
class TestIncrementalMinhash:
    def test_equals_full_run_filtered_to_new(self):
        """Splitting the corpus into existing/new and running the
        incremental op must yield EXACTLY the full run's verified
        pairs restricted to >=1 new side (shared signature + banding
        kernels; pruning only drops existing-existing candidates)."""
        import pandas as pd
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines import textops as T
        full = T.minhash_dedup_pairs(SF)
        docs = rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        existing = docs.map_batches(lambda b: b[b["doc_id"] % 5 != 0],
                                    batch_format="pandas")
        new = docs.map_batches(lambda b: b[b["doc_id"] % 5 == 0],
                               batch_format="pandas")
        inc = T.incremental_minhash_pairs(existing, new)
        is_new_a = (full["doc_a"] % 5 == 0)
        is_new_b = (full["doc_b"] % 5 == 0)
        want = (full[is_new_a | is_new_b]
                .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(inc, want)
        # and some existing-existing pairs were actually pruned away
        assert len(want) < len(full)

    def test_precomputed_signature_passthrough(self):
        import pandas as pd
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines import textops as T
        docs = rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        existing = docs.map_batches(lambda b: b[b["doc_id"] % 5 != 0],
                                    batch_format="pandas")
        new = docs.map_batches(lambda b: b[b["doc_id"] % 5 == 0],
                               batch_format="pandas")
        import functools
        sig_ex = existing.map_batches(
            functools.partial(T._minhash_batch, num_perm=64, k=3, seed=42),
            batch_format="pandas")
        via_sigs = T.incremental_minhash_pairs(sig_ex, new)
        via_text = T.incremental_minhash_pairs(existing, new)
        pd.testing.assert_frame_equal(via_sigs, via_text)

    def test_signature_scheme_mismatch_raises(self):
        # stored sip-built signatures fed to an md5-default run must
        # raise, not silently find zero pairs (the thash marker)
        import functools
        import pytest as _pt
        import ray
        from osm_sidewalkreator_ray.pipelines import textops as T
        docs = T._read_docs(SF, ["doc_id", "text"])
        existing = docs.map_batches(lambda b: b[b["doc_id"] % 5 != 0],
                                    batch_format="pandas")
        new = docs.map_batches(lambda b: b[b["doc_id"] % 5 == 0],
                               batch_format="pandas")
        sig_sip = existing.map_batches(
            functools.partial(T._minhash_batch, num_perm=64, k=3,
                              seed=42, token_hash="sip"),
            batch_format="pandas")
        with _pt.raises((ValueError, ray.exceptions.RayTaskError)):
            T.incremental_minhash_pairs(sig_sip, new)

    def test_disjoint_batches_no_pairs(self):
        import pandas as pd
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines import textops as T
        existing = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["alpha beta gamma delta epsilon",
                                        "one two three four five six"]}))
        new = rd.from_pandas(pd.DataFrame(
            {"doc_id": [10], "text": ["totally different words here now"]}))
        out = T.incremental_minhash_pairs(existing, new)
        assert out.empty


class TestKCore:
    @staticmethod
    def _ref_k_core(edges, k):
        """Local peeling reference: repeatedly drop deg<k vertices."""
        adj = {}
        for u, v in edges:
            if u == v:
                continue
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        changed = True
        while changed:
            changed = False
            for v in [v for v, nb in adj.items() if len(nb) < k]:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
        return sorted(adj)

    def test_triangle_with_tail(self):
        from osm_sidewalkreator_ray.functions.graph import k_core
        # triangle 1-2-3 plus a tail 3-4-5: 2-core = the triangle
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
        got = k_core(pd.DataFrame(edges, columns=["src", "dst"]), k=2)
        assert got["vertex"].tolist() == [1, 2, 3]

    def test_matches_reference_random(self):
        from osm_sidewalkreator_ray.functions.graph import k_core
        rng = np.random.default_rng(7)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 60, size=(400, 2))]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        for k in (2, 3, 5):
            got = k_core(df, k=k, num_buckets=8)
            assert got["vertex"].tolist() == self._ref_k_core(edges, k)

    def test_everything_peels(self):
        from osm_sidewalkreator_ray.functions.graph import k_core
        # a path has no 2-core
        edges = [(i, i + 1) for i in range(10)]
        got = k_core(pd.DataFrame(edges, columns=["src", "dst"]), k=2)
        assert len(got) == 0
        assert got["vertex"].dtype == np.int64

    def test_multiedges_and_selfloops_ignored(self):
        from osm_sidewalkreator_ray.functions.graph import k_core
        # duplicate parallel edges must NOT inflate degree
        edges = [(1, 2), (1, 2), (2, 1), (1, 1), (2, 2)]
        got = k_core(pd.DataFrame(edges, columns=["src", "dst"]), k=2)
        assert len(got) == 0


class TestBfsHops:
    @staticmethod
    def _ref_bfs(edges, sources):
        from collections import deque
        adj = {}
        verts = set()
        for u, v in edges:
            verts.update((u, v))
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        dist = {s: 0 for s in sources if s in verts}
        q = deque(dist)
        while q:
            u = q.popleft()
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return {v: dist.get(v, -1) for v in verts}

    def test_chain(self):
        from osm_sidewalkreator_ray.functions.graph import bfs_hops
        edges = [(i, i + 1) for i in range(6)]
        got = bfs_hops(pd.DataFrame(edges, columns=["src", "dst"]), [0])
        assert dict(zip(got["vertex"], got["hops"])) == {
            i: i for i in range(7)}

    def test_multi_source_and_unreachable(self):
        from osm_sidewalkreator_ray.functions.graph import bfs_hops
        edges = [(0, 1), (1, 2), (10, 11)]
        got = bfs_hops(pd.DataFrame(edges, columns=["src", "dst"]),
                       [0, 2])
        m = dict(zip(got["vertex"], got["hops"]))
        assert m == {0: 0, 1: 1, 2: 0, 10: -1, 11: -1}

    def test_matches_reference_random(self):
        from osm_sidewalkreator_ray.functions.graph import bfs_hops
        rng = np.random.default_rng(11)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 80, size=(150, 2)) if a != b]
        sources = [0, 5]
        got = bfs_hops(pd.DataFrame(edges, columns=["src", "dst"]),
                       sources, num_buckets=8)
        assert dict(zip(got["vertex"], got["hops"])) == \
            self._ref_bfs(edges, sources)


class TestRandomWalks:
    @staticmethod
    def _ref_walks(edges, walk_len, wpv, seed):
        from osm_sidewalkreator_ray.functions.graph import \
            _walk_choice_hash
        adj = {}
        for u, v in edges:
            adj.setdefault(u, []).append(v)
        for u in adj:
            adj[u].sort()
        rows = []
        for v in sorted(adj):
            for r in range(wpv):
                w = v * wpv + r
                cur = v
                rows.append((w, 0, cur))
                for step in range(1, walk_len + 1):
                    nb = adj.get(cur)
                    if not nb:
                        break
                    h = _walk_choice_hash(
                        np.array([w], dtype=np.int64), step, 42)[0]
                    cur = nb[int(h % np.uint64(len(nb)))]
                    rows.append((w, step, cur))
        return pd.DataFrame(rows,
                            columns=["walk_id", "step", "vertex"])

    def test_matches_reference_random_digraph(self):
        from osm_sidewalkreator_ray.functions.graph import random_walks
        rng = np.random.default_rng(3)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 40, size=(200, 2))]
        got = random_walks(pd.DataFrame(edges,
                                        columns=["src", "dst"]),
                           walk_len=6, walks_per_vertex=2,
                           num_buckets=8)
        want = self._ref_walks(edges, 6, 2, 42) \
            .sort_values(["walk_id", "step"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_dead_end_terminates(self):
        from osm_sidewalkreator_ray.functions.graph import random_walks
        edges = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
        got = random_walks(edges, walk_len=5)
        # walk from 1: 1 -> 2 -> 3 (3 has no out-edge, stops at step 2)
        w1 = got[got["walk_id"] == 1]
        assert w1["vertex"].tolist() == [1, 2, 3]
        assert w1["step"].tolist() == [0, 1, 2]

    def test_walks_per_vertex_and_determinism(self):
        from osm_sidewalkreator_ray.functions.graph import random_walks
        rng = np.random.default_rng(5)
        edges = pd.DataFrame(rng.integers(0, 20, size=(80, 2)),
                             columns=["src", "dst"]).astype("int64")
        a = random_walks(edges, walk_len=4, walks_per_vertex=3)
        b = random_walks(edges, walk_len=4, walks_per_vertex=3,
                         num_buckets=5)
        pd.testing.assert_frame_equal(a, b)
        n_starts = a[a["step"] == 0]["walk_id"].nunique()
        assert n_starts == edges["src"].nunique() * 3


@pytest.mark.usefixtures("ray_session")
class TestLabelPropagation:
    def _local_lpa(self, edges, iters):
        import collections
        adj = collections.defaultdict(list)
        for s, d in edges:
            adj[s].append(d)
            adj[d].append(s)
        labels = {v: v for v in adj}
        for _ in range(iters):
            new = {}
            for v in adj:
                cnt = collections.Counter(labels[u] for u in adj[v])
                best = max(cnt.items(), key=lambda kv: (kv[1],
                                                        -kv[0]))
                new[v] = best[0]
            labels = new
        return labels

    def test_two_cliques_with_bridge(self):
        from osm_sidewalkreator_ray.functions.graph import \
            label_propagation
        edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        edges += [(a, b) for a in range(10, 15)
                  for b in range(a + 1, 15)]
        edges += [(4, 10)]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        got = label_propagation(df, iters=5).set_index("vertex")
        comms = got["community"]
        assert len(set(comms.iloc[:5])) == 1
        assert len(set(comms.iloc[5:])) == 1
        assert comms.iloc[0] != comms.iloc[-1]

    def test_equals_local_reference(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.graph import \
            label_propagation
        rng = np.random.RandomState(4)
        edges = list({(int(a), int(b)) for a, b in
                      zip(rng.randint(0, 60, 150),
                          rng.randint(0, 60, 150)) if a != b})
        df = pd.DataFrame(edges, columns=["src", "dst"])
        for it in (1, 3):
            got = label_propagation(
                rd.from_pandas(df).repartition(4), iters=it)
            ref = self._local_lpa(edges, it)
            assert dict(zip(got["vertex"], got["community"])) == ref


@pytest.mark.usefixtures("ray_session")
class TestSSSPWeighted:
    @staticmethod
    def _dijkstra(edges_df, sources, directed=False):
        import heapq
        adj = {}
        for s, d, w in edges_df[["src", "dst", "w"]].itertuples(
                index=False):
            adj.setdefault(s, []).append((d, w))
            if not directed:
                adj.setdefault(d, []).append((s, w))
        dist = {v: np.inf for v in
                set(edges_df["src"]) | set(edges_df["dst"])}
        heap = []
        for s in sources:
            dist[s] = 0.0
            heapq.heappush(heap, (0.0, s))
        while heap:
            dcur, u = heapq.heappop(heap)
            if dcur > dist[u]:
                continue
            for v, w in adj.get(u, []):
                nd = dcur + w
                if nd < dist[v]:
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        return dist

    def _random_graph(self, n=200, m=700, seed=13):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        keep = src != dst
        return pd.DataFrame({"src": src[keep], "dst": dst[keep],
                             "w": rng.uniform(0.5, 5.0, keep.sum())})

    def test_matches_dijkstra(self):
        import ray.data as rd

        from osm_sidewalkreator_ray.functions.graph import sssp_weighted
        e = self._random_graph()
        got = sssp_weighted(rd.from_pandas(e), sources=[0, 17])
        want = self._dijkstra(e, [0, 17])
        assert len(got) == len(want)
        for v, d in zip(got["vertex"], got["dist"]):
            if np.isinf(want[v]):
                assert np.isinf(d)
            else:
                assert abs(d - want[v]) < 1e-9, v

    def test_directed_and_unreachable(self):
        import ray.data as rd

        from osm_sidewalkreator_ray.functions.graph import sssp_weighted
        e = pd.DataFrame({"src": [0, 1, 3], "dst": [1, 2, 0],
                          "w": [2.0, 3.0, 1.0]})
        got = sssp_weighted(rd.from_pandas(e), sources=[0],
                            directed=True).set_index("vertex")["dist"]
        assert got[0] == 0 and got[1] == 2.0 and got[2] == 5.0
        assert np.isinf(got[3])  # 3 -> 0 edge is directed away

    def test_negative_weight_raises(self):
        import ray.data as rd

        from osm_sidewalkreator_ray.functions.graph import sssp_weighted
        e = pd.DataFrame({"src": [0], "dst": [1], "w": [-1.0]})
        with pytest.raises(Exception, match="negative"):
            sssp_weighted(rd.from_pandas(e), sources=[0]).to_string()


class TestShingleWidths:
    """Regression: _shingle_hashes indexed _MIX (3 entries) by raw
    window position, crashing for any k >= 4."""

    def test_k4_and_k5_no_crash_and_distinct(self):
        from osm_sidewalkreator_ray.pipelines.textops import \
            _shingle_hashes
        words = "the quick brown fox jumps over the lazy dog".split()
        for k in (1, 2, 3, 4, 5, 7):
            sh = _shingle_hashes(words, k)
            assert len(sh) >= 1
            assert sh.dtype == np.uint64
        # short-doc path (len < k) must not crash either
        assert len(_shingle_hashes(["a", "b", "c", "d"], 5)) == 1
        # positions j and j+3 use rotated multipliers: swapping
        # tokens 3 apart must change the k=4 shingle hash
        a = _shingle_hashes(["w", "x", "y", "z"], 4)
        b = _shingle_hashes(["z", "x", "y", "w"], 4)
        assert not np.array_equal(a, b)

    def test_k3_output_unchanged(self):
        # golden-stability: the k<=3 scheme is byte-identical to the
        # original (rotation = 0), keeping every fixture valid
        from osm_sidewalkreator_ray.pipelines.textops import (
            _MIX, _shingle_hashes)
        words = ["aa", "bb", "cc", "dd"]
        th = pd.util.hash_array(np.asarray(words, dtype=object))
        acc = np.zeros(2, dtype=np.uint64)
        for j in range(3):
            acc ^= th[j:2 + j] * np.uint64(_MIX[j])
        assert np.array_equal(np.unique(acc),
                              _shingle_hashes(words, 3))

    def test_bands_must_divide_num_perm(self):
        from osm_sidewalkreator_ray.pipelines.textops import \
            _explode_bands
        with pytest.raises(ValueError, match="divide"):
            _explode_bands(pd.DataFrame({"sig": [], "doc_id": []}),
                           num_perm=64, bands=12, coarse_buckets=8)


class TestMultisetSig:
    def test_partition_invariant_and_sentinel_safe(self):
        """Regression: the raw label-sum fixpoint test collided
        deterministically when labels dropped by an exact multiple of
        2^64 (four vertices leaving the 2^62 INF sentinel)."""
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.graph import \
            _multiset_sig
        INF = np.int64(1) << 62
        before = pd.DataFrame({
            "vertex": np.arange(8, dtype=np.int64),
            "label": np.concatenate([np.full(4, INF), np.arange(4)])})
        after = before.copy()
        after.loc[:3, "label"] = 0  # sum shifted by exactly 4*2^62
        sig_b = _multiset_sig(rd.from_pandas(before), ("vertex", "label"))
        sig_a = _multiset_sig(rd.from_pandas(after), ("vertex", "label"))
        assert sig_b != sig_a
        # same multiset, different block layout -> same signature
        sh = before.sample(frac=1, random_state=3)
        assert _multiset_sig(
            rd.from_pandas(sh).repartition(3), ("vertex", "label")) \
            == sig_b
