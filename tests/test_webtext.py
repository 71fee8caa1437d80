"""URL curation ops vs stdlib-urlparse and DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd

from osm_sidewalkreator_ray.pipelines import webtext as W


def make_urls(n: int = 600, seed: int = 7) -> pd.Series:
    """Deterministic adversarial URL corpus: multi-suffix hosts, ports,
    userinfo, trailing-dot hosts, uppercase, deep paths, query spam,
    fragments, and non-URL garbage."""
    rng = np.random.RandomState(seed)
    hosts = ["example.com", "www.example.com", "a.b.co.uk", "x.org",
             "news.example.test", "spam.biz", "sub.deep.site.com.br",
             "localhost", "192.168.0.1", "Example.COM.", "t.co",
             "media.cdn.example.com"]
    schemes = ["http", "https", "https", "https", "ftp"]
    urls = []
    for i in range(n):
        if i % 41 == 0:
            urls.append(["not a url", "", "mailto:x@y.z",
                         "https:///nohost/path"][i % 4])
            continue
        h = hosts[rng.randint(len(hosts))]
        sc = schemes[rng.randint(len(schemes))]
        port = f":{rng.randint(1, 9999)}" if rng.rand() < 0.2 else ""
        user = "u:p@" if rng.rand() < 0.1 else ""
        depth = rng.randint(0, 16)
        path = "".join(f"/p{rng.randint(99)}" for _ in range(depth))
        nq = rng.randint(0, 12)
        q = ("?" + "&".join(f"k{j}=v{rng.randint(9)}" for j in range(nq))
             if nq else "")
        frag = "#frag" if rng.rand() < 0.15 else ""
        urls.append(f"{sc}://{user}{h}{port}{path}{q}{frag}")
    return pd.Series(urls, name="url")


class TestParseVsUrllib:
    def test_matches_stdlib_urlparse(self):
        from urllib.parse import urlparse
        urls = make_urls()
        got = W.parse_url_frame(urls)
        for i, u in enumerate(urls):
            if "://" not in u:
                assert got.loc[i, "scheme"] == ""
                assert got.loc[i, "host"] == ""
                continue
            p = urlparse(u)
            assert got.loc[i, "scheme"] == p.scheme.lower(), u
            # documented delta vs stdlib: trailing dot stripped
            assert got.loc[i, "host"] == (p.hostname or "").rstrip("."), u
            if p.port is None:
                assert np.isnan(got.loc[i, "port"]), u
            else:
                assert got.loc[i, "port"] == p.port, u
            assert got.loc[i, "path_depth"] == sum(
                1 for x in p.path.split("/") if x), u
            assert got.loc[i, "n_query_params"] == sum(
                1 for x in p.query.split("&") if x), u
            assert got.loc[i, "url_len"] == len(u), u

    def test_registered_domain_heuristic(self):
        cases = {"a.b.co.uk": "b.co.uk", "www.example.com": "example.com",
                 "sub.deep.site.com.br": "site.com.br", "t.co": "t.co",
                 "localhost": "localhost", "": ""}
        for host, want in cases.items():
            assert W._registered_domain(host) == want, host


URL_FILTER_SQL = """
SELECT * REPLACE (drop_reason = '' AS keep) FROM (
  SELECT *, true AS keep, CASE
    WHEN scheme NOT IN ('http', 'https') THEN 'bad_scheme'
    WHEN host IN ('spam.biz', 'localhost') THEN 'blocked_host'
    WHEN domain IN ('site.com.br') THEN 'blocked_domain'
    WHEN tld IN ('biz') THEN 'blocked_tld'
    WHEN url_len > 2048 THEN 'too_long'
    WHEN path_depth > 12 THEN 'too_deep'
    WHEN n_query_params > 8 THEN 'too_many_params'
    ELSE '' END AS drop_reason
  FROM parsed)
ORDER BY url
"""

HOST_STATS_SQL = """
SELECT domain, COUNT(*) AS n_pages, COUNT(DISTINCT host) AS n_hosts,
       AVG(path_depth) AS mean_path_depth, AVG(url_len) AS mean_url_len
FROM parsed GROUP BY domain ORDER BY domain
"""


@pytest.mark.usefixtures("ray_session")
class TestFilterAndStatsOracles:
    @pytest.fixture(scope="class")
    def parsed_df(self):
        urls = make_urls()
        ds = rd.from_pandas(pd.DataFrame({"url": urls}))
        return W.url_parse_ds(ds, "url").to_pandas()

    def test_url_filter_matches_duckdb(self, parsed_df):
        con = duckdb.connect()
        con.register("parsed", parsed_df)
        want = con.sql(URL_FILTER_SQL).df()
        got = (W.url_filter_ds(
            rd.from_pandas(parsed_df),
            blocked_hosts=frozenset({"spam.biz", "localhost"}),
            blocked_domains=frozenset({"site.com.br"}),
            blocked_tlds=frozenset({"biz"}))
            .to_pandas().sort_values("url").reset_index(drop=True))
        want = want.reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        assert got["keep"].tolist() == want["keep"].tolist()
        assert got["drop_reason"].tolist() == want["drop_reason"].tolist()
        assert not got[got["keep"]]["drop_reason"].ne("").any()

    def test_blocklists_as_object_refs(self, parsed_df):
        sets = dict(blocked_hosts=frozenset({"spam.biz", "localhost"}),
                    blocked_domains=frozenset({"site.com.br"}),
                    blocked_tlds=frozenset({"biz"}))
        plain = (W.url_filter_ds(rd.from_pandas(parsed_df), **sets)
                 .to_pandas().sort_values("url").reset_index(drop=True))
        refs = {k: ray.put(v) for k, v in sets.items()}
        via_ref = (W.url_filter_ds(rd.from_pandas(parsed_df), **refs)
                   .to_pandas().sort_values("url").reset_index(drop=True))
        pd.testing.assert_frame_equal(plain, via_ref)

    def test_host_stats_matches_duckdb(self, parsed_df):
        con = duckdb.connect()
        con.register("parsed", parsed_df)
        want = con.sql(HOST_STATS_SQL).df()
        got = (W.host_stats_ds(rd.from_pandas(parsed_df))
               .to_pandas().sort_values("domain").reset_index(drop=True))
        got = got[list(want.columns)]
        assert got["domain"].tolist() == want["domain"].tolist()
        assert got["n_pages"].astype("int64").tolist() == \
            want["n_pages"].astype("int64").tolist()
        assert got["n_hosts"].astype("int64").tolist() == \
            want["n_hosts"].astype("int64").tolist()
        assert np.allclose(got["mean_path_depth"], want["mean_path_depth"])
        assert np.allclose(got["mean_url_len"], want["mean_url_len"])

    def test_host_stats_multiblock_equals_singleblock(self, parsed_df):
        one = (W.host_stats_ds(rd.from_pandas(parsed_df))
               .to_pandas().sort_values("domain").reset_index(drop=True))
        many = (W.host_stats_ds(rd.from_pandas(parsed_df).repartition(13))
                .to_pandas().sort_values("domain").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            one.sort_index(axis=1), many.sort_index(axis=1))


@pytest.mark.usefixtures("ray_session")
class TestFlagshipComposition:
    def test_over_synthetic_pages(self):
        from osm_sidewalkreator_ray.sources.synthetic import pages_dataset
        parsed = W.url_parse_ds(pages_dataset(200, parallelism=4))
        stats = W.host_stats_ds(parsed).to_pandas()
        assert stats["n_pages"].sum() == 200
        assert set(stats["domain"]) == {"example.test"}
        gated = W.url_filter_ds(parsed).to_pandas()
        assert gated["keep"].all()


@pytest.mark.usefixtures("ray_session")
class TestPmiCollocations:
    SF = "/root/testdata/sf0.001"

    def test_matches_duckdb(self):
        from osm_sidewalkreator_ray.pipelines import textops as T
        got = T.pmi_collocations(self.SF, min_count=5, top_k=20)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{self.SF}/documents.parquet'")
        want = con.sql(T.PMI_SQL_TMPL.format(min_count=5, top_k=20)).df()
        assert got["w1"].tolist() == want["w1"].tolist()
        assert got["w2"].tolist() == want["w2"].tolist()
        assert got["c_xy"].tolist() == want["c_xy"].astype("int64").tolist()
        assert np.allclose(got["pmi"], want["pmi"])

    def test_no_cross_doc_bigrams(self):
        from osm_sidewalkreator_ray.pipelines import textops as T
        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5, 6],
             "text": ["a b", "a b", "a b", "a b", "a b", "b a"]}))
        out = T.pmi_collocations_ds(docs, min_count=1, top_k=10)
        # 'b a' occurs once INSIDE doc 6 only; the five doc-boundary
        # b->a adjacencies must not count
        ba = out[(out["w1"] == "b") & (out["w2"] == "a")]
        assert ba["c_xy"].tolist() == [1]
        ab = out[(out["w1"] == "a") & (out["w2"] == "b")]
        assert ab["c_xy"].tolist() == [5]
