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


def make_link_pages():
    """Deterministic HTML corpus: quoted hrefs only (the common ground
    between the regex extractor and the stdlib-HTMLParser reference)."""
    hosts = ["alpha.example.com", "beta.example.com", "www.gamma.co.uk",
             "delta.org"]
    pages, n = [], 0
    for hi, h in enumerate(hosts):
        for p in range(3):
            url = f"https://{h}/sec{p}/page{n}.html"
            other = hosts[(hi + 1) % len(hosts)]
            body = (
                f'<html><body>'
                f'<a href="rel{p}/next.html">rel</a> '
                f'<a class="x" href="/root{p}">root</a> '
                f'<a href="https://{other}/in">abs</a> '
                f'<a href="//{hosts[(hi + 2) % len(hosts)]}/pp">proto</a> '
                f'<a href="#frag">skip</a> '
                f'<a href="javascript:void(0)">skip</a> '
                f'<a href="mailto:a@b.c">skip</a> '
                f'</body></html>')
            pages.append({"url": url, "html": body.encode()})
            n += 1
    return pd.DataFrame(pages)


def reference_links(df: pd.DataFrame) -> pd.DataFrame:
    """Independent extraction: stdlib HTMLParser + urljoin."""
    from html.parser import HTMLParser
    from urllib.parse import urljoin
    rows = []

    class P(HTMLParser):
        def __init__(self, base):
            super().__init__()
            self.base = base

        def handle_starttag(self, tag, attrs):
            if tag != "a":
                return
            for k, v in attrs:
                if k == "href" and v and not v.startswith("#") and \
                        not v.lower().startswith(
                            ("javascript:", "mailto:", "data:", "tel:")):
                    rows.append({"url": self.base, "href": v,
                                 "dst_url": urljoin(self.base, v)})

    for _, r in df.iterrows():
        P(r["url"]).feed(r["html"].decode())
    return pd.DataFrame(rows)


HOST_GRAPH_SQL = """
SELECT src_domain, dst_domain, COUNT(*) AS n_links FROM linkdoms
WHERE src_domain <> dst_domain AND src_domain <> '' AND dst_domain <> ''
GROUP BY 1, 2 ORDER BY 1, 2
"""


@pytest.mark.usefixtures("ray_session")
class TestLinkGraph:
    def test_extract_matches_htmlparser(self):
        from osm_sidewalkreator_ray.pipelines import webtext as W
        df = make_link_pages()
        got = (W.extract_links_ds(rd.from_pandas(df).repartition(3))
               .to_pandas().sort_values(["url", "href"])
               .reset_index(drop=True))
        want = (reference_links(df).sort_values(["url", "href"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_host_graph_matches_duckdb(self):
        from osm_sidewalkreator_ray.pipelines import webtext as W
        df = make_link_pages()
        links = W.extract_links_ds(rd.from_pandas(df)).to_pandas()
        linkdoms = pd.DataFrame({
            "src_domain": W.parse_url_frame(links["url"])["domain"],
            "dst_domain": W.parse_url_frame(links["dst_url"])["domain"]})
        con = duckdb.connect()
        con.register("linkdoms", linkdoms)
        want = con.sql(HOST_GRAPH_SQL).df()
        got = (W.host_link_graph_ds(rd.from_pandas(links).repartition(4))
               .to_pandas().sort_values(["src_domain", "dst_domain"])
               .reset_index(drop=True))
        assert got["src_domain"].tolist() == want["src_domain"].tolist()
        assert got["dst_domain"].tolist() == want["dst_domain"].tolist()
        assert got["n_links"].astype("int64").tolist() == \
            want["n_links"].astype("int64").tolist()

    def test_host_rank_cycle_is_uniform(self):
        # 3 domains in a directed cycle -> exact PageRank 1/3 each,
        # any damping, any iteration count
        from osm_sidewalkreator_ray.pipelines import webtext as W
        pages = pd.DataFrame([
            {"url": "https://a.com/x",
             "html": b'<a href="https://b.com/">b</a>'},
            {"url": "https://b.com/x",
             "html": b'<a href="https://c.com/">c</a>'},
            {"url": "https://c.com/x",
             "html": b'<a href="https://a.com/">a</a>'},
        ])
        out = W.host_rank(rd.from_pandas(pages), iters=8)
        assert sorted(out["domain"]) == ["a.com", "b.com", "c.com"]
        assert np.allclose(out["rank"], 1 / 3)

    def test_host_rank_hub_wins(self):
        from osm_sidewalkreator_ray.pipelines import webtext as W
        # hub is DANGLING (no outlinks): exercises the dangling-mass
        # path and converges monotonically (a hub<->spoke 2-cycle
        # oscillates for tens of iterations before the fixpoint)
        rows = [{"url": f"https://s{i}.org/p",
                 "html": b'<a href="https://hub.org/">h</a>'}
                for i in range(5)]
        out = W.host_rank(rd.from_pandas(pd.DataFrame(rows)), iters=12)
        assert out.iloc[0]["domain"] == "hub.org"
        assert np.isclose(out["rank"].sum(), 1.0)

    def test_all_intra_domain_links_empty_rank(self):
        from osm_sidewalkreator_ray.pipelines import webtext as W
        pages = pd.DataFrame([
            {"url": "https://a.example.com/x",
             "html": b'<a href="https://b.example.com/">same etld+1</a>'}])
        out = W.host_rank(rd.from_pandas(pages))
        assert out.empty and list(out.columns) == ["domain", "rank"]


def reference_normalize(url: str) -> str:
    """Independent canonicalizer via stdlib urlsplit/parse_qsl."""
    from urllib.parse import urlsplit, urlunsplit
    if "://" not in url:
        return url
    p = urlsplit(url)
    host = (p.hostname or "").rstrip(".")
    port = p.port
    if (p.scheme.lower(), port) in (("http", 80), ("https", 443)):
        port = None
    netloc = host + (f":{port}" if port is not None else "")
    path = p.path
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    from osm_sidewalkreator_ray.pipelines.webtext import TRACKING_PARAMS
    parts = [kv for kv in p.query.split("&") if kv
             and kv.split("=", 1)[0].lower() not in TRACKING_PARAMS]
    query = "&".join(sorted(parts))
    return urlunsplit((p.scheme.lower(), netloc, path, query, ""))


@pytest.mark.usefixtures("ray_session")
class TestUrlNormalizeDedup:
    def test_normalize_matches_stdlib_composition(self):
        from osm_sidewalkreator_ray.pipelines import webtext as W
        cases = [
            "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
            "https://example.com:443/",
            "https://example.com:8443/x/",
            "http://a.b.co.uk./deep/path///",
            "https://h.io/p?gclid=1&fbclid=2",
            "https://h.io/p?z=1&y=2&z=0",
            "not a url",
            "https://u:p@h.io:9090/q?ref=tw&keep=1",
        ]
        for u in cases:
            assert W.normalize_url(u) == reference_normalize(u), u
        # and over the adversarial corpus (skip userinfo-less delta:
        # reference drops userinfo too via hostname)
        for u in make_urls(300):
            assert W.normalize_url(u) == reference_normalize(u), u

    def test_url_dedup_keeps_earliest_capture(self):
        from osm_sidewalkreator_ray.pipelines import webtext as W
        rows = []
        for i in range(60):
            base = f"https://site{i % 7}.org/art/{i % 20}"
            variant = [base,
                       base + "?utm_source=feed",
                       base + "/#sec",
                       f"HTTPS://SITE{i % 7}.ORG:443/art/{i % 20}"][i % 4]
            rows.append({"url": variant, "warc_ts": 1000 + i,
                         "payload": i})
        df = pd.DataFrame(rows)
        out = (W.url_dedup_ds(rd.from_pandas(df).repartition(5))
               .to_pandas().sort_values("norm_url")
               .reset_index(drop=True))
        # pandas reference
        ref = df.copy()
        ref["norm_url"] = ref["url"].map(W.normalize_url)
        g = ref.groupby("norm_url").agg(warc_ts=("warc_ts", "min"),
                                        n_dups=("warc_ts", "size"))
        assert len(out) == len(g)
        got = out.set_index("norm_url")
        assert got["warc_ts"].to_dict() == g["warc_ts"].to_dict()
        assert got["n_dups"].astype(int).to_dict() == \
            g["n_dups"].astype(int).to_dict()
        # survivor carries its own full row
        merged = out.merge(ref, on=["norm_url", "warc_ts"],
                           suffixes=("", "_ref"))
        assert (merged["payload"] == merged["payload_ref"]).all()

    def test_url_dedup_single_survivor_on_timestamp_tie(self):
        """Regression: two captures sharing (norm_url, min warc_ts)
        used to BOTH survive the keeper join, breaking the one-row-
        per-canonical-URL contract."""
        from osm_sidewalkreator_ray.pipelines import webtext as W
        df = pd.DataFrame({
            "url": ["https://a.org/x", "HTTPS://A.ORG:443/x",
                    "https://a.org/x?utm_source=f",
                    "https://b.org/y", "https://b.org/y/#frag"],
            "warc_ts": [100, 100, 250, 7, 7],
            "payload": [0, 1, 2, 3, 4]})
        out = (W.url_dedup_ds(rd.from_pandas(df).repartition(3))
               .to_pandas().sort_values("norm_url")
               .reset_index(drop=True))
        assert len(out) == 2  # exactly one survivor per canonical URL
        assert out["n_dups"].astype(int).tolist() == [3, 2]
        assert out["warc_ts"].tolist() == [100, 7]
        # deterministic pick: smallest raw url among the tied captures
        assert out["url"].tolist() == ["HTTPS://A.ORG:443/x",
                                       "https://b.org/y"]


@pytest.mark.usefixtures("ray_session")
class TestRefreshCorpus:
    def _data(self):
        import ray.data as rd
        corpus = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma delta epsilon zeta",
                     "one two three four five six seven",
                     "red green blue cyan magenta yellow"],
            "lang": ["en", "en", "de"]})
        new = pd.DataFrame({
            "doc_id": [10, 11, 12, 13, 14],
            "text": [
                # exact dup of corpus doc 1
                "alpha beta gamma delta epsilon zeta",
                # near-dup of corpus doc 2 (one word changed)
                "one two three four five six eight",
                # near-dup PAIR within the batch: 12 kept, 13 dropped
                "lorem ipsum dolor sit amet consectetur adipiscing",
                "lorem ipsum dolor sit amet consectetur elit",
                # fresh
                "totally fresh unrelated content words here now"],
            "lang": ["en", "en", "la", "la", "en"]})
        return rd.from_pandas(corpus), rd.from_pandas(new), corpus, new

    def test_refresh_decisions(self):
        from osm_sidewalkreator_ray.pipelines.refresh import \
            refresh_corpus
        ex, nw, _, _ = self._data()
        out = refresh_corpus(ex, nw, threshold=0.5)
        acc = (out["accepted"].to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert acc["doc_id"].tolist() == out["accepted_ids"]
        assert acc["doc_id"].tolist() in ([11, 12, 14], [12, 14]), \
            acc["doc_id"].tolist()
        reasons = dict(out["dropped"][["doc_id", "reason"]]
                       .to_numpy())
        assert reasons[10] == "exact_dup"
        assert reasons[13] == "near_dup_batch"

    def test_refresh_near_dup_threshold(self):
        from osm_sidewalkreator_ray.pipelines.refresh import \
            refresh_corpus
        ex, nw, _, _ = self._data()
        # doc 11 shares 6/8 words with corpus doc 2 -> at a LOW
        # threshold it must be dropped as near_dup_existing
        out = refresh_corpus(ex, nw, threshold=0.2)
        assert 11 not in set(out["accepted_ids"])
        reasons = dict(out["dropped"][["doc_id", "reason"]]
                       .to_numpy())
        assert reasons[11] == "near_dup_existing"

    def test_refresh_index_and_state(self, tmp_path):
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines.refresh import (
            LANG_STATS_SPEC, refresh_corpus)
        from osm_sidewalkreator_ray.pipelines.search import (
            build_inverted_index, search_index)
        from osm_sidewalkreator_ray.functions.aggregates import \
            agg_state_ds, finalize_agg_state
        ex, nw, corpus, _ = self._data()
        idx = str(tmp_path / "idx")
        build_inverted_index(ex, idx)
        state = agg_state_ds(ex, ["lang"], LANG_STATS_SPEC) \
            .to_pandas()
        out = refresh_corpus(ex, nw, threshold=0.5, index_dir=idx,
                             lang_state=state)
        # the fresh doc is searchable post-refresh
        hits = search_index(idx, ["unrelated"], mode="and")
        assert 14 in set(hits["doc_id"])
        # merged lang counts equal a full recount over corpus+accepted
        merged = finalize_agg_state(
            rd.from_pandas(out["lang_state"]), ["lang"],
            LANG_STATS_SPEC).set_index("lang")["n_docs"]
        full = pd.concat([corpus[["lang"]],
                          out["accepted"].to_pandas()[["lang"]]])
        ref = full.value_counts("lang")
        assert merged.sort_index().tolist() \
            == ref.sort_index().tolist()


@pytest.mark.usefixtures("ray_session")
class TestWarcSource:
    def _records(self, n=6):
        return [{"url": f"https://ex{i}.org/p{i}",
                 "warc_ts": f"2024-01-0{i % 9 + 1}T00:00:00Z",
                 "record_id": f"<urn:uuid:{i:08d}>",
                 "status": 200 if i % 3 else 404,
                 "html": (f"<html><body><p>page {i} text "
                          f"content</p></body></html>"
                          ).encode()}
                for i in range(n)]

    def test_warc_roundtrip_plain_and_gz(self, tmp_path):
        from osm_sidewalkreator_ray.sources.warc import (
            warc_records_ds, write_warc)
        recs = self._records()
        p1 = str(tmp_path / "a.warc")
        p2 = str(tmp_path / "b.warc.gz")
        write_warc(recs[:3], p1, compress=False)
        write_warc(recs[3:], p2, compress=True)
        got = (warc_records_ds([p1, p2]).to_pandas()
               .sort_values("url").reset_index(drop=True))
        exp = (pd.DataFrame(recs).sort_values("url")
               .reset_index(drop=True))
        for c in ["url", "warc_ts", "record_id"]:
            assert got[c].tolist() == exp[c].tolist(), c
        assert [bytes(h) for h in got["html"]] \
            == exp["html"].tolist()
        assert got["status"].tolist() == exp["status"].tolist()

    def test_warc_non_response_skipped_and_html_pipeline(
            self, tmp_path):
        from osm_sidewalkreator_ray.sources.warc import (
            parse_warc, warc_records_ds, write_warc)
        # hand-build a request record + a response record
        req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: https://x.org/\r\n"
               b"Content-Length: 4\r\n\r\nGET /\r\n\r\n")
        assert parse_warc(req[:req.index(b"GET /") + 4]
                          + b"\r\n\r\n") == []
        p = str(tmp_path / "c.warc")
        write_warc(self._records(2), p)
        # end-to-end: WARC -> HtmlExtractor text
        from osm_sidewalkreator_ray.stages.html_text import \
            HtmlExtractor
        ds = warc_records_ds([p])
        txt = (ds.map_batches(HtmlExtractor(),
                              batch_format="pandas").to_pandas())
        assert len(txt) == 2
        assert any("page 0 text content" in t
                   for t in txt.filter(like="text", axis=1)
                   .iloc[:, 0])


@pytest.mark.usefixtures("ray_session")
class TestRobotsAndBroadcastJoin:
    def test_robots_filter(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines.webtext import \
            robots_filter_ds
        pages = pd.DataFrame({"url": [
            "https://a.org/public/1", "https://a.org/private/2",
            "https://b.org/anything", "https://c.org/x"],
            "v": [1, 2, 3, 4]})
        robots = {"a.org": "User-agent: *\nDisallow: /private/\n",
                  "b.org": "User-agent: *\nDisallow: /\n"}
        got = (robots_filter_ds(rd.from_pandas(pages)
                                .repartition(2), robots)
               .to_pandas().sort_values("v"))
        # a.org/private blocked, b.org fully blocked, c.org no rules
        assert got["v"].tolist() == [1, 4]

    def test_broadcast_join_matches_pandas_and_gates(self):
        import ray.data as rd
        from osm_sidewalkreator_ray.functions.joins import \
            broadcast_join
        rng = np.random.RandomState(0)
        big = pd.DataFrame({"k": rng.randint(0, 20, 5000),
                            "v": rng.uniform(size=5000)})
        small = pd.DataFrame({"k": np.arange(10),
                              "name": [f"n{i}" for i in range(10)]})
        got = (broadcast_join(rd.from_pandas(big).repartition(4),
                              small, left_on="k").to_pandas()
               .sort_values(["k", "v"]).reset_index(drop=True))
        ref = (big.merge(small, on="k")
               .sort_values(["k", "v"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, ref)
        left = (broadcast_join(rd.from_pandas(big), small,
                               left_on="k", how="left").to_pandas())
        assert len(left) == len(big)
        with pytest.raises(ValueError):
            broadcast_join(rd.from_pandas(big), big, left_on="k",
                           max_small_rows=100)


@pytest.mark.usefixtures("ray_session")
def test_refresh_all_duplicate_batch_keeps_promised_keys():
    """Regression: when every new doc is a duplicate (the steady-state
    common case), lang_state / touched_buckets were omitted from the
    result instead of returning the unchanged state."""
    from osm_sidewalkreator_ray.functions.aggregates import (
        agg_state_ds)
    from osm_sidewalkreator_ray.pipelines.refresh import (
        LANG_STATS_SPEC, refresh_corpus)
    ex = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["same text here", "other doc"],
        "lang": ["en", "en"]}))
    nw = rd.from_pandas(pd.DataFrame({
        "doc_id": [10, 11], "text": ["same text here", "other doc"],
        "lang": ["en", "en"]}))
    state = agg_state_ds(ex.select_columns(["lang"]), ["lang"],
                         LANG_STATS_SPEC).to_pandas()
    out = refresh_corpus(ex, nw, threshold=0.5, lang_state=state)
    assert out["accepted_ids"] == []
    # the key is present and equals the unchanged input state
    got = out["lang_state"].sort_values("lang").reset_index(drop=True)
    want = state.sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
