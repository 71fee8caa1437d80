"""JSON-column operators vs DuckDB's json_extract: both parser paths
on the real events.props column, adversarial nested/malformed shapes,
and the corpus shape profiler."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.jsonops import (extract_batch,
                                                      json_extract_ds,
                                                      json_profile_ds)

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("parser", ["regex", "json", "auto"])
def test_events_props_matches_duckdb(parser):
    out = (json_extract_ds(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["event_id", "props"]),
        "props", {"k": "int64"}, parser=parser)
        .to_pandas().sort_values("event_id", ignore_index=True))
    ref = duckdb.sql(f"""
        SELECT event_id, json_extract(props, '$.k')::BIGINT AS k
        FROM read_parquet('{SF}/events.parquet') ORDER BY event_id
    """).df()
    assert len(out) == len(ref) > 0
    assert (out["k"].to_numpy(np.int64)
            == ref["k"].to_numpy(np.int64)).all()
    assert "props" not in out.columns  # dropped by default


def test_nested_and_malformed_agree_with_duckdb():
    docs = pd.Series([
        '{"a": {"k": 5}, "b": 1.5}',       # nested k must NOT match $.k
        '{"k": 7, "s": "x,y"}',
        '{"k": "12"}',                      # string number -> cast
        'not json at all',
        None,
        '{"s": "q\\"uote", "k": null}',    # escaped quote + null
        '{"arr": [1, 2], "b": true}',
    ])
    fields = {"k": "int64", "b": "string", "a.k": "int64"}
    got = extract_batch(docs, fields, parser="json")
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"d": docs}))
    ref = con.sql("""
        SELECT CASE WHEN json_valid(d)
                    THEN json_extract(d, '$.k')::BIGINT END AS k,
               CASE WHEN json_valid(d)
                    THEN json_extract_string(d, '$.b') END AS b,
               CASE WHEN json_valid(d)
                    THEN json_extract(d, '$."a"."k"')::BIGINT END
                   AS a_k
        FROM t
    """).df()
    np.testing.assert_array_equal(
        got["k"].astype("float64").to_numpy(),
        ref["k"].astype("float64").to_numpy())
    np.testing.assert_array_equal(
        got["a_k"].astype("float64").to_numpy(),
        ref["a_k"].astype("float64").to_numpy())
    assert got["b"].fillna("∅").tolist() == \
        ref["b"].fillna("∅").tolist()


def test_auto_falls_back_on_nested_batches():
    # auto must give json-path semantics even when a nested doc hides
    # the key at the wrong level
    docs = pd.Series(['{"a": {"k": 5}}', '{"k": 3}'])
    got = extract_batch(docs, {"k": "int64"}, parser="auto")
    assert got["k"].astype("float64").fillna(-1).tolist() == [-1.0, 3.0]
    with pytest.raises(ValueError):
        extract_batch(docs, {"k": "int64"}, parser="regex")


def test_regex_and_json_paths_identical_on_flat_docs():
    rng = np.random.RandomState(7)
    docs = pd.Series([
        '{"k": %d, "f": %.3f, "s": "v%d", "t": %s}'
        % (rng.randint(-50, 50), rng.standard_normal(),
           i, ["true", "false", "null"][i % 3])
        for i in range(500)])
    fields = {"k": "int64", "f": "float64", "s": "string", "t": "bool"}
    a = extract_batch(docs, fields, parser="regex")
    b = extract_batch(docs, fields, parser="json")
    for c in a.columns:
        assert a[c].astype(object).fillna("∅").tolist() \
            == b[c].astype(object).fillna("∅").tolist(), c


def test_json_profile_counts_paths():
    docs = pd.DataFrame({"j": [
        '{"k": 1, "m": {"x": 2}}',
        '{"k": "s"}',
        'broken',
    ] * 5})
    prof = (json_profile_ds(rd.from_pandas(docs), "j")
            .to_pandas().set_index(["path", "json_type"])["n_docs"])
    assert prof[("$", "object")] == 10
    assert prof[("$", "malformed")] == 5
    assert prof[("k", "number")] == 5
    assert prof[("k", "string")] == 5
    assert prof[("m.x", "number")] == 5


def test_null_string_value_survives_both_paths():
    """Regression: the regex path nulled the legitimate string value
    "null" after unquoting, diverging from the json path and DuckDB."""
    import duckdb
    from osm_sidewalkreator_ray.functions.jsonops import extract_batch
    doc = '{"k": "null"}'
    for p in ("regex", "json"):
        got = extract_batch(pd.Series([doc]), {"k": "string"}, parser=p)
        assert got["k"].iloc[0] == "null", p
    # real JSON null -> NA on both paths (matching DuckDB)
    for p in ("regex", "json"):
        got = extract_batch(pd.Series(['{"k": null}']),
                            {"k": "string"}, parser=p)
        assert pd.isna(got["k"].iloc[0]), p
    ref = duckdb.sql(
        "SELECT json_extract_string('{\"k\": \"null\"}', '$.k')"
    ).fetchone()[0]
    assert ref == "null"


def test_bool_cast_tolerates_dirty_scalars():
    """Regression: the general path raised TypeError on non-bool
    scalars (one dirty doc killed the whole task); both paths now
    yield NA."""
    from osm_sidewalkreator_ray.functions.jsonops import extract_batch
    nested = extract_batch(pd.Series(['{"a": {"k": "yes"}}']),
                           {"a.k": "bool"})
    assert pd.isna(nested["a_k"].iloc[0])
    flat_r = extract_batch(pd.Series(['{"k": "yes"}']),
                           {"k": "bool"}, parser="regex")
    flat_j = extract_batch(pd.Series(['{"k": "yes"}']),
                           {"k": "bool"}, parser="json")
    assert pd.isna(flat_r["k"].iloc[0]) and pd.isna(flat_j["k"].iloc[0])
