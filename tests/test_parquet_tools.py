"""compact_parquet / read_parquet_harmonized round-trips."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


@pytest.mark.usefixtures("ray_session")
class TestCompact:
    def test_coalesces_small_files(self, tmp_path):
        from osm_sidewalkreator_ray.sources.parquet_tools import \
            compact_parquet
        src = str(tmp_path / "small")
        df = pd.DataFrame({"a": np.arange(5000, dtype=np.int64),
                           "b": np.arange(5000) * 0.5})
        rd.from_pandas(df).repartition(25).write_parquet(src)
        out = str(tmp_path / "compact")
        rep = compact_parquet(src, out, target_rows_per_file=2500)
        assert rep["rows"] == 5000
        assert rep["files_before"] >= 20
        assert rep["files_after"] <= 3
        back = rd.read_parquet(out).to_pandas() \
            .sort_values("a").reset_index(drop=True)
        pd.testing.assert_frame_equal(back, df, check_like=True)
        assert not os.path.exists(out + ".compacting")


@pytest.mark.usefixtures("ray_session")
class TestHarmonized:
    def test_union_with_missing_and_cast(self, tmp_path):
        from osm_sidewalkreator_ray.sources.parquet_tools import \
            read_parquet_harmonized
        old = str(tmp_path / "old.parquet")
        new = str(tmp_path / "new")
        pq.write_table(pa.table({
            "id": pa.array([1, 2], pa.int32()),
            "txt": pa.array(["a", "b"])}), old)
        rd.from_arrow(pa.table({
            "id": pa.array([3, 4], pa.int64()),
            "txt": pa.array(["c", "d"]),
            "lang": pa.array(["en", "es"])})).write_parquet(new)
        ds = read_parquet_harmonized(
            [old, new],
            {"id": pa.int64(), "txt": pa.string(),
             "lang": pa.string()})
        assert ds.schema().names == ["id", "txt", "lang"]
        df = ds.to_pandas().sort_values("id").reset_index(drop=True)
        assert df["id"].tolist() == [1, 2, 3, 4]
        assert df["lang"].tolist()[:2] == [None, None]
        assert df["lang"].tolist()[2:] == ["en", "es"]
        types = dict(zip(ds.schema().names, ds.schema().types))
        assert types["id"] == pa.int64()


@pytest.mark.usefixtures("ray_session")
class TestTextFormats:
    def test_jsonl_roundtrip(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.text_formats import (
            read_jsonl_ds, write_jsonl)
        src = "/root/testdata/sf0.001/documents.parquet"
        schema = pq.read_schema(src)
        ds = rd.read_parquet(src)
        out = str(tmp_path / "jsonl")
        write_jsonl(ds, out)
        back = (read_jsonl_ds(out, schema=schema).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        orig = (ds.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(back, orig[back.columns])
        # typed: schema cast reproduces the parquet types exactly
        assert read_jsonl_ds(out, schema=schema).schema().names \
            == list(schema.names)

    def test_csv_roundtrip_lineitem(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.text_formats import (
            read_csv_ds, write_csv)
        src = "/root/testdata/sf0.001/lineitem.parquet"
        schema = pq.read_schema(src)
        ds = rd.read_parquet(src)
        out = str(tmp_path / "csv")
        write_csv(ds, out)
        back = (read_csv_ds(out, schema=schema).to_pandas()
                .sort_values(["l_orderkey", "l_linenumber"])
                .reset_index(drop=True))
        orig = (ds.to_pandas()
                .sort_values(["l_orderkey", "l_linenumber"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(back, orig[back.columns])


@pytest.mark.usefixtures("ray_session")
class TestZoneMapPruning:
    def _layout(self, tmp_path):
        """4 files with disjoint l_orderkey ranges (a sorted layout)."""
        import pyarrow.parquet as pq
        import pyarrow as pa
        d = tmp_path / "zoned"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(4):
            n = 500
            t = pa.table({
                "l_orderkey": np.arange(i * 1000, i * 1000 + n,
                                        dtype=np.int64),
                "v": rng.uniform(size=n)})
            pq.write_table(t, str(d / f"part-{i}.parquet"))
        return str(d)

    def test_prune_reads_only_matching_files(self, tmp_path):
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            build_zone_map, prune_files, read_parquet_pruned)
        d = self._layout(tmp_path)
        mf = build_zone_map(d, ["l_orderkey"])
        assert len(mf) == 4
        # range inside file 2 only
        paths = prune_files(mf, "l_orderkey", lo=2100, hi=2200)
        assert [p.split("/")[-1] for p in paths] == ["part-2.parquet"]
        got = (read_parquet_pruned(d, mf, "l_orderkey", 2100, 2200)
               .to_pandas())
        assert len(got) == 101
        assert got["l_orderkey"].min() == 2100
        assert got["l_orderkey"].max() == 2200

    def test_prune_conservative_and_empty(self, tmp_path):
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            build_zone_map, prune_files, read_parquet_pruned)
        d = self._layout(tmp_path)
        mf = build_zone_map(d, ["l_orderkey"])
        # column without a zone row -> every file kept
        assert len(prune_files(mf, "no_such_col")) == 4
        # out-of-range -> zero files, empty typed Dataset
        ds = read_parquet_pruned(d, mf, "l_orderkey", 10 ** 9, None)
        assert ds.count() == 0
        assert "l_orderkey" in ds.schema().names

    def test_prune_equals_full_scan(self, tmp_path):
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            build_zone_map, read_parquet_pruned)
        d = self._layout(tmp_path)
        mf = build_zone_map(d, ["l_orderkey"])
        got = (read_parquet_pruned(d, mf, "l_orderkey", 900, 2100)
               .to_pandas().sort_values("l_orderkey")
               .reset_index(drop=True))
        full = rd.read_parquet(d).to_pandas()
        ref = (full[(full["l_orderkey"] >= 900)
                    & (full["l_orderkey"] <= 2100)]
               .sort_values("l_orderkey").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, ref)


@pytest.mark.usefixtures("ray_session")
class TestOrcIpcFormats:
    def _roundtrip(self, reader, writer, tmp_path, name):
        import pyarrow.parquet as pq
        import ray.data as rd
        src = "/root/testdata/sf0.001/lineitem.parquet"
        schema = pq.read_schema(src)
        ds = rd.read_parquet(src).repartition(3)
        out = str(tmp_path / name)
        writer(ds, out)
        back = (reader(out, schema=schema).to_pandas()
                .sort_values(["l_orderkey", "l_linenumber"])
                .reset_index(drop=True))
        orig = (ds.to_pandas()
                .sort_values(["l_orderkey", "l_linenumber"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(back, orig[back.columns])
        import os
        files = os.listdir(out)
        assert len(files) >= 2  # one file per block
        # idempotent re-write: same content-hash names, no dup files
        writer(rd.read_parquet(src).repartition(3), out)
        assert sorted(os.listdir(out)) == sorted(files)

    def test_orc_roundtrip(self, tmp_path):
        from osm_sidewalkreator_ray.sources.text_formats import (
            read_orc_ds, write_orc)
        self._roundtrip(read_orc_ds, write_orc, tmp_path, "orc")

    def test_ipc_roundtrip(self, tmp_path):
        from osm_sidewalkreator_ray.sources.text_formats import (
            read_ipc_ds, write_ipc)
        self._roundtrip(read_ipc_ds, write_ipc, tmp_path, "ipc")


@pytest.mark.usefixtures("ray_session")
class TestRangePartitionedWrite:
    def test_write_prune_roundtrip(self, tmp_path):
        import os
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            read_range_partitioned, write_range_partitioned)
        src = "/root/testdata/sf0.001/lineitem.parquet"
        ds = rd.read_parquet(src)
        out = str(tmp_path / "ranged")
        edges = write_range_partitioned(ds, "l_extendedprice", out,
                                        n_parts=8)
        assert len(edges) == 7
        dirs = [d for d in os.listdir(out) if d.startswith("__range=")]
        assert len(dirs) >= 6  # equi-depth: most partitions populated
        # full read equals source
        full = read_range_partitioned(out, "l_extendedprice", edges)
        assert full.count() == ds.count()
        # narrow band: prunes directories AND matches a full filter
        lo, hi = float(edges[2]), float(edges[3])
        got = (read_range_partitioned(out, "l_extendedprice", edges,
                                      lo, hi).to_pandas())
        ref = ds.to_pandas()
        ref = ref[(ref["l_extendedprice"] >= lo)
                  & (ref["l_extendedprice"] <= hi)]
        assert len(got) == len(ref)
        assert np.isclose(got["l_extendedprice"].sum(),
                          ref["l_extendedprice"].sum())
        # out-of-range -> empty but TYPED Dataset (same contract as
        # read_parquet_pruned; returning None crashed composing callers)
        empty = read_range_partitioned(out, "l_extendedprice", edges,
                                       10 ** 9, None)
        assert empty is not None and empty.count() == 0
        assert "l_extendedprice" in empty.schema().names


@pytest.mark.usefixtures("ray_session")
class TestVersionedTable:
    def test_append_time_travel_replace(self, tmp_path):
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            commit_append, commit_replace, read_table_version,
            table_versions)
        t = str(tmp_path / "tbl")
        df1 = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                            "v": np.ones(100)})
        df2 = pd.DataFrame({"k": np.arange(100, 150,
                                           dtype=np.int64),
                            "v": np.zeros(50)})
        v1 = commit_append(rd.from_pandas(df1).repartition(2), t)
        v2 = commit_append(rd.from_pandas(df2), t)
        assert (v1, v2) == (1, 2)
        assert read_table_version(t, 1).count() == 100
        assert read_table_version(t).count() == 150  # latest
        # replace (compaction): new version, old still readable
        latest = read_table_version(t)
        v3 = commit_replace(latest, t)
        assert v3 == 3
        assert read_table_version(t, 3).count() == 150
        assert read_table_version(t, 1).count() == 100
        assert table_versions(t) == [1, 2, 3]
        # values preserved through the replace
        got = (read_table_version(t, 3).to_pandas()
               .sort_values("k").reset_index(drop=True))
        ref = (pd.concat([df1, df2]).sort_values("k")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, ref)

    def test_crash_before_publish_is_invisible(self, tmp_path):
        import os
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            commit_append, read_table_version, table_versions)
        t = str(tmp_path / "tbl")
        commit_append(rd.from_pandas(
            pd.DataFrame({"k": np.arange(10, dtype=np.int64)})), t)
        # simulate a writer that died after data files, before
        # manifest publish: orphan parquet in data/
        orphan = os.path.join(t, "data", "block-deadbeef.parquet")
        pd.DataFrame({"k": np.arange(999, 1009,
                                     dtype=np.int64)}).to_parquet(
            orphan)
        assert table_versions(t) == [1]
        assert read_table_version(t).count() == 10  # orphan unseen


@pytest.mark.usefixtures("ray_session")
class TestVersionedMergeVacuum:
    def test_commit_merge_and_vacuum(self, tmp_path):
        import os
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            commit_append, commit_merge, read_table_version,
            table_versions, vacuum_table)
        t = str(tmp_path / "tbl")
        base = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                             "v": np.arange(20, dtype=np.float64)})
        commit_append(rd.from_pandas(base).repartition(2), t)
        # changeset: update k=3, insert k=100, delete k=7
        ch = pd.DataFrame({"k": [3, 100, 7],
                           "v": [99.0, 1.0, 0.0],
                           "is_del": [False, False, True]})
        v2 = commit_merge(t, rd.from_pandas(ch), on="k",
                          delete_col="is_del")
        assert v2 == 2
        got = (read_table_version(t).to_pandas()
               .sort_values("k").reset_index(drop=True))
        assert 7 not in set(got["k"])
        assert got.loc[got["k"] == 3, "v"].iloc[0] == 99.0
        assert got.loc[got["k"] == 100, "v"].iloc[0] == 1.0
        assert len(got) == 20  # 20 - 1 delete + 1 insert
        # old version still intact pre-vacuum
        assert read_table_version(t, 1).count() == 20
        rep = vacuum_table(t, keep_versions=1)
        assert rep["versions_dropped"] == 1
        assert rep["files_deleted"] >= 1
        assert table_versions(t) == [2]
        got2 = (read_table_version(t).to_pandas()
                .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got2, got)


@pytest.mark.usefixtures("ray_session")
def test_table_job_cli(tmp_path):
    import io
    import contextlib
    import json
    from jobs.table_job import main
    base = str(tmp_path / "base.parquet")
    pd.DataFrame({"k": np.arange(30, dtype=np.int64),
                  "v": np.ones(30)}).to_parquet(base)
    ch = str(tmp_path / "ch.parquet")
    pd.DataFrame({"k": [1, 999], "v": [5.0, 7.0],
                  "is_del": [False, False]}).to_parquet(ch)
    t = str(tmp_path / "tbl")

    def run(args):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(args)
        assert rc == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    assert run(["append", "--table", t, "--data", base])["version"] \
        == 1
    r = run(["merge", "--table", t, "--data", ch, "--on", "k",
             "--delete-col", "is_del"])
    assert r["version"] == 2
    info = run(["info", "--table", t])
    assert info["rows"] == 31 and info["versions"] == [1, 2]
    vac = run(["vacuum", "--table", t, "--keep", "1"])
    assert vac["versions"] == [2]


@pytest.mark.usefixtures("ray_session")
class TestContentHashCollision:
    def test_blocks_with_same_tail_buffer_do_not_collide(self, tmp_path):
        """Regression: the content-addressed block name used to hash
        only each column's LAST Arrow buffer, so ['ab','c'] and
        ['a','bc'] (same data buffer, different offsets) collided and
        one version's file silently overwrote the other's."""
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            commit_replace, read_table_version)
        t = str(tmp_path / "tbl")
        df_a = pd.DataFrame({"s": ["ab", "c"]})
        df_b = pd.DataFrame({"s": ["a", "bc"]})
        v1 = commit_replace(rd.from_pandas(df_a), t)
        v2 = commit_replace(rd.from_pandas(df_b), t)
        # time travel must return each version's own rows
        got1 = sorted(read_table_version(t, v1).to_pandas()["s"])
        got2 = sorted(read_table_version(t, v2).to_pandas()["s"])
        assert got1 == ["ab", "c"]
        assert got2 == ["a", "bc"]

    def test_null_vs_zero_do_not_collide(self, tmp_path):
        import ray.data as rd
        import pyarrow as pa
        from osm_sidewalkreator_ray.sources.parquet_tools import (
            commit_replace, read_table_version)
        t = str(tmp_path / "tbl")
        v1 = commit_replace(rd.from_arrow(pa.table(
            {"x": pa.array([1, None], type=pa.int64())})), t)
        v2 = commit_replace(rd.from_arrow(pa.table(
            {"x": pa.array([1, 0], type=pa.int64())})), t)
        assert read_table_version(
            t, v1).to_pandas()["x"].isna().sum() == 1
        assert read_table_version(
            t, v2).to_pandas()["x"].isna().sum() == 0
