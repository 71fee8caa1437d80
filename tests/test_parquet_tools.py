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
