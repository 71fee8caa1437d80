"""Tar-shard trainer feed: round-trip, determinism, convergence."""

import hashlib
import json
import os

import numpy as np
import pandas as pd
import ray.data as rd

from osm_sidewalkreator_ray.pipelines.textops import _read_docs
from osm_sidewalkreator_ray.sources import tar_shards as TS

SF_DIR = "/root/testdata/sf0.001"


def _dir_hashes(d):
    return {p: hashlib.sha256(
        open(os.path.join(d, p), "rb").read()).hexdigest()
        for p in sorted(os.listdir(d)) if p.endswith(".tar")}


class TestTarShards:
    def test_roundtrip_real_table(self, tmp_path):
        out = str(tmp_path / "shards")
        docs = _read_docs(SF_DIR, ["doc_id", "text", "lang"])
        manifest = TS.write_tar_shards(docs, out, docs_per_shard=64,
                                       meta_cols=["lang"])
        src = docs.to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        assert manifest["n_docs"].sum() == len(src)
        assert len(manifest) == int(np.ceil(
            (src["doc_id"].max() + 1) / 64))
        back = (TS.read_tar_shards(out).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert back["doc_id"].tolist() == src["doc_id"].tolist()
        assert back["text"].tolist() == src["text"].tolist()
        langs = [json.loads(m)["lang"] for m in back["meta_json"]]
        assert langs == src["lang"].tolist()
        # manifest sidecar exists and matches
        lines = [json.loads(line) for line in
                 open(os.path.join(out, "_manifest.jsonl"))]
        assert sum(r["n_docs"] for r in lines) == len(src)

    def test_byte_reproducible_and_convergent(self, tmp_path):
        df = pd.DataFrame({
            "doc_id": np.arange(10, dtype=np.int64) * 7,  # sparse ids
            "text": [f"doc number {i}" for i in range(10)]})
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        TS.write_tar_shards(rd.from_pandas(df), a, docs_per_shard=16)
        TS.write_tar_shards(rd.from_pandas(df).repartition(5), b,
                            docs_per_shard=16)
        assert _dir_hashes(a) == _dir_hashes(b)
        # re-run over the same dir converges (same file set and bytes)
        before = _dir_hashes(a)
        TS.write_tar_shards(rd.from_pandas(df), a, docs_per_shard=16)
        assert _dir_hashes(a) == before
        assert not any(p.endswith(".tmp") for p in os.listdir(a))

    def test_unicode_and_empty_text(self, tmp_path):
        out = str(tmp_path / "u")
        df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                           "text": ["héllo wörld ✓", ""]})
        TS.write_tar_shards(rd.from_pandas(df), out)
        back = (TS.read_tar_shards(out).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert back["text"].tolist() == ["héllo wörld ✓", ""]
        assert back["meta_json"].isna().all()

    def test_reader_honors_manifest_over_stale_shards(self, tmp_path):
        """Regression: a smaller re-write leaves a stale shard file
        from a previous run on disk; the reader must trust the
        manifest's file set, not the directory glob."""
        import ray.data as rd
        from osm_sidewalkreator_ray.sources.tar_shards import (
            read_tar_shards, write_tar_shards)
        out = str(tmp_path / "shards")
        big = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [f"doc {i}" for i in range(6)]})
        write_tar_shards(rd.from_pandas(big), out, docs_per_shard=3)
        small = pd.DataFrame({
            "doc_id": np.arange(2, dtype=np.int64),
            "text": [f"new {i}" for i in range(2)]})
        write_tar_shards(rd.from_pandas(small), out, docs_per_shard=3)
        got = read_tar_shards(out).to_pandas().sort_values("doc_id")
        # docs 3..5 live in stale shard-000001.tar and must NOT appear
        assert got["doc_id"].tolist() == [0, 1]
        assert got["text"].tolist() == ["new 0", "new 1"]
