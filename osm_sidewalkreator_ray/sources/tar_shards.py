"""WebDataset-style tar-shard trainer feed (stdlib ``tarfile`` only).

Large-scale training loaders (WebDataset, Mosaic streaming) consume a
corpus as a directory of tar shards — sequential-read-friendly, one
shard per loader worker. This module writes a documents Dataset as
deterministic, byte-reproducible shards and streams them back:

- shard assignment is ``doc_id // docs_per_shard`` — a pure function
  of the row, so retries, re-partitioning and re-runs place every doc
  in the same shard (shards are uneven when ids are sparse; that is
  the documented trade for resumability without a global sort).
- ONE bucketed shuffle co-locates each shard's docs; the writer task
  sorts by doc_id, builds the tar with zeroed mtime/uid/gid (two runs
  produce byte-identical shards), writes to a temp name and
  ``os.replace``s — the resumable-output rule: a re-run converges on
  the same file set instead of duplicating.
- each sample is ``{doc_id:012d}.txt`` (UTF-8 text) plus, when
  ``meta_cols`` is given, ``{doc_id:012d}.json`` — the WebDataset
  same-key-multiple-extensions convention.
- ``read_tar_shards`` parallelizes per shard file via
  ``read_binary_files`` (the format's natural parallel unit, same
  shape as ``sources/warc.py``).
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pandas as pd


def _tar_add(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tf.addfile(info, io.BytesIO(data))


def write_tar_shards(docs, out_dir: str, docs_per_shard: int = 1000,
                     text_col: str = "text", id_col: str = "doc_id",
                     meta_cols: list[str] | None = None,
                     num_buckets: int = 32) -> pd.DataFrame:
    """Write ``docs`` as ``shard-{id:06d}.tar`` files under
    ``out_dir``; returns the manifest (shard_path, n_docs, n_bytes)
    and writes it as ``_manifest.jsonl`` alongside (atomic)."""
    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = list(meta_cols or [])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        shard = b[id_col].to_numpy(np.int64) // docs_per_shard
        b["__shard"] = shard
        b["__b"] = (pd.util.hash_array(shard)
                    % num_buckets).astype(np.int64)
        return b

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for shard_id, grp in g.groupby("__shard", sort=True):
            grp = grp.sort_values(id_col)
            path = os.path.join(out_dir, f"shard-{shard_id:06d}.tar")
            tmp = path + ".tmp"
            with tarfile.open(tmp, "w") as tf:
                for _, r in grp.iterrows():
                    key = f"{int(r[id_col]):012d}"
                    _tar_add(tf, key + ".txt",
                             str(r[text_col]).encode("utf-8"))
                    if meta_cols:
                        meta = {c: (r[c].item()
                                    if hasattr(r[c], "item") else r[c])
                                for c in meta_cols}
                        _tar_add(tf, key + ".json",
                                 json.dumps(meta, sort_keys=True)
                                 .encode("utf-8"))
            os.replace(tmp, path)
            rows.append((path, len(grp), os.path.getsize(path)))
        return pd.DataFrame(rows, columns=["shard_path", "n_docs",
                                           "n_bytes"]) \
            if rows else pd.DataFrame(
                {"shard_path": pd.Series(dtype=object),
                 "n_docs": pd.Series(dtype="int64"),
                 "n_bytes": pd.Series(dtype="int64")})

    manifest = (docs.map_batches(tag, batch_format="pandas")
                .groupby("__b")
                .map_groups(write_bucket, batch_format="pandas")
                .to_pandas()
                .sort_values("shard_path").reset_index(drop=True))
    mtmp = os.path.join(out_dir, "_manifest.jsonl.tmp")
    with open(mtmp, "w") as f:
        for _, r in manifest.iterrows():
            f.write(json.dumps({"shard_path": r["shard_path"],
                                "n_docs": int(r["n_docs"]),
                                "n_bytes": int(r["n_bytes"])}) + "\n")
    os.replace(mtmp, os.path.join(out_dir, "_manifest.jsonl"))
    return manifest


def read_tar_shards(out_dir: str, id_col: str = "doc_id"):
    """Stream shards back as a Dataset of (doc_id, text, meta_json) —
    meta_json is the raw ``.json`` member string or None. One decode
    task per shard file."""
    import ray.data as rd

    # the manifest defines the valid file set: a later, smaller write
    # may leave stale shard files from a previous run on disk (the
    # writer only converges files it still owns), and globbing would
    # silently feed those deleted docs back to the trainer
    man = os.path.join(out_dir, "_manifest.jsonl")
    if os.path.exists(man):
        paths = []
        with open(man) as f:
            for line in f:
                if line.strip():
                    paths.append(json.loads(line)["shard_path"])
        paths.sort()
    else:
        paths = sorted(
            os.path.join(out_dir, p) for p in os.listdir(out_dir)
            if p.endswith(".tar"))
    files = rd.read_binary_files(paths, include_paths=True)

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        ids, texts, metas = [], [], []
        for blob in b["bytes"]:
            texts_by_key: dict[str, str] = {}
            metas_by_key: dict[str, str] = {}
            with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                for m in tf.getmembers():
                    if not m.isfile():
                        continue
                    key, dot, ext = m.name.rpartition(".")
                    data = tf.extractfile(m).read()
                    if ext == "txt":
                        texts_by_key[key] = data.decode("utf-8")
                    elif ext == "json":
                        metas_by_key[key] = data.decode("utf-8")
            for key in sorted(texts_by_key):
                ids.append(int(key))
                texts.append(texts_by_key[key])
                metas.append(metas_by_key.get(key))
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "text": pd.Series(texts, dtype=object),
            "meta_json": pd.Series(metas, dtype=object)})

    return files.map_batches(parse, batch_format="pandas")
