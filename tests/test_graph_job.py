"""graph_job CLI: per-vertex parquet outputs + JSON reports across
representative modes, plus the inline diameter report."""

import json

import numpy as np
import pandas as pd
import pytest

from jobs.graph_job import main as gj_main

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges(tmp_path):
    # two 2-cycles bridged + a pendant: nontrivial CC/SCC/coloring
    # kept SMALL — the SCC mode pays per-round fixed costs
    el = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4)]
    df = pd.DataFrame(el, columns=["src", "dst"]).astype("int64")
    p = str(tmp_path / "edges.parquet")
    df.to_parquet(p)
    return p, df


def test_components_pagerank_coloring(tmp_path, capsys):
    src, df = _edges(tmp_path)

    out = str(tmp_path / "cc")
    assert gj_main(["components", "--edges", src, "--out", out,
                    "--num-buckets", "4"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["metric"] == "graph_job" and rep["rows"] == 5
    cc = pd.read_parquet(out)
    assert set(cc["component"]) == {0}  # one weak component

    out = str(tmp_path / "pr")
    assert gj_main(["pagerank", "--edges", src, "--out", out,
                    "--num-buckets", "4", "--iters", "5"]) == 0
    pr = pd.read_parquet(out)
    assert len(pr) == 5
    np.testing.assert_allclose(pr["rank"].sum(), 1.0, rtol=1e-6)

    out = str(tmp_path / "col")
    assert gj_main(["coloring", "--edges", src, "--out", out,
                    "--num-buckets", "4"]) == 0
    col = pd.read_parquet(out)
    cmap = dict(zip(col["vertex"], col["color"]))
    for s, d in df.itertuples(index=False):
        assert cmap[s] != cmap[d]


def test_scc_and_diameter_report(tmp_path, capsys):
    src, _ = _edges(tmp_path)

    out = str(tmp_path / "scc")
    assert gj_main(["scc", "--edges", src, "--out", out,
                    "--num-buckets", "4"]) == 0
    capsys.readouterr()
    scc = pd.read_parquet(out)
    got = dict(zip(scc["vertex"], scc["scc"]))
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4}

    assert gj_main(["diameter", "--edges", src,
                    "--num-buckets", "4"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "diameter" and rep["diameter_lb"] >= 3


def test_out_required(tmp_path):
    src, _ = _edges(tmp_path)
    with pytest.raises(SystemExit):
        gj_main(["pagerank", "--edges", src])
