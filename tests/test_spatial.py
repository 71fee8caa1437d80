"""Spatial analysis operators: DBSCAN vs a naive O(N^2) reference and
a full recursive-closure DuckDB oracle (core counts -> core-graph
components -> deterministic border rule -> noise), plus exact formula
oracles for global Moran's I and Getis-Ord Gi*."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions import spatial as S

pytestmark = pytest.mark.usefixtures("ray_session")


def _points(n=400, seed=7, blobs=3, spread=2.0):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(10, 90, (blobs, 2))
    k = n // (blobs + 1)
    pts = [rng.normal(c, spread, (k, 2)) for c in centers]
    pts.append(rng.uniform(0, 100, (n - blobs * k, 2)))
    xy = np.vstack(pts)
    # non-contiguous ids so id != row index anywhere in the plan
    return pd.DataFrame({"id": np.arange(len(xy), dtype=np.int64) * 3 + 11,
                         "x": xy[:, 0], "y": xy[:, 1]})


def _dbscan_reference(df, eps, min_pts):
    """Single-process DBSCAN with the module's deterministic rules:
    cluster = min core id of the component; border joins the
    component of its minimum-id core neighbor."""
    ids = df["id"].to_numpy(np.int64)
    x = df["x"].to_numpy(np.float64)
    y = df["y"].to_numpy(np.float64)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    nb = d2 <= eps * eps
    core = nb.sum(1) >= min_pts

    parent = {int(i): int(i) for i in ids[core]}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    core_idx = np.where(core)[0]
    for ai in core_idx:
        for bi in core_idx[nb[ai, core_idx]]:
            ra, rb = find(int(ids[ai])), find(int(ids[bi]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    rows = []
    for idx, pid in enumerate(ids):
        pid = int(pid)
        if core[idx]:
            rows.append((pid, find(pid), "core"))
        else:
            nbr = ids[nb[idx] & core]
            nbr = nbr[nbr != pid]
            if len(nbr):
                rows.append((pid, find(int(nbr.min())), "border"))
            else:
                rows.append((pid, -1, "noise"))
    return (pd.DataFrame(rows, columns=["id", "cluster", "role"])
            .sort_values("id").reset_index(drop=True))


def _run_dbscan(df, eps, min_pts, nparts=7):
    ds = rd.from_pandas(df).repartition(nparts)
    out = S.dbscan(ds, eps, min_pts).to_pandas()
    out["role"] = out["role"].astype(object)
    return out.sort_values("id").reset_index(drop=True)


class TestDbscan:
    @pytest.mark.parametrize("eps,min_pts", [(3.0, 5), (2.0, 3),
                                             (5.0, 10)])
    def test_matches_naive_reference(self, eps, min_pts):
        df = _points()
        got = _run_dbscan(df, eps, min_pts)
        want = _dbscan_reference(df, eps, min_pts)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_sql_recursive_oracle(self):
        """The whole chain vs one DuckDB query: neighbor counts,
        WITH RECURSIVE min-label closure of the core graph, the
        min-core-neighbor border rule, noise."""
        df = _points(n=220, seed=11)
        eps, min_pts = 3.0, 4
        got = _run_dbscan(df, eps, min_pts)
        con = duckdb.connect()
        con.register("pts", df)
        want = con.execute(f"""
            WITH RECURSIVE
            pairs AS (
              SELECT a.id AS i, b.id AS j FROM pts a, pts b
              WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
                    <= {eps * eps}),
            cnt AS (SELECT i, COUNT(*) AS n FROM pairs GROUP BY i),
            core AS (SELECT i AS id FROM cnt WHERE n >= {min_pts}),
            ce AS (SELECT p.i AS u, p.j AS v FROM pairs p
                   WHERE p.i IN (SELECT id FROM core)
                     AND p.j IN (SELECT id FROM core)),
            reach(u, lbl) AS (
                SELECT id, id FROM core
                UNION
                SELECT ce.u, r.lbl FROM ce JOIN reach r ON ce.v = r.u),
            comp AS (SELECT u AS id, MIN(lbl) AS component
                     FROM reach GROUP BY u),
            border_rep AS (
                SELECT p.i AS id, MIN(p.j) AS rep FROM pairs p
                WHERE p.i NOT IN (SELECT id FROM core)
                  AND p.j IN (SELECT id FROM core) AND p.i <> p.j
                GROUP BY p.i),
            lab AS (
                SELECT c.id, cm.component AS cluster, 'core' AS role
                FROM core c JOIN comp cm ON cm.id = c.id
                UNION ALL
                SELECT b.id, cm.component, 'border' FROM border_rep b
                JOIN comp cm ON cm.id = b.rep
                UNION ALL
                SELECT p.id, -1, 'noise' FROM pts p
                WHERE p.id NOT IN (SELECT id FROM core)
                  AND p.id NOT IN (SELECT id FROM border_rep))
            SELECT id, cluster, role FROM lab ORDER BY id
        """).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_exact_eps_boundary_is_closed(self):
        # two points at distance EXACTLY eps are neighbors (<=)
        df = pd.DataFrame({"id": [1, 2], "x": [0.0, 3.0],
                           "y": [0.0, 0.0]})
        got = _run_dbscan(df, 3.0, 2, nparts=2)
        assert got["role"].tolist() == ["core", "core"]
        assert got["cluster"].tolist() == [1, 1]

    def test_all_noise_when_min_pts_too_high(self):
        df = _points(n=60, seed=3)
        got = _run_dbscan(df, 0.5, 50)
        assert (got["role"] == "noise").all()
        assert (got["cluster"] == -1).all()

    def test_min_pts_one_makes_isolated_singleton_cores(self):
        df = pd.DataFrame({"id": [10, 20, 30],
                           "x": [0.0, 100.0, 100.5],
                           "y": [0.0, 0.0, 0.0]})
        got = _run_dbscan(df, 1.0, 1, nparts=2)
        assert got["role"].tolist() == ["core"] * 3
        assert got["cluster"].tolist() == [10, 20, 20]


class TestMoransI:
    def _oracle(self, df, d):
        con = duckdb.connect()
        con.register("pts", df)
        return con.execute(f"""
            WITH g AS (SELECT COUNT(*) AS n, AVG(v) AS m FROM pts),
            pairs AS (
              SELECT a.v AS vi, b.v AS vj FROM pts a, pts b
              WHERE a.id <> b.id
                AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
                    <= {d * d}),
            num AS (SELECT COUNT(*) AS s0,
                           SUM((vi - (SELECT m FROM g))
                               * (vj - (SELECT m FROM g))) AS cross
                    FROM pairs),
            den AS (SELECT SUM((v - (SELECT m FROM g))
                               * (v - (SELECT m FROM g))) AS m2
                    FROM pts)
            SELECT (SELECT n FROM g) * 1.0 / num.s0
                   * num.cross / den.m2 AS i,
                   num.s0 AS s0
            FROM num, den
        """).df()

    def test_positive_autocorrelation_matches_oracle(self):
        rng = np.random.RandomState(5)
        # uniform field whose value follows position -> strong
        # positive autocorrelation at a short distance band
        df = pd.DataFrame({
            "id": np.arange(300, dtype=np.int64) * 7 + 3,
            "x": rng.uniform(0, 100, 300),
            "y": rng.uniform(0, 100, 300)})
        df["v"] = df["x"] + df["y"] + rng.normal(0, 1, len(df))
        got = S.morans_i(rd.from_pandas(df).repartition(5), "v", 8.0)
        want = self._oracle(df, 8.0)
        assert got["s0"].iloc[0] == want["s0"].iloc[0]
        assert got["morans_i"].iloc[0] == pytest.approx(
            want["i"].iloc[0], rel=1e-9)
        assert got["morans_i"].iloc[0] > 0.3
        assert got["expected_i"].iloc[0] == pytest.approx(-1 / 299)

    def test_checkerboard_is_negative(self):
        n = 12
        ix, iy = np.meshgrid(np.arange(n), np.arange(n))
        df = pd.DataFrame({
            "id": np.arange(n * n, dtype=np.int64),
            "x": ix.ravel().astype(float),
            "y": iy.ravel().astype(float),
            "v": ((ix.ravel() + iy.ravel()) % 2 * 2 - 1).astype(float)})
        got = S.morans_i(rd.from_pandas(df).repartition(4), "v", 1.0)
        want = self._oracle(df, 1.0)
        assert got["morans_i"].iloc[0] == pytest.approx(
            want["i"].iloc[0], rel=1e-9)
        assert got["morans_i"].iloc[0] < -0.9


class TestGetisOrdGstar:
    def test_matches_formula_oracle(self):
        rng = np.random.RandomState(9)
        df = _points(n=250, seed=9)
        df["v"] = np.where(df["x"] > 50, 10.0, 1.0) \
            + rng.normal(0, 0.5, len(df))
        d = 6.0
        got = (S.getis_ord_gstar(rd.from_pandas(df).repartition(5),
                                 "v", d)
               .to_pandas().sort_values("id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("pts", df)
        want = con.execute(f"""
            WITH g AS (SELECT COUNT(*) AS n, AVG(v) AS m,
                              STDDEV_POP(v) AS s FROM pts),
            nb AS (SELECT a.id, COUNT(*) AS wi, SUM(b.v) AS sx
                   FROM pts a JOIN pts b
                     ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
                        <= {d * d}
                   GROUP BY a.id)
            SELECT nb.id, nb.wi,
                   (sx - m * wi)
                   / (s * sqrt((n * wi - wi * wi) / (n - 1.0))) AS gi
            FROM nb, g ORDER BY nb.id
        """).df()
        assert got["id"].tolist() == want["id"].tolist()
        assert got["n_neighbors"].tolist() == want["wi"].tolist()
        np.testing.assert_allclose(got["gi_star"].to_numpy(),
                                   want["gi"].to_numpy(), rtol=1e-9)
        # hot half scores hot: max |z| point sits in the high-value half
        hot = got.loc[got["gi_star"].idxmax(), "id"]
        assert df.loc[df["id"] == hot, "x"].iloc[0] > 50


class TestIDWInterpolate:
    """IDW estimates vs an exact DuckDB oracle with the same
    coincident-point and empty-neighborhood conventions."""

    def _data(self, seed=3, n_s=300, n_q=60):
        rng = np.random.RandomState(seed)
        samp = pd.DataFrame({
            "id": np.arange(n_s, dtype=np.int64),
            "x": rng.uniform(0, 100, n_s),
            "y": rng.uniform(0, 100, n_s),
            "v": rng.uniform(-5, 10, n_s)})
        qry = pd.DataFrame({
            "id": np.arange(n_q, dtype=np.int64) * 7 + 1,
            "x": rng.uniform(0, 100, n_q),
            "y": rng.uniform(0, 100, n_q),
            "v": np.zeros(n_q)})
        # query 0 coincides with two samples (duplicate sample site)
        samp.loc[1, ["x", "y"]] = samp.loc[0, ["x", "y"]].to_numpy()
        qry.loc[0, ["x", "y"]] = samp.loc[0, ["x", "y"]].to_numpy()
        # query 1 is out of everyone's reach
        qry.loc[1, ["x", "y"]] = [1e4, 1e4]
        return samp, qry

    @pytest.mark.parametrize("radius,power", [(12.0, 2.0), (25.0, 1.0)])
    def test_matches_duckdb_oracle(self, radius, power):
        samp, qry = self._data()
        got = (S.idw_interpolate(
            rd.from_pandas(samp).repartition(4),
            rd.from_pandas(qry).repartition(3),
            radius=radius, power=power)
            .to_pandas().sort_values("id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("samp", samp)
        con.register("qry", qry)
        want = con.execute(f"""
            WITH pairs AS (
              SELECT q.id,
                     s.v,
                     sqrt((q.x-s.x)*(q.x-s.x)
                          + (q.y-s.y)*(q.y-s.y)) AS d
              FROM qry q JOIN samp s
                ON (q.x-s.x)*(q.x-s.x) + (q.y-s.y)*(q.y-s.y)
                   <= {radius * radius})
            SELECT q.id,
                   CASE
                     WHEN COUNT(p.d) = 0 THEN NULL
                     WHEN SUM(CASE WHEN p.d = 0 THEN 1 ELSE 0 END) > 0
                       THEN SUM(CASE WHEN p.d = 0 THEN p.v END)
                            / SUM(CASE WHEN p.d = 0 THEN 1 ELSE 0 END)
                     ELSE SUM(p.v / POWER(p.d, {power}))
                          / SUM(1.0 / POWER(p.d, {power}))
                   END AS est,
                   COUNT(p.d) AS n_samples
            FROM qry q LEFT JOIN pairs p ON p.id = q.id
            GROUP BY q.id ORDER BY q.id
        """).df()
        assert got["id"].tolist() == want["id"].tolist()
        assert got["n_samples"].tolist() == want["n_samples"].tolist()
        np.testing.assert_allclose(got["est"].to_numpy(),
                                   want["est"].to_numpy(), rtol=1e-9)

    def test_coincident_and_empty_conventions(self):
        samp, qry = self._data()
        got = (S.idw_interpolate(rd.from_pandas(samp),
                                 rd.from_pandas(qry), radius=12.0)
               .to_pandas().set_index("id"))
        assert len(got) == len(qry)  # nobody dropped
        # coincident query: mean of the two stacked sample values
        v0 = samp.loc[[0, 1], "v"].mean()
        np.testing.assert_allclose(got.loc[1, "est"], v0)
        # unreachable query: NaN est, zero neighbors
        assert np.isnan(got.loc[8, "est"])
        assert got.loc[8, "n_samples"] == 0


class TestConvexHull:

    def test_known_square(self):
        rng = np.random.RandomState(5)
        inner = rng.uniform(1, 9, (500, 2))
        corners = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.]])
        # edge midpoints are collinear boundary points -> excluded
        mids = np.array([[5., 0.], [10., 5.], [5., 10.], [0., 5.]])
        df = pd.DataFrame(np.vstack([inner, corners, mids]),
                          columns=["x", "y"])
        hull = S.convex_hull(rd.from_pandas(df).repartition(6))
        assert sorted(map(tuple, hull.to_numpy())) \
            == sorted(map(tuple, corners))

    def test_properties_random(self):
        rng = np.random.RandomState(11)
        pts = rng.normal(0, 30, (4000, 2))
        df = pd.DataFrame(pts, columns=["x", "y"])
        hull = S.convex_hull(rd.from_pandas(df).repartition(8),
                             batch_size=512).to_numpy()
        # vertices are input points
        src = set(map(tuple, pts))
        assert all(tuple(v) in src for v in hull)
        # strictly convex, CCW
        for a, b, c in zip(hull, np.roll(hull, -1, axis=0),
                           np.roll(hull, -2, axis=0)):
            assert (b[0] - a[0]) * (c[1] - a[1]) \
                - (b[1] - a[1]) * (c[0] - a[0]) > 0
        # contains every input point
        for a, b in zip(hull, np.roll(hull, -1, axis=0)):
            cr = (b[0] - a[0]) * (pts[:, 1] - a[1]) \
                - (b[1] - a[1]) * (pts[:, 0] - a[0])
            assert (cr >= -1e-9).all()
        # starts at the lexicographically smallest vertex
        assert tuple(hull[0]) == min(map(tuple, hull))

    def test_degenerate_collinear_and_dupes(self):
        df = pd.DataFrame({"x": [1., 1., 3., 5., 5., 2.],
                           "y": [1., 1., 3., 5., 5., 2.]})
        hull = S.convex_hull(rd.from_pandas(df))
        assert sorted(map(tuple, hull.to_numpy())) \
            == [(1., 1.), (5., 5.)]
        one = S.convex_hull(rd.from_pandas(
            pd.DataFrame({"x": [2.], "y": [3.]})))
        assert one.to_numpy().tolist() == [[2., 3.]]
        empty = S.convex_hull(rd.from_pandas(
            pd.DataFrame({"x": pd.Series([], dtype="float64"),
                          "y": pd.Series([], dtype="float64")})))
        assert len(empty) == 0
