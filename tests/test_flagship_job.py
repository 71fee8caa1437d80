"""The `ray job submit` entrypoint: fresh run writes partitions +
prints the metrics line; an identical re-submit resumes from the
manifests and recomputes nothing."""

import json

import pytest

from jobs.flagship_job import main


@pytest.mark.usefixtures("ray_session")
def test_flagship_job_run_and_resume(tmp_path, capsys):
    out = str(tmp_path / "run1")
    sf = "/root/testdata/sf0.001"

    assert main(["--sf-dir", sf, "--out", out]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["metric"] == "flagship_job"
    assert m1["partitions"] > 0 and m1["join_rows"] > 0

    # identical re-submit: both manifests already complete
    assert main(["--sf-dir", sf, "--out", out]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["partitions"] == 0 and m2["join_rows"] == 0
