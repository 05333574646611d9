"""North-rule packaging proof: the engine runs under a REAL
``spark-submit --py-files sdg_engine.zip`` invocation, from a neutral
working directory with the repo removed from PYTHONPATH — the only way
``import sdg_engine`` can succeed (driver or executor) is through the
shipped zip."""

import os
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    from sdg_engine.deploy import build_pyfiles_zip

    zip_path = build_pyfiles_zip()
    out_dir = str(tmp_path / "out")
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_rai.py"),
            SF, out_dir,
        ],
        cwd=str(tmp_path),  # neutral cwd: repo not importable implicitly
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # result correctness: same rows as the in-process flagship
    import pandas as pd
    import pyarrow.parquet as pq

    got = (
        pq.read_table(out_dir).to_pandas()
        .sort_values("country_code").reset_index(drop=True)
    )
    assert len(got) == 4  # the fixture's four countries
    assert (got["n_near"] <= got["n_points"]).all()
    assert ((got["rai"] >= 0) & (got["rai"] <= 1)).all()
