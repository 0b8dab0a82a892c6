"""North-rule run mode: the pipeline must run via
``spark-submit --py-files`` (BASELINE.json north_rule). This drives the
REAL launcher: zip the package, spark-submit run_cdc.py in a fresh JVM
against a materialized feed, then verify the committed table from the
test session equals the LWW oracle."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

import nifi_spark
from nifi_spark.feedgen import generate_change_feed, materialize_feed
from nifi_spark.sinks.laketable import LakeTable

from .oracle import assert_final_state_equal, pandas_fold

REPO = os.path.dirname(os.path.dirname(os.path.abspath(nifi_spark.__file__)))


def _find_spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    submit = _find_spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")

    feed = generate_change_feed(spark, n_conversations=15, max_turns=4, max_edits=3)
    feed_dir = str(tmp_path / "feed")
    materialize_feed(feed, feed_dir, n_segments=2)
    expected = pandas_fold(feed.toPandas())

    zpath = str(tmp_path / "nifi_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "nifi_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))

    table, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")
    r = subprocess.run(
        [
            submit, "--master", "local[4]", "--py-files", zpath,
            os.path.join(REPO, "run_cdc.py"),
            "--feed-dir", feed_dir, "--table", table, "--checkpoint", ckpt,
            "--n-buckets", "4", "--sink-mode", "append", "--available-now",
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # NOT the repo: only the zip provides the package
    )
    assert r.returncode == 0, (r.stderr or "")[-3000:]

    t = LakeTable(spark, table, n_buckets=4)
    got = (
        t.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
    )
    assert_final_state_equal(got, expected)
