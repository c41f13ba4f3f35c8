"""Deployment-shape smoke test: the north rule's `spark-submit --py-files`
path, run for real.

The pipeline's cluster deployment is

    zip -r cantine_spark.zip cantine_spark
    spark-submit --py-files cantine_spark.zip scripts/cantine_submit.py ...

(reference analog: cantine ships `load` / `query` binaries driven by a
shell — cantine/src/bin/load.rs, query.rs). Everything else in the suite
imports the package in-process; this test proves the submitted artifact is
self-contained: a FRESH JVM + fresh Python workers that only see the
package through the --py-files zip can build an index and answer a BM25
query over it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _make_pyfiles_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "cantine_spark.zip")
    pkg = os.path.join(REPO, "cantine_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath: str, *argv: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # the submitted script must NOT resolve the package from the repo cwd —
    # run from a neutral cwd so only --py-files provides cantine_spark
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "cantine_submit.py"),
        *argv,
    ]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          env=env, cwd=os.path.dirname(zpath))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on PATH")
def test_spark_submit_build_then_search(spark, tmp_path):
    # synthesize a tiny input_hint-shaped corpus with the session we
    # already have (datagen is not part of the deployment under test)
    from cantine_spark.corpus import generate_corpus
    corpus_dir = str(tmp_path / "corpus")
    generate_corpus(spark, 300, partitions=4).write.parquet(corpus_dir)

    zpath = _make_pyfiles_zip(str(tmp_path))
    index_dir = str(tmp_path / "idx")

    built = _submit(zpath, "build", "--corpus", corpus_dir,
                    "--index", index_dir)
    assert built.returncode == 0, built.stderr[-4000:]
    manifest = json.loads(built.stdout.strip().splitlines()[-1])
    assert manifest["n_docs"] == 300

    found = _submit(zpath, "search", "--index", index_dir,
                    "--query", '{"fulltext": "def", "num_items": 5}')
    assert found.returncode == 0, found.stderr[-4000:]
    res = json.loads(found.stdout.strip().splitlines()[-1])
    assert res["total_found"] > 0
    assert 0 < len(res["items"]) <= 5
    # the submitted engine scores for real: BM25 scores are positive,
    # descending, and every hit carries the hydrated doc fields
    scores = [it["score"] for it in res["items"]]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all("path" in it and "doc_id" in it for it in res["items"])
