"""spark-submit entrypoint smoke test: run goskema_spark.__main__ against
a parquet corpus and check the ledger + JSON summary."""

import json
import shutil
import subprocess
import sys
import tempfile

from goskema_spark.corpus import corpus_from_documents, dim_source_df

SF = "/root/testdata/sf0.001"


def test_cli_end_to_end(spark):
    tmp = tempfile.mkdtemp()
    try:
        corpus_from_documents(spark, SF).write.mode("overwrite").parquet(f"{tmp}/in")
        dim_source_df(spark).write.mode("overwrite").parquet(f"{tmp}/dim")
        out = subprocess.run(
            [sys.executable, "-m", "goskema_spark",
             "--input", f"{tmp}/in", "--dim-source", f"{tmp}/dim",
             "--ledger", f"{tmp}/ledger", "--violations", f"{tmp}/viols",
             "--run-id", "cli-test", "--repartition", "4"],
            capture_output=True, text=True, timeout=600, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        summary = json.loads(line)
        assert summary["verdict"] == "fail"  # corrupted corpus must fail
        assert summary["rows"] == 500
        assert summary["violations"] > 0
        assert summary["partitions"] >= 20
        led = spark.read.parquet(f"{tmp}/ledger")
        assert led.filter("run_id = 'cli-test'").count() == summary["partitions"]
        viols = spark.read.parquet(f"{tmp}/viols")
        assert viols.count() == summary["violations"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
