"""Reader round-trips and the spark-submit CLI entrypoint."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

from pyspark.sql import functions as F

from gliner_spark.sources.readers import load_docs, load_ner_eval_json
from gliner_spark.sources.synth import synth_docs


def test_load_docs_formats_roundtrip(spark):
    """parquet / json / orc / csv-with-JSON-spans all load to identical
    rows (csv written by write_docs_csv — the labeling-tool/warehouse-dump
    interchange shape)."""
    from gliner_spark.sources.readers import write_docs_csv

    tmp = tempfile.mkdtemp(prefix="gs_rd_")
    try:
        docs = synth_docs(spark, 50, partitions=2)
        docs.write.mode("overwrite").parquet(f"{tmp}/p")
        docs.write.mode("overwrite").json(f"{tmp}/j")
        docs.write.mode("overwrite").orc(f"{tmp}/o")
        write_docs_csv(docs, f"{tmp}/c")
        loaded = {
            fmt: load_docs(spark, f"{tmp}/{fmt[0]}", fmt=fmt)
            for fmt in ("parquet", "json", "orc", "csv")
        }
        fp = {
            fmt: {r.doc_id: str(r.spans) for r in df.collect()}
            for fmt, df in loaded.items()
        }
        assert all(df.count() == 50 for df in loaded.values())
        assert fp["parquet"] == fp["json"] == fp["orc"] == fp["csv"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_load_ner_eval_json_reference_format(spark):
    tmp = tempfile.mkdtemp(prefix="gs_nj_")
    try:
        rows = [
            {"tokenized_text": ["john", "works", "at", "acme"],
             "ner": [[0, 0, "person"], [3, 3, "org"]]},
            {"tokenized_text": ["hello"], "ner": []},
        ]
        with open(f"{tmp}/eval.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        df = load_ner_eval_json(spark, f"{tmp}/eval.json")
        got = df.orderBy(F.size("tokenized_text").desc()).collect()
        assert got[0].tokenized_text == ["john", "works", "at", "acme"]
        assert [(n.start, n.end, n.label) for n in got[0].ner] == [
            (0, 0, "person"), (3, 3, "org")
        ]
        assert got[1].ner == []
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_cli_pipeline_and_resume():
    out = tempfile.mkdtemp(prefix="gs_cli_t_")
    try:
        cmd = [
            sys.executable, "scripts/run_pipeline.py",
            "--synth", "300", "--output", out, "--buckets", "8",
        ]
        env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}
        p1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                            cwd="/root/repo", timeout=420)
        assert p1.returncode == 0, p1.stderr[-2000:]
        st1 = json.loads(p1.stdout.strip().splitlines()[-1])
        assert st1["buckets"] == 8 and st1["triples"] > 0
        # rerun: extraction is a no-op (resume), finalize recomputes
        p2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                            cwd="/root/repo", timeout=420)
        st2 = json.loads(p2.stdout.strip().splitlines()[-1])
        assert st2["buckets"] == 0 and st2["n_docs"] == 0
        assert st2["triples"] == st1["triples"]
    finally:
        shutil.rmtree(out, ignore_errors=True)
