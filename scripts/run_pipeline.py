#!/usr/bin/env python3
"""spark-submit entrypoint for the KG-construction pipeline (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Cluster usage:
    zip -r gliner_spark.zip gliner_spark/
    spark-submit --py-files gliner_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/run_pipeline.py \
        --input cat.db.docs --format iceberg \
        --output s3://bucket/graph --buckets 4096

Local / sandbox:
    python scripts/run_pipeline.py --synth 10000 --output /tmp/graph

Resume: re-run the same command; completed lineage buckets are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="docs table path / iceberg identifier")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "json", "orc", "csv"])
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N docs instead of reading --input")
    ap.add_argument("--output", required=True,
                    help="graph base path (parquet) or catalog.namespace "
                         "(--sink-format iceberg)")
    ap.add_argument("--sink-format", default="parquet",
                    choices=["parquet", "iceberg"],
                    help="graph-table sink format (sinks/materialize.TableIO)")
    ap.add_argument("--buckets", type=int, default=64,
                    help="lineage/resume bucket count (cluster: 1000s)")
    ap.add_argument("--labels", default="",
                    help="comma-separated label subset (zero-shot selection)")
    ap.add_argument("--extract-only", action="store_true",
                    help="skip linking/canonicalization (resume later)")
    args = ap.parse_args()

    import dataclasses

    from gliner_spark.presets import default_model
    from gliner_spark.session import get_spark
    from gliner_spark.sinks.materialize import finalize_graph, run_extraction
    from gliner_spark.sources.readers import load_docs
    from gliner_spark.sources.synth import synth_docs

    spark = get_spark(app_name="gliner-spark-pipeline")
    model = default_model()
    if args.buckets != model.config.lineage_buckets:
        model = dataclasses.replace(
            model, config=dataclasses.replace(model.config, lineage_buckets=args.buckets)
        )

    if args.synth:
        docs = synth_docs(spark, args.synth, partitions=max(32, args.buckets // 4))
    elif args.input:
        docs = load_docs(spark, args.input, fmt=args.format)
    else:
        ap.error("need --input or --synth")

    labels = [s.strip() for s in args.labels.split(",") if s.strip()] or None
    if labels:
        unknown = [l for l in labels if l not in model.labels]
        if unknown:
            ap.error(f"--labels not in model label set: {unknown}")

    stats = run_extraction(
        spark, docs, model, args.output, labels=labels, fmt=args.sink_format
    )
    if not args.extract_only:
        stats = {
            **stats,
            **finalize_graph(
                spark, args.output, model.config, fmt=args.sink_format
            ),
        }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
