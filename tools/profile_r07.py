"""r7 targeted profiler: noop-sink isolation of the extraction chain and
selected operators (guide §1.4). NOT the driver bench — bench.py is frozen;
this exists to attribute wall time to chain stages before/after changes.

Usage: python tools/profile_r07.py [sf_dir] [targets_csv]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gliner_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
REPS = int(os.environ.get("PROF_REPS", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="profile-r07")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entry
    from gliner_spark.cache import release_caches
    from gliner_spark.operators.extraction import (
        extract_graph,
        mentions_table,
        triples_raw_table,
    )
    from gliner_spark.operators.linking import (
        canonicalize,
        rewrite_triples,
        surface_table,
    )
    from gliner_spark.presets import default_model
    from gliner_spark.sources.synth import synth_docs

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count() * 10

    def synth():
        return synth_docs(spark, n_docs, partitions=32)

    model = default_model()

    def t_synth_only():
        noop(synth())

    def t_extract():
        noop(extract_graph(synth(), model))

    def t_mentions():
        noop(mentions_table(extract_graph(synth(), model)))

    def t_surfaces():
        noop(surface_table(mentions_table(extract_graph(synth(), model))))

    def t_canonicalize():
        g = extract_graph(synth(), model).persist()
        _, smap = canonicalize(mentions_table(g), model.config)
        noop(smap)
        release_caches(smap)
        g.unpersist()

    def t_triples_chain():
        df = entry.queries()["kg_triples"](spark, SF)
        noop(df)
        release_caches(df)

    targets = {
        "synth_only": t_synth_only,
        "extract": t_extract,
        "mentions": t_mentions,
        "surfaces": t_surfaces,
        "canonicalize": t_canonicalize,
        "triples_chain": t_triples_chain,
    }
    # any declared query by name: query:<name>
    qs = entry.queries()

    def q_runner(name):
        def run():
            df = qs[name](spark, SF)
            noop(df)
            release_caches(df)
        return run

    names = ONLY or list(targets)
    out = {}
    # warmup
    qs["rel_q1"](spark, SF).count()
    for name in names:
        fn = targets.get(name) or q_runner(name.replace("query:", ""))
        reps = []
        for _ in range(REPS):
            sc.setJobDescription(f"prof:{name}")
            t0 = time.time()
            fn()
            reps.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = reps
        print(name, reps, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
