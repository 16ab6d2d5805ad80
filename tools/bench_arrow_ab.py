"""A/B: row-path (mapInPandas dict-rows) vs columnar (mapInArrow) mention
extraction. Precondition: identical rows. Interleaved best-of-N like
tools/bench_ab.py (co-tenant variance defense)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from gliner_spark.operators.extraction import (  # noqa: E402
    extract_mentions_arrow,
    extract_mentions_only,
)
from gliner_spark.presets import default_model  # noqa: E402
from gliner_spark.session import get_spark  # noqa: E402
from gliner_spark.sources.synth import synth_docs  # noqa: E402

N_DOCS, REPS = 100_000, 3


def main():
    spark = get_spark(app_name="bench-arrow-ab")
    spark.sparkContext.setLogLevel("ERROR")
    model = default_model()
    docs = synth_docs(spark, N_DOCS, partitions=32).persist()
    docs.count()

    a = sorted(map(tuple, extract_mentions_only(docs.limit(2000), model).collect()))
    b = sorted(map(tuple, extract_mentions_arrow(docs.limit(2000), model).collect()))
    assert a == b, "arrow path rows differ from pandas path"

    t_pandas, t_arrow = [], []
    extract_mentions_only(docs, model).count()  # warm workers
    for _ in range(REPS):
        t0 = time.time()
        n1 = extract_mentions_only(docs, model).count()
        t_pandas.append(time.time() - t0)
        t0 = time.time()
        n2 = extract_mentions_arrow(docs, model).count()
        t_arrow.append(time.time() - t0)
        assert n1 == n2
    out = {
        "n_docs": N_DOCS,
        "rows": n1,
        "pandas_sec": round(min(t_pandas), 3),
        "arrow_sec": round(min(t_arrow), 3),
        "speedup": round(min(t_pandas) / min(t_arrow), 3),
        "identical_rows": True,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
