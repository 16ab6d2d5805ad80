"""Capture .explain('formatted') for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <out_dir> <suffix> [queries_csv]
e.g.   python tools/capture_plans.py plans/r07 after kg_lpa,kg_bfs
Runs from whatever repo root is on sys.path[0] — point PYTHONPATH at a
round-start checkout to capture the 'before' side.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.environ.get("GS_PLAN_REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from gliner_spark.session import get_spark  # noqa: E402

OUT = sys.argv[1]
SUFFIX = sys.argv[2]
NAMES = sys.argv[3].split(",")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"plans-{SUFFIX}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    from gliner_spark.cache import release_caches

    for name in NAMES:
        try:
            df = qs[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            release_caches(df)
            path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print("wrote", path, flush=True)
        except Exception as e:
            print("FAIL", name, str(e)[:200], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
