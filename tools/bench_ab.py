"""A/B statistical micro-benchmark: gather fast path vs dense einsum
baseline.

Mirrors the reference's benchmark discipline
(benchmarks/BENCHMARK_batch_level_decoding.md:27-37): bit-identical-output
precondition, interleaved A/B execution, warmup reps, Welch's t-test.
No scipy in this container — the t statistic is computed directly and
compared against the t(0.975, dof) critical value table.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gliner_spark.presets import default_model
from gliner_spark.sources.synth import assembled_text, gen_doc

WARMUP, REPS, N_DOCS = 5, 20, 300


def t_crit(dof: float) -> float:
    # two-sided 5% critical values, conservative stepwise table
    for lim, v in [(10, 2.23), (20, 2.09), (30, 2.04), (60, 2.0), (1e9, 1.96)]:
        if dof <= lim:
            return v
    return 1.96


def main():
    model = default_model()
    texts = [assembled_text(gen_doc(i)["spans"]) for i in range(N_DOCS)]

    # precondition: identical outputs (the reference requires bit-identity
    # before accepting a speedup)
    for t in texts[:50]:
        fast = model.predict_doc(t)[0]
        dense = model.predict_doc_dense(t)
        assert [(x["start"], x["end"], x["label"]) for x in fast] == [
            (x["start"], x["end"], x["label"]) for x in dense
        ], "fast path output differs from dense baseline"

    def run_fast():
        for t in texts:
            model.predict_doc(t)

    def run_dense():
        for t in texts:
            model.predict_doc_dense(t)

    a_times, b_times = [], []
    for rep in range(WARMUP + REPS):
        # interleave A/B within each rep to cancel thermal/quota drift
        t0 = time.perf_counter(); run_fast(); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); run_dense(); tb = time.perf_counter() - t0
        if rep >= WARMUP:
            a_times.append(ta)
            b_times.append(tb)

    # npz dense-checkpoint path (core/dense.py): embedding lookup ->
    # SpanMarkerV0 -> prompt matmul. Not output-comparable to the gather
    # model (different weights); timed for the cost row the scoring stage
    # pays when real exported weights replace the gazetteer construction.
    from gliner_spark.core.dense import random_quantized, score_doc_dense

    ck = random_quantized(["person", "organization", "location", "date"])
    c_times = []
    for rep in range(WARMUP + REPS):
        t0 = time.perf_counter()
        for t in texts:
            score_doc_dense(t, ck)
        if rep >= WARMUP:
            c_times.append(time.perf_counter() - t0)

    a, b = np.array(a_times), np.array(b_times)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    n = len(a)
    t_stat = (b.mean() - a.mean()) / np.sqrt(va / n + vb / n)
    dof = (va / n + vb / n) ** 2 / (
        (va / n) ** 2 / (n - 1) + (vb / n) ** 2 / (n - 1)
    )
    out = {
        "fast_ms_per_doc": round(a.mean() / N_DOCS * 1000, 4),
        "dense_ms_per_doc": round(b.mean() / N_DOCS * 1000, 4),
        "dense_ckpt_ms_per_doc": round(
            float(np.mean(c_times)) / N_DOCS * 1000, 4
        ),
        "speedup": round(b.mean() / a.mean(), 2),
        "welch_t": round(float(t_stat), 2),
        "dof": round(float(dof), 1),
        "significant_p05": bool(abs(t_stat) > t_crit(dof)),
        "reps": n,
        "identical_outputs": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
