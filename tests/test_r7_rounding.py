"""Cross-engine rounding parity (r7): _duckdb_round6 must reproduce
DuckDB's round(x, 6) on doubles bit-for-bit, including -0.0 — the seam
behind the CORRECTNESS_r06 kg_modularity hash-fail (F.round's BigDecimal
HALF_UP path drops the sign of negative zero)."""

import math
import struct

import pytest


def _bits(x: float) -> str:
    return struct.pack("<d", x).hex()


def test_duckdb_round6_matches_duckdb_bitwise(spark):
    duckdb = pytest.importorskip("duckdb")
    from pyspark.sql import functions as F

    from gliner_spark.operators.graph_analytics import _duckdb_round6

    import random

    rng = random.Random(7)
    vals = [
        0.0, -0.0, 1.0, -1.0, 0.5e-6, -0.5e-6, 1.5e-6, -1.5e-6,
        2.5e-6, -2.5e-6, 1e-7, -1e-7, -7.903e-10, 0.9999995, -0.9999995,
        0.123456789, -0.123456789, 0.1234565, -0.1234565,
    ]
    # the kg_modularity domain: exact-bigint numerator over 4*m^2
    for _ in range(400):
        m = rng.randint(1, 10_000)
        e = rng.randint(0, m)
        d = rng.randint(0, 2 * m)
        vals.append((4 * m * e - d * d) / (4 * m * m))
    vals += [rng.uniform(-2, 2) for _ in range(400)]

    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r.y
        for r in sdf.select(_duckdb_round6(F.col("x")).alias("y"))
        .toPandas()
        .itertuples()
    ]
    con = duckdb.connect()
    want = [
        con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]
        for v in vals
    ]
    bad = [
        (v, g, w)
        for v, g, w in zip(vals, got, want)
        if _bits(float(g)) != _bits(float(w))
    ]
    assert not bad, f"{len(bad)} bit mismatches, first: {bad[:3]}"
    # the fix's raison d'etre: negative zero survives
    assert math.copysign(1.0, got[vals.index(-7.903e-10)]) == -1.0
