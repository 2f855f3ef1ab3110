"""Registration-time shape lint over the whole gate registry.

Round 4's driver run shipped three red classes the tolerant local gate
could not see, and two of them are STATIC output-shape properties:
array-typed output columns crash the driver's canonicalizer
(``random_projection`` / ``snapshot_diff``), and decimals wider than 18
digits are narrowed differently by the driver's two fetch paths
(``table_fingerprint``, and r1/r2's ``partition_lineage`` before it).

This test is the enforcement point: every registered gate's Spark
output schema (plan analysis only — no job runs) and its oracle's
BOUND DuckDB relation types are swept through the same rejection rules
``tools/selfcheck.py --strict`` applies, so a gate with an illegal
output shape fails ``pytest`` the day it is registered — before it can
wait months in the never-driver-checked queue and then red a round.

Streaming gates are excluded: their gate functions execute real
micro-batches at call time (cost), and all seven sit at positions 5-11
of the round-5 driver window with strict selfcheck evidence already.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from conftest import SF_SMOKE  # noqa: E402
from selfcheck import TABLES, shape_sweep  # noqa: E402


def test_every_registered_gate_has_driver_safe_output_shape(spark):
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    names = {n for n in E.queries() if not n.startswith("stream_")}
    bad = shape_sweep(spark, con, SF_SMOKE, names=names)
    assert bad == {}, "driver-unsafe gate output shapes:\n" + "\n".join(
        f"{n}: {'; '.join(p)}" for n, p in sorted(bad.items())
    )
