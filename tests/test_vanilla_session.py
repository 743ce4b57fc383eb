"""Driver-harness portability gate.

Round 1's only systemic failure: the driver's correctness harness builds
its OWN vanilla SparkSession (no repo configs), and every query reading
events.parquet died with PARQUET_TYPE_ILLEGAL INT64(TIMESTAMP(NANOS))
because ``spark.sql.legacy.parquet.nanosAsLong`` was only set by the
repo's session builder (CORRECTNESS_r01.json: 18 ERRs).  ``load_table``
now sets the conf at read time; this test replicates the driver harness
in a SUBPROCESS (so the repo's pytest session fixture can't leak its
configs in) and runs ``entry`` plus EVERY registry query on a bare
``SparkSession.builder.getOrCreate()`` at sf0.001.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as entry_mod

failures = {}
try:
    df = entry_mod.entry(spark)
    n = df.count()
    assert n >= 0 and df.schema is not None
except Exception as exc:  # noqa: BLE001
    failures["<entry>"] = repr(exc)

sf_dir = sys.argv[1]
for name, fn in entry_mod.queries().items():
    try:
        fn(spark, sf_dir).count()
    except Exception as exc:  # noqa: BLE001
        failures[name] = repr(exc)

print("VANILLA_RESULT " + json.dumps(failures))
sys.exit(1 if failures else 0)
"""


def test_all_registry_queries_run_on_vanilla_session():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, "/root/testdata/sf0.001"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1200,
        env={**os.environ, "PYTHONPATH": repo},
    )
    marker = [
        line
        for line in proc.stdout.splitlines()
        if line.startswith("VANILLA_RESULT ")
    ]
    assert marker, f"subprocess died before reporting:\n{proc.stderr[-4000:]}"
    assert proc.returncode == 0, marker[-1]
