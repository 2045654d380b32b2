"""Dump `.explain("formatted")` plans for round-20 touched queries.

Usage: python tests/gen_plans_r20.py <suffix> <query> [<query> ...]
Writes plans/r20/<query>_<suffix>.txt (suffix: before / after).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(
    app_name="plans_r20", master="local[8]", shuffle_partitions=32
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod

qs = mod.queries()
suffix = sys.argv[1]
outdir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r20",
)
os.makedirs(outdir, exist_ok=True)
for name in sys.argv[2:]:
    df = qs[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)
