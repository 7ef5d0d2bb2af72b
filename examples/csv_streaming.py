"""csv_streaming example — translation of the reference's
examples/examples/csv_streaming.rs: register a CSV table, aggregate
it, land the result in a registered table, and write it back out as
CSV. Runs self-contained (stages its own CSV):

    python examples/csv_streaming.py
"""

import os
import tempfile

from denormalized_spark import Context
from pyspark.sql import functions as F

ctx = Context()
workdir = tempfile.mkdtemp(prefix="csv_streaming_")

# stage an ordered_table-style CSV (ts, inc_col) like window_1.csv
src = os.path.join(workdir, "window_1.csv")
with open(src, "w") as fh:
    fh.write("ts,inc_col\n")
    for i in range(100):
        fh.write(f"{i // 10},{i}\n")

# register, aggregate, sort — the reference's exact pipeline
ctx.register_csv("ordered_table", src)
df = (
    ctx.sql("SELECT ts, min(inc_col) AS min, max(inc_col) AS max FROM ordered_table GROUP BY ts")
    .sort("ts")
)

# land the aggregate in a registered table, then write CSV from it
ctx.register_table("out_table", df)
out_path = os.path.join(workdir, "out.csv")
ctx.spark.table("out_table").write.mode("overwrite").option("header", True).csv(out_path)

print(f"Data written to csv {out_path}")
ctx.spark.read.option("header", True).csv(out_path).orderBy(F.col("ts").cast("int")).show(5)
