"""Child-process DuckDB oracle runner for tools/check_correctness.py.

Reads one SQL statement from stdin, executes it against the parquet
views of the sf dir given as argv[1], and writes the result as a
pandas pickle to argv[2] (pickle, not parquet: same interpreter on
both ends, and it round-trips exotic dtypes — object Decimals,
datetime units — bit-identically, so the comparison sees exactly
what ``con.execute(sql).df()`` produced). Running the oracle in its OWN address space (not
inside the Spark-JVM-hosting driver process) eliminates the r11/r12
class of transient "bad allocation" OOMs: those were allocator
pressure from DuckDB and a 100+ GiB JVM sharing one process during
long mixed sweeps — never value mismatches, always green serially.
A belt-and-braces ``memory_limit`` cap keeps a single oracle query
from ballooning even in its own process.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    sql = sys.stdin.read()
    con = duckdb.connect()
    # memory is the resource the isolation exists to protect; THREADS
    # must stay at the box default — the wordpiece 6-merge unrolled
    # oracle ran in minutes at 32 threads in-process but timed out at
    # a 8-thread cap (found by the r13 full-registry sweep).
    # 48GB (was 24GB, r14): sim_recall_curve's unrolled-IVF oracle
    # peaks right at the old cap at 32 threads — it passed or OOM'd
    # ("bad allocation" on a 16KB block) run-to-run depending on box
    # pressure. One child runs at a time next to a 16GB-heap JVM on a
    # 128GB box, so 48GB still bounds a runaway query while clearing
    # the measured peak with 2x headroom.
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    df = con.execute(sql).df()
    df.to_pickle(out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
