#!/usr/bin/env python
"""Round-14 optimization profiler: per-query plan capture + timing.

Usage:
  python tools_profile_r15.py plan  <tag> <query> [query ...]
      Writes plans/r15/<query>_<tag>.txt (explain formatted).
  python tools_profile_r15.py time  <runs> <query> [query ...]
      Best-of-<runs> noop-sink wall + process-tree CPU per query,
      printed as one JSON line (no artifact files touched).

Same session recipe as bench.py (get_spark on local[$SPARK_GRAFT_CPUS],
data from $SPARK_GRAFT_SF_DIR) so readings are comparable with
BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_gamedb_etl_spark.plans import explain_str
from bigdata_gamedb_etl_spark.registry import all_queries
from bigdata_gamedb_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r15")


def _tree_cpu_seconds() -> float:
    """utime+stime of this process and every live descendant (the JVM
    is a child; its executor threads run in-process under local[N])."""
    import glob

    hz = os.sysconf("SC_CLK_TCK")

    def cpu_of(pid: str) -> tuple[float, str]:
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            with open(f"/proc/{pid}/status") as f:
                ppid = ""
                for line in f:
                    if line.startswith("PPid:"):
                        ppid = line.split()[1]
                        break
            return (int(parts[11]) + int(parts[12])) / hz, ppid
        except OSError:
            return 0.0, ""

    me = str(os.getpid())
    info = {}
    for p in glob.glob("/proc/[0-9]*"):
        pid = p.rsplit("/", 1)[1]
        info[pid] = cpu_of(pid)
    mine = {me}
    changed = True
    while changed:
        changed = False
        for pid, (_, ppid) in info.items():
            if pid not in mine and ppid in mine:
                mine.add(pid)
                changed = True
    return sum(info[p][0] for p in mine if p in info)


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark(app_name="r15-profile")
    queries = all_queries()
    if mode == "plan":
        tag, names = sys.argv[2], sys.argv[3:]
        os.makedirs(PLAN_DIR, exist_ok=True)
        for name in names:
            spark.sparkContext.setJobDescription(f"plan: {name}")
            df = queries[name](spark, SF_DIR)
            out = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
            with open(out, "w") as f:
                f.write(explain_str(df, "formatted"))
            print(f"wrote {out}")
    elif mode == "time":
        runs, names = int(sys.argv[2]), sys.argv[3:]
        res = {}
        for name in names:
            walls, cpus = [], []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(f"time: {name}")
                c0 = _tree_cpu_seconds()
                t0 = time.perf_counter()
                df = queries[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 3))
                cpus.append(round(_tree_cpu_seconds() - c0, 3))
            res[name] = {"wall": walls, "cpu": cpus,
                         "best_wall": min(walls), "best_cpu": min(cpus)}
            print(json.dumps({name: res[name]}), flush=True)
        print("RESULT " + json.dumps(res))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
