"""Stage-level profiler for headline queries (guide §1: measure first).

Runs the named queries through the noop sink with event logging on, then
summarizes per-stage wall time / shuffle bytes / task counts from the
event log, attributing stages to queries via job descriptions.

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_query.py q1 [q2 ...]
       (repeats each query N times, N from $PROFILE_PASSES, default 3;
        pass-1 is warmup, later passes reported)
"""
import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as mod  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    names = sys.argv[1:]
    passes = int(os.environ.get("PROFILE_PASSES", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_session(
        "profile",
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            # single plain-text file (Spark 4 defaults to a rolling
            # zstd-compressed dir; the sandbox has no zstandard module)
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    qs = mod.queries()
    walls: dict[str, list[float]] = defaultdict(list)
    for p in range(passes):
        for name in names:
            sc.setJobDescription(f"{name}|pass{p}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name].append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # parse event log (Spark 4 rolling layout: eventlog_v2_<app>/events_N_<app>[.zstd])
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        path = os.path.join(EVDIR, f"eventlog_v2_{app_id}")

    def _lines(p):
        if os.path.isdir(p):
            import glob as _glob

            for part in sorted(_glob.glob(os.path.join(p, "events_*"))):
                yield from _lines(part)
            return
        if p.endswith(".zstd"):
            import zstandard

            with open(p, "rb") as fh:
                reader = zstandard.ZstdDecompressor().stream_reader(fh)
                import io

                yield from io.TextIOWrapper(reader)
        else:
            with open(p) as fh:
                yield from fh

    jobs = {}          # jobId -> description
    stage_job = {}     # stageId -> jobId
    stages = {}        # stageId -> dict
    if True:
        for line in _lines(path):
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                jobs[ev["Job ID"]] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = ev["Job ID"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                acc = {
                    a["Name"]: a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:60],
                    "tasks": si.get("Number of Tasks"),
                    "wall_ms": (comp - sub) if sub and comp else None,
                    "sh_read_mb": round(
                        (int(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0)
                         + int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0))
                        / 1e6, 2),
                    "sh_write_mb": round(
                        int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0) / 1e6, 2),
                    "input_mb": round(
                        int(acc.get("internal.metrics.input.bytesRead", 0) or 0) / 1e6, 2),
                    "cpu_s": round(
                        int(acc.get("internal.metrics.executorCpuTime", 0) or 0) / 1e9, 2),
                    "run_s": round(
                        int(acc.get("internal.metrics.executorRunTime", 0) or 0) / 1e3, 2),
                }

    by_desc: dict[str, list] = defaultdict(list)
    for sid, st in sorted(stages.items()):
        desc = jobs.get(stage_job.get(sid, -1), "?")
        by_desc[desc].append((sid, st))

    for name in names:
        print(f"\n===== {name}: walls={walls[name]} =====")
        for p in range(passes):
            if p == 0:
                continue  # warmup pass
            desc = f"{name}|pass{p}"
            sts = by_desc.get(desc, [])
            tot_wall = sum(s["wall_ms"] or 0 for _, s in sts)
            print(f"-- pass{p}: {len(sts)} stages, sum-stage-wall {tot_wall} ms")
            for sid, s in sorted(
                sts, key=lambda x: -(x[1]["wall_ms"] or 0)
            )[:14]:
                print(
                    f"  stage {sid:>5} {s['wall_ms']:>6}ms tasks={s['tasks']:>3} "
                    f"in={s['input_mb']:>7}MB shR={s['sh_read_mb']:>7}MB "
                    f"shW={s['sh_write_mb']:>7}MB cpu={s['cpu_s']:>6}s "
                    f"run={s['run_s']:>6}s  {s['name']}"
                )


if __name__ == "__main__":
    main()
