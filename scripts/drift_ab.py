"""A/B attribution for the r6 bench drift (VERDICT r6 item 7).

BENCH_r05 -> BENCH_r06 showed a uniform +14% on the 18 common bench
queries; the r6 code change nearest the whole suite is the
InferFiltersFromGenerate optimizer exclusion (session.py). This runs
the bench protocol (warm-up lap, then best-of-N forces) over the full
bench set TWICE IN ONE PROCESS — exclusion ON (the shipped default)
vs OFF (`spark.sql.optimizer.excludedRules` cleared at runtime) — in
alternating laps, so JIT state and box load hit both arms equally.
Prints per-query and aggregate A/B seconds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.session import get_spark  # noqa: E402
from duckdb_data_eng_proj_spark.queries import REGISTRY  # noqa: E402
from bench import BENCH_QUERIES, _force  # noqa: E402

EXCLUDED = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f)) for f in os.listdir(sf_dir)
    )
    spark = get_spark(app_name="drift-ab", input_bytes=input_bytes,
                      latency_profile=True)
    spark.sparkContext.setLogLevel("ERROR")

    qids = [q for q in BENCH_QUERIES if q in REGISTRY]

    def set_arm(on: bool) -> None:
        spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED if on else "")

    # Warm-up lap per arm (codegen classes differ between arms).
    for arm in (True, False):
        set_arm(arm)
        for qid in qids:
            _force(REGISTRY[qid].fn(spark, sf_dir))

    best: dict[tuple[str, bool], float] = {}
    for lap in range(3):
        for arm in (True, False):
            set_arm(arm)
            for qid in qids:
                t0 = time.perf_counter()
                _force(REGISTRY[qid].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                key = (qid, arm)
                best[key] = min(best.get(key, float("inf")), dt)

    # arm=True means the exclusion is applied (rule OFF — the shipped
    # posture); arm=False clears excludedRules (rule ON).
    tot_shipped = tot_rule_on = 0.0
    print(f"{'query':28s} {'rule-OFF(shipped)':>18s} {'rule-ON':>10s} {'off/on':>7s}")
    for qid in qids:
        shipped, rule_on = best[(qid, True)], best[(qid, False)]
        tot_shipped += shipped
        tot_rule_on += rule_on
        print(f"{qid:28s} {shipped:18.3f} {rule_on:10.3f} {shipped / rule_on:7.2f}")
    print(f"\nTOTAL shipped(excluded)={tot_shipped:.2f}s vs rule-on={tot_rule_on:.2f}s "
          f"ratio={tot_shipped / tot_rule_on:.3f}")


if __name__ == "__main__":
    main()
