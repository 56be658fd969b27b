"""Time the 14 BENCH oracle queries on DuckDB at sf0.1 (warm, best-of-3)."""
import sys, time
sys.path.insert(0, "/root/repo")
import duckdb
from bench import BENCH_QUERIES
from duckdb_data_eng_proj_spark.queries import REGISTRY

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
con.execute("SELECT count(*) FROM lineitem").fetchall()  # warm

out = {}
for qid in BENCH_QUERIES:
    sql = REGISTRY[qid].oracle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    out[qid] = round(best, 4)
print({"total": round(sum(out.values()), 4), "queries": out})
