"""Driver-simulation: exercises __spark_entry__.py exactly as the harness does.

Vanilla SparkSession (NO engine-side confs — probes that tables.py's defensive
runtime confs actually kick in), entry() smoke at sf0.001, then each oracle
query at sf0.01 hash-compared against DuckDB.
"""
import sys, math, time, random

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

# vanilla session, like a driver would build — note: NO nanosAsLong, NO AQE conf
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

qs = E.queries()
oracles = E.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")

import duckdb

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


# spot-check a sample of oracle queries cross-engine + all rows-only queries
sample = random.Random(7).sample(sorted(oracles), 12)
rows_only = sorted(set(qs) - set(oracles))
fails = []
for name in sample:
    sdf = qs[name](spark, SF)
    scols = sorted(sdf.columns)
    sidx = [sdf.columns.index(c) for c in scols]
    srows = sorted((tuple(canon(r[i]) for i in sidx) for r in sdf.collect()), key=repr)
    res = con.execute(oracles[name])
    dcols_raw = [d[0] for d in res.description]
    dcols = sorted(dcols_raw)
    didx = [dcols_raw.index(c) for c in dcols]
    drows = sorted((tuple(canon(r[i]) for i in didx) for r in res.fetchall()), key=repr)
    ok = scols == dcols and srows == drows
    print(f"{'OK ' if ok else 'FAIL'} {name}: spark={len(srows)} oracle={len(drows)}")
    if not ok:
        fails.append(name)
for name in rows_only:
    n = qs[name](spark, SF).count()
    print(f"ROWS {name}: {n}")

print("FAILS:", fails)
assert not fails
