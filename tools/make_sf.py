"""Generate a larger scale factor by deterministic, FK-consistent N-fold
inflation of an existing testdata directory (default: sf0.1 x10 -> a
local sf1.0 under .scratch/). The driver only ships sf0.001/0.01/0.1;
scaling evidence beyond that (VERDICT r06 'Next round' #2) needs a real
on-disk dataset, not in-plan explode, so spill/AQE/scan behavior is
measured against genuine parquet row groups.

Inflation model (mirrors how TPC-H itself scales):
- every fact/dim key is remapped k -> k*F + r for replica r in [0, F),
  applied consistently to primary AND foreign keys, so referential
  integrity, join fan-outs, and per-key group sizes are PRESERVED while
  key cardinalities grow F-fold;
- region/nation stay fixed (25 nations at every TPC-H scale factor);
- value columns, timestamps, and distributions are untouched: more
  orders per day is exactly what a bigger business looks like;
- documents get a per-replica token suffix (every word in replica r>0
  gets digit r appended, n_chars recomputed) so each replica is a
  DISJOINT corpus: without this, 10 byte-identical copies of every doc
  would make the shingle/minhash band joins quadratically explode on
  artificial dup families no real 10x corpus has;
- embeddings are rotated by r positions per replica (norm-preserving;
  rotations of independent random vectors are uncorrelated), so the
  cosine/ANN workload grows in corpus size, not in degenerate
  near-dup families.

Usage:
    python tools/make_sf.py                       # sf0.1 x10 -> .scratch/sf1.0
    python tools/make_sf.py <src_dir> <out_dir> <factor> [tables]
    # [tables]: optional comma-separated subset (e.g. documents,embeddings)
    # for corpus-only probes that don't need 30x fact tables.

COMPOSITION CAVEAT: inflate from the ORIGINAL sf0.1, not from an
already-inflated directory. Document suffixing composes cleanly
(replica vocabularies stay disjoint), but embedding rotation does NOT:
rot_a then rot_b lands on rot_{a+b}, so a x3 of a x10 produces
overlapping rotation families — artificial exact-duplicate vectors that
make near-dup probes pathologically dup-heavy (measured r08: 6.3x wall
on embedding_near_dupes at the same corpus size a clean x30 handles
sub-linearly).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from hdp_tez_spark.session import get_session
from hdp_tez_spark.sources.catalog import TABLES, load_table

# foreign/primary integer keys remapped per table; every other column
# passes through unchanged
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def inflate_table(df: DataFrame, name: str, factor: int) -> DataFrame:
    if name in ("region", "nation"):
        return df
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    out = df.select("*", rep)
    for k in KEY_COLS[name]:
        out = out.withColumn(k, F.col(k) * factor + F.col("__r"))
    if name == "documents":
        # disjoint vocabulary per replica: append the replica digits to
        # every token (replica 0 keeps the original text verbatim)
        new_text = F.when(F.col("__r") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.col("__r").cast("string")),
                ),
                " ",
            )
        )
        out = out.withColumn("text", new_text).withColumn(
            "n_chars", F.length("text").cast("long")
        )
    if name == "embeddings":
        # rotate the vector by r positions — norm-preserving and
        # decorrelated across replicas, unlike a scalar perturbation
        n = F.size("embedding")
        out = out.withColumn(
            "embedding",
            F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice(F.col("embedding"), F.col("__r") + 1, n - F.col("__r")),
                    F.slice(F.col("embedding"), F.lit(1), F.col("__r")),
                )
            ),
        )
    return out.drop("__r")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(here, ".scratch", "sf1.0")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else list(TABLES)
    os.makedirs(out, exist_ok=True)

    spark = get_session("hdp-tez-spark-make-sf")
    spark.sparkContext.setLogLevel("ERROR")
    # match the driver generator's timestamp encoding: Spark's default is
    # legacy INT96, which pyarrow reports as timestamp[ns] and which makes
    # the generated tables look unlike the /root/testdata originals
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    for name in tables:
        df = load_table(spark, src, name)
        big = inflate_table(df, name, factor)
        # ~32 MB-ish files via a modest repartition on the big facts;
        # dims stay single-file
        if name in ("lineitem", "orders", "events"):
            big = big.repartition(8)
        big.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {big.count()} rows -> {out}/{name}.parquet")


if __name__ == "__main__":
    main()
