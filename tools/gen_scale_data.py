"""Generate a seed-deterministic ~sf1 clone of the driver's testdata.

The provided testdata stops at sf0.1 (read-only, TESTDATA.md); the
self-scaled stress run (SCALE.md) needs one decade more. Same table
shapes and the same scale ratios the driver's generator uses
(lineitem = 6M rows at sf1), generated entirely Spark-side — `F.range`
plus hash-derived columns, no driver-side loops, no RNG state — so the
output is bit-identical across runs and partitionings.

Usage: python tools/gen_scale_data.py [sf] [outdir]
  default: sf=1 → /root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from project_graphdb_spark import get_spark  # noqa: E402

REF_DIR = "/root/testdata/sf0.1"  # fixed dims copied from here


def u(*seed) -> Column:
    """Deterministic uniform double in [0,1) from the row id + a salt."""
    return (
        F.pmod(F.hash(F.col("id"), *[F.lit(s) for s in seed]), F.lit(10**6))
        / 10**6
    )


def pick(choices: list[str], *seed) -> Column:
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(
        arr, (F.pmod(F.hash(F.col("id"), *[F.lit(s) for s in seed]),
                     F.lit(len(choices))) + 1).cast("int")
    )


def days_ts(base: str, span_days: int, *seed) -> Column:
    return F.to_timestamp(F.lit(base)) + F.make_interval(
        days=F.pmod(
            F.hash(F.col("id"), *[F.lit(s) for s in seed]),
            F.lit(span_days),
        ).cast("int")
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale",
            f"sf{sf:g}",
        )
    )
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    spark = get_spark(app_name="gen-scale-data")

    def write(df: DataFrame, name: str, parts: int) -> None:
        path = os.path.join(out, f"{name}.parquet")
        df.repartition(parts).write.mode("overwrite").parquet(path)
        print(f"wrote {path}")

    # fixed dims: identical to the driver's (5 regions / 25 nations)
    for name in ("region", "nation"):
        write(
            spark.read.parquet(os.path.join(REF_DIR, f"{name}.parquet")),
            name, 1,
        )

    write(
        spark.range(n_cust).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", "id").alias("c_name"),
            F.pmod(F.hash("id", F.lit("nat")), F.lit(25))
            .cast("int").alias("c_nationkey"),
            F.round(u("bal") * 10_000, 2).alias("c_acctbal"),
            pick(["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
                  "HOUSEHOLD"], "seg").alias("c_mktsegment"),
        ),
        "customer", 4,
    )

    write(
        spark.range(n_supp).select(
            F.col("id").alias("s_suppkey"),
            F.format_string("Supplier#%09d", "id").alias("s_name"),
            F.pmod(F.hash("id", F.lit("nat")), F.lit(25))
            .cast("int").alias("s_nationkey"),
            F.round(u("bal") * 10_000, 2).alias("s_acctbal"),
        ),
        "supplier", 1,
    )

    write(
        spark.range(n_part).select(
            F.col("id").alias("p_partkey"),
            F.concat_ws(
                " ",
                pick(["cold", "small", "large", "hot", "dim", "bright"],
                     "adj"),
                pick(["widget", "bolt", "gear", "spring", "washer"], "nn"),
            ).alias("p_name"),
            F.format_string(
                "Brand#%d",
                F.pmod(F.hash("id", F.lit("brand")), F.lit(25)) + 1,
            ).alias("p_brand"),
            pick(["ECONOMY", "STANDARD", "PROMO", "DELUXE"], "typ")
            .alias("p_type"),
            (F.pmod(F.hash("id", F.lit("size")), F.lit(50)) + 1)
            .cast("int").alias("p_size"),
            F.round(F.lit(900.0) + F.col("id") * 0.1, 2)
            .alias("p_retailprice"),
        ),
        "part", 2,
    )

    write(
        spark.range(n_ord).select(
            F.col("id").alias("o_orderkey"),
            F.pmod(F.hash("id", F.lit("cust")), F.lit(n_cust))
            .alias("o_custkey"),
            F.when(u("st") < 0.45, "F")
            .when(u("st") < 0.90, "O").otherwise("P")
            .alias("o_orderstatus"),
            F.round(F.lit(1_000.0) + u("tp") * 450_000, 2)
            .alias("o_totalprice"),
            days_ts("1995-01-01", 2404, "od").alias("o_orderdate"),
            pick(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                  "5-LOW"], "pri").alias("o_orderpriority"),
        ),
        "orders", 8,
    )

    # lineitem: ~4 lines per order, with ~1% of rows funneled onto 10
    # hot orderkeys (the skew the salted-agg / AQE-skew paths exist for)
    write(
        spark.range(n_li).select(
            F.when(
                u("hot") < 0.01,
                F.pmod(F.hash("id", F.lit("which")), F.lit(10)),
            )
            .otherwise(F.col("id") / 4)
            .cast("long").alias("l_orderkey"),
            F.pmod(F.hash("id", F.lit("pk")), F.lit(n_part))
            .alias("l_partkey"),
            F.pmod(F.hash("id", F.lit("sk")), F.lit(n_supp))
            .alias("l_suppkey"),
            (F.pmod(F.col("id"), F.lit(7)) + 1).cast("int")
            .alias("l_linenumber"),
            (F.pmod(F.hash("id", F.lit("q")), F.lit(50)) + 1)
            .cast("double").alias("l_quantity"),
            F.round(F.lit(900.0) + u("ep") * 100_000, 2)
            .alias("l_extendedprice"),
            (F.pmod(F.hash("id", F.lit("d")), F.lit(11)) / 100.0)
            .alias("l_discount"),
            (F.pmod(F.hash("id", F.lit("t")), F.lit(9)) / 100.0)
            .alias("l_tax"),
            pick(["A", "N", "R"], "rf").alias("l_returnflag"),
            pick(["O", "F"], "ls").alias("l_linestatus"),
            days_ts("1995-01-01", 2404, "sd").alias("l_shipdate"),
        ),
        "lineitem", 32,
    )

    # events: ~3 s mean cadence with jitter, zipf-ish hot users (1% of
    # traffic on 10 ids), same five event types
    write(
        spark.range(n_ev).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.unix_micros(F.to_timestamp(F.lit("2024-01-01")))
                + F.col("id") * 3_000_000
                + F.pmod(F.hash("id", F.lit("j")), F.lit(3_000_000))
            ).alias("ts"),
            F.when(
                u("hotu") < 0.01,
                F.pmod(F.hash("id", F.lit("wu")), F.lit(10)),
            )
            .otherwise(
                F.pmod(F.hash("id", F.lit("u")), F.lit(max(n_cust, 1)))
            ).alias("user_id"),
            pick(["click", "view", "purchase", "signup", "error"], "et")
            .alias("event_type"),
            F.round(u("v") * 200, 2).alias("value"),
            F.format_string(
                '{"k": %d}',
                F.pmod(F.hash("id", F.lit("k")), F.lit(100)),
            ).alias("props"),
        ),
        "events", 8,
    )

    # documents: 80-200 words from a 500-word vocab; every id%20==1 doc
    # is a planted near-duplicate of id-1 (same text + one extra word)
    vocab = [f"word{i:03d}" for i in range(480)] + [
        "the", "a", "of", "to", "and", "in", "is", "it", "for", "on",
        "was", "with", "that", "as", "are", "this", "be", "or", "an",
        "by",
    ]
    vocab_col = F.array(*[F.lit(w) for w in vocab])
    base = F.when(
        F.pmod(F.col("id"), F.lit(20)) == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    n_words = 80 + F.pmod(F.hash(base, F.lit("len")), F.lit(120))
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words.cast("int")),
            lambda j: F.element_at(
                vocab_col,
                (F.pmod(F.hash(base, j, F.lit("w")), F.lit(len(vocab)))
                 + 1).cast("int"),
            ),
        ),
    )
    text = F.when(
        F.pmod(F.col("id"), F.lit(20)) == 1,
        F.concat(body, F.lit(" mutated")),
    ).otherwise(body)
    write(
        spark.range(n_doc).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.element_at(
                F.array(*[F.lit(x) for x in
                          ("en", "en", "en", "de", "fr", "es", "it")]),
                (F.pmod(F.hash(base, F.lit("lang")), F.lit(7)) + 1)
                .cast("int"),
            ).alias("lang"),
            pick(["web", "books", "code", "wiki"], "src").alias("source"),
            F.length(text).alias("n_chars"),
        ),
        "documents", 4,
    )

    # embeddings: 64-dim float vectors; every id%50==1 is a slightly
    # perturbed copy of id-1 (the near-dup the blocked operator hunts)
    ebase = F.when(
        F.pmod(F.col("id"), F.lit(50)) == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            (F.pmod(F.hash(ebase, j, F.lit("e")), F.lit(2000)) - 1000)
            / 1000.0
            + F.when(
                F.pmod(F.col("id"), F.lit(50)) == 1,
                F.pmod(F.hash(F.col("id"), j, F.lit("p")), F.lit(10))
                / 10_000.0,
            ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    write(
        spark.range(n_emb).select(
            F.col("id").alias("vec_id"),
            vec.alias("embedding"),
            F.pmod(F.hash(ebase, F.lit("lbl")), F.lit(10))
            .cast("int").alias("label"),
        ),
        "embeddings", 2,
    )

    spark.stop()
    print(f"done: sf={sf:g} at {out}")


if __name__ == "__main__":
    main()
