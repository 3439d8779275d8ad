package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys (SURVEY.md §4 / the 100 TB
  * posture). AQE's skew-join splitting covers sort-merge joins at runtime;
  * these cover the two cases it doesn't: a skewed AGGREGATION key, and a
  * broadcast-replicated join against a hot build side.
  *
  * Salting is pure plan algebra — no config, no sampling pass: the salt
  * column spreads one hot key over `salts` reducers in phase 1, and
  * phase 2 merges the per-salt partials (any associative aggregate
  * decomposes this way; Spark's own partial aggregation is the same trick
  * per-partition — salting extends it per-reducer). */
object Skew {

  /** Deterministic salt in [0, salts): hash of the full row's grouping
    * ON TOP of a uniform spreader column. Using a stable hash of another
    * column (not rand()) keeps the operator idempotent and retry-safe —
    * task retries must land rows in the same salt bucket or partial
    * re-aggregation double-counts under speculative execution. */
  def saltCol(spreader: Column, salts: Int): Column =
    pmod(xxhash64(spreader), lit(salts))

  /** Two-phase salted sum-style aggregation:
    * groupBy(key) agg Σ(valueCols) rewritten as
    * groupBy(key, salt) Σ → groupBy(key) Σ. Output schema = key + sums. */
  def saltedSum(df: DataFrame, key: Column, spreader: Column,
                salts: Int, valueCols: (Column, String)*): DataFrame = {
    val phase1 = df
      .withColumn("_salt", saltCol(spreader, salts))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(valueCols.head._1.as(valueCols.head._2),
        valueCols.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(col("_key"))
      .agg(sum(col(valueCols.head._2)).as(valueCols.head._2),
        valueCols.tail.map { case (_, n) => sum(col(n)).as(n) }: _*)
      .withColumnRenamed("_key", "key")
  }

  /** Salted broadcast-replicated join for a hot probe side: the small
    * build side is exploded `salts`× (one copy per salt value), the big
    * side computes its salt from a uniform column, and the join key
    * becomes (key, salt) — one hot key's rows now hash to `salts`
    * different reducers instead of one. For genuinely small build sides
    * prefer plain `broadcast()`; this is the pattern for when the build
    * side is too big to broadcast AND the probe key is skewed. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 spreader: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", saltCol(spreader, salts))
    val replicatedSmall = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
