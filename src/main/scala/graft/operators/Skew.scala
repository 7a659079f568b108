package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (north-star: "salt-based skew mitigation on hot
  * entities", AQE skew-join as the runtime complement).
  *
  * Salting splits a hot key across `salts` reducers. Two shapes:
  *
  *  - [[saltedAggregate]]: two-phase aggregation — partial per (key, salt),
  *    final per key. For algebraic aggregates this is exactly what
  *    map-side combine already does; use it when the aggregate is
  *    object-hash (collect_set & co.) where a single hot key otherwise
  *    serializes into one reducer's heap. (ConnectedComponents uses this
  *    shape inline for the min-neighbor-label step.)
  *
  *  - [[saltedJoin]]: fact-side rows get a random-but-deterministic salt
  *    (hash of a high-cardinality discriminator column, NOT a true rand()
  *    — resumability per the north rule means re-runs must produce the
  *    same partitioning); the dimension side is exploded `salts`-fold so
  *    every (key, salt) bucket finds its match. Use when the dimension is
  *    too big to broadcast AND fact keys are Zipf-hot; broadcast beats it
  *    whenever the dimension fits (the engine's linker broadcasts).
  */
object Skew {

  def withSalt(df: DataFrame, discriminator: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(discriminator), lit(salts)))

  def saltedAggregate(df: DataFrame, keyCols: Seq[String],
      discriminator: Column, salts: Int,
      partial: Column, partialName: String,
      finalAgg: Column => Column): DataFrame =
    withSalt(df, discriminator, salts)
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partial.as(partialName))
      .groupBy(keyCols.map(col): _*)
      .agg(finalAgg(col(partialName)).as(partialName))

  /** Join `fact` (skewed keys) with `dim` (one row per key, too big to
    * broadcast) on `key`: fact rows salt deterministically by
    * `discriminator`; dim rows replicate `salts`-fold.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    val saltedFact = withSalt(fact, discriminator, salts)
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
