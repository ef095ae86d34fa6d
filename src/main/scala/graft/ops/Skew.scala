package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation primitives. AQE's skew-join split handles most runtime
  * skew; these are the explicit spellings for when the skew is known ahead
  * of time (hot keys in a 100 TB fact table) or the operator is not
  * AQE-splittable.
  *
  * Correctness does not depend on WHICH salt a row gets — only that the
  * small side is replicated across every salt — so the salt can be any
  * cheap per-row value.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side scatters each hot key across
    * `saltFactor` sub-keys; the small side replicates `saltFactor`×. The
    * shuffle then spreads a hot key over `saltFactor` reducers instead of
    * melting one. */
  private val SaltSafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // The salt rewrite only preserves semantics when unmatched SMALL-side
    // rows are never null-extended: a right/full join would emit one
    // null-extended row per salt replica (saltFactor duplicates).
    require(SaltSafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: unsupported joinType '$joinType' — the salt rewrite is " +
        "only correct for inner/left/left_semi/left_anti joins")
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-stage salted aggregation: partial (key, salt) combine, then final
    * per-key merge. For count/sum the decomposition is exact; the decimal
    * widening keeps the double sums order-insensitive so the result is
    * bit-identical to the unsalted aggregate. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    df
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("__s"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
  }

  /** Join-key skew report — the measurement you run BEFORE choosing between
    * a plain shuffle join, [[saltedJoin]], or a broadcast: per key column,
    * row count, distinct keys, the heaviest key and its row count, and
    * `skew_ratio_micro` = ⌊10⁶ · max_key_rows · n_keys / n_rows⌋ (1.0 =
    * perfectly uniform; AQE's skew threshold thinks in the same ratio).
    * One aggregation per key column (map-side combining), then a 1-row
    * reduction — nothing here is proportional to data volume except the
    * first groupBy. All-integer output; ties on the hot key break to the
    * lexicographically smallest key string. */
  def skewReport(relations: Seq[(String, DataFrame, String)]): DataFrame =
    relations.map { case (rel, df, key) =>
      val counts = df
        .select(col(key).cast("string").as("k"))
        .filter(col("k").isNotNull)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
      counts
        .agg(
          sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("n")).as("max_key_rows"),
          min_by(col("k"), struct((-col("n")).as("neg"), col("k"))).as("top_key"))
        .select(
          lit(rel).as("rel"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          col("n_keys"),
          coalesce(col("max_key_rows"), lit(0L)).as("max_key_rows"),
          coalesce(col("top_key"), lit("")).as("top_key"),
          expr("""CASE WHEN n_rows IS NULL OR n_rows = 0 THEN 0L ELSE
                 |  CAST(FLOOR(CAST(max_key_rows AS DOUBLE) * 1000000.0D
                 |    * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE)) AS BIGINT) END"""
            .stripMargin).as("skew_ratio_micro"))
    }.reduce(_.unionByName(_)).orderBy(col("rel"))
}
