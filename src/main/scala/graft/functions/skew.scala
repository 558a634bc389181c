package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7.6). AQE's skew-join handling covers
  * joins; for aggregations over power-law keys (one user = 10% of a
  * 100 TB event stream), two-phase salted aggregation keeps every
  * reducer bounded: phase 1 aggregates (key, salt) across `salts`
  * partitions, phase 2 merges the per-salt partials per key.
  */
object skew {

  /** Salted count+sum per key: exact same result as a direct
    * groupBy(key).agg(count, sum), but the widest shuffle fans the hot
    * key over `salts` reducers. The salt is derived from a stable column
    * (not rand()) so results stay deterministic and re-executable. */
  def saltedCountSum(df: DataFrame, key: Column, saltSource: Column,
      value: Column, salts: Int): DataFrame =
    df.select(key.as("k"), pmod(hash(saltSource), lit(salts)).as("salt"),
        value.as("v"))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy("k")
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
}
