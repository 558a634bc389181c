package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.sources.Tables

/** The shared co-purchase materialized views (Analytics.orderPartMV /
  * partCountsMV / coPairsMV) and q206's DELTA train matrix: each view
  * must equal its inline recompute, and the delta decomposition
  * co_train = co_all − co_excluded (floor applied after differencing)
  * must reproduce the direct train-side computation row for row — on
  * the real fixture, not synthetic rows. */
class CoPurchaseSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private lazy val opInline = Tables.lineitem(spark, sf)
    .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()

  test("order_part MV ≡ inline distinct incidence") {
    assert(rows(Analytics.orderPartMV(spark, sf)) == rows(opInline))
  }

  test("part_counts MV ≡ inline per-part order counts") {
    assert(rows(Analytics.partCountsMV(spark, sf)) ==
      rows(opInline.groupBy("p").agg(count(lit(1)).as("np"))))
  }

  test("copairs_sup2 MV ≡ inline floored half co-matrix") {
    val pc = opInline.groupBy("p").agg(count(lit(1)).as("np"))
    val opf = opInline.join(
      broadcast(pc.filter(col("np") >= 2).select(col("p"))), Seq("p"))
    val inline = opf.select(col("o"), col("p").as("pa"))
      .join(opf.select(col("o").as("o2"), col("p").as("pb")),
        col("o") === col("o2") && col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
    assert(rows(Analytics.coPairsMV(spark, sf)) == rows(inline))
  }

  test("q206 delta train co-matrix ≡ inline train-only recompute") {
    // the split q206 states: train = all but each customer's last order
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val lo = Tables.orders(spark, sf).select(col("o_custkey").as("u"),
      col("o_orderkey"), row_number().over(byCust).as("rn"))
    val tr = lo.filter(col("rn") > 1).select("u", "o_orderkey")
    val exc = lo.filter(col("rn") === 1).select("u", "o_orderkey")

    // INLINE reference: the pre-round-11 formulation — train incidence
    // from lineitem, train-support floor, half self-join
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val opTrain = tr.join(li, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pcTrain = opTrain.groupBy("p").agg(count(lit(1)).as("np"))
    val opfTrain = opTrain.join(
      broadcast(pcTrain.filter(col("np") >= 2).select("p")), Seq("p"))
    val inlineHalf = opfTrain.select(col("o"), col("p").as("pa"))
      .join(opfTrain.select(col("o").as("o2"), col("p").as("pb")),
        col("o") === col("o2") && col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n"))

    // DELTA form: exactly the steps the rewritten q206 takes
    val opAll = Analytics.orderPartMV(spark, sf)
    val pcAll = Analytics.partCountsMV(spark, sf)
    val opExc = exc.join(opAll, col("o") === col("o_orderkey"))
      .select(col("o"), col("p"))
    val pcExc = opExc.groupBy("p").agg(count(lit(1)).as("np_exc"))
    val fTrain = pcAll.join(pcExc, Seq("p"), "left")
      .filter(col("np") - coalesce(col("np_exc"), lit(0L)) >= 2)
      .select("p")
    val coAllF = Analytics.coPairsMV(spark, sf)
      .join(broadcast(fTrain.select(col("p").as("pa"))), Seq("pa"))
      .join(broadcast(fTrain.select(col("p").as("pb"))), Seq("pb"))
    val opExcF = opExc.join(broadcast(fTrain), Seq("p"))
    val coExcHalf = opExcF.select(col("o"), col("p").as("pa"))
      .join(opExcF.select(col("o").as("o2"), col("p").as("pb")),
        col("o") === col("o2") && col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_exc"))
    val deltaHalf = coAllF.join(coExcHalf, Seq("pa", "pb"), "left")
      .select(col("pa"), col("pb"),
        (col("n_ab") - coalesce(col("n_exc"), lit(0L))).as("n"))
      .filter(col("n") > 0)

    val inline = rows(inlineHalf)
    val delta = rows(deltaHalf)
    assert(delta == inline,
      s"delta-inline mismatch: ${delta.diff(inline).take(5)} extra, " +
      s"${inline.diff(delta).take(5)} missing")
    assert(inline.nonEmpty, "fixture must exercise the co-matrix")
    // and the fixture must exercise the subtraction path (pairs whose
    // count actually changed between co_all and co_train)
    val changed = rows(coAllF.join(coExcHalf, Seq("pa", "pb"), "left_semi"))
    assert(changed.nonEmpty,
      "fixture must contain pairs touched by excluded orders")
  }
}
