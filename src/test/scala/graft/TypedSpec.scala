package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Typed

/** Rich-type module (q212–q215): exactness witnesses and the
  * cross-engine semantic assumptions the oracles rely on. */
class TypedSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def q(name: String) =
    Typed.defs.find(_.name == name).get.fn(spark, sf)

  test("q212: decimal residual is EXACTLY zero for every group") {
    val rows = q("q212_decimal_ledger").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val res = r.getAs[java.math.BigDecimal]("residual")
      assert(res.signum() == 0, s"non-zero residual $res in $r")
    }
  }

  test("q212: result decimal types are the declared exact scales") {
    val sch = q("q212_decimal_ledger").schema
    assert(sch("sum_amt").dataType == DecimalType(38, 5))
    assert(sch("sum_disc").dataType == DecimalType(38, 8))
    assert(sch("residual").dataType == DecimalType(38, 8))
  }

  test("month-add clamp semantics match DuckDB (clamp, no last-day preservation)") {
    // The q213 oracle equates Spark add_months with DuckDB + INTERVAL n
    // MONTH. Both clamp into short months and neither preserves
    // last-day-ness — pin that here so an engine upgrade can't silently
    // break the oracle assumption.
    val got = Seq("2024-01-31", "2024-02-29", "2024-04-30")
      .toDF("d").select(add_months(col("d").cast(DateType), 1).cast(StringType))
      .as[String].collect().toSeq
    assert(got == Seq("2024-02-29", "2024-03-29", "2024-05-30"))
  }

  test("q213: interval columns are self-consistent") {
    val rows = q("q213_interval_calendar").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val due = r.getAs[Long]("due_ts_us")
      val eta = r.getAs[Long]("eta_ts_us")
      // eta (2d 3:30) is exactly 15.5h after due (36h) for every row
      assert(eta - due == (15 * 3600L + 1800L) * 1000000L)
      val qe = r.getAs[java.sql.Date]("quarter_end").toLocalDate
      assert(Set(3, 6, 9, 12).contains(qe.getMonthValue))
      assert(qe.plusDays(1).getDayOfMonth == 1, s"$qe is not a quarter end")
    }
  }

  test("q214: post-agg struct field access equals the struct's own field") {
    val rows = q("q214_nested_struct_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val first = r.getStruct(r.fieldIndex("first_order"))
      assert(r.getAs[Long]("first_key") == first.getAs[Long]("okey"))
      val span = r.getStruct(r.fieldIndex("span"))
      assert(!span.getAs[java.sql.Date]("first_d")
        .after(span.getAs[java.sql.Date]("last_d")))
    }
  }

  test("q215: packed array<struct> is consistent with its flat checksum") {
    val df = q("q215_order_lines_envelope")
    val bad = df.select(col("l_orderkey"), col("n_lines"), col("total_qty"),
        explode(col("lines")).as("line"))
      .groupBy("l_orderkey", "n_lines", "total_qty")
      .agg(count(lit(1)).as("n2"), sum(col("line.qty")).as("q2"))
      .filter(col("n2") =!= col("n_lines") || col("q2") =!= col("total_qty"))
    assert(bad.isEmpty, "exploded view disagrees with packed checksum")
    // arrays are sorted by (ln, qty): ln non-decreasing per order
    // (the fixture DOES repeat line numbers within an order — ties sort
    // by qty, and exact duplicates are value-identical either way)
    val rows = df.select(col("lines").getField("ln")).as[Seq[Long]].collect()
    rows.foreach(lns => assert(lns == lns.sorted))
  }
}
