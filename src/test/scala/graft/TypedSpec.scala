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
      assert(r.getAs[Long]("residual_e8") == 0L,
        s"non-zero residual in $r")
    }
  }

  test("q212: DECIMAL agg runs in-plan; sink columns are exact BIGINT") {
    val df = q("q212_decimal_ledger")
    // the sink schema is flat scalars (driver's pandas comparer can't
    // ingest Decimal objects)...
    Seq("sum_amt_e5", "sum_disc_e8", "min_amt_e5", "max_amt_e5",
      "residual_e8").foreach(c => assert(df.schema(c).dataType == LongType))
    // ...but the plan still aggregates at the declared exact scales
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("decimal(38,5)"), "decimal(38,5) agg gone")
    assert(analyzed.contains("decimal(38,8)"), "decimal(38,8) agg gone")
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

  test("q214: post-agg struct field access survives flattening") {
    val df = q("q214_nested_struct_stats")
    // min_by/max_by over structs still runs in-plan
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("min_by") && analyzed.contains("max_by"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("first_key") == r.getAs[Long]("first_okey"))
      assert(r.getAs[Long]("first_okey") <= r.getAs[Long]("last_okey"))
      assert(!r.getAs[java.sql.Date]("span_first_d")
        .after(r.getAs[java.sql.Date]("span_last_d")))
    }
  }

  test("q215: posexploded long form is consistent with its flat checksum") {
    val df = q("q215_order_lines_envelope")
    // pack → posexplode round trip: per-order row count and qty sum of
    // the exploded view must re-derive the checksums packed pre-explode
    val bad = df.groupBy("l_orderkey", "n_lines", "total_qty")
      .agg(count(lit(1)).as("n2"), sum(col("qty")).as("q2"),
        min("pos").as("p0"), max("pos").as("p1"))
      .filter(col("n2") =!= col("n_lines") || col("q2") =!= col("total_qty")
        || col("p0") =!= lit(0) || col("p1") =!= col("n_lines") - 1)
    assert(bad.isEmpty, "exploded view disagrees with packed checksum")
    // array was sorted by (ln, qty): ln non-decreasing along pos
    // (the fixture DOES repeat line numbers within an order — ties sort
    // by qty, and exact duplicates are value-identical either way)
    val rows = df.orderBy("l_orderkey", "pos")
      .select("l_orderkey", "ln").as[(Long, Long)].collect()
    rows.sliding(2).foreach {
      case Array((k1, l1), (k2, l2)) =>
        assert(k1 != k2 || l1 <= l2, s"ln order broken at order $k2")
      case _ => ()
    }
  }

  test("q220: exploded map entries cross-check their scalar twins") {
    val df = q("q220_map_column_roundtrip")
    assert(df.queryExecution.analyzed.toString.contains("map_from_entries"))
    val bad = df.groupBy("source", "n_langs", "en_docs")
      .agg(count(lit(1)).as("k"),
        sum(when(col("lang") === "en", col("n")).otherwise(lit(0L))).as("e"))
      .filter(col("k") =!= col("n_langs") || col("e") =!= col("en_docs"))
    assert(bad.isEmpty, "map entry rows disagree with scalar twins")
  }
}
