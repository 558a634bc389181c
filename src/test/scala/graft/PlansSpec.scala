package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** graft.plans optimizer rules. Cluster deployments inject them at
  * session build (spark.sql.extensions=graft.GraftExtensions —
  * GraftExtensions.apply is itself covered in LayoutSpec); here the rule
  * is attached to the shared live session via the public
  * experimental.extraOptimizations hook, which accepts rules at runtime. */
class PlansSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._
  import spark.implicits._

  override def beforeAll(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.ReorderJoinPredicates

  override def afterAll(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.ReorderJoinPredicates)

  private def joinCond(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.condition.get
    }.head

  test("join conditions evaluate cheap conjuncts before expensive ones") {
    val a = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0))).toDF("ida", "va")
    val b = Seq((1L, Seq(1.0, 2.0)), (3L, Seq(5.0, 6.0))).toDF("idb", "vb")
    // written EXPENSIVE-first, as the q60 misplan produced it
    val naive = a.join(b,
      round(graft.functions.DotProduct.dot($"va", $"vb"), 4) >= 0.0 && $"ida" < $"idb")
    val first = joinCond(naive) match {
      case org.apache.spark.sql.catalyst.expressions.And(l, _) => l
      case other => other
    }
    assert(first.isInstanceOf[org.apache.spark.sql.catalyst.expressions.LessThan],
      s"expected cheap conjunct first, got: ${joinCond(naive)}")
    // results are unchanged by the reorder
    assert(naive.count() == 2) // (1,3) and (2,3): dot >= 0 and ida < idb
  }

  test("rule leaves single-conjunct conditions and equal-cost order alone") {
    val a = Seq(1L, 2L).toDF("ida")
    val b = Seq(2L, 3L).toDF("idb")
    // single conjunct: untouched (and still a valid equi-join)
    assert(a.join(b, $"ida" === $"idb").count() == 1)
    // equal-cost conjuncts: stable sort preserves the written order
    val eq = a.join(b, $"ida" < $"idb" && $"ida" =!= $"idb")
    joinCond(eq) match {
      case org.apache.spark.sql.catalyst.expressions.And(l, _) =>
        assert(l.isInstanceOf[org.apache.spark.sql.catalyst.expressions.LessThan],
          s"stable sort should keep user order for equal costs")
      case _ => // collapsed to fewer conjuncts — fine
    }
    assert(eq.count() == 3)
  }
}
