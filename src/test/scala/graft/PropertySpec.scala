package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property layer (SURVEY.md §5): algebraic laws that must hold for any
  * input — seeded generated inputs where generation helps, the fixtures
  * where the law is about the real pipeline. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("wordcount masses balance: sum of counts == total token count") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val total = docs.select(size(split($"text", " ")).cast("long").as("n"))
      .agg(sum($"n")).as[Long].head()
    val counted = SparkEntry.queries("q11_wordcount")(spark, sf)
      .agg(sum($"n")).as[Long].head()
    assert(counted == total)
  }

  test("exact dedup is idempotent: distinct(distinct(x)) == distinct(x)") {
    val d = graft.sources.Tables.documents(spark, sf).select($"text").distinct()
    assert(d.count() == d.distinct().count())
  }

  test("top-k monotonicity: top-3 orders per customer ⊆ top-5") {
    val orders = graft.sources.Tables.orders(spark, sf)
    def topk(k: Int) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      orders.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select($"o_orderkey").as[Long].collect().toSet
    }
    assert(topk(3).subsetOf(topk(5)))
  }

  test("pigeonhole lemma: Hamming<=6 pairs always share one of the 7 chunks") {
    // the q24 candidate-generation guarantee, checked on seeded random
    // signature pairs mutated by exactly d <= 6 bit flips
    val rnd = new scala.util.Random(7)
    def chunks(sig: Long): Seq[Long] = (0 until 7).map(k => (sig >>> (k * 9)) & 511L)
    for (_ <- 1 to 500) {
      val a = rnd.nextLong() & ((1L << 60) - 1)
      val d = rnd.nextInt(7) // 0..6 flips
      val flipped = rnd.shuffle((0 until 60).toList).take(d)
        .foldLeft(a)((s, b) => s ^ (1L << b))
      assert(java.lang.Long.bitCount(a ^ flipped) <= 6)
      assert(chunks(a).zip(chunks(flipped)).exists { case (x, y) => x == y },
        s"no shared chunk for d=$d flips")
    }
    // and the bucket join's candidate condition is exact on the boundary:
    // 7 flips spread one per chunk CAN miss every chunk (why 7 chunks is
    // the minimum for threshold 6, not a convenience)
    val base = 0L
    val spread = (0 until 7).foldLeft(base)((s, k) => s ^ (1L << (k * 9)))
    assert(chunks(base).zip(chunks(spread)).forall { case (x, y) => x != y })
  }

  test("DotProduct is commutative and scales linearly (seeded generated inputs)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(25)((
      List.fill(8)(rnd.nextDouble() * 20 - 10),
      List.fill(8)(rnd.nextDouble() * 20 - 10)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.DotProduct.dot($"a", $"b").as("ab"),
      graft.functions.DotProduct.dot($"b", $"a").as("ba"),
      graft.functions.DotProduct.dot(transform($"a", x => x * 2), $"b").as("a2b"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(math.abs(r.getDouble(2) - 2 * r.getDouble(0)) < 1e-9)
    }
  }

  test("jaccard bounds: every reported pair has 0.5 <= j <= 1.0 and inter <= min(sz)") {
    val rows = SparkEntry.queries("q22_neardup_jaccard")(spark, sf).collect()
    rows.foreach { r =>
      val inter = r.getAs[Long]("inter")
      val sa = r.getAs[Long]("sz_a"); val sb = r.getAs[Long]("sz_b")
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
      assert(inter <= math.min(sa, sb))
    }
  }

  test("session windows partition events exactly: Σ n_events == |events|") {
    val n = graft.sources.Tables.events(spark, sf).count()
    val sessSum = SparkEntry.queries("q20_session_windows")(spark, sf)
      .agg(sum($"n_events")).as[Long].head()
    assert(sessSum == n)
  }

  test("sliding windows cover each event exactly 6 times") {
    val n = graft.sources.Tables.events(spark, sf).count()
    val winSum = SparkEntry.queries("q19_sliding_6h_1h_counts")(spark, sf)
      .agg(sum($"n")).as[Long].head()
    assert(winSum == 6 * n)
  }

  test("interleave closed form == sort definition for arbitrary source-size configs") {
    // The q105/q116 position formula — pos(s, r) = Σ_{s'} min(|s'|, r−1)
    //   + |{s' < s : |s'| ≥ r}| + 1 — must equal the 1-based index under
    // the defining total order (rank, source) for ANY multiset of source
    // sizes, not just the fixture's. Pure-JVM check over seeded random
    // configs including the adversarial shapes (single source, all size
    // one, highly skewed).
    val rnd = new scala.util.Random(42)
    val configs =
      Seq(Map("a" -> 1), Map("a" -> 5), Map("a" -> 1, "b" -> 1, "c" -> 1),
        Map("a" -> 7, "b" -> 1), Map("a" -> 1, "b" -> 9, "c" -> 3)) ++
        (1 to 20).map { _ =>
          (0 until (1 + rnd.nextInt(6)))
            .map(i => s"s$i" -> (1 + rnd.nextInt(12))).toMap
        }
    configs.foreach { sizes =>
      val docs = sizes.toSeq.flatMap { case (s, n) => (1 to n).map(r => (s, r)) }
      val sorted = docs.sortBy { case (s, r) => (r, s) }
      val byDefinition = sorted.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
      docs.foreach { case (s, r) =>
        val closed = sizes.values.map(n => math.min(n.toLong, r - 1L)).sum +
          sizes.count { case (s2, n2) => s2 < s && n2 >= r } + 1L
        assert(closed == byDefinition((s, r)),
          s"config $sizes: pos($s, $r) closed=$closed sort=${byDefinition((s, r))}")
      }
    }
  }
}
