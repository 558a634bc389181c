package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden/e2e layer (SURVEY.md §5): every registered query runs on
  * sf0.001 and returns a sane, stably-sized result; entry() smokes. */
class QueriesSmokeSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns >0 rows (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has distinct name and, when oracled, a SQL twin") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // Known-stable expected row counts at sf0.001 (spot-checked golden).
  private val expected = Map(
    "q01_pricing_summary" -> 6L,
    "q07_rollup_revenue" -> 10L,
    "q09_distinct_users_per_event_type" -> 5L,
    "q11_wordcount" -> 31L,
    "q12_inverted_index" -> 31L,
    "q13_global_sort_events" -> 1000L,
    "q21_exact_dedup_groups" -> 500L,
    "q25_tfidf_top_terms" -> 25L,
    "q26_sentiment_lexicon" -> 500L,
    "q27_langid_heuristic" -> 500L,
    "q28_quality_score" -> 500L,
    "q29_token_stats" -> 5L,
    "q30_doc_fingerprint" -> 500L,
    "q31_cosine_topk" -> 50L,
    "q34_embedding_pair_topk" -> 20L,
    "q35_multimodal_binary_features" -> 500L,
    "q36_welford_variance" -> 3L)

  SparkEntry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001") {
      val n = q.fn(spark, sf).count()
      expected.get(q.name) match {
        case Some(e) => assert(n == e, s"expected $e rows, got $n")
        case None    => assert(n >= 0)
      }
    }
  }

  test("q22 finds the planted near-dup pairs (FIXTURES: 28 at sf0.001)") {
    assert(SparkEntry.queries("q22_neardup_jaccard")(spark, sf).count() == 28)
  }

  test("q23 MinHash+LSH returns exactly the brute-force pair set") {
    val brute = SparkEntry.queries("q22_neardup_jaccard")(spark, sf).collect().toSeq
    val lsh = SparkEntry.queries("q23_neardup_minhash_lsh")(spark, sf).collect().toSeq
    assert(lsh == brute)
  }
}
