package graft

import org.scalatest.funsuite.AnyFunSuite

/** Training-data-pipeline operators (q56–q64): law-based assertions on
  * sf0.001 — monotone funnels, conservation sums, hash-split stability,
  * and sketch error bounds. Oracle parity is covered by the driver gate
  * (tools/check.py); these pin the semantics independently. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q96 leakage audit conserves the verified pair set and labels leaks") {
    val rows = run("q96_split_leakage_audit").collect()
    assert(rows.nonEmpty)
    val totalPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    // every audited pair row is consistent: flag <=> split mismatch,
    // distinct-doc counts bounded by pair count, splits canonically ordered
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(a <= b, "split pair not canonically ordered")
      assert(r.getAs[Int]("is_leak") == (if (a != b) 1 else 0))
      assert(r.getAs[Long]("n_docs_a") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("n_docs_b") <= r.getAs[Long]("n_pairs"))
    }
    // pair conservation against the verified near-dup pair set (J >= 0.5),
    // recomputed brute-force from the public shingle helper
    import org.apache.spark.sql.functions._
    val sh = graft.functions.text.shingles(
      graft.sources.Tables.documents(spark, sf))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val expected = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sa")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sb")), Seq("doc_b"))
      .filter(round(col("inter").cast("double")
        / (col("sa") + col("sb") - col("inter")), 4) >= 0.5)
      .count()
    assert(totalPairs == expected,
      s"audit covers $totalPairs pairs, verified set has $expected")
  }

  test("q99 retrieval returns ranked top-3 per slice query, no self-matches") {
    import org.apache.spark.sql.functions._
    val rows = run("q99_tfidf_cosine_retrieval").collect()
    assert(rows.nonEmpty)
    val sliceIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(graft.functions.text
        .md5Hash60(concat(lit("ret:"), col("doc_id").cast("string"))) % 50 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byQuery = rows.groupBy(_.getAs[Long]("query_doc"))
    assert(byQuery.keySet == sliceIds, "every slice doc retrieves, nothing else")
    byQuery.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L),
        s"query $q: ranks not 1..3")
      sorted.foreach(r => assert(r.getAs[Long]("match_doc") != q, "self-match"))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse, s"query $q: cosine not ranked")
      cosines.foreach(c => assert(c > 0.0 && c <= 1.0001, s"cosine $c out of range"))
    }
  }

  test("q56 HLL estimate is within 20% of the exact distinct count") {
    run("q56_hll_distinct_sketch").collect().foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("hll_estimate")
      assert(math.abs(est - exact) / exact < 0.20,
        s"estimate $est vs exact $exact")
    }
  }

  test("q57 split sizes sum to the table size and are run-to-run stable") {
    val rows = run("q57_hash_split_train_val_test").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs)
    // overall split must be roughly 80/10/10 (hash uniformity)
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit("train").toDouble / docs > 0.7)
    assert(bySplit("val") > 0 && bySplit("test") > 0)
    assert(run("q57_hash_split_train_val_test").collect().toSeq == rows.toSeq)
  }

  test("q58 chunking covers every token at least once (overlap >= 1x)") {
    val rows = run("q58_doc_chunking").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    import org.apache.spark.sql.functions._
    val tokens = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val chunkTokens = rows.map(_.getAs[Long]("sum_chunk_tokens")).sum
    assert(chunkTokens >= tokens) // stride < window => overlap inflates
    rows.foreach(r => assert(r.getAs[Long]("n_chunks") >= r.getAs[Long]("n_docs")))
  }

  test("q59 PMI output respects the min-count floor and the limit") {
    val rows = run("q59_bigram_pmi").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_pairs") >= 20))
    // sorted by pmi desc
    val pmis = rows.map(_.getAs[Double]("pmi")).toSeq
    assert(pmis == pmis.sorted.reverse)
  }

  test("q60 threshold near-dup pairs are canonical (a<b) and above threshold") {
    run("q60_embedding_neardup_pairs").collect().foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cos_sim") >= 0.4)
    }
  }

  test("q61 sample is a subset with a plausible rate") {
    val rows = run("q61_stratified_hash_sample").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val sampled = rows.map(_.getAs[Long]("n_sampled")).sum.toDouble
    assert(sampled / total > 0.03 && sampled / total < 0.25)
  }

  test("q62 Zipf ranks are 1..20 with non-increasing frequency") {
    val rows = run("q62_zipf_rank_frequency").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    val freqs = rows.map(_.getAs[Long]("freq")).toSeq
    assert(freqs == freqs.sorted.reverse)
  }

  test("q63 funnel stages are monotone non-increasing") {
    val r = run("q63_conversion_funnel").head()
    val chain = Seq(r.getAs[Long]("n_users"), r.getAs[Long]("n_viewed"),
      r.getAs[Long]("n_clicked_after"), r.getAs[Long]("n_purchased_after"))
    assert(chain == chain.sorted.reverse)
    assert(chain.head > 0)
  }

  test("q65 LSH neighbors are a subset of brute-force candidates with rn<=3") {
    val rows = run("q65_ann_hyperplane_lsh").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rn") >= 1 && r.getAs[Long]("rn") <= 3)
      assert(r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id"))
    }
    // per query, rn is contiguous from 1 and sims are non-increasing
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, qr) =>
      val sorted = qr.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to sorted.length).toSeq)
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims == sims.sorted.reverse)
    }
  }

  test("q72 multi-probe dominates single-probe LSH per query (recall dial)") {
    def best(name: String): Map[Long, Double] =
      run(name).collect()
        .filter(_.getAs[Long]("rn") == 1L)
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("sim")).toMap
    val single = best("q65_ann_hyperplane_lsh")
    val multi = best("q72_ann_multiprobe_lsh")
    // every query answered by single-probe is answered at least as well
    single.foreach { case (q, s) =>
      assert(multi.contains(q), s"multi-probe lost query $q")
      assert(multi(q) >= s, s"multi-probe worse for query $q: ${multi(q)} < $s")
    }
    assert(multi.size >= single.size)
  }

  test("q78 LSH-pruned pair top-k: sims are exact dots; ordering is total") {
    import org.apache.spark.sql.functions._
    val rows = run("q78_embedding_pair_topk_lsh").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // every reported sim must equal the exact rounded dot of the two
    // vectors (pruning may drop pairs, but must never distort a value)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(a < b)
      val exact = BigDecimal(vecs(a).zip(vecs(b)).foldLeft(0.0) {
        case (acc, (x, y)) => acc + x * y
      }).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("sim") - exact) < 1e-9,
        s"pair ($a,$b): reported ${r.getAs[Double]("sim")} vs exact $exact")
    }
    val sims = rows.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
    // and the pruned top-1 must not beat the exact top-1 (sanity: subset)
    val exactTop = run("q34_embedding_pair_topk").head().getAs[Double]("sim")
    assert(sims.head <= exactTop)
  }

  test("q83 LSH-pruned threshold near-dup is a subset of q60 with identical values") {
    // The pruned scale form may DROP pairs (sign-LSH recall curve) but
    // must never invent a pair or distort a value: every q83 row must
    // appear in q60 byte-for-byte, and every sim must be the exact
    // rounded dot of the raw vectors.
    import org.apache.spark.sql.functions._
    def keyed(name: String): Map[(Long, Long), (Double, Int)] =
      run(name).collect().map { r =>
        (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
          ((r.getAs[Double]("cos_sim"), r.getAs[Int]("same_label")))
      }.toMap
    val pruned = keyed("q83_embedding_neardup_lsh")
    val exact = keyed("q60_embedding_neardup_pairs")
    assert(pruned.nonEmpty, "fixture must yield at least one pruned pair")
    pruned.foreach { case (pair, v) =>
      assert(exact.contains(pair), s"q83 invented pair $pair absent from q60")
      assert(exact(pair) == v, s"pair $pair: q83 $v vs q60 ${exact(pair)}")
    }
    // and the values themselves are exact rounded dots of the raw vectors
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    pruned.foreach { case ((a, b), (sim, _)) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(sim >= 0.4, s"pair ($a,$b) below threshold: $sim")
      val dot = BigDecimal(vecs(a).zip(vecs(b)).foldLeft(0.0) {
        case (acc, (x, y)) => acc + x * y
      }).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(sim - dot) < 1e-9,
        s"pair ($a,$b): reported $sim vs exact $dot")
    }
  }

  test("q80 approx equi-depth tracks the exact ntile histogram") {
    val approx = run("q80_equidepth_histogram_scale").collect()
    val exact = run("q70_equidepth_histogram").collect()
    val total = exact.map(_.getAs[Long]("n")).sum
    assert(approx.map(_.getAs[Long]("n")).sum == total,
      "every row must land in exactly one bucket")
    assert(approx.map(_.getAs[Long]("bucket")).toSeq == (1L to 10L),
      "all 10 deciles populated")
    // sampled boundaries keep buckets within 50% of the ideal depth at
    // this tiny scale (20% of 1000 events = a 200-row sample)
    approx.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      assert(n > total / 10.0 * 0.5 && n < total / 10.0 * 1.5,
        s"bucket ${r.getAs[Long]("bucket")} depth $n vs ideal ${total / 10.0}")
    }
    // bucket value ranges are disjoint and ordered, like the exact form
    val his = approx.map(_.getAs[Double]("hi")).toSeq
    assert(his == his.sorted)
  }

  test("q66 grouping sets: detail rows sum to subtotals and grand total") {
    val rows = run("q66_grouping_sets").collect()
    def n(st: String, pr: String) = rows.collectFirst {
      case r if r.getAs[String]("status") == st && r.getAs[String]("priority") == pr =>
        r.getAs[Long]("n_orders")
    }.get
    val statuses = rows.map(_.getAs[String]("status")).distinct.filter(_ != "ALL")
    statuses.foreach { st =>
      val detail = rows.filter(r => r.getAs[String]("status") == st
        && r.getAs[String]("priority") != "ALL").map(_.getAs[Long]("n_orders")).sum
      assert(detail == n(st, "ALL"), s"subtotal mismatch for $st")
    }
    assert(statuses.map(st => n(st, "ALL")).sum == n("ALL", "ALL"))
  }

  test("q64 quality funnel stages are monotone non-increasing per lang") {
    run("q64_quality_filter_funnel").collect().foreach { r =>
      val chain = Seq(r.getAs[Long]("n_docs"), r.getAs[Long]("pass_len"),
        r.getAs[Long]("pass_tokens"), r.getAs[Long]("pass_diversity"))
      assert(chain == chain.sorted.reverse)
    }
  }

  test("q101 compaction keeps exactly one doc per component plus all unpaired docs") {
    val rows = run("q101_canonical_compaction").collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs, "every doc counted")
    val comp = run("q45_neardup_components").collect()
    val nComponents = comp.map(_.getAs[Long]("component_id")).distinct.length
    assert(rows.map(_.getAs[Long]("n_removed")).sum == comp.length - nComponents,
      "removed = members - one survivor per component")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
        == r.getAs[Long]("n_docs"))
      val f = r.getAs[Double]("kept_token_frac")
      assert(f > 0.0 && f <= 1.0)
    }
  }

  test("q102 quantization errors respect the int8 bound; vectors conserved") {
    val rows = run("q102_embedding_quantization_error").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      spark.read.parquet(s"$sf/embeddings.parquet").count())
    rows.foreach { r =>
      // unit-norm vectors: max|v_i| <= 1 so scale = 127/max|v_i| >= 127,
      // and |err| <= 0.5/scale <= 0.5/127
      assert(r.getAs[Double]("avg_scale") >= 127.0)
      val maxErr = r.getAs[Double]("max_abs_err")
      assert(maxErr >= 0.0 && maxErr <= 0.5 / 127.0 + 1e-9,
        s"int8 reconstruction error bound violated: $maxErr")
      assert(r.getAs[Double]("mse_ppm") >= 0.0)
    }
  }

  test("q103 hard negatives are cross-label and bounded by the exact best") {
    import org.apache.spark.sql.functions._
    val rows = run("q103_hard_negative_mining").collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Int]("anchor_label") != r.getAs[Int]("negative_label")))
    // the LSH-mined negative can never beat the brute-force best
    // cross-label similarity (it IS it whenever the best pair shares a
    // probed bucket — the recall dial, not a correctness bound)
    val dot = graft.functions.DotProduct.dot _
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val best = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.label") =!= col("b.label"))
      .groupBy(col("a.vec_id").as("anchor_id"))
      .agg(max(round(dot(col("a.v"), col("b.v")), 4)).as("best"))
      .collect()
      .map(r => r.getAs[Long]("anchor_id") -> r.getAs[Double]("best")).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("sim") <= best(r.getAs[Long]("anchor_id")) + 1e-9)
    }
  }

  test("q107 delete cascade reconciles and leaves no surviving orphans") {
    import org.apache.spark.sql.functions._
    val rows = run("q107_delete_cascade_audit").collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem", "events"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_rows")
        == r.getAs[Long]("n_removed") + r.getAs[Long]("n_surviving"))
      assert(r.getAs[Long]("n_removed") >= 0)
    }
    assert(rows("customer").getAs[Long]("n_removed") > 0,
      "the 2% slice must select at least one customer")
    // independent recompute via anti-joins: after the cascade, no
    // surviving order references a killed customer, no surviving
    // lineitem references a removed order, no surviving event a killed user
    val kill = spark.read.parquet(s"$sf/customer.parquet")
      .filter(graft.functions.text.md5Hash60(
        concat(lit("del:"), col("c_custkey").cast("string"))) % 50 === 0)
      .select("c_custkey")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val survOrders = orders.join(kill,
      orders("o_custkey") === kill("c_custkey"), "left_anti")
    assert(survOrders.count() == rows("orders").getAs[Long]("n_surviving"))
    val okill = orders.join(kill,
      orders("o_custkey") === kill("c_custkey"), "left_semi").select("o_orderkey")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(li.join(okill, li("l_orderkey") === okill("o_orderkey"), "left_anti")
      .count() == rows("lineitem").getAs[Long]("n_surviving"))
    val ev = graft.sources.Tables.events(spark, sf)
    assert(ev.join(kill, ev("user_id") === kill("c_custkey"), "left_anti")
      .count() == rows("events").getAs[Long]("n_surviving"))
  }

  test("q105 closed-form interleave positions equal the global-sort definition") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // recompute the order the slow way — one global window — and check
    // the closed form reproduces it exactly (only viable at test scale;
    // the query itself never total-orders)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val r = docs.select(col("doc_id"), col("source"),
        graft.functions.text.md5Hash60(
          concat(lit("ilv:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("hk", "doc_id")).cast("long"))
    val expected = r.withColumn("p",
        row_number().over(Window.orderBy(col("rk"), col("source"))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), min("p").as("mn"), max("p").as("mx"))
      .collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("mn"), x.getAs[Long]("mx")))).toMap
    val rows = run("q105_interleave_shuffle_order").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("min_pos")).min == 1L)
    assert(rows.map(_.getAs[Long]("max_pos")).max == total)
    rows.foreach { row =>
      val (n, mn, mx) = expected(row.getAs[String]("source"))
      assert(row.getAs[Long]("n_docs") == n)
      assert(row.getAs[Long]("min_pos") == mn, s"${row.getString(0)} min_pos")
      assert(row.getAs[Long]("max_pos") == mx, s"${row.getString(0)} max_pos")
      val f = row.getAs[Double]("avg_pos_frac")
      assert(f > 0.3 && f < 0.7, s"interleave should mix sources, got $f")
    }
  }

  test("q115 journey paths are bounded 5-step prefixes over the event-type domain") {
    import org.apache.spark.sql.functions._
    val rows = run("q115_user_journey_paths").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getAs[Long]("n_users")).toSeq
    assert(counts == counts.sorted.reverse, "ordered by user count desc")
    val types = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().collect()
      .map(_.getAs[String]("event_type")).toSet
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.length >= 1 && steps.length <= 5)
      steps.foreach(t => assert(types.contains(t), s"unknown event type $t"))
    }
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(counts.sum <= nUsers, "each user contributes at most one path")
  }

  test("q116 shard plan balances docs within one and covers positions exactly") {
    import org.apache.spark.sql.functions._
    val rows = run("q116_export_shard_plan").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("shard")).toSeq == (0L until math.min(8L, nDocs)))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs, "every doc lands in a shard")
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1,
      s"mod-sharding a permutation must balance within one doc: ${sizes.toSeq}")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totalTok = docs.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTok)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_pos") >= 1 && r.getAs[Long]("max_pos") <= nDocs)
      assert(r.getAs[Long]("n_sources") >= 1)
    }
  }

  test("q119 graph metrics satisfy the triangle/wedge laws and agree with q45") {
    val rows = run("q119_neardup_graph_metrics").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (nodes, edges) = (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))
    val (tri, wedges) = (r.getAs[Long]("n_triangles"), r.getAs[Long]("n_wedges"))
    assert(nodes == run("q45_neardup_components").count(),
      "metric node count must equal the component view")
    assert(edges == run("q22_neardup_jaccard").count(),
      "metric edge count must equal the verified pair set")
    assert(tri >= 0 && wedges >= 0)
    assert(3 * tri <= wedges, "every triangle closes exactly 3 wedges")
    val cc = r.getAs[Double]("clustering_coeff")
    assert(cc >= 0.0 && cc <= 1.0)
    if (wedges > 0)
      assert(math.abs(cc - BigDecimal(3.0 * tri / wedges)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q120 anomaly z-scores honor warm-up and conserve event counts") {
    import org.apache.spark.sql.functions._
    val rows = run("q120_daily_volume_anomaly").collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "daily counts must partition the event stream")
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val byDay = rs.sortBy(_.getAs[java.sql.Date]("day").toString)
      // the first 7 days per type can have no full trailing baseline
      byDay.take(math.min(7, byDay.length)).foreach(r =>
        assert(r.isNullAt(r.fieldIndex("z")), s"$t: z must be NULL in warm-up"))
      byDay.foreach { r =>
        val a = r.getAs[Int]("anomaly")
        assert(a == 0 || a == 1)
        if (a == 1) assert(math.abs(r.getAs[Double]("z")) >= 2.0)
        if (!r.isNullAt(r.fieldIndex("z")))
          assert(r.getAs[Long]("n") >= 0 && r.getAs[Double]("baseline_mean") > 0)
      }
    }
  }

  test("q126 referential integrity reports all edges and zero orphans on the fixture") {
    val rows = run("q126_referential_integrity").collect()
    assert(rows.map(_.getAs[String]("edge")).toSeq ==
      Seq("customer->nation", "events->customer", "lineitem->orders",
        "orders->customer"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0,
        s"${r.getString(0)}: fixture FKs are verified subsets (SURVEY 2.4)")
      assert(r.getAs[Long]("n_child") > 0 && r.getAs[Long]("n_parents") > 0)
      assert(r.getAs[Long]("n_childless") >= 0 &&
        r.getAs[Long]("n_childless") <= r.getAs[Long]("n_parents"))
    }
  }

  test("q127 column profile marks keys unique and reflects real null mass") {
    val rows = run("q127_column_profile").collect()
      .map(r => r.getAs[String]("column_name") ->
        ((r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct")))).toMap
    assert(rows.keySet == Set("event_id", "ts_us", "user_id", "event_type",
      "value", "props"))
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(rows("event_id") == ((0L, n)), "event_id is a unique non-null key")
    assert(rows("user_id")._1 == 0)
    assert(rows("value")._1 >= 0) // value is nullable (NULLs appear from sf0.01 up)
    rows.values.foreach { case (nulls, distinct) =>
      assert(nulls + distinct <= n + 1 && distinct >= 1)
    }
  }

  test("q129 span audit chunk volumes reconcile with per-doc token counts") {
    import org.apache.spark.sql.functions._
    val rows = run("q129_duplicated_span_audit").collect()
    assert(rows.nonEmpty)
    val expected = graft.sources.Tables.documents(spark, sf)
      .select(col("source"),
        floor(size(split(col("text"), " ")) / lit(32)).cast("long").as("k"))
      .groupBy("source").agg(sum(col("k")).as("k")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("k")).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_chunks") == expected(src),
        s"$src: chunk count must be sum of floor(tokens/32)")
      val (n, d) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"))
      assert(d >= 0 && d <= n)
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q130 recall meter covers every query with hits bounded by the ANN output") {
    val rows = run("q130_ann_recall_eval").collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq == (0L until 10L),
      "every ground-truth query must appear, including zero-hit ones")
    val annByQuery = run("q72_ann_multiprobe_lsh").collect()
      .groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 3)
      assert(hits <= annByQuery.getOrElse(r.getAs[Long]("query_id"), 0),
        "hits cannot exceed what the ANN returned")
      assert(math.abs(r.getAs[Double]("recall_at_3") - BigDecimal(hits / 3.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_hits")).sum > 0,
      "the probe set must find something on the fixture")
  }

  test("q104 drift is non-negative and token volumes conserve") {
    import org.apache.spark.sql.functions._
    val rows = run("q104_vocab_drift_by_source").collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totalTok = docs.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTok)
    val vocab = docs.select(explode(split(col("text"), " "))).distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2_ppm") >= 0.0)
      assert(r.getAs[Long]("n_vocab_used") >= 1 &&
        r.getAs[Long]("n_vocab_used") <= vocab)
    }
  }

  test("q175 power iteration: unit loadings, eigenvalue matches a replayed matvec") {
    val rows = run("q175_principal_component").collect().sortBy(_.getAs[Long]("dim"))
    assert(rows.length == 64)
    val v = rows.map(_.getAs[Double]("loading"))
    val lambda = rows.head.getAs[Double]("eigenvalue")
    assert(rows.forall(_.getAs[Double]("eigenvalue") == lambda))
    val norm2 = v.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"loadings not unit: $norm2")
    assert(lambda > 0.0)
    // replay one exact matvec with the OUTPUT vector: for a converged
    // direction, ||X^T X v|| must approximate the reported eigenvalue
    val xs = graft.sources.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("embedding")
        .cast("array<double>").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val w = new Array[Double](64)
    xs.foreach { x =>
      var s = 0.0
      var i = 0
      while (i < 64) { s += x(i) * v(i); i += 1 }
      i = 0
      while (i < 64) { w(i) += x(i) * s; i += 1 }
    }
    val replayed = math.sqrt(w.map(x => x * x).sum)
    // power iteration on a PSD Gram matrix is Rayleigh-monotone: one
    // more exact step can only grow the norm (up to rounding)...
    assert(replayed >= lambda - 0.01,
      s"replayed step shrank: $replayed < reported $lambda")
    // ...and after 3 steps it is already in the eigenvalue's
    // neighborhood even on the tiny sf0.001 corpus
    assert((replayed - lambda) / lambda < 0.15,
      s"replayed matvec norm $replayed too far above reported $lambda")
  }

  test("q162 containment: ratios consistent, every exact-dup pair surfaces at 1.0") {
    val rows = run("q162_containment_pairs").collect()
    rows.foreach { r =>
      val (inter, szA, szB) = (r.getAs[Long]("inter"), r.getAs[Long]("sz_a"),
        r.getAs[Long]("sz_b"))
      assert(inter >= 1 && inter <= szA, "intersection bounded by the contained side")
      assert(szA < szB ||
        (szA == szB && r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")),
        "A is the smaller side, ties ordered")
      val c = r.getAs[Double]("containment")
      assert(c >= 0.8 && c <= 1.0)
      val expect = BigDecimal(inter.toDouble / szA)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(c == expect, "containment != round4(inter/sz_a)")
    }
    assert(rows.nonEmpty, "fixture geometry yields containment pairs")
    // cross-operator law: containment of the smaller side dominates
    // Jaccard (inter/min >= inter/union), so every q22 near-dup pair
    // whose smaller-side ratio clears 0.8 must surface here with
    // exactly that ratio
    val pairMap = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    var checked = 0
    run("q22_neardup_jaccard").collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (szA, szB) = (r.getAs[Long]("sz_a"), r.getAs[Long]("sz_b"))
      val inter = r.getAs[Long]("inter")
      val (small, large, szS, szL) =
        if (szA < szB || (szA == szB && a < b)) (a, b, szA, szB)
        else (b, a, szB, szA)
      val c = BigDecimal(inter.toDouble / szS)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(c >= r.getAs[Double]("jaccard"), "containment must dominate jaccard")
      if (c >= 0.8) {
        checked += 1
        assert(pairMap.get((small, large)).contains(c),
          s"near-dup pair ($small,$large) missing from containment or ratio differs")
      }
    }
    assert(checked > 0, "at least one q22 pair must clear the containment bar")
  }

  test("q162 prefix-filtered candidates have exact recall vs the raw self-join") {
    import org.apache.spark.sql.functions._
    // brute-force reference: EVERY ordered pair sharing any shingle,
    // then the same containment/dominance filters — the unfiltered
    // candidate generation the prefix filter replaced
    val sh = graft.functions.text.shingles(
      spark.read.parquet(s"$sf/documents.parquet"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val p = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val brute = p
      .join(sz.select(col("doc_id").as("da"), col("sz").as("sz_a")),
        col("doc_a") === col("da"))
      .join(sz.select(col("doc_id").as("db"), col("sz").as("sz_b")),
        col("doc_b") === col("db"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("sz_a"), col("sz_b"),
        (round(col("inter").cast("double") / col("sz_a"), 4) + lit(0.0))
          .as("containment"))
      .filter(col("containment") >= 0.8 &&
        (col("sz_a") < col("sz_b") ||
          (col("sz_a") === col("sz_b") && col("doc_a") < col("doc_b"))))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"), r.getAs[Double]("containment"))).toSet
    val pruned = run("q162_containment_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"), r.getAs[Double]("containment"))).toSet
    assert(brute.nonEmpty)
    assert(pruned == brute,
      s"prefix filter must lose nothing: ${brute.size} brute vs ${pruned.size}")
    // and the probe side must be a real reduction: the prefix carries
    // at most ⌊sz/5⌋+2 of each doc's shingles
    val probeRows = sz.select(sum(expr("sz div 5") + lit(2))).head.getLong(0)
    val fullRows = sz.select(sum(col("sz"))).head.getLong(0)
    assert(probeRows * 2 < fullRows,
      s"prefix probe ($probeRows shingle rows) should be well under the full set ($fullRows)")
  }

  test("q164 normalization masses are nested and ratios consistent") {
    val rows = run("q164_text_normalization_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, alnum, norm) = (r.getAs[Long]("chars_raw"),
        r.getAs[Long]("chars_alnum"), r.getAs[Long]("chars_norm"))
      assert(norm <= alnum && alnum <= raw,
        s"${r.getAs[String]("source")}: masses must shrink through the pipeline")
      val ratio = BigDecimal(norm.toDouble / raw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(r.getAs[Double]("keep_ratio") == ratio)
    }
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
  }

  test("q165 correlation matrix stays in [-1,1] and tracks the built-in corr") {
    val rows = run("q165_correlation_matrix").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(v >= -1.0 && v <= 1.0, s"${r.getAs[String]("pair")}: r $v out of range")
    }
    // the decimal-moment form must agree with Spark's float corr to well
    // inside the rounding grid (the moments are exact; corr is not)
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sf)
    val builtin = li.agg(
      corr(col("l_quantity"), col("l_extendedprice")).as("qp"),
      corr(col("l_discount"), col("l_tax")).as("dt")).head()
    val byPair = rows.map(r => r.getAs[String]("pair") -> r.getAs[Double]("r")).toMap
    assert(math.abs(byPair("quantity_extendedprice") - builtin.getAs[Double]("qp")) < 1e-3)
    assert(math.abs(byPair("discount_tax") - builtin.getAs[Double]("dt")) < 1e-3)
  }

  test("q163 boilerplate fractions bounded; doc counts match shingle-bearing docs") {
    val rows = run("q163_boilerplate_fraction").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("mean_bp_frac")
      assert(f >= 0.0 && f <= 1.0, s"mean fraction $f outside [0,1]")
      assert(r.getAs[Long]("n_heavy") <= r.getAs[Long]("n_docs"))
    }
    import org.apache.spark.sql.functions._
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val got = rows.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    assert(got == expected, "per-source doc counts must equal shingle-bearing docs")
  }

  test("q238 winnowing guarantee: every >=7-token shared run yields a shared fingerprint") {
    import org.apache.spark.sql.functions._
    val tt = col("t")
    // brute-force ground truth: doc pairs sharing any 7-token run
    // (w+k-1 = 7 is the paper's detection threshold for k=4, w=4)
    val g7 = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(tt) >= 7)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(tt) - 6),
        i => concat_ws(" ", (0 until 7).map(k => element_at(tt, i + lit(k))): _*)))
        .as("g"))
      .distinct()
    val mustPairs = g7.select(col("doc_id").as("doc_a"), col("g"))
      .join(g7.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    assert(mustPairs.count() > 0, "fixture must contain shared 7-token runs")
    val fp = graft.operators.Dedup.winnowFingerprints(spark, sf)
    val fpPairs = fp.select(col("doc_id").as("doc_a"), col("f"))
      .join(fp.select(col("doc_id").as("doc_b"), col("f")), Seq("f"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    assert(mustPairs.except(fpPairs).count() == 0,
      "winnowing guarantee violated: a >=7-token shared run with no shared fingerprint")
    // density bounds: 1 <= |fingerprints| <= window count per doc
    val m = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 3).as("m"))
      .filter(col("m") >= 1)
    val badDensity = fp.groupBy("doc_id").agg(count(lit(1)).as("fp_n"))
      .join(m, "doc_id")
      .filter(col("fp_n") < 1 || col("fp_n") > greatest(col("m") - 3, lit(1)))
      .count()
    assert(badDensity == 0, "fingerprint count outside [1, windows] for some doc")
    // the report surfaces every high-J planted near-dup pair
    val hi = run("q22_neardup_jaccard").filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")
    val rep = run("q238_winnowing_fingerprints").select("doc_a", "doc_b")
    assert(hi.except(rep).count() == 0,
      "a J>=0.9 near-dup pair is missing from the winnowing report")
  }

  test("q239 duplicated spans: in-bounds, maximal islands, planted near-dups covered") {
    import org.apache.spark.sql.functions._
    val spans = run("q239_dup_span_islands").collect()
    assert(spans.nonEmpty)
    val lenByDoc = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    spans.foreach { r =>
      val (s0, e0, t0) = (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
        r.getAs[Long]("span_tokens"))
      // spans are contiguous duplicated-TOKEN runs after interval merge
      assert(t0 == e0 - s0 + 1, "span_tokens must equal end - start + 1")
      assert(t0 >= 15, "span below the 15-token cut")
      assert(s0 >= 1 && e0 <= lenByDoc(r.getAs[Long]("doc_id")),
        "span exceeds document bounds")
    }
    // islands are maximal AND disjoint: consecutive spans in a doc are
    // separated by at least one non-duplicated token (overlapping or
    // adjacent ranges would have merged — no token is double-counted)
    spans.groupBy(_.getAs[Long]("doc_id")).values.foreach { ss =>
      ss.sortBy(_.getAs[Long]("span_start")).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.getAs[Long]("span_start") > a.getAs[Long]("span_end") + 1,
            "adjacent islands should have merged")
        case _ =>
      }
    }
    // every doc in a J>=0.9 planted pair carries at least one span
    val hiDocs = run("q22_neardup_jaccard").filter(col("jaccard") >= 0.9)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val spanDocs = spans.map(_.getAs[Long]("doc_id")).toSet
    assert(hiDocs.nonEmpty && hiDocs.subsetOf(spanDocs),
      "a J>=0.9 near-dup doc has no duplicated span")
  }

  test("q258 scrub ledger reconciles exactly with q239's spans") {
    import org.apache.spark.sql.functions._
    val scrub = run("q258_dup_span_scrub").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_kept"),
          Option(r.getAs[java.lang.Long]("cleaned_checksum")))).toMap
    val spans = run("q239_dup_span_islands").collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, ss) => d -> ss.map(_.getAs[Long]("span_tokens")).sum }
    // exactly the audited docs are scrubbed, and the removed mass is
    // exactly the audited span mass (disjoint islands ⇒ no double cut)
    assert(scrub.keySet == spans.keySet,
      "scrub work list must equal the span-audit doc set")
    val lenByDoc = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n").toLong).toMap
    scrub.foreach { case (d, (nt, nr, nk, ck)) =>
      assert(nt == lenByDoc(d), s"doc $d: token count must match the source")
      assert(nr + nk == nt, s"doc $d: removed + kept must cover every token")
      assert(nr == spans(d), s"doc $d: removed mass must equal span mass")
      assert(ck.isDefined == (nk > 0),
        s"doc $d: checksum is NULL exactly for fully-scrubbed docs")
    }
  }

  test("q241 component split: covers all docs, zero leaks, pairs co-assigned") {
    import org.apache.spark.sql.functions._
    val rows = run("q241_component_safe_split").collect()
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "val", "test"))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs, "split must cover every doc")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_groups") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_leaked_pairs") == 0L,
        "component-grain split must never leak a near-dup pair")
    }
    // grouped splitting is deterministic: a re-run reassigns identically
    assert(run("q241_component_safe_split").collect().toSeq == rows.toSeq)
  }

  test("q242 phrase proximity matches a brute-force token scan exactly") {
    val rows = run("q242_phrase_proximity").collect()
    assert(rows.nonEmpty)
    val pairs = Map(1L -> ("scan", "column"), 2L -> ("window", "order"),
      3L -> ("sort", "key"))
    // recompute every (pair, doc) hit count and min gap by scanning tokens
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ")).toMap
    val expected = (for {
      (pid, (ta, tb)) <- pairs.toSeq
      (doc, t) <- texts.toSeq
      gaps = for {
        ia <- t.indices if t(ia) == ta
        ib <- (ia + 1) to math.min(ia + 3, t.length - 1) if t(ib) == tb
      } yield (ib - ia).toLong
      if gaps.nonEmpty
    } yield (pid, doc) -> ((gaps.size.toLong, gaps.min))).toMap
    val got = rows.map(r => (r.getAs[Long]("pair_id"), r.getAs[Long]("doc_id"))
      -> ((r.getAs[Long]("n_hits"), r.getAs[Long]("min_gap")))).toMap
    assert(got == expected, "proximity hits must equal the brute-force scan")
  }

  test("q243 sorted-neighborhood verifies exactly the brute-force pair set on the fixture") {
    // subset is the SNM invariant (candidates are verified with the same
    // exact Jaccard); full recall is a measured fixture property — the
    // multi-pass keys (prefix + reversed prefix) cover the planted edits
    val snm = run("q243_sorted_neighborhood_neardup").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val brute = run("q22_neardup_jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(snm.subsetOf(brute), "SNM must never report a non-verified pair")
    assert(snm == brute, "multi-pass SNM reaches full recall on the fixture")
  }

  test("q245 BFS hops carry the exact-distance certificate and agree with q45") {
    import org.apache.spark.sql.functions._
    val rows = run("q245_cluster_bfs_hops").collect()
    assert(rows.nonEmpty)
    val hops = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hops")).toMap
    val compOf = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id")).toMap
    val q45 = run("q45_neardup_components").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id")).toMap
    assert(compOf == q45, "BFS must cover exactly the component view's nodes")
    // adjacency recomputed brute-force from the public shingle helper
    val sh = graft.functions.text.shingles(
      graft.sources.Tables.documents(spark, sf))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = sh.select(col("doc_id").as("a"), col("shingle"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a"), col("sz").as("sa")), Seq("a"))
      .join(sz.select(col("doc_id").as("b"), col("sz").as("sb")), Seq("b"))
      .filter(round(col("inter").cast("double")
        / (col("sa") + col("sb") - col("inter")), 4) >= 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exactness certificate: h(canonical) = 0, and every node's h equals
    // min over neighbors + 1 (lower neighbor exists, no lower is possible)
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id"); val h = hops(d)
      if (d == compOf(d)) assert(h == 0, s"canonical $d must be hop 0")
      else {
        assert(h >= 1 && adj(d).exists(n => hops(n) == h - 1),
          s"node $d at hops $h lacks a hops-${h - 1} neighbor")
        assert(h <= adj(d).map(hops).min + 1,
          s"node $d overshoots its neighborhood minimum")
      }
    }
    // radius is the per-component max
    val radii = rows.map(r =>
      r.getAs[Long]("component_id") -> r.getAs[Long]("radius")).toMap
    rows.groupBy(_.getAs[Long]("component_id")).foreach { case (c, rs) =>
      assert(rs.map(_.getAs[Long]("hops")).max == radii(c))
    }
  }

  test("q240 int8 quantization audit: one row, bounded recall and tiny dot error") {
    val r = run("q240_sq8_quantization_recall").collect()
    assert(r.length == 1)
    val row = r.head
    val (nq, nm) = (row.getAs[Long]("n_queries"), row.getAs[Long]("n_match"))
    assert(nq == 20, "audit must score exactly the 20 query vectors")
    assert(nm >= 0 && nm <= nq)
    val recall = row.getAs[Double]("recall_at_1")
    assert(math.abs(recall - math.rint(nm.toDouble / nq * 10000) / 10000) < 1e-12)
    assert(recall >= 0.9, "int8 on unit vectors should be near-lossless")
    val err = row.getAs[Double]("mean_abs_err")
    assert(err >= 0.0 && err <= 0.01,
      s"mean abs dot error $err above the int8 budget")
  }
}
