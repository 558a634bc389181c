package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet sources for the ten fixture tables (FIXTURES.md).
  *
  * Scale notes (SURVEY.md §7.6): each table is a plain parquet directory;
  * at cluster scale these would be partitioned/bucketed layouts, but the
  * reader API is identical — `spark.read.parquet` gets vectorized scans,
  * predicate pushdown and column pruning from Catalyst for free. Never
  * infer schema from text; parquet footers are authoritative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    tsTolerant(s, d, "orders", Seq("o_orderdate"))
  def lineitem(s: SparkSession, d: String): DataFrame =
    tsTolerant(s, d, "lineitem", Seq("l_shipdate"))

  /** Drift-tolerant read for tables whose timestamp columns could be
    * regenerated at ns precision (the round-8 events lesson, applied to
    * every declared-timestamp column): probe under legacy `nanosAsLong`;
    * a declared-timestamp column surfacing as LongType can ONLY be a
    * TIMESTAMP(NANOS) footer (a plain µs/ms timestamp reads as a
    * timestamp type regardless of the flag), so derive the typed column
    * back via exact `div 1000` + `timestamp_micros` — value-identical
    * instants under the pinned UTC session. On the no-drift path the
    * conf is restored immediately so it can't mask anything else. */
  private def tsTolerant(s: SparkSession, d: String, name: String,
      tsCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val key  = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    val raw = apply(s, d, name)
    val nsCols = tsCols.filter(c =>
      raw.schema.fieldNames.contains(c) && raw.schema(c).dataType == LongType)
    if (nsCols.isEmpty) {
      prev.fold(s.conf.unset(key))(v => s.conf.set(key, v))
      raw
    } else // keep nanosAsLong set for execution time on the ns path
      nsCols.foldLeft(raw)((df, c) =>
        df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000"))))
  }
  /** events.ts physical encoding has drifted between fixture generations:
    * int64 epoch-nanos (which Spark 4 refuses as TimestampType —
    * [PARQUET_TYPE_ILLEGAL]) and µs-precision TIMESTAMP_NTZ. A real
    * lakehouse source must survive both, so dispatch on the parquet
    * footer schema and expose one stable column `ts_us` = epoch
    * microseconds (every downstream query reads `ts_us`, never raw `ts`):
    *
    *  - int64 ns: read under legacy `nanosAsLong` (the conf is set only on
    *    this path so a future type change can't be masked by it), then
    *    exact integer division `ts div 1000`. (Double division would
    *    corrupt: epoch-ns ~1.7e18 exceeds 2^53.)
    *  - TIMESTAMP_NTZ / TIMESTAMP: `unix_micros(cast(ts as timestamp))`.
    *    All graft sessions pin `spark.sql.session.timeZone=UTC`, so the
    *    NTZ→LTZ cast is the identity instant and the result matches
    *    DuckDB's `epoch_us(ts)` bit-for-bit.
    *
    * Schema probing itself needs `nanosAsLong` (footer inference throws on
    * ns without it), so set it, probe, then restore on the timestamp path. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val key  = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // ns fixture: keep nanosAsLong set for execution time
        raw.withColumn("ts_us", expr("ts div 1000"))
      case TimestampNTZType | TimestampType =>
        prev.fold(s.conf.unset(key))(v => s.conf.set(key, v))
        raw.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
      case other =>
        prev.fold(s.conf.unset(key))(v => s.conf.set(key, v))
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected int64-ns or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Name-driven drift-tolerant loader dispatch — the ONE place the
    * per-table drift policy lives (round-18 review: `validate`'s probe
    * and q261's catalog audit each carried their own copy of this
    * match, so the next drift-tolerant table could be added in one and
    * silently missed by the other). Tables with declared-timestamp
    * columns go through their own loaders (a ns-encoded fixture throws
    * `[PARQUET_TYPE_ILLEGAL]` on a plain read); everything else reads
    * directly. */
  def load(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events"   => events(s, d)
    case "orders"   => orders(s, d)
    case "lineitem" => lineitem(s, d)
    case n          => apply(s, d, n)
  }

  /** Fixture schema probe (FIXTURES.md expectations). Run at the top of
    * Verify.main / Bench.main: prints one diagnostic line per drift to
    * stderr and NEVER aborts — its whole purpose is to turn a silent
    * environment shift (like the round-8 events ns→µs regeneration that
    * cost 64 queries) into a single actionable line in the artifact.
    * Returns the drift lines so tests can assert on them. */
  private val expected: Map[String, Seq[(String, Set[String])]] = {
    val ts = Set("timestamp", "timestamp_ntz", "long") // physical drift tolerated
    Map(
      "region"   -> Seq("r_regionkey" -> Set("integer", "long"), "r_name" -> Set("string")),
      "nation"   -> Seq("n_nationkey" -> Set("integer", "long"), "n_name" -> Set("string"),
                        "n_regionkey" -> Set("integer", "long")),
      "supplier" -> Seq("s_suppkey" -> Set("long"), "s_name" -> Set("string"),
                        "s_nationkey" -> Set("integer", "long"), "s_acctbal" -> Set("double")),
      "customer" -> Seq("c_custkey" -> Set("long"), "c_name" -> Set("string"),
                        "c_nationkey" -> Set("integer", "long"), "c_acctbal" -> Set("double"),
                        "c_mktsegment" -> Set("string")),
      "part"     -> Seq("p_partkey" -> Set("long"), "p_name" -> Set("string"),
                        "p_brand" -> Set("string"), "p_type" -> Set("string"),
                        "p_size" -> Set("integer", "long"), "p_retailprice" -> Set("double")),
      "orders"   -> Seq("o_orderkey" -> Set("long"), "o_custkey" -> Set("long"),
                        "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
                        "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
      "lineitem" -> Seq("l_orderkey" -> Set("long"), "l_partkey" -> Set("long"),
                        "l_suppkey" -> Set("long"), "l_linenumber" -> Set("integer", "long"),
                        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
                        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
                        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
                        "l_shipdate" -> ts),
      "events"   -> Seq("event_id" -> Set("long"), "ts" -> ts, "user_id" -> Set("long"),
                        "event_type" -> Set("string"), "value" -> Set("double"),
                        "props" -> Set("string")),
      "documents" -> Seq("doc_id" -> Set("long"), "text" -> Set("string"),
                        "lang" -> Set("string"), "source" -> Set("string"),
                        "n_chars" -> Set("long")),
      "embeddings" -> Seq("vec_id" -> Set("long"), "embedding" -> Set("array"),
                        "label" -> Set("integer", "long")))
  }

  /** FIXTURES.md-expected FULL schema width per table (the `expected`
    * column lists are complete, probed against the fixtures when they
    * were recorded). The catalog audit (q261) embeds these as its
    * drift reference: both engines derive `n_cols` from the same
    * parquet footers, so a real drift moves both sides identically and
    * only a CODE-CONSTANT expectation can make it visible. */
  private[graft] def expectedWidth(name: String): Int = expected(name).size

  def validate(s: SparkSession, sfDir: String): Seq[String] = {
    val drifts = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { t =>
      try {
        // Probed through the shared drift-tolerant dispatch ([[load]]):
        // a ns-encoded fixture throws [PARQUET_TYPE_ILLEGAL] on a plain
        // read, and probing the raw reader would report an encoding the
        // loader explicitly supports as UNREADABLE/drift (round-9
        // ADVICE).
        val schema = load(s, sfDir, t).schema
        val have = schema.fields.map(f => f.name -> f.dataType.typeName).toMap
        expected(t).foreach { case (col, okTypes) =>
          have.get(col) match {
            case None =>
              drifts += s"$t.$col: MISSING (expected ${okTypes.mkString("|")})"
            case Some(tn) if !okTypes.contains(tn.takeWhile(_ != '<')) =>
              drifts += s"$t.$col: $tn (expected ${okTypes.mkString("|")})"
            case _ => ()
          }
        }
      } catch { case e: Throwable =>
        drifts += s"$t: UNREADABLE (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString})"
      }
    }
    drifts.foreach(d => System.err.println(s"[fixture-drift] $d"))
    if (drifts.isEmpty) System.err.println(s"[fixture-probe] $sfDir: 10/10 schemas OK")
    drifts.toSeq
  }
}
