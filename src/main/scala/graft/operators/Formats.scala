package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.text

/** Text source formats under the correctness gate (SURVEY §2.2 widened
  * beyond parquet): the engine's JSON-Lines and CSV read paths proved
  * LOSSLESS by round-trip — write the documents table out in each
  * format, read it back with an explicit schema (never inference — an
  * inference pass is a full extra scan at 100 TB), and reduce both
  * copies to per-(format, lang) fingerprints that the DuckDB oracle
  * recomputes from the original parquet. Any escaping, encoding, quote
  * or type drift in either text path breaks the content checksum and
  * fails the hash gate.
  */
object Formats {

  /** Per-JVM scratch root for the format round-trips, removed by a
    * shutdown hook: each query REUSES its own subdirectory (writes are
    * mode=overwrite), so repeated verify/bench/test invocations — and
    * plan()-only calls from PlanSpec — no longer accumulate corpus
    * copies in /tmp (round-9 ADVICE). */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_formats")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delTree(p.toFile)))
    p
  }
  private def delTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delTree))
    f.delete(); ()
  }
  private def scratch(q: String): String =
    java.nio.file.Files.createDirectories(scratchRoot.resolve(q)).toString

  /** Per-row md5 content hash folded to 40 bits — the summand of the
    * group checksums below. Fields join under a \u0001 separator so no
    * field concatenation is ambiguous. */
  private def rowHash = text.md5Hash60(
    concat_ws("\u0001", col("doc_id"), col("lang"), col("source"),
      col("n_chars"), col("text"))) % (1L << 40)

  /** Scale-independent group checksum over 40-bit row hashes: EXACT sum
    * (decimal(38,0) accumulator — Spark's bare sum(long) wraps silently
    * under non-ANSI at ~2^23 rows per group while DuckDB sums to
    * HUGEINT, so at larger SFs the two engines would diverge rather
    * than wrap identically; round-14 ADVICE) folded modulo 2^40, so the
    * emitted value is a bounded BIGINT whose arithmetic is identical on
    * both engines up to ~10^26 rows per group. [[checksum40Sql]] is the
    * DuckDB twin (HUGEINT sum, same modulus). */
  private def checksum40(h: Column): Column =
    (sum(h.cast(DecimalType(38, 0))) % lit(1L << 40)).cast("long")

  /** DuckDB oracle twin of [[checksum40]]. */
  private def checksum40Sql(h: String): String =
    s"CAST(SUM($h) % (1::BIGINT << 40) AS BIGINT)"

  private val q202 = QueryDef(
    "q202_text_source_roundtrip",
    "JSON-Lines and CSV source paths proved lossless by checksummed round-trip",
    Some(s"""
      WITH h AS (SELECT lang,
                        ${text.md5Hash60Sql(
                          "doc_id || chr(1) || lang || chr(1) || source || chr(1) || n_chars || chr(1) || text")}
                          % (1::BIGINT << 40) AS h
                 FROM documents),
      g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ${checksum40Sql("h")} AS content_checksum
            FROM h GROUP BY lang),
      f AS (SELECT unnest(['csv', 'json']) AS format)
      SELECT f.format, g.lang, g.n_docs, g.content_checksum
      FROM f CROSS JOIN g
      ORDER BY f.format, g.lang"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars", "text")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType),
        StructField("text", StringType)))
      val base = scratch("q202")
      docs.write.mode("overwrite").json(s"$base/json")
      docs.write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        .csv(s"$base/csv")
      val j = s.read.schema(schema).json(s"$base/json")
        .withColumn("format", lit("json"))
      val c = s.read.schema(schema)
        .option("header", "true").csv(s"$base/csv")
        .withColumn("format", lit("csv"))
      c.unionByName(j)
        .select(col("format"), col("lang"), rowHash.as("h"))
        .groupBy("format", "lang")
        .agg(count(lit(1)).as("n_docs"),
          checksum40(col("h")).as("content_checksum"))
        .orderBy("format", "lang")
    })

  // ---------------------------------------------------------------------
  // q216 — Hive-partitioned layout + partition pruning
  // ---------------------------------------------------------------------

  /** The 100 TB layout primitive: write the corpus Hive-partitioned by a
    * low-cardinality column (`lang/`), then read back with a filter on
    * the partition column. Correctness: the selected partitions'
    * content checksum must equal the oracle's recomputation from the
    * flat table — any row routed to the wrong partition directory, lost
    * in the rewrite, or double-read breaks the sum. Performance: the
    * filter must prune at the DIRECTORY level (`PartitionFilters` in
    * the scan, pinned by PlanSpec) — at scale this is the difference
    * between listing 2 directories and scanning the corpus. The
    * partition column round-trips through the directory name; reading
    * it back proves the value→path→value encoding is lossless. */
  private val q216 = QueryDef(
    "q216_partitioned_layout_pruning",
    "Hive-partitioned write + partition-pruned read, checksum-verified vs the flat table",
    Some(s"""
      WITH h AS (SELECT lang,
                        ${text.md5Hash60Sql(
                          "doc_id || chr(1) || lang || chr(1) || source || chr(1) || n_chars || chr(1) || text")}
                          % (1::BIGINT << 40) AS h
                 FROM documents WHERE lang IN ('en', 'de'))
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             ${checksum40Sql("h")} AS content_checksum
      FROM h GROUP BY lang ORDER BY lang"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars", "text")
      val base = scratch("q216")
      docs.write.mode("overwrite").partitionBy("lang").parquet(s"$base/bylang")
      s.read.parquet(s"$base/bylang")
        .filter(col("lang").isin("en", "de"))
        .select(col("lang"), rowHash.as("h"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          checksum40(col("h")).as("content_checksum"))
        .orderBy("lang")
    })

  // ---------------------------------------------------------------------
  // q217 — schema evolution via mergeSchema
  // ---------------------------------------------------------------------

  /** Lakehouse schema evolution: an old writer generation lacks a
    * column a newer generation added (`quality`), and the reader must
    * merge footers across generations — old rows surface NULL, new
    * rows carry values, aggregates see exactly the union. This is the
    * drift case the round-8 events regeneration proved real: sources
    * at 100 TB are written by YEARS of pipeline versions, and a reader
    * that assumes one frozen physical schema breaks on the oldest or
    * newest file. The deterministic doc_id parity split lets the
    * DuckDB oracle recompute both generations from the flat table. */
  private val q217 = QueryDef(
    "q217_schema_evolution_merge",
    "mergeSchema read across two writer generations (added column nulls backfilled)",
    Some("""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) FILTER (doc_id % 2 = 1) AS BIGINT)
               AS n_with_quality,
             CAST(SUM(n_chars) FILTER (doc_id % 2 = 1) AS BIGINT)
               AS sum_quality
      FROM documents GROUP BY lang ORDER BY lang"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = scratch("q217")
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang", "text")
        .write.mode("overwrite").parquet(s"$base/gen1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("text"),
          col("n_chars").as("quality"))
        .write.mode("overwrite").parquet(s"$base/gen2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/gen1", s"$base/gen2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("quality")).as("n_with_quality"),
          sum(col("quality")).as("sum_quality"))
        .orderBy("lang")
    })

  // ---------------------------------------------------------------------
  // q244 — dynamic-partition-overwrite backfill
  // ---------------------------------------------------------------------

  /** The idempotent BACKFILL primitive: a corrected batch for ONE
    * partition (`lang=en`, its `source` re-attributed to 'patched')
    * overwrites exactly that directory while every other partition's
    * files stay in place — `partitionOverwriteMode=dynamic` as a WRITER
    * option, so no session conf is touched. This is how a 100 TB lake
    * repairs yesterday's bad partition: re-run the slice, overwrite in
    * place, never rewrite the table. Correctness is checksummed per
    * partition against the oracle's simulation of the final state: a
    * STATIC overwrite would drop the four untouched languages (row
    * counts vanish), a non-atomic backfill would double-count en, and
    * any leakage across partition directories breaks the per-lang sum.
    * The spec additionally pins that the untouched partitions' FILES
    * are byte-identical paths after the backfill. */
  private val q244 = QueryDef(
    "q244_partition_backfill_overwrite",
    "dynamic partition-overwrite backfill of lang=en, checksum-verified per partition",
    Some(s"""
      WITH pat AS (SELECT doc_id, lang,
                          CASE WHEN lang = 'en' THEN 'patched' ELSE source END
                            AS source,
                          n_chars, text
                   FROM documents),
      h AS (SELECT lang,
                   ${text.md5Hash60Sql(
                     "doc_id || chr(1) || lang || chr(1) || source || chr(1) || n_chars || chr(1) || text")}
                     % (1::BIGINT << 40) AS h
            FROM pat)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             ${checksum40Sql("h")} AS content_checksum
      FROM h GROUP BY lang ORDER BY lang"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars", "text")
      val base = scratch("q244")
      docs.write.mode("overwrite").partitionBy("lang").parquet(s"$base/t")
      docs.filter(col("lang") === "en")
        .withColumn("source", lit("patched"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang").parquet(s"$base/t")
      s.read.parquet(s"$base/t")
        .select(col("lang"), rowHash.as("h"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          checksum40(col("h")).as("content_checksum"))
        .orderBy("lang")
    })

  // ---------------------------------------------------------------------
  // q253 — ORC source/sink round-trip (the second columnar format)
  // ---------------------------------------------------------------------

  /** ORC under the same checksummed round-trip gate as q202's text
    * formats: the corpus written to ORC (Spark's native orc-core path —
    * the other columnar format every warehouse migration has to read),
    * read back with an explicit schema, and reduced to per-lang content
    * checksums the oracle recomputes from the ORIGINAL parquet — any
    * type coercion, string encoding, or null drift between the two
    * columnar stacks breaks the sum. The read side also proves the
    * format keeps the scan-level contracts the engine's plans rely on:
    * a lang filter on the ORC read must surface as ORC PushedFilters
    * (PlanSpec pins it), because a format that can't push predicates
    * turns every 100 TB selective scan into a full read. The filtered
    * branch re-counts 'en' docs through the ORC row-group path, so the
    * pushdown's RESULT is inside the hash gate too, not just its plan
    * shape. */
  private val q253 = QueryDef(
    "q253_orc_source_roundtrip",
    "ORC sink+source proved lossless by checksummed round-trip; filtered read pushes down",
    Some(s"""
      WITH h AS (SELECT lang,
                        ${text.md5Hash60Sql(
                          "doc_id || chr(1) || lang || chr(1) || source || chr(1) || n_chars || chr(1) || text")}
                          % (1::BIGINT << 40) AS h
                 FROM documents),
      g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ${checksum40Sql("h")} AS content_checksum
            FROM h GROUP BY lang),
      en AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_en FROM documents
             WHERE lang = 'en')
      SELECT g.lang, g.n_docs, g.content_checksum, en.n_en
      FROM g CROSS JOIN en
      ORDER BY g.lang"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars", "text")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType),
        StructField("text", StringType)))
      val base = scratch("q253")
      docs.write.mode("overwrite").orc(s"$base/orc")
      val back = s.read.schema(schema).orc(s"$base/orc")
      val en = back.filter(col("lang") === "en")
        .agg(count(lit(1)).as("n_en"))
      back.select(col("lang"), rowHash.as("h"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          checksum40(col("h")).as("content_checksum"))
        .crossJoin(broadcast(en))
        .orderBy("lang")
    })

  // ---------------------------------------------------------------------
  // q255 — bucketed (SMB) layout: the exchange-free co-located join
  // ---------------------------------------------------------------------

  /** The two q255 layout tables as MAINTAINED WARM STATE (round-14
    * verdict item 2): a bucketed layout is built once per dataset
    * version and amortized over every later exchange-free join, exactly
    * like a materialized view — so the build rides the fingerprinted MV
    * registry ([[graft.sources.MaterializedViews.cachedBucketed]]), is
    * listed in [[graft.sources.MVWarm.views]] (the bench builds it
    * UNTIMED and reports it via `mv_builds`/`mv_found`), and q255 times
    * the join the layout exists to showcase, not the write. The writer
    * itself stays covered by LayoutSpec. */
  def bucketedLineitem(s: SparkSession, dir: String): DataFrame =
    s.table(graft.sources.MaterializedViews.cachedBucketed(
      s, dir, "lineitem_b8", "l_orderkey", 8, "lineitem.parquet")(
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")))

  /** q255's orders side — see [[bucketedLineitem]]. */
  def bucketedOrders(s: SparkSession, dir: String): DataFrame =
    s.table(graft.sources.MaterializedViews.cachedBucketed(
      s, dir, "orders_b8", "o_orderkey", 8, "orders.parquet")(
      Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")))

  /** The write-once-shuffle-never layout under the driver gate
    * (round-13 verdict item 4): lineitem and orders land as BUCKETED
    * tables — hash-distributed into the same bucket count on their join
    * key at WRITE time ([[graft.sources.Layouts.writeBucketed]] via the
    * warm registry above) — and the fact join then runs with ZERO
    * Exchange on either side (PlanSpec pins the join subtree
    * exchange-free): the shuffle is paid once at layout time and
    * amortized over every later join, the sort-merge-bucket discipline
    * 100 TB fact tables live by. Correctness: the joined rows reduce to
    * per-priority content checksums over the INTEGER key columns, which
    * the oracle recomputes by joining the ORIGINAL flat parquet — a row
    * routed to the wrong bucket pairs with nothing (the join loses it),
    * a double-written bucket double-counts, so the bucket routing
    * itself sits inside the hash gate. Tables are EXTERNAL at the
    * registry path — the harness session's warehouse stays untouched. */
  private val q255 = QueryDef(
    "q255_bucketed_smb_join",
    "same-bucketed lineitem ⋈ orders with zero exchanges, checksum-verified",
    Some(s"""
      WITH j AS (SELECT l.l_orderkey, l.l_partkey, l.l_suppkey,
                        l.l_linenumber, o.o_orderpriority
                 FROM lineitem l JOIN orders o
                   ON l.l_orderkey = o.o_orderkey),
      h AS (SELECT o_orderpriority,
                   ${text.md5Hash60Sql(
                     "l_orderkey || chr(1) || l_partkey || chr(1) || " +
                     "l_suppkey || chr(1) || l_linenumber || chr(1) || " +
                     "o_orderpriority")}
                     % (1::BIGINT << 40) AS h
            FROM j)
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
             ${checksum40Sql("h")} AS content_checksum
      FROM h GROUP BY 1 ORDER BY 1"""),
    (s, dir) => {
      val li = bucketedLineitem(s, dir)
      val ord = bucketedOrders(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          (text.md5Hash60(concat_ws("\u0001", col("l_orderkey"),
            col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
            col("o_orderpriority"))) % (1L << 40)).as("h"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          checksum40(col("h")).as("content_checksum"))
        .orderBy("o_orderpriority")
    })

  // ---------------------------------------------------------------------
  // q260 — raw-text source (spark.read.text): the last M1 input clause
  // ---------------------------------------------------------------------

  /** The RAW-TEXT ingest path (SURVEY §2.1 M1's last unexercised
    * sub-clause — round-15 verdict item 3): scraped corpora land as
    * line-oriented text long before anything is columnar, and the
    * classic MapReduce job reads exactly that. The corpus exports as
    * doc_id-keyed lines (`doc_id\u0001text` — deterministic content;
    * the fixture's text carries no newlines, CRs or \u0001, probed
    * before this gate was authored), `spark.read.text` reads the lines
    * back (byte-range splittable — at 100 TB the scan parallelizes by
    * HDFS/S3 block, no footer required), the line parses back into
    * (doc_id, text), and the q11/q12-shape word profile — occurrences
    * AND distinct containing docs per word — is recomputed THROUGH the
    * text path while the oracle recomputes it from the ORIGINAL
    * parquet. Any encoding, line-splitting, or key-parse drift in the
    * text write/read breaks the per-word counts; the distinct-doc
    * column additionally pins the doc_id keying (a line split in two
    * would double a doc, a dropped key would null it). */
  /** q260's line parse, keyed on the FIRST separator only (round-19
    * ADVICE): the earlier substring_index(value, sep, -1) took
    * everything after the LAST separator, so a regenerated fixture
    * whose text happened to contain \u0001 would silently truncate the
    * Spark-side text while the oracle splits the ORIGINAL parquet
    * column -- a parity failure reading as an engine bug.
    * split(_, _, limit=2) keeps doc_id and the FULL text intact no
    * matter what bytes the text carries (the one-time fixture probe in
    * the q260 scaladoc is now documentation, not a correctness
    * precondition). Shared with SourcesSpec so the pinned idiom IS the
    * production parse. */
  private[graft] def parseDocLines(lines: DataFrame): DataFrame =
    lines
      .withColumn("kv", split(col("value"), "\u0001", 2))
      .select(
        element_at(col("kv"), 1).cast("long").as("doc_id"),
        element_at(col("kv"), 2).as("text"))

  private val q260 = QueryDef(
    "q260_raw_text_wordcount",
    "spark.read.text raw-line ingest proved lossless via word-profile parity",
    Some("""
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      GROUP BY word
      ORDER BY word"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = scratch("q260")
      // NULL-text docs export no line (round-18 review: concat_ws SKIPS
      // nulls, so a null text would collapse the line to the bare
      // doc_id and the parse would read the id digits back as words;
      // the oracle's unnest(string_split(NULL)) contributes zero rows
      // for such a doc, and so does an absent line — the two sides
      // agree by filtering, not by luck, if a regenerated fixture ever
      // carries nulls)
      docs.filter(col("text").isNotNull)
        .select(concat_ws("\u0001",
          col("doc_id"), col("text")).as("value"))
        .write.mode("overwrite").text(s"$base/txt")
      parseDocLines(s.read.text(s"$base/txt"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("word")
    })

  /** Shared scaffold of the malformed-input policy gates (q262/q263):
    * ONE copy of the count/checksum discipline, so a fix to it can
    * never silently drift between formats (post-close review).
    * `read(schema, options)` parses the corrupted export under the
    * policy the options state.
    *
    * The discipline, measured on CSV and inherited by JSON:
    *  - counts must come from a COLUMN-REFERENCING scan: a bare
    *    count() prunes every column, the parser never attempts a
    *    conversion, and no line is ever "malformed" (measured:
    *    500 raw lines counted instead of 450 survivors). Both counts
    *    derive from the same projection the checksum needs, which
    *    forces the parse (and makes DROPMALFORMED's n_rows = n_clean
    *    BY CONSTRUCTION, exactly its contract);
    *  - the corrupt-record column can never be the ONLY referenced
    *    column of a raw scan (Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
    *    rule, CSV and JSON alike): the PERMISSIVE clean predicate also
    *    references doc_id (redundant on this data -- the corrupt lines
    *    are precisely the null-doc_id ones), keeping the scan's
    *    required schema non-degenerate under ANY downstream pruning;
    *  - ONE scan per policy (round-19 review: a bare-count crossJoin
    *    once read the file twice): PERMISSIVE's total rows, clean rows
    *    and clean checksum come from one conditional aggregation --
    *    count(when)/sum(when) skip the nulls corrupt rows carry, which
    *    is exactly the filtered checksum. PlanSpec pins one scan per
    *    policy for both formats. */
  /** Shared (doc_id, lang, n_chars) audit row of the recovery gates
    * (q262/q263/q265): ONE read schema and ONE 40-bit row hash, so the
    * hash recipe can never drift between a gate and its oracle twin
    * for a reason unrelated to the behavior under test (post-close
    * review of q265). */
  private val auditSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("n_chars", LongType)))
  private def auditRowHash = text.md5Hash60(concat_ws("\u0001",
    col("doc_id"), col("lang"), col("n_chars"))) % (1L << 40)

  private def policyAudit(
      read: (StructType, Map[String, String]) => DataFrame): DataFrame = {
    val schema = auditSchema
    val rowH = auditRowHash
    val dropped = read(schema, Map("mode" -> "DROPMALFORMED"))
      .select(rowH.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        checksum40(col("h")).as("content_checksum"))
      .select(lit("DROPMALFORMED").as("mode"), col("n_rows"),
        col("n_rows").as("n_clean"), col("content_checksum"))
    val permSchema = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val perm = read(permSchema, Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt_record"))
    val clean = col("_corrupt_record").isNull && col("doc_id").isNotNull
    val permRow = perm
      .select(clean.as("clean"), rowH.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("clean"), 1)).as("n_clean"),
        checksum40(when(col("clean"), col("h"))).as("content_checksum"))
      .select(lit("PERMISSIVE").as("mode"), col("n_rows"),
        col("n_clean"), col("content_checksum"))
    dropped.unionByName(permRow).orderBy("mode")
  }

  /** DuckDB twin of [[policyAudit]] -- both gates state the IDENTICAL
    * oracle: the clean set, its checksum, and each policy's row
    * arithmetic, recomputed from the ORIGINAL parquet + the shared
    * corruption rule (doc_id % 10 == 3). */
  private val policyOracleSql: String = s"""
      WITH c AS (SELECT doc_id, lang, n_chars FROM documents
                 WHERE doc_id % 10 <> 3),
      h AS (SELECT ${text.md5Hash60Sql(
                      "doc_id || chr(1) || lang || chr(1) || n_chars")}
                      % (1::BIGINT << 40) AS h
            FROM c),
      agg AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clean,
                     ${checksum40Sql("h")} AS content_checksum
              FROM h)
      SELECT 'DROPMALFORMED' AS mode, agg.n_clean AS n_rows,
             agg.n_clean, agg.content_checksum
      FROM agg
      UNION ALL
      SELECT 'PERMISSIVE',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
             agg.n_clean, agg.content_checksum
      FROM agg
      ORDER BY mode"""

  /** Malformed-input policy gate (round-16 verdict item 6 -- the
    * ingest-robustness story q260 opens but does not stress): real
    * scraped-corpus CSV always carries broken lines, and an engine must
    * offer BOTH recovery policies with provable semantics. The corpus
    * exports as (doc_id, lang, n_chars) CSV with a DETERMINISTIC
    * corruption -- every `doc_id % 10 == 3` line gets its doc_id field
    * replaced by an unparseable token (`CORRUPT#<id>`: arity intact,
    * the LONG cast fails) -- and the file is read back under the two
    * policies via [[policyAudit]]:
    *  - DROPMALFORMED: broken lines vanish; the survivors' count and
    *    content checksum must equal the oracle's over
    *    `documents WHERE doc_id % 10 <> 3` -- drop exactly the corrupt
    *    lines, every clean line intact, nothing else dropped;
    *  - PERMISSIVE: every line survives (n_rows = full corpus), broken
    *    lines carry a populated `_corrupt_record` and a null doc_id,
    *    and the CLEAN subset (corrupt-record IS NULL) reproduces the
    *    same checksum -- isolation without loss.
    * The oracle recomputes all of it from the ORIGINAL parquet + the
    * corruption rule, so any policy drift (a clean line misdropped, a
    * corrupt line silently salvaged into the clean set, a partial-parse
    * change) breaks parity. At 100 TB this is the scan-time policy
    * choice itself -- both paths stream, nothing driver-side. */
  private val q262 = QueryDef(
    "q262_malformed_csv_policy",
    "PERMISSIVE vs DROPMALFORMED CSV recovery proved against the corruption rule",
    Some(policyOracleSql),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = scratch("q262")
      // deterministic corruption at WRITE time: arity stays 3, the
      // doc_id field becomes unparseable for LongType. Written through
      // the REAL CSV writer with quoteAll (round-19 review): a
      // hand-rolled concat_ws would re-open the q260 regenerated-
      // fixture hazard class -- a lang containing a comma/quote would
      // shift arity and corrupt a line the oracle's rule keeps clean.
      // quoteAll makes every field quoted; the reader unquotes before
      // the type conversion, so the corrupt token still fails the LONG
      // cast and clean ids still parse (the q202 writer discipline).
      docs.select(
          when(col("doc_id") % 10 === 3,
            concat(lit("CORRUPT#"), col("doc_id")))
            .otherwise(col("doc_id").cast("string")).as("doc_id"),
          col("lang"), col("n_chars"))
        .write.mode("overwrite").option("quoteAll", "true")
        .csv(s"$base/csv")
      policyAudit((sch, opts) =>
        s.read.schema(sch).options(opts).csv(s"$base/csv"))
    })

  /** q262's JSON-lines sibling, exercising the failure class CSV cannot
    * have: STRUCTURAL corruption. q262's corrupt lines keep their shape
    * (arity intact) and fail only a field's type conversion; a scraped
    * JSON corpus instead carries truncated objects -- a writer died
    * mid-line, a chunk boundary clipped a record -- where the parser
    * fails before any field exists. The corpus exports as
    * (doc_id, lang, n_chars) JSON lines through the real generator
    * (`to_json(struct(...))` -- the same escaping as the json writer,
    * so a quote/backslash in a field can never fake a corruption), and
    * every `doc_id % 10 == 3` line loses its closing brace: Jackson
    * hits EOF inside the object and the whole line is malformed.
    * Read back under both policies via [[policyAudit]]:
    *  - DROPMALFORMED: truncated lines vanish; survivor count and
    *    content checksum must equal the oracle's over
    *    `documents WHERE doc_id % 10 <> 3`;
    *  - PERMISSIVE: every line survives, truncated ones carry the raw
    *    line in `_corrupt_record` with ALL data fields null (structural
    *    failure has no partial result, unlike q262's field-level case
    *    where intact fields may survive), and the clean subset
    *    reproduces the checksum.
    * The oracle is recomputed from the ORIGINAL parquet + the rule, so
    * a clean line misdropped, a truncated line half-salvaged, or any
    * generator/parser escaping drift breaks parity. JSON lines stay
    * byte-range-splittable (one record per line), so both policies are
    * scan-time row-local decisions at 100 TB -- nothing driver-side. */
  private val q263 = QueryDef(
    "q263_malformed_json_policy",
    "PERMISSIVE vs DROPMALFORMED JSON-lines recovery proved against a truncation rule",
    Some(policyOracleSql),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = scratch("q263")
      // real JSON generation, then a deterministic structural clip: the
      // final char of a to_json object line is always the closing brace,
      // so dropping it leaves Jackson mid-object at EOF -- malformed
      // regardless of field content.
      val line = to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
      docs.select(
          when(col("doc_id") % 10 === 3,
            line.substr(lit(1), length(line) - 1))
            .otherwise(line).as("value"))
        .write.mode("overwrite").text(s"$base/json")
      policyAudit((sch, opts) =>
        s.read.schema(sch).options(opts).json(s"$base/json"))
    })

  // ---------------------------------------------------------------------
  // q265 — corrupt-parquet survival (skip + quarantine-by-pruning)
  // ---------------------------------------------------------------------

  /** The columnar sibling of the q262/q263 recovery gates: a 100 TB
    * lake ALWAYS contains a few unreadable parquet files (truncated
    * uploads, failed multipart commits, bit rot), and a scan that dies
    * on the first one cannot finish a day's work. The corpus is
    * exported Hive-partitioned by `pk = doc_id % 8`, then every data
    * file under `pk=3` is overwritten with garbage bytes (the lake's
    * pre-existing damage, simulated deterministically; the stale
    * LocalFS `.crc` twins are removed so the failure is the parquet
    * footer itself, not a checksum veneer). Two survival strategies
    * are proved against the SAME oracle — the clean subset
    * `documents WHERE doc_id % 8 <> 3`:
    *  - IGNORE_CORRUPT: `ignoreCorruptFiles=true` (a per-read option,
    *    no session conf) must skip EXACTLY the unreadable file —
    *    count + checksum equal to the clean subset proves no clean
    *    file was dropped with it and no partial salvage of the bad
    *    file leaked rows;
    *  - PRUNE_QUARANTINE: a STRICT read (no ignore option) with the
    *    partition predicate `pk <> 3` must succeed — directory-level
    *    pruning means the corrupt file is never OPENED, which is how
    *    a production lake quarantines a bad partition while the
    *    repair job runs. If the filter ever degraded to a post-scan
    *    predicate, the strict read would throw and the gate would go
    *    red (PlanSpec pins the PartitionFilters shape).
    * Both rows must carry identical numbers; the explicit read schema
    * keeps planning footer-free (no inference pass to trip on the
    * corrupt file before execution even starts). At 100 TB both
    * policies are scan-time, file-local decisions — nothing
    * driver-side. */
  private val q265 = QueryDef(
    "q265_corrupt_parquet_policy",
    "ignoreCorruptFiles skip + partition-pruned quarantine proved against the clean subset",
    Some(s"""
      WITH c AS (SELECT doc_id, lang, n_chars FROM documents
                 WHERE doc_id % 8 <> 3),
      h AS (SELECT ${text.md5Hash60Sql(
                      "doc_id || chr(1) || lang || chr(1) || n_chars")}
                      % (1::BIGINT << 40) AS h
            FROM c),
      agg AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_rows,
                     ${checksum40Sql("h")} AS content_checksum
              FROM h)
      SELECT m.mode, agg.n_rows, agg.content_checksum
      FROM (SELECT unnest(['IGNORE_CORRUPT', 'PRUNE_QUARANTINE']) AS mode) m
      CROSS JOIN agg
      ORDER BY m.mode"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = scratch("q265")
      docs.select(col("doc_id"), col("lang"), col("n_chars"),
          (col("doc_id") % 8).as("pk"))
        .repartition(col("pk"))
        .write.mode("overwrite").partitionBy("pk").parquet(s"$base/t")
      // The lake's damage: every data file under pk=3 becomes garbage
      // bytes (no parquet magic), and its LocalFS .crc twin goes away
      // so the read fails in the parquet footer, not the checksum
      // layer. Deterministic: pk derives from doc_id alone.
      val badDir = new java.io.File(s"$base/t/pk=3")
      Option(badDir.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .foreach { f =>
          java.nio.file.Files.write(f.toPath,
            "CORRUPTED".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
          if (crc.exists) { crc.delete(); () }
        }
      val schema = StructType(
        auditSchema.fields :+ StructField("pk", LongType))
      val rowH = auditRowHash
      def audit(df: DataFrame, mode: String): DataFrame = df
        .select(rowH.as("h"))
        .agg(count(lit(1)).as("n_rows"),
          checksum40(col("h")).as("content_checksum"))
        .select(lit(mode).as("mode"), col("n_rows"),
          col("content_checksum"))
      val ignored = audit(
        s.read.schema(schema).option("ignoreCorruptFiles", "true")
          .parquet(s"$base/t"),
        "IGNORE_CORRUPT")
      val pruned = audit(
        s.read.schema(schema).parquet(s"$base/t")
          .filter(col("pk") =!= 3L),
        "PRUNE_QUARANTINE")
      ignored.unionByName(pruned).orderBy("mode")
    })

  def defs: Seq[QueryDef] =
    Seq(q202, q216, q217, q244, q253, q255, q260, q262, q263, q265)
}
