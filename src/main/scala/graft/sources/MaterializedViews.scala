package graft.sources

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}

/** sfDir-keyed materialized-view registry: shared query prefixes (the
  * near-dup shingle set, the verified pair set) are computed ONCE per
  * dataset and parquet-backed, then every consumer reads the parquet.
  *
  * Round-2 finding: q22/q23/q44/q45/q73 each rebuilt the shingle
  * explosion + verified-pair join from scratch (~2-3 s apiece at sf0.1)
  * because in-session caches are cleared between queries. A materialized
  * view is the engine-level fix — at 100 TB this is exactly the
  * precomputed dedup-pair table a production pipeline maintains next to
  * the corpus, rebuilt only when the corpus version changes.
  *
  * Design notes:
  *  - Keyed by (dataset dir, source-file length+mtime, view name): a
  *    regenerated fixture gets a fresh fingerprint, so stale views are
  *    never read — they are simply orphaned and overwritten space-wise.
  *  - Storage is parquet under java.io.tmpdir: consumers get scan-time
  *    column pruning/pushdown like any other table, and multiple plan
  *    subtrees re-scan the (small) parquet instead of pinning executor
  *    cache memory.
  *  - Content is deterministic (seed-fixed hashing, exact arithmetic),
  *    so a view written by one query and read by another cannot change
  *    any result — only when it is computed.
  *  - The build is guarded by a JVM-wide lock + parquet's _SUCCESS
  *    marker within one JVM, and by write-to-temp + atomic rename
  *    across JVMs: a concurrent builder in another process either wins
  *    the rename or discards its temp dir — readers only ever see a
  *    complete view, never a half-written one.
  */
object MaterializedViews {

  private val root = new File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-mv")

  /** Per-view build seconds for views THIS process actually built
    * (cache hits don't log). Bench drains it after the warm pass so
    * the emitted artifact reports MV build cost explicitly instead of
    * burying it in the first consumer's query time. */
  private val buildLog =
    scala.collection.mutable.LinkedHashMap.empty[String, Double]

  /** Returns and clears the (view name → build seconds) log. */
  def drainBuildLog(): Seq[(String, Double)] = synchronized {
    val out = buildLog.toSeq
    buildLog.clear()
    out
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Read-through cache: returns `name` for dataset `dir`, building it
    * with `build` on first use. `srcFile` is the table the view derives
    * from — its size+mtime fingerprint the dataset version. */
  def cached(s: SparkSession, dir: String, name: String,
      srcFile: String = "documents.parquet")(build: => DataFrame): DataFrame =
    synchronized {
      val src = new File(dir, srcFile)
      val fp = md5hex(s"$dir|${src.length}|${src.lastModified}")
      val out = new File(new File(root, fp), name)
      if (!new File(out, "_SUCCESS").isFile) {
        // Publish atomically: build into a process-private temp sibling,
        // then rename into place. Two JVMs racing the same fingerprint
        // each build a complete view; the loser's rename fails against
        // the winner's (identical, deterministic) published dir and its
        // temp is discarded — no reader can observe a partial write.
        // A target dir WITHOUT _SUCCESS (a crash mid-publish under the
        // old in-place path, or a killed process) is garbage: delete it
        // and retry the rename once, so one stale dir can't make the
        // view permanently unbuildable. try/finally removes the temp on
        // any failure path so aborted builds don't leak under /tmp.
        val tmp = new File(out.getParentFile,
          s"$name.tmp-${java.lang.ProcessHandle.current.pid}")
        val t0 = System.nanoTime()
        try {
          build.write.mode("overwrite").parquet(tmp.getPath)
          buildLog(name) = (System.nanoTime() - t0) / 1e9
          def move(): Unit =
            java.nio.file.Files.move(tmp.toPath, out.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          try move()
          catch {
            case _: java.nio.file.FileAlreadyExistsException
                 | _: java.nio.file.FileSystemException
              if new File(out, "_SUCCESS").isFile =>
              // lost the race to an equivalent view — discard ours
            case _: java.nio.file.FileAlreadyExistsException
                 | _: java.nio.file.DirectoryNotEmptyException
                 | _: java.nio.file.FileSystemException =>
              // stale incomplete target (no _SUCCESS): evict and retry
              deleteRecursively(out)
              move()
          }
        } finally if (tmp.exists()) deleteRecursively(tmp)
      }
      s.read.parquet(out.getPath)
    }

  /** Bucketed-layout sibling of [[cached]] (round-14 verdict item 2):
    * a BUCKETED table is maintained warm state exactly like a
    * materialized view — written once per dataset version, amortized
    * over every later exchange-free join — so charging its build to the
    * query that reads it measures layout ingest, not the join. The
    * files land under the same fingerprinted registry (atomic
    * temp+rename publish, build seconds drained by the bench warm pass
    * into `mv_builds`); the session-catalog registration is metadata
    * only and re-derived per session via `CREATE TABLE ... CLUSTERED BY
    * ... LOCATION` over the published files (bucket ids ride the
    * parquet file NAMES, so a fresh catalog trusts the DDL spec against
    * the existing layout). Returns the catalog table name, fingerprint-
    * suffixed so two datasets never collide within one session. */
  def cachedBucketed(s: SparkSession, dir: String, name: String,
      key: String, buckets: Int, srcFile: String)
      (build: => DataFrame): String = synchronized {
    val src = new File(dir, srcFile)
    val fp = md5hex(s"$dir|${src.length}|${src.lastModified}")
    val out = new File(new File(root, fp), name)
    val table = s"graft_mv_${name}_${fp.take(8)}"
    if (!new File(out, "_SUCCESS").isFile) {
      val pid = java.lang.ProcessHandle.current.pid
      val tmp = new File(out.getParentFile, s"$name.tmp-$pid")
      // the bucketed writer needs a catalog name; the table is EXTERNAL
      // (explicit path), so dropping it below keeps the files — only the
      // transient metadata entry goes
      val tmpTable = s"${table}_build_$pid"
      val t0 = System.nanoTime()
      try {
        Layouts.writeBucketed(build, tmpTable, key, buckets, Some(tmp.getPath))
        buildLog(name) = (System.nanoTime() - t0) / 1e9
        def move(): Unit =
          java.nio.file.Files.move(tmp.toPath, out.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        try move()
        catch {
          case _: java.nio.file.FileAlreadyExistsException
               | _: java.nio.file.FileSystemException
            if new File(out, "_SUCCESS").isFile =>
            // lost the race to an equivalent layout — discard ours
          case _: java.nio.file.FileAlreadyExistsException
               | _: java.nio.file.DirectoryNotEmptyException
               | _: java.nio.file.FileSystemException =>
            deleteRecursively(out)
            move()
        }
      } finally {
        try { s.sql(s"DROP TABLE IF EXISTS $tmpTable"): Unit }
        catch { case _: Throwable => () }
        if (tmp.exists()) deleteRecursively(tmp)
      }
    }
    if (!s.catalog.tableExists(table)) {
      val ddl = s.read.parquet(out.getPath).schema.toDDL
      s.sql(s"CREATE TABLE $table ($ddl) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
        s"LOCATION '${out.getPath}'"): Unit
    }
    table
  }
}
