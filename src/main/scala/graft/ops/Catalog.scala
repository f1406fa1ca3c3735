package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE atomic transactions over [[Versioned]] lakes — the
  * catalog-pointer design (Iceberg REST catalog / Nessie): per-table
  * commit logs give single-table atomicity, but "move these rows from
  * A to B" must never expose a catalog state where the rows are in
  * both tables or neither. The fix is one LEVEL OF INDIRECTION:
  *
  * {{{
  *   <root>/_catalog/v<N>.cat    table → (lake path, PINNED version)
  * }}}
  *
  * Readers resolve every table THROUGH the newest catalog file and
  * read its lake at the pinned version — so a catalog version is a
  * CONSISTENT CROSS-TABLE SNAPSHOT, and the atomic publish of a
  * multi-table transaction is the same primitive [[Versioned]] uses
  * for one table: write `v<N+1>.cat` to a temp name, rename into
  * place. A transaction that committed new lake versions but not yet
  * the catalog file is invisible; after the rename every table moves
  * at once.
  *
  * Writer concurrency is PESSIMISTIC at the catalog (one transaction
  * at a time per catalog root, via an exclusive-create lock with
  * bounded exponential backoff) — the Hive-metastore/Nessie global
  * commit-lock shape. That is the honest trade at this layer: the
  * transaction body runs arbitrary multi-table work against the
  * pinned snapshots, so optimistic retry would mean re-running user
  * work on every race; catalog commits are metadata-speed (the work's
  * data writes dominate), so the lock is held for seconds per
  * transaction while READERS never block (they just read the newest
  * catalog file). Single-table writers bypass the catalog entirely
  * and keep [[Versioned]]'s optimistic concurrency.
  *
  * 100 TB story: the catalog file is O(tables) lines — the data
  * never moves through it; a transaction costs its own data work
  * plus two metadata writes, and cross-table consistent reads (the
  * reconciliation report that must see trades and settlements from
  * the SAME instant) are free.
  */
object Catalog {

  private def catDir(root: String) = new Path(root, "_catalog")
  private def catPath(root: String, v: Long) =
    new Path(catDir(root), s"v$v.cat")
  private def txLock(root: String) = new Path(catDir(root), ".tx.lock")

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest catalog version, or None before [[init]]. */
  def current(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val dir = catDir(root)
    if (!f.exists(dir)) None
    else {
      val vs = f.listStatus(dir).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".cat") =>
          n.stripPrefix("v").stripSuffix(".cat").toLong }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The table → (lake path, pinned lake version) map of catalog
    * version `v` (default: current). */
  def entries(spark: SparkSession, root: String,
      v: Option[Long] = None): Map[String, (String, Long)] = {
    val cv = v.orElse(current(spark, root))
      .getOrElse(sys.error(s"uninitialized catalog: $root"))
    val f = fs(spark, root)
    val in = f.open(catPath(root, cv))
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.split('\n').iterator.filter(_.nonEmpty).map { line =>
      val parts = line.split('\t')
      require(parts.length == 3, s"malformed catalog line: '$line'")
      parts(0) -> (parts(1), parts(2).toLong)
    }.toMap
  }

  private def writeCat(spark: SparkSession, root: String, v: Long,
      ents: Map[String, (String, Long)]): Unit = {
    val f = fs(spark, root)
    f.mkdirs(catDir(root))
    val tmp = new Path(catDir(root),
      s".v$v.cat.tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(ents.toSeq.sortBy(_._1)
      .map { case (t, (p, lv)) => s"$t\t$p\t$lv" }
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp, catPath(root, v)),
      s"catalog publish rename failed: $root v$v")
  }

  /** Register `tables` (name → lake path, each already
    * [[Versioned.init]]ed) at their CURRENT lake versions as catalog
    * version 1. */
  def init(spark: SparkSession, root: String,
      tables: Map[String, String]): Long = {
    require(tables.nonEmpty, "catalog needs at least one table")
    tables.foreach { case (t, p) =>
      require(t.nonEmpty && !(t + p).exists(c => c == '\t' || c == '\n'),
        s"catalog table names and paths must be single-line, tab-free: " +
          s"'$t' -> '$p'")
    }
    require(current(spark, root).isEmpty,
      s"catalog already initialized: $root")
    val ents = tables.map { case (t, p) =>
      t -> (p, Versioned.currentVersion(spark, p)
        .getOrElse(sys.error(s"table '$t' not initialized at $p")))
    }
    writeCat(spark, root, 1L, ents)
    1L
  }

  /** Read `table` through catalog version `catV` (default: current) —
    * the lake at its PINNED version, not its newest. */
  def read(spark: SparkSession, root: String, table: String,
      catV: Option[Long] = None): DataFrame = {
    val (p, lv) = entries(spark, root, catV).getOrElse(table,
      sys.error(s"no such catalog table: $table"))
    Versioned.read(spark, p, Some(lv))
  }

  /** Run `work` as ONE atomic cross-table transaction and return the
    * new catalog version. `work` receives the table → (path, pinned
    * version) snapshot and performs its lake commits
    * ([[Versioned.merge]] / delete / …); afterwards every named
    * table's NEW current lake version is pinned and the whole set is
    * published with a single catalog-file rename. Readers see all of
    * the transaction's effects or none. */
  def transact(spark: SparkSession, root: String,
      work: Map[String, (String, Long)] => Unit,
      lockWaitMs: Long = 60000L): Long = {
    val f = fs(spark, root)
    // fail fast BEFORE the lock wait: an uninitialized catalog means
    // the lock create itself errors (missing directory) in a way the
    // race-tolerant loop below would misread as a held lock
    require(current(spark, root).nonEmpty, s"uninitialized catalog: $root")
    val lock = txLock(root)
    // bounded exponential backoff on the exclusive-create tx lock
    var waited = 0L
    var delay = 50L
    var locked = false
    while (!locked) {
      locked =
        try {
          if (f.getScheme == "file") {
            java.nio.file.Files.createFile(
              java.nio.file.Paths.get(lock.toUri.getPath)); true
          } else { f.create(lock, false).close(); true }
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      if (!locked) {
        require(waited < lockWaitMs,
          s"catalog tx lock held past ${lockWaitMs}ms: $root " +
            "(crashed transaction? remove _catalog/.tx.lock)")
        Thread.sleep(delay); waited += delay; delay = math.min(delay * 2, 2000L)
      }
    }
    try {
      val cv = current(spark, root)
        .getOrElse(sys.error(s"uninitialized catalog: $root"))
      val ents = entries(spark, root, Some(cv))
      work(ents)
      val newEnts = ents.map { case (t, (p, _)) =>
        t -> (p, Versioned.currentVersion(spark, p).get)
      }
      writeCat(spark, root, cv + 1, newEnts)
      cv + 1
    } finally f.delete(lock, false)
  }
}
