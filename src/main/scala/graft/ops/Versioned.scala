package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-isolated MERGE over immutable parquet files — the
  * poor-man's lakehouse the incremental-ingest gate's output needs,
  * built from the two primitives a plain filesystem gives you:
  * immutable data files and an atomic rename.
  *
  * Layout:
  * {{{
  *   <table>/data/b<version>/…            immutable parquet batches
  *   <table>/_versions/v<version>.manifest  one data-file path per line
  * }}}
  *
  *  - '''Commit = manifest rename.''' A writer stages its new data
  *    files, writes the next manifest to a temp name, and renames it
  *    into place. Readers resolve "current" as the highest committed
  *    manifest and read exactly the files it lists — so a reader that
  *    resolved version N keeps a consistent snapshot forever (its
  *    files are never mutated or deleted until [[vacuum]]), and a
  *    half-crashed writer leaves only unreferenced stage files, never
  *    a torn table.
  *  - '''Optimistic concurrency.''' Version N+1 is claimed by an
  *    EXCLUSIVE CREATE of a `.v<N+1>.lock` marker (O_CREAT|O_EXCL on
  *    local disks, namenode-atomic `create(overwrite=false)` on
  *    HDFS), so two writers racing to commit produce exactly one
  *    winner — the loser re-reads the new current and retries its
  *    merge (bounded retries, then error). Only the winner writes the
  *    manifest, still tmp+rename so readers never see a torn list.
  *  - '''Partition-scoped rewrite.''' MERGE with `partitionCol`
  *    rewrites only the partitions present in the source batch:
  *    untouched partitions' files carry over into the new manifest BY
  *    REFERENCE (never copied — at 100 TB the daily delta touches
  *    days, not the table). Within touched partitions the surviving
  *    target rows and the source rows are one anti-join + union,
  *    shuffling only those partitions' data.
  *
  * MERGE semantics (whole-row, the standard upsert):
  * source row matches target on `keys` → source version wins
  * (UPDATE); no match → INSERT; source rows flagged by `deleteCol`
  * → DELETE (matched target rows disappear, the flagged source rows
  * are not inserted).
  */
object Versioned {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_versions")

  private def manifestPath(path: String, v: Long) =
    new Path(manifestDir(path), s"v$v.manifest")

  /** Highest committed version, or None for an uninitialized table. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val dir = manifestDir(path)
    if (!f.exists(dir)) None
    else {
      val vs = f.listStatus(dir).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readManifest(spark: SparkSession, path: String,
      v: Long): Seq[String] = {
    val in = fs(spark, path).open(manifestPath(path, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The files of version `v` (default: current). */
  def files(spark: SparkSession, path: String,
      version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(currentVersion(spark, path))
      .getOrElse(sys.error(s"uninitialized versioned table: $path"))
    readManifest(spark, path, v)
  }

  /** Batch-level directory name, partition-style (`gbatch=<v>`) so a
    * manifest mixing files from several batches still presents ONE
    * consistent directory structure to partition discovery; the
    * column is dropped on read. */
  private val batchCol = "gbatch"

  /** A manifest may reference files under SEVERAL data roots — its own
    * `<table>/data/` plus any [[clone]] source's — and Spark's
    * partition discovery takes exactly one `basePath`. Group the files
    * by their data root (the `…/data` prefix before the batch
    * directory), read each group against its own root so partition
    * columns reconstruct identically, and union. The common
    * single-root case stays one scan. */
  private def readFiles(spark: SparkSession, path: String,
      fileList: Seq[String]): DataFrame = {
    def root(f: String): String = {
      val i = f.lastIndexOf(s"/data/$batchCol=")
      require(i > 0, s"manifest entry outside a data root: $f")
      f.substring(0, i + "/data".length)
    }
    fileList.groupBy(root).toSeq.sortBy(_._1).map { case (base, fs) =>
      spark.read.option("basePath", base).parquet(fs: _*).drop(batchCol)
    }.reduce(_ unionByName _)
  }

  /** Read a snapshot (default: current). `basePath` keeps partition
    * columns recoverable from the directory layout. */
  def read(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame =
    readFiles(spark, path, files(spark, path, version))

  /** Stage a batch's rows as immutable files under a UNIQUE
    * `data/gbatch=<v>-<uuid>/` directory and return (dir, paths). The
    * uuid suffix is what makes the optimistic-concurrency story sound:
    * two writers racing toward the same version stage into DISJOINT
    * directories, so neither the loser's overwrite nor its post-loss
    * cleanup can touch the winner's committed files. (The gbatch value
    * is partition-style only so mixed-batch manifests present one
    * consistent directory layout; the column is dropped on read, so
    * the suffix is invisible to consumers.) */
  private def stage(df: DataFrame, path: String, v: Long,
      partitionCol: Option[String]): (Path, Seq[String]) = {
    val unique = s"$v-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = new Path(new Path(path, "data"), s"$batchCol=$unique")
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(dir.toString)
    val f = fs(df.sparkSession, path)
    val it = f.listFiles(dir, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        out += s.getPath.toString
    }
    (dir, out.result())
  }

  /** Atomically commit `fileList` as version `v`. True iff this writer
    * won the race for `v`.
    *
    * The lock is an EXCLUSIVE CREATE of `.v<v>.lock` — on a local
    * filesystem that is a real O_CREAT|O_EXCL via java.nio (POSIX
    * rename would silently overwrite, so exists()+rename is
    * check-then-act there); on HDFS `create(overwrite = false)` is
    * namenode-atomic. Only the lock winner writes the manifest, still
    * via tmp+rename so readers never observe a torn file list. */
  private def commit(spark: SparkSession, path: String, v: Long,
      fileList: Seq[String]): Boolean = {
    val f = fs(spark, path)
    f.mkdirs(manifestDir(path))
    val lock = new Path(manifestDir(path), s".v$v.lock")
    val won =
      if (f.getScheme == "file") {
        try {
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(lock.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        // hadoop's FileAlreadyExistsException extends IOException; any
        // other IO failure here is indistinguishable from a lost race
        // and the caller's bounded retry surfaces a persistent fault
        try { f.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
      }
    if (!won) return false
    val tmp = new Path(manifestDir(path),
      s".v$v.manifest.tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write((fileList.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.rename(tmp, manifestPath(path, v))
  }

  /** Initialize the table with `df` as version 1. */
  def init(df: DataFrame, path: String,
      partitionCol: Option[String] = None): Long = {
    val spark = df.sparkSession
    require(currentVersion(spark, path).isEmpty,
      s"table already initialized: $path")
    val (_, staged) = stage(df, path, 1L, partitionCol)
    require(commit(spark, path, 1L, staged), s"init lost a commit race: $path")
    1L
  }

  /** MERGE `source` into the table (semantics in the object doc).
    * Returns the committed version. */
  def merge(source: DataFrame, path: String, keys: Seq[String],
      partitionCol: Option[String] = None,
      deleteCol: Option[String] = None, maxRetries: Int = 5): Long = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val spark = source.sparkSession
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = currentVersion(spark, path)
        .getOrElse(sys.error(s"uninitialized versioned table: $path"))
      val next = cur + 1
      val curFiles = readManifest(spark, path, cur)

      val (carried, rewriteDf) = partitionCol match {
        case Some(pc) =>
          // untouched partitions carry over BY REFERENCE. Match against
          // the HIVE-ESCAPED directory name (specials are %-encoded on
          // disk, NULL becomes __HIVE_DEFAULT_PARTITION__) — a raw
          // string match would miss those partitions, carry their old
          // files alongside the new rows, and break the upsert.
          // The value string must be SPARK's cast-to-string (what the
          // dynamic-partition writer embeds in the path — e.g. a
          // timestamp renders '…00:00:00', where JVM toString yields
          // '…00:00:00.0'), so derive it with the same Cast in-plan
          // rather than Row.get(0).toString on the driver.
          import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          val touched = source
            .select(col(pc).cast("string").as("p")).distinct()
            .collect().map { r =>
              ExternalCatalogUtils.getPartitionPathString(pc,
                if (r.isNullAt(0)) null else r.getString(0))
            }.toSet
          val (hit, keep) = curFiles.partition(f =>
            touched.exists(t => f.contains(s"/$t/")))
          val hitDf =
            if (hit.isEmpty) spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              read(spark, path, Some(cur)).schema)
            else readFiles(spark, path, hit)
          (keep, hitDf)
        case None => (Seq.empty[String], read(spark, path, Some(cur)))
      }

      val srcCols = rewriteDf.columns.toSeq
      val inserts = deleteCol.fold(source)(d =>
        source.filter(!coalesce(col(d), lit(false))))
        .select(srcCols.map(col): _*)
      val survivors = rewriteDf.join(
        source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      val merged = survivors.unionByName(inserts)

      val (stagedDir, staged) = stage(merged, path, next, partitionCol)
      if (commit(spark, path, next, carried ++ staged)) return next
      // lost the race: another writer committed `next` — clean up OUR
      // OWN staging directory only (uuid-suffixed, so the winner's
      // files are untouchable by construction) and re-merge against
      // the new current
      fs(spark, path).delete(stagedDir, true)
      attempt += 1
    }
    sys.error(s"merge lost ${maxRetries + 1} commit races " +
      s"(1 attempt + $maxRetries retries): $path")
  }

  /** ZERO-COPY shallow clone: publish `src`'s current snapshot as
    * version 1 of a new table at `dst` by copying the MANIFEST only —
    * the data files are shared by reference, so cloning a 100 TB table
    * costs one small metadata write (the Delta/Iceberg shallow-clone
    * shape: dev/test sandboxes, WAP staging branches, reproducible
    * experiment pins). Writes to the clone stage their own files under
    * the clone's directory and never touch the source; the clone's
    * first full rewrite (merge without partitionCol, or compact) ends
    * the sharing entirely.
    *
    * Caveat shared with every shallow-clone design: [[vacuum]] is
    * table-local reference counting, so vacuuming the SOURCE may
    * delete files a clone still references. Vacuum only tables with no
    * live clones (or deep-copy first) — documented contract, pinned by
    * `VersionedSpec`. */
  def clone(spark: SparkSession, src: String, dst: String): Long = {
    require(currentVersion(spark, dst).isEmpty,
      s"clone target already initialized: $dst")
    val fileList = files(spark, src)
    require(commit(spark, dst, 1L, fileList),
      s"clone lost a commit race: $dst")
    1L
  }

  /** Compact the current snapshot into `targetFiles` files and commit
    * the rewrite as a new version — data-identical by construction
    * (the plan is read → round-robin repartition → write; no filter,
    * no projection). The small-file problem this solves is the
    * steady-state of any merge-maintained lake: every MERGE stages a
    * fresh batch directory, so the file count grows with commit count
    * while file SIZE shrinks toward the per-task sliver, and at 100 TB
    * the scan's task-scheduling + footer overhead comes to dominate.
    * Compaction trades one bounded rewrite for a scan-optimal layout;
    * readers of older versions are untouched (their files stay until
    * [[vacuum]]).
    *
    * Without `partitionCol` the rewrite is a round-robin
    * `repartition(targetFiles)`, so the new version has EXACTLY
    * `targetFiles` files whenever rows ≥ targetFiles (round-robin
    * spreads rows evenly — no empty tasks). With `partitionCol` the
    * data is clustered by partition value first (`repartition(n, pc)`)
    * and written `partitionBy(pc)`, giving at most `targetFiles` files
    * per partition value and preserving partition-scoped [[merge]]
    * carry-over semantics for subsequent commits.
    *
    * Concurrency: same optimistic loop as [[merge]] — losing a commit
    * race re-reads the new current (which may contain rows the raced
    * merge just added) and re-compacts, so a compaction can never
    * silently undo a concurrent writer's committed rows. */
  def compact(spark: SparkSession, path: String, targetFiles: Int,
      partitionCol: Option[String] = None, maxRetries: Int = 5): Long = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = currentVersion(spark, path)
        .getOrElse(sys.error(s"uninitialized versioned table: $path"))
      val next = cur + 1
      val snap = read(spark, path, Some(cur))
      val laidOut = partitionCol match {
        case Some(pc) => snap.repartition(targetFiles, col(pc))
        case None     => snap.repartition(targetFiles)
      }
      val (stagedDir, staged) = stage(laidOut, path, next, partitionCol)
      if (commit(spark, path, next, staged)) return next
      fs(spark, path).delete(stagedDir, true)
      attempt += 1
    }
    sys.error(s"compact lost ${maxRetries + 1} commit races " +
      s"(1 attempt + $maxRetries retries): $path")
  }

  /** Receipt of a [[delete]]: the committed version, how many files
    * were rewritten vs carried by reference, and the matched row
    * count. `version == -1` means the predicate matched nothing and
    * no new version was committed (a no-op DELETE, like Delta's). */
  final case class Erasure(version: Long, rewritten: Int, carried: Int,
    deletedRows: Long)

  /** Scheme-stripped, decoded filesystem path — the common coordinate
    * between manifest entries (`FileStatus.getPath.toString`) and
    * `input_file_name()` (URL-encoded URI). */
  private def uriPath(f: String): String = new Path(f).toUri.getPath

  /** DELETE every row matching `pred`, rewriting ONLY the files that
    * contain at least one matching row; all other files carry into the
    * new manifest BY REFERENCE. This is the Delta `DELETE` shape and
    * the right-to-be-forgotten primitive: erasing one user from a
    * 100 TB table costs I/O proportional to that user's FILE FOOTPRINT
    * (find pass reads only the predicate's columns; rewrite pass reads
    * only the hit files), not to the table — and if ingest clustered
    * the table on the erasure key ([[compact]] with a key layout), the
    * footprint is a handful of files.
    *
    * Tables initialized/maintained with a `partitionCol` must pass the
    * same column here so the rewrite preserves the directory layout
    * (mixing partitioned and unpartitioned leaf directories under one
    * data root would break partition discovery).
    *
    * Concurrency: the same optimistic loop as [[merge]] — losing the
    * commit race re-resolves current and re-runs the find pass, so a
    * racing writer's committed rows are never clobbered. */
  def delete(spark: SparkSession, path: String, pred: Column,
      partitionCol: Option[String] = None,
      maxRetries: Int = 5): Erasure = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = currentVersion(spark, path)
        .getOrElse(sys.error(s"uninitialized versioned table: $path"))
      val next = cur + 1
      val curFiles = readManifest(spark, path, cur)
      // find pass: which files hold matching rows? Column-pruned scan
      // (only the predicate's inputs are read); result cardinality is
      // bounded by the FILE count, so the collect is manifest-scale.
      val hitPaths = readFiles(spark, path, curFiles).filter(pred)
        .select(input_file_name().as("f")).distinct()
        .collect().map(r => uriPath(r.getString(0))).toSet
      val (hit, keep) = curFiles.partition(f => hitPaths.contains(uriPath(f)))
      require(hit.length == hitPaths.size,
        s"delete find-pass returned files outside the manifest: " +
          s"${hitPaths.size} scanned vs ${hit.length} matched in $path")
      if (hit.isEmpty) return Erasure(-1L, 0, curFiles.length, 0L)
      val hitDf = readFiles(spark, path, hit)
      val deletedRows = hitDf.filter(pred).count()
      val survivors = hitDf.filter(!pred)
      val (stagedDir, staged) = stage(survivors, path, next, partitionCol)
      if (commit(spark, path, next, keep ++ staged))
        return Erasure(next, hit.length, keep.length, deletedRows)
      fs(spark, path).delete(stagedDir, true)
      attempt += 1
    }
    sys.error(s"delete lost ${maxRetries + 1} commit races " +
      s"(1 attempt + $maxRetries retries): $path")
  }

  /** Delete data files referenced by NO surviving manifest and drop
    * all but the last `keepLast` manifests. Returns deleted file
    * count. Readers of retained versions are unaffected. */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the current version")
    val f = fs(spark, path)
    val dir = manifestDir(path)
    if (!f.exists(dir)) return 0
    val versions = f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }.sorted
    val (drop, keep) = versions.splitAt(math.max(0, versions.length - keepLast))
    val live = keep.flatMap(v => readManifest(spark, path, v)).toSet
    val dataDir = new Path(path, "data")
    var deleted = 0
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      val dead = Seq.newBuilder[Path]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet")
            && !live.contains(s.getPath.toString))
          dead += s.getPath
      }
      dead.result().foreach { p => if (f.delete(p, false)) deleted += 1 }
    }
    drop.foreach { v =>
      f.delete(manifestPath(path, v), false)
      f.delete(new Path(dir, s".v$v.lock"), false)
    }
    deleted
  }
}
