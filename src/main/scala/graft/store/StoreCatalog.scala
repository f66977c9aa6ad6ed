package graft.store

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileContext, Options, Path}

import org.apache.spark.sql.SparkSession

/** Name → current-version pointer catalog for the persisted index stores
  * — the missing last step of the version-swap lifecycle: deletion
  * ([[graft.operators.Similarity.deleteFromIvfAssigned]] and kin) and
  * retraining ([[graft.operators.Similarity.retrainIvfStore]]) write NEW
  * version directories by contract (`outDir != inDir`), and this catalog
  * performs the swap that makes the new version live.
  *
  * Layout: one tiny pointer file per store name at
  * `<catalogRoot>/<name>.ptr`, whose whole content is the current
  * version directory path. The flip is a write-to-temp + atomic
  * rename-with-overwrite ([[FileContext.rename]] with
  * `Options.Rename.OVERWRITE` — atomic on HDFS and POSIX local
  * filesystems, the same primitive Spark's own commit protocols lean
  * on), so a reader either sees the old pointer or the new one, never a
  * torn path, and the old version stays fully serveable until the
  * instant of the flip.
  *
  * Serving through the catalog composes with the store stamps: `resolve`
  * hands back a DIRECTORY, and the stamped loads
  * ([[graft.operators.Similarity.loadIvfAssigned]],
  * [[graft.operators.Similarity.loadPqCodes]]) still verify the
  * quantizer fingerprint against whatever that directory holds — a
  * pointer flipped to a store built under different artifacts fails
  * loudly at load, exactly like a direct-path load.
  *
  * [[gcSuperseded]] reclaims non-current version directories under a
  * store's versions root. It refuses to run unless the current pointer
  * target is itself under that root (a mis-paired root would otherwise
  * delete EVERY version), and it never deletes the current target.
  *
  * Scale shape: everything here is driver-side metadata — one small file
  * read/rename per operation; the 100 TB version directories are only
  * ever touched by `gcSuperseded`'s recursive delete of superseded
  * versions.
  */
object StoreCatalog {

  private def ptrPath(catalogRoot: String, name: String): Path = {
    require(name.nonEmpty && name.matches("[A-Za-z0-9._-]+"),
      s"store name must be a plain token, got '$name'")
    new Path(catalogRoot, s"$name.ptr")
  }

  private def fc(spark: SparkSession, p: Path): FileContext =
    FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)

  /** Atomically flip `name`'s current-version pointer to `dir`. The
    * version directory must already be fully written (publish is the
    * LAST step of a build/delete/retrain — the swap, not the write).
    */
  def publish(
      spark: SparkSession, catalogRoot: String, name: String, dir: String): Unit = {
    val ptr = ptrPath(catalogRoot, name)
    val ctx = fc(spark, ptr)
    val dirP = new Path(dir)
    require(ctx.util.exists(dirP),
      s"cannot publish $name → $dir: the version directory does not exist " +
        "(publish is the swap step; write the store first)")
    ctx.mkdir(ptr.getParent,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault, true)
    val tmp = new Path(catalogRoot,
      s".$name.ptr.tmp-${java.util.UUID.randomUUID().toString}")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(dir.getBytes(UTF_8))
    finally out.close()
    ctx.rename(tmp, ptr, Options.Rename.OVERWRITE)
  }

  /** The current version directory for `name`, or None if never
    * published.
    */
  def resolveOpt(
      spark: SparkSession, catalogRoot: String, name: String): Option[String] = {
    val ptr = ptrPath(catalogRoot, name)
    val ctx = fc(spark, ptr)
    if (!ctx.util.exists(ptr)) None
    else {
      val in = ctx.open(ptr)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        Some(new String(bytes.toByteArray, UTF_8).trim)
      } finally in.close()
    }
  }

  /** [[resolveOpt]] that fails loudly for an unpublished name — the
    * serve-path form (an unbuilt store must never silently serve
    * nothing).
    */
  def resolve(spark: SparkSession, catalogRoot: String, name: String): String =
    resolveOpt(spark, catalogRoot, name).getOrElse(
      throw new IllegalStateException(
        s"store '$name' has no published version in catalog $catalogRoot"))

  /** Delete superseded version directories of `name` under
    * `versionsRoot`: every child directory that is not the current
    * pointer target. Returns the deleted paths. Refuses a versionsRoot
    * that does not contain the current target (the wrong-root guard),
    * and never deletes the current version or non-directory files.
    *
    * Concurrency guards — GC runs beside live builds and swaps:
    *   - `graceMs` (default 1 h): a candidate with ANY entry modified
    *     within the grace window — checked recursively via
    *     [[modifiedSince]], newest mtime anywhere under it, not the
    *     root's own — is NEVER deleted: an in-flight version build
    *     (written first, published last by contract) keeps its leaf
    *     files hot even while a long artifact write leaves the version
    *     directory's own mtime stale, so GC cannot eat a half-built
    *     version that simply hasn't been published yet. Pass 0 only in
    *     tests/offline maintenance.
    *   - the pointer is RE-resolved immediately before each delete, so
    *     a version published after the initial listing (the
    *     resolve-then-delete race) is spared. The residual window is
    *     the single delete call itself — arrange maintenance so GC and
    *     publish for one name don't run in the same instant, or rely on
    *     the grace window (a just-published version is always younger
    *     than any sensible grace).
    */
  def gcSuperseded(
      spark: SparkSession,
      catalogRoot: String,
      name: String,
      versionsRoot: String,
      graceMs: Long = 3600000L): Seq[String] = {
    val current = resolve(spark, catalogRoot, name)
    val rootP = new Path(versionsRoot)
    val ctx = fc(spark, rootP)
    val currentQ = ctx.makeQualified(new Path(current))
    val rootQ = ctx.makeQualified(rootP)
    require(currentQ.getParent == rootQ,
      s"current version $currentQ is not a direct child of $rootQ — " +
        "refusing to GC a versions root that does not own the live version")
    if (!ctx.util.exists(rootQ)) Seq.empty
    else {
      val cutoff = System.currentTimeMillis() - graceMs
      val it = ctx.listStatus(rootQ)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val p = ctx.makeQualified(st.getPath)
        if (st.isDirectory && p != currentQ &&
            !modifiedSince(ctx, p, st, cutoff) &&
            // re-check the pointer right before the irreversible step:
            // a swap that landed since the listing spares its target
            ctx.makeQualified(new Path(resolve(spark, catalogRoot, name))) != p) {
          ctx.delete(p, true)
          out += p.toString
        }
      }
      out.result()
    }
  }

  /** True when `p` or ANYTHING under it was modified after `cutoff` —
    * [[gcSuperseded]]'s in-flight-build detector. The house builders
    * write the huge artifact first (saveBm25Index's postings,
    * savePqCodes' codes land as leaf files inside partition subdirs),
    * so during a long write only the LEAF files' mtimes stay fresh
    * while every ancestor directory's own mtime goes stale — a
    * root-mtime grace check would let GC eat a half-built unpublished
    * version. Walks with early exit (returns at the first hot entry);
    * the full walk is paid only for a directory that is about to be
    * recursively deleted anyway, so the listing adds no asymptotic
    * cost over the delete itself.
    */
  private def modifiedSince(
      ctx: FileContext,
      p: Path,
      st: org.apache.hadoop.fs.FileStatus,
      cutoff: Long): Boolean =
    if (st.getModificationTime > cutoff) true
    else if (!st.isDirectory) false
    else {
      val it = ctx.listStatus(p)
      var hot = false
      while (!hot && it.hasNext) {
        val c = it.next()
        hot = modifiedSince(ctx, c.getPath, c, cutoff)
      }
      hot
    }

  /** One [[list]] row: a published store name and its current version. */
  final case class CatalogEntry(name: String, current: String)

  /** Every published name under `catalogRoot` with its current version
    * directory, sorted by name — the catalog-wide operability readout.
    * Driver-side metadata: one directory listing plus one tiny pointer
    * read per name; version directories are never touched.
    */
  def list(spark: SparkSession, catalogRoot: String): Seq[CatalogEntry] = {
    val rootP = new Path(catalogRoot)
    val ctx = fc(spark, rootP)
    if (!ctx.util.exists(rootP)) Seq.empty
    else {
      val it = ctx.listStatus(rootP)
      val names = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (!st.isDirectory && n.endsWith(".ptr") && !n.startsWith("."))
          names += n.stripSuffix(".ptr")
      }
      names.result().sorted.flatMap(n =>
        resolveOpt(spark, catalogRoot, n).map(CatalogEntry(n, _)))
    }
  }

  /** One store's version inventory: the current pointer target plus
    * every non-current version directory under `versionsRoot` with its
    * root mtime (millis) — what [[gcSuperseded]] WOULD reclaim and how
    * stale each candidate is, without deleting anything. Same
    * wrong-root guard as GC.
    */
  final case class VersionInventory(
      name: String,
      current: String,
      superseded: Seq[(String, Long)])

  def inventory(
      spark: SparkSession,
      catalogRoot: String,
      name: String,
      versionsRoot: String): VersionInventory = {
    val current = resolve(spark, catalogRoot, name)
    val rootP = new Path(versionsRoot)
    val ctx = fc(spark, rootP)
    val currentQ = ctx.makeQualified(new Path(current))
    val rootQ = ctx.makeQualified(rootP)
    require(currentQ.getParent == rootQ,
      s"current version $currentQ is not a direct child of $rootQ — " +
        "refusing to inventory a versions root that does not own the live version")
    val out = Seq.newBuilder[(String, Long)]
    if (ctx.util.exists(rootQ)) {
      val it = ctx.listStatus(rootQ)
      while (it.hasNext) {
        val st = it.next()
        val p = ctx.makeQualified(st.getPath)
        if (st.isDirectory && p != currentQ)
          out += ((p.toString, st.getModificationTime))
      }
    }
    VersionInventory(name, currentQ.toString, out.result().sortBy(_._1))
  }

  /** The next fresh version directory under `versionsRoot`: `v<N+1>`
    * over the largest existing `v<N>` child (`v1` for an empty/missing
    * root). A naming convention, not a reservation — builders may use
    * any unique directory; this is the house default the maintenance
    * policy uses so retrain targets never collide with live versions.
    */
  def nextVersionDir(spark: SparkSession, versionsRoot: String): String = {
    val rootP = new Path(versionsRoot)
    val ctx = fc(spark, rootP)
    var mx = 0L
    if (ctx.util.exists(rootP)) {
      val it = ctx.listStatus(rootP)
      while (it.hasNext) {
        val n = it.next().getPath.getName
        if (n.matches("v[0-9]{1,17}")) mx = math.max(mx, n.drop(1).toLong)
      }
    }
    new Path(rootP, s"v${mx + 1}").toString
  }
}
