package graft.sources

import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The reference's HyDFS verbs (create / get / append / ls /
  * multiappend / merge — dht/dht.go:773-931, main.go REPL commands)
  * re-expressed on the storage model Spark itself assumes: a "file" is
  * a directory of immutable BLOCKS (part files), exactly like a
  * Spark/HDFS table directory.
  *
  *  - `append` writes a NEW immutable block (temp file + atomic rename)
  *    — never mutates existing bytes, so concurrent appenders cannot
  *    corrupt each other, the same isolation the reference gets from
  *    replica-side append queues.
  *  - Canonical content order = lexicographic block name. Block names
  *    embed a per-file LOGICAL sequence (max existing block seq + 1 —
  *    clock-free, so writer clock skew cannot reorder content) + a uuid
  *    tiebreak, so every reader (`get`) sees ONE deterministic order
  *    regardless of append interleaving — the consistency `merge`
  *    establishes across replicas in the reference (dht.go:807+).
  *  - `multiappend` runs appends concurrently (the reference fans out
  *    to several VMs; here, several writer threads) — all blocks land,
  *    order resolved by the canonical name order.
  *  - `merge` compacts all blocks into one, preserving canonical order
  *    (get-before == get-after); replication itself is delegated to the
  *    underlying FS (HDFS/object store), per SURVEY §2.2 non-goals.
  *
  * Everything goes through the Hadoop FileSystem API, so the same code
  * runs on local disk in tests and HDFS/S3A on a cluster.
  *
  * Verb mapping for the reference's replica-introspection and
  * membership REPL commands (main.go:88-157), which have no meaningful
  * analogue once replication is the FS's job:
  *  - `cat <localfile>` (main.go:144) — printing a local file; that is
  *    `get` with a `file://` path (the Hadoop API serves both schemes).
  *  - `store` (main.go:150) — "which blocks does THIS replica hold";
  *    block→machine placement lives below the FS API here, so the
  *    truthful equivalent is `ls`, which reports the file's full block
  *    set (placement queries go to the store's own tooling, e.g.
  *    `hdfs fsck -files -blocks -locations`).
  *  - `getfromreplica <vm> <file> <out>` (main.go:152) — read a
  *    SPECIFIC replica's copy to check convergence; an FS with atomic
  *    rename has no divergent replicas to compare, which is the point
  *    of building on one.
  *  - `list_mem` / `list_self` / `leave` / `{enable,disable,status}_sus`
  *    (main.go:89-115) — SWIM membership introspection; delegated to
  *    the cluster manager's executor liveness (Spark UI / REST), per
  *    SURVEY §2.2 non-goals.
  */
object Hyfs {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Next LOGICAL block sequence for a file: max observed block seq + 1.
    * Clock-free — ordering is derived from the file's own state, so a
    * writer with a skewed (or regressed) clock still orders strictly
    * after every block it can observe, which is the multi-writer
    * determinism wall-clock names cannot give. Two appenders racing
    * for the same seq both land (unique uuid suffix) and their
    * relative order resolves by uuid — concurrent appends have no
    * defined order anyway; the contract is that ALL readers agree on
    * ONE order after the fact.
    *
    * The directory is LISTED only on this process's first touch of the
    * file; after that a cached atomic counter issues sequences — n
    * appends cost one listing, not n (a full per-append listing is
    * O(n²) total and a paged remote call per append on an object
    * store). Cross-process: sequential writers still order correctly
    * (the next process's first touch sees every earlier block);
    * concurrent foreign appends resolve by the uuid rule above.
    */
  private val seqCache =
    new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()

  private def nextSeq(f: FileSystem, dir: Path): Long =
    seqCache.computeIfAbsent(f.makeQualified(dir).toString, _ => {
      val names =
        if (f.exists(dir))
          f.listStatus(dir).iterator.map(_.getPath.getName)
            .filter(_.startsWith("block-")).toSeq
        else Seq.empty
      val maxSeq = names.flatMap(n => n.split("-").lift(1).map(_.toLong))
      new AtomicLong(if (maxSeq.isEmpty) 0L else maxSeq.max)
    }).incrementAndGet()

  /** Unique block name: zero-padded logical sequence + uuid tiebreak. */
  private def blockName(seqNo: Long): String =
    f"block-$seqNo%016d-${UUID.randomUUID()}"

  def create(spark: SparkSession, file: String, content: String): Unit = {
    val dir = new Path(file)
    val f = fs(spark, dir)
    require(!f.exists(dir), s"$file already exists")
    f.mkdirs(dir)
    append(spark, file, content)
  }

  /** Append one immutable block: write to a hidden temp name, then
    * atomic rename into place — a reader never observes a partial block.
    */
  def append(spark: SparkSession, file: String, content: String): String = {
    val dir = new Path(file)
    val f = fs(spark, dir)
    val name = blockName(nextSeq(f, dir))
    val tmp = new Path(dir, s".tmp-$name")
    val out = f.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // rename reports failure as `false` (not an exception) on HDFS/S3A —
    // surfacing it prevents a silently lost block
    if (!f.rename(tmp, new Path(dir, name)))
      throw new java.io.IOException(s"append: rename of block $name into $file failed")
    name
  }

  /** Concurrent appends (reference fans out to VMs; dht.go:773-805). */
  def multiappend(spark: SparkSession, file: String, contents: Seq[String]): Seq[String] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(
      Future.sequence(contents.map(c => Future(append(spark, file, c)))),
      Duration.Inf)
  }

  /** Block names in canonical (lexicographic) order. */
  def ls(spark: SparkSession, file: String): Seq[String] = {
    val dir = new Path(file)
    fs(spark, dir).listStatus(dir).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("block-"))
      .toSeq.sorted
  }

  private def readBlocks(spark: SparkSession, file: String, names: Seq[String]): String = {
    val dir = new Path(file)
    val f = fs(spark, dir)
    names.map { n =>
      val len = f.getFileStatus(new Path(dir, n)).getLen
      // getLen.toInt on a >2 GiB block would wrap negative and either
      // throw NegativeArraySizeException or truncate the read — reject
      // with a clear error instead (merge concatenates blocks, so
      // repeated merges of a growing file WILL eventually cross this).
      if (len > Int.MaxValue)
        throw new java.io.IOException(
          s"get: block $n of $file is $len bytes; the string read API " +
            "supports blocks up to 2 GiB (Int.MaxValue) — see merge doc")
      val in = f.open(new Path(dir, n))
      try {
        val bytes = new Array[Byte](len.toInt)
        in.readFully(bytes)
        new String(bytes, "UTF-8")
      } finally in.close()
    }.mkString
  }

  /** Whole-file content: blocks concatenated in canonical order. */
  def get(spark: SparkSession, file: String): String =
    readBlocks(spark, file, ls(spark, file))

  /** Compact all blocks into one, preserving canonical order; content
    * observed by `get` is unchanged. Like the reference (merge is
    * fulfilled by the file's primary replica, dht.go:807+), merge is a
    * SINGLE-writer operation: an append racing a merge keeps its data
    * (its block is not in `old` so it survives), but its position
    * relative to pre-merge content is unspecified — the same contract
    * the reference's primary-decides ordering gives; concurrent merges
    * are not allowed. A GET racing a merge may transiently observe the
    * compacted block alongside not-yet-deleted originals (duplicated
    * content) — merge is a maintenance operation to run at quiescent
    * points, exactly like the reference's REPL-invoked merge. The
    * append-then-delete order is deliberate: a crash mid-merge leaves
    * duplicate data (recoverable by re-merging), never lost data.
    * Size bound: merge concatenates every block into ONE, and blocks
    * are capped at 2 GiB by the string read path (readBlocks) — do not
    * merge files whose total content exceeds that; they remain fully
    * readable unmerged.
    */
  def merge(spark: SparkSession, file: String): Unit = {
    val old = ls(spark, file)
    if (old.length <= 1) return
    // Read exactly the captured block set — an append landing after the
    // listing survives the merge untouched instead of being duplicated.
    val content = readBlocks(spark, file, old)
    val dir = new Path(file)
    val f = fs(spark, dir)
    append(spark, file, content)
    old.foreach(n => f.delete(new Path(dir, n), false))
  }
}
