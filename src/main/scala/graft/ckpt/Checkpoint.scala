package graft.ckpt

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One superstep's worth of run telemetry (north_rule: checkpoints
  * carry per-partition lineage + metrics). */
final case class IterMetrics(
    iter: Int,
    activeVertices: Long,
    wallMs: Long,
    gatherRows: Long)

/** Parquet-backed checkpoint store with a JSON manifest per snapshot —
  * the sandbox stand-in for an Iceberg-cataloged checkpoint table
  * (SURVEY.md §7: no Iceberg runtime jar ships with the image; the
  * directory layout `<root>/iter=NNNNN/{state/, manifest.json}` maps
  * 1:1 onto an Iceberg snapshot + metadata file, so swapping in
  * `iceberg-spark-runtime` later changes only this class).
  *
  * The manifest records: algorithm, iteration, snapshot id, row count,
  * per-partition row counts (lineage), and the full iteration-metrics
  * history — enough for exact resume (north_rule) and for a post-hoc
  * skew audit (the reference's `Matrix::balance` report,
  * src/mat/matrix.hpp:562-687, reborn as data).
  */
final class CheckpointManager(root: String, val every: Int) extends Serializable {

  private def iterDir(iter: Int): Path = Paths.get(root, f"iter=$iter%05d")

  def shouldCheckpoint(iter: Int): Boolean = every > 0 && iter > 0 && iter % every == 0

  def save(algo: String, iter: Int, state: DataFrame, metrics: Seq[IterMetrics]): Unit = {
    val dir = iterDir(iter)
    val stateDir = dir.resolve("state").toString
    state.write.mode("overwrite").parquet(stateDir)

    // Per-partition lineage: row count per physical partition of the
    // snapshot we just wrote (read back so counts describe the files).
    val spark = state.sparkSession
    val perPart = spark.read.parquet(stateDir)
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val rows = perPart.map(_._2).sum

    val snapshotId = java.util.UUID.nameUUIDFromBytes(
      s"$algo/$iter/$rows".getBytes("UTF-8")).toString
    val metricsJson = metrics.map(m =>
      s"""{"iter":${m.iter},"active":${m.activeVertices},"wallMs":${m.wallMs},"gatherRows":${m.gatherRows}}"""
    ).mkString("[", ",", "]")
    val partsJson = perPart.map { case (p, c) => s"""{"pid":$p,"rows":$c}""" }
      .mkString("[", ",", "]")
    val manifest =
      s"""{"algo":"${algo}","iteration":$iter,"snapshotId":"$snapshotId",
         |"rows":$rows,"partitions":$partsJson,"metrics":$metricsJson}""".stripMargin
    Files.writeString(dir.resolve("manifest.json"), manifest)
  }

  /** Algorithm name recorded in the snapshot's manifest. */
  def manifestAlgo(iter: Int): Option[String] = {
    val m = iterDir(iter).resolve("manifest.json")
    if (!Files.exists(m)) None
    else """"algo"\s*:\s*"([^"]*)"""".r
      .findFirstMatchIn(Files.readString(m)).map(_.group(1))
  }

  /** Latest complete snapshot (has a manifest), if any. */
  def latestIter(): Option[Int] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return None
    Files.list(r).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("iter=") &&
        Files.exists(p.resolve("manifest.json")))
      .map(p => p.getFileName.toString.stripPrefix("iter=").toInt)
      .toSeq.sorted.lastOption
  }

  def load(spark: SparkSession, iter: Int): DataFrame =
    spark.read.parquet(iterDir(iter).resolve("state").toString)

  /** Load with a fail-fast algorithm check: resuming algorithm X from
    * a snapshot written by algorithm Y would reinterpret state columns
    * (e.g. an engine LPA's LONG label read as the kernel's DOUBLE) —
    * the same wrong-input class as resuming from a different graph,
    * which the kernel's slot lookup already rejects. */
  def load(spark: SparkSession, iter: Int, expectAlgo: String): DataFrame = {
    manifestAlgo(iter).filter(_ != expectAlgo).foreach(a =>
      throw new IllegalArgumentException(
        s"checkpoint at $root iter=$iter was written by algorithm '$a', " +
          s"cannot resume '$expectAlgo' from it"))
    load(spark, iter)
  }
}
