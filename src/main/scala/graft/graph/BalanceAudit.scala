package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-balance audit — the reference's `Matrix::balance`
  * (src/mat/matrix.hpp:562-687) reborn as data: per-partition edge
  * counts of the salted CSR adjacency plus an imbalance ratio against
  * the same 0.2 threshold the reference prints. Where the reference
  * only *reports* ("Not functional"), this drives the decision loop:
  * a breach means the salt chunk size should shrink (Adjacency.build
  * `chunk`) or partitions should grow.
  */
object BalanceAudit {

  final case class Report(
      partitions: Long,
      minEdges: Long,
      maxEdges: Long,
      meanEdges: Double,
      /** max/mean − 1; reference flags > 0.2 (matrix.hpp:614-626) */
      imbalance: Double,
      breached: Boolean)

  val Threshold = 0.2

  def perPartition(adj: Adjacency): DataFrame =
    adj.out.select(spark_partition_id().as("pid"), size(col("nbrs")).as("n"))
      .groupBy("pid").agg(sum(col("n")).as("edges"), count(lit(1)).as("csr_rows"))

  def audit(adj: Adjacency): Report = {
    // coalesce: an EMPTY adjacency aggregates to (0, null, null, null)
    val r = perPartition(adj)
      .agg(count(lit(1)), coalesce(min(col("edges")), lit(0L)),
        coalesce(max(col("edges")), lit(0L)), coalesce(avg(col("edges")), lit(0.0)))
      .head()
    val (parts, mn, mx, mean) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val imb = if (mean > 0) mx / mean - 1.0 else 0.0
    Report(parts, mn, mx, mean, imb, imb > Threshold)
  }
}
