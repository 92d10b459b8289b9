package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over a timestamped edge/link stream
  * (src, dst, ts). The reference is strictly batch (SURVEY §2.6 —
  * no streaming exists there); these extend the engine to the
  * continuous-ingest case a 10^12-file pipeline actually faces: new
  * repo snapshots arriving as a stream, degree/link stats maintained
  * incrementally instead of recomputed.
  */
object LinkStream {

  final case class LinkEvent(src: Long, dst: Long, ts: Timestamp)
  final case class DegreeUpdate(vid: Long, degree: Long)

  /** Windowed in-link counts with a watermark: per (window, dst)
    * arrival counts, late data beyond `lateness` dropped. Append-mode
    * compatible (emits finalized windows only). */
  def windowedInLinks(events: DataFrame,
                      window: String = "1 hour",
                      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("dst"))
      .agg(count(lit(1)).as("n_links"))

  /** Incremental out-degree via keyed state: each micro-batch updates
    * a per-vertex running counter and emits the new total — the
    * streaming analog of the Degree program (reference deg.h:32-52),
    * state kept in the state store instead of a vertex vector. */
  def incrementalOutDegree(events: Dataset[LinkEvent]): Dataset[DegreeUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.src)
      .mapGroupsWithState[Long, DegreeUpdate](GroupStateTimeout.NoTimeout) {
        (vid: Long, batch: Iterator[LinkEvent], state: GroupState[Long]) =>
          val d = state.getOption.getOrElse(0L) + batch.size
          state.update(d)
          DegreeUpdate(vid, d)
      }
  }
}
