package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result-statistics operators — parity with the reference's sinks:
  *
  *  - `checksum`: Σ state + reachable-vertex count (reference
  *    `Vertex_Program::checksum`, src/vp/vertex_program.hpp:1927-1960)
  *  - `summary`: mean / stddev / mode / skewness / argmax of the state
  *    column (reference `checksum1`, vp:1963-2119 — its hand-rolled
  *    gather-to-master loops become built-in aggregate expressions)
  *  - `display`: first-k states by vid (reference `display`,
  *    vp:2124-2181, count=31)
  */
object Stats {

  def checksum(state: DataFrame, stateCol: String, reachable: DataFrame => DataFrame = identity): (Double, Long) = {
    val r = reachable(state)
      .agg(coalesce(sum(col(stateCol)), lit(0.0)).as("sum"), count(lit(1)).as("n"))
      .head()
    (r.getDouble(0), r.getLong(1))
  }

  def summary(state: DataFrame, stateCol: String): DataFrame = {
    val c = col(stateCol).cast("double")
    val modeRow = state.groupBy(col(stateCol).as("mode_value"))
      .agg(count(lit(1)).as("mode_count"))
      .orderBy(desc("mode_count"), asc("mode_value")).limit(1)
    val argmaxRow = state
      .orderBy(desc(stateCol), asc("vid"))
      .select(col("vid").as("argmax_vid"), col(stateCol).as("max_value")).limit(1)
    val aggRow = state.agg(
      count(lit(1)).as("n"),
      avg(c).as("mean"),
      stddev(c).as("stddev"),
      skewness(c).as("skewness"))
    // LEFT joins (not crossJoin): an EMPTY state yields empty mode /
    // argmax rows, which must not annihilate the (always 1-row) agg —
    // summary stays total, with nulls in the empty-side columns.
    aggRow.join(modeRow, lit(true), "left").join(argmaxRow, lit(true), "left")
  }

  def display(state: DataFrame, k: Int = 31): Unit =
    state.orderBy(asc("vid")).show(k, truncate = false)
}
