package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries against an sf dir.
  * Usage: ./run_main.sh graft.tools.QueryTime <sfDir> <query...>
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-qtime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
      val rows = df.count()
      println(f"[qtime] $n rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
