package graft.tools

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-level profile of SpmvKernel.compile's constituent costs on a
  * parked edge table — round-6 measurement tool (guide §1).
  * Usage: ./run_main.sh graft.tools.CompileProfile <cores> <parquet> [kryo|java]
  */
object CompileProfile {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val path = args(1)
    val ser = if (args.length > 2 && args(2) == "java")
      "org.apache.spark.serializer.JavaSerializer"
    else "org.apache.spark.serializer.KryoSerializer"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-compile-profile")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.serializer", ser)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = cores
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val edges = spark.read.parquet(path)
    time("parquet count()")(edges.count())

    // A: the current compile's edge shuffle: boxed tuples + partitionBy
    val hp = new HashPartitioner(parts)
    val eRdd = edges.selectExpr("CAST(src AS LONG)", "CAST(dst AS LONG)")
      .queryExecution.toRdd.map(ir => (ir.getLong(0), (ir.getLong(1), 1.0)))
      .partitionBy(hp)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    time("A: tuple partitionBy + persistSER")(eRdd.count())
    val verts = eRdd.mapPartitions(_.flatMap { case (s, (d, _)) =>
      Iterator((s, null), (d, null)) }, preservesPartitioning = false)
      .reduceByKey(hp, (a, _) => a)
    time("B: verts reduceByKey")(verts.count())
    val degs = eRdd.mapValues(_ => 1L).reduceByKey(hp, _ + _)
    time("C: degs reduceByKey (narrow)")(degs.count())
    time("D: re-read persisted eRdd")(eRdd.count())
    eRdd.unpersist(true); verts.unpersist(true)

    // E: Tungsten exchange of the same rows (UnsafeRow, no boxing)
    val reparted = edges.selectExpr("CAST(src AS LONG) AS src", "CAST(dst AS LONG) AS dst")
      .repartition(parts, col("src"))
    time("E: DataFrame repartition(src)") {
      reparted.queryExecution.toRdd.mapPartitions(it => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }).sum()
    }
    // F: Tungsten vertex-universe dedup
    val v2 = edges.selectExpr("CAST(src AS LONG) AS vid")
      .union(edges.selectExpr("CAST(dst AS LONG) AS vid"))
      .repartition(parts, col("vid")).distinct()
    time("F: DataFrame vertex distinct")(v2.count())
    // G: full current compile for reference
    time("G: SpmvKernel.compile")(graft.graph.SpmvKernel.compile(
      edges.select(col("src"), col("dst")), parts).unpersist())
    spark.stop()
  }
}
