package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Round-6 optimization measurement harness (guide §1.1/§1.4): times
  * each declared query exactly the way the frozen bench does
  * (`fn(spark, sfDir).count()` on the bench's session config), but
  * additionally counts the Spark jobs/stages/tasks each query launches
  * and can dump `.explain("formatted")` of the query's result frame to
  * plans/r06. Separate main — Bench.scala is frozen for measurement.
  *
  * Usage: runMain graft.tools.BenchExtra [--explain tag] [--reps n] q...
  *   env SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *       SPARK_GRAFT_CPUS (default 32).
  * `all` expands to every declared query in bench (sorted) order.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var explainTag: Option[String] = None
    var reps = 1
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--explain" => explainTag = Some(args(i + 1)); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case n => names += n; i += 1
      }
    }
    val qs: Seq[String] =
      if (names.contains("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else names.toSeq

    // identical session shape to Bench.session (frozen) — measurements
    // here must predict the driver's numbers
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
      .config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })

    explainTag.foreach(_ => Files.createDirectories(Paths.get("plans/r06")))
    for (n <- qs; r <- 1 to reps) {
      jobs.set(0); stages.set(0); tasks.set(0)
      spark.sparkContext.setJobDescription(s"benchextra:$n")
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150) // settle async listener counters before reading them
      println(f"[extra] $n%-22s rep$r sec=$sec%7.3f rows=$rows%7d " +
        f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d")
      explainTag.foreach { tag =>
        val out = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
        Files.writeString(Paths.get(s"plans/r06/${n}_$tag.txt"), out.toString)
      }
    }
    spark.stop()
  }
}
