package graft

/** Temporary profiling probe (not part of the library surface). */
object Probe {
  private def gcStats(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[probe] heap max = ${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB")
    if (args.headOption.contains("shuffles")) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val n = "Exchange hashpartitioning".r.findAllIn(plan).length +
          "Exchange rangepartitioning".r.findAllIn(plan).length
        val b = "BroadcastExchange".r.findAllIn(plan).length
        println(f"[probe] shuffles $name%-28s exchanges=$n broadcasts=$b")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("explain")) {
      for (name <- args.drop(1)) {
        println(s"==== $name ====")
        println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString.take(8000))
      }
      spark.stop(); return
    }
    for (name <- args; i <- 1 to 3) {
      val (gc0, gt0) = gcStats()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val (gc1, gt1) = gcStats()
      println(f"[probe] $name%-22s run$i ${secs}%8.2f s   gc=${gc1 - gc0}%4d collections ${(gt1 - gt0) / 1000.0}%7.2f s gc-time")
    }
    spark.stop()
  }
}
