package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: per-Spark-job timing breakdown of selected queries —
  * `runMain graft.JobProbe <sfDir> <name-substring>...`.
  *
  * Lifecycle queries (MV create/refresh/commit, sink commits) spend their
  * time in a CHAIN of sequential driver-launched jobs, which per-query wall
  * clock cannot attribute. This runs each query twice (warm JIT) and prints
  * every job the warm pass launched: id, duration, description/callsite —
  * the measurement §1/§5 of the optimization guide asks for before touching
  * a commit chain.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val stages = js.stageInfos.map(si => si.name.takeWhile(_ != '\n')).distinct
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("") + " | " + stages.mkString("; ")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, (je.time - t0) / 1e3, desc))
        }
      }
    })

    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    try runOnce(SparkEntry.queries("q1_agg")) catch { case _: Throwable => () }

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          runOnce(fn) // warm pass (JIT + footer caches)
          Thread.sleep(200)
          done.clear()
          val t0 = System.nanoTime()
          runOnce(fn)
          val total = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let listener drain
          println(f"\n===== $name%s total=$total%.3f s =====")
          val recs = done.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
          recs.foreach { case (id, sec, desc) =>
            println(f"  job $id%4d  $sec%7.3f s  ${desc.take(110)}%s")
          }
          println(f"  jobs=${recs.length}%d sumJobSec=${recs.map(_._2).sum}%.3f")
        } catch { case e: Throwable => println(s"$name FAILED: $e") }
      }
    spark.stop()
  }
}
