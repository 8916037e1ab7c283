package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Per-query wall times for the XMark replay set — the front end's
  * decorrelation feedback loop. Args: query names (default: the
  * formerly-slow correlated set). `SPARK_GRAFT_XMARK_EXPLAIN=1` prints
  * each plan instead of running it twice. */
object ProfileXmark {
  def main(args: Array[String]): Unit = {
    val xmarkDir =
      "/root/reference/bundles/sirix-query/src/test/resources/xmark"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q08", "q11", "q12", "q20")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          val ms = sc.stageInfo.taskMetrics.executorRunTime
          taskMs.addAndGet(ms)
          if (ms > 2000 && sys.env.contains("SPARK_GRAFT_STAGES"))
            println(f"  stage ${sc.stageInfo.stageId} ${ms / 1e3}%.1fs " +
              f"tasks=${sc.stageInfo.numTasks} ${sc.stageInfo.name.take(80)}")
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val xml = new String(
      Files.readAllBytes(Paths.get(s"$xmarkDir/auction.xml")), "UTF-8")
    val store = new graft.query.JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-xmark-prof").toString)
    val t0 = System.nanoTime()
    val ctx = store.storeXml("xmark", "auction.xml", xml)
    println(f"store+encode: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    names.foreach { name =>
      val q = if (name.startsWith("q:")) name.substring(2)
        else new String(Files.readAllBytes(
          Paths.get(s"$xmarkDir/queries/orig/$name.xq")), "UTF-8")
      if (sys.env.contains("SPARK_GRAFT_XMARK_EXPLAIN")) {
        graft.query.JsoniqRun.run(store, q, Some(ctx)).explain("formatted")
      } else {
        val times = (1 to 2).map { _ =>
          val t1 = System.nanoTime()
          val df = graft.query.JsoniqRun.run(store, q, Some(ctx))
          val n = df.count()
          if (sys.env.contains("SPARK_GRAFT_METRICS")) {
            df.queryExecution.executedPlan.foreach { node =>
              val interesting = node.metrics.filter { case (_, m) =>
                m.metricType == "timing" || m.metricType == "nsTiming" }
              val tot = interesting.values.map(m =>
                if (m.metricType == "nsTiming") m.value / 1e6 else m.value.toDouble).sum
              if (tot > 1000)
                println(f"  ${node.nodeName.take(50)}%-50s ${tot / 1e3}%.1fs " +
                  interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" "))
            }
          }
          ((System.nanoTime() - t1) / 1e9, n)
        }
        println(f"$name: ${times.map(_._1).min}%.2f s  " +
          f"(first ${times.head._1}%.2f) rows=${times.head._2}  " +
          f"[jobs=${jobs.getAndSet(0)} stages=${stages.getAndSet(0)} " +
          f"taskTime=${taskMs.getAndSet(0) / 1e3}%.1fs]")
      }
    }
    spark.stop()
  }
}
