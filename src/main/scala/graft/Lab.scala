package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 scratch harness: noop-sink stage timings for the PPJoin
  * family (guide §1.4). Not part of the driver contract;
  * committed as the evidence harness behind OPTIMIZATION_r18.md. Usage: runMain graft.Lab <exp> */
object Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    def time(tag: String)(df: => DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[lab] $tag%-28s min=${secs.min}%7.3f passes=${secs.map(s => f"$s%.3f").mkString(",")}")
    }
    val exp = args.headOption.getOrElse("q149")
    if (exp.startsWith("stages:")) {
      val q = exp.stripPrefix("stages:")
      val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
          stages.put(si.stageId, (si.name.takeWhile(_ != '\n').take(90), dur, si.numTasks))
        }
      })
      // warm pass then measured pass
      SparkEntry.queries(q)(spark, sfDir).count()
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(_._1)
      println(f"[lab] $q warm-pass total=$total%.3f n_stages=${rows.size}")
      rows.foreach { case (id, (nm, ms, nt)) =>
        println(f"[lab] stage $id%4d ${ms}%6d ms tasks=$nt%3d  $nm")
      }
      println(f"[lab] sum_stage_ms=${rows.map(_._2._2).sum}")
      spark.stop(); return
    }
    if (exp.startsWith("metrics:")) {
      val q = exp.stripPrefix("metrics:")
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count() // warm
      val df2 = SparkEntry.queries(q)(spark, sfDir)
      df2.count()
      def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
        val interesting = p.metrics.filter { case (k, m) =>
          (k.contains("Time") || k.contains("time") || k == "numOutputRows" ||
            k.contains("dataSize") || k.contains("shuffleBytes") ||
            k.contains("bytesWritten") || k.contains("records")) && m.value > 0
        }
        val ms = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        println(s"[lab] ${"  " * depth}${p.nodeName}  $ms")
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan, depth + 1)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(qs.plan, depth + 1)
          case rr: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
            println(s"[lab] ${"  " * (depth + 1)}(reused ${rr.child.nodeName})")
          case _ => p.children.foreach(walk(_, depth + 1))
        }
      }
      walk(df2.queryExecution.executedPlan, 0)
      spark.stop(); return
    }
    exp match {
      case "sel" => ext.DedupLab.selectivity(spark, sfDir)
      case "q202" => ext.GraphLab.q202(spark, sfDir, time)
      case "q199hash" => ext.GraphLab.q199hash(spark, sfDir, time)
      case "q120" => ext.GraphLab.q120(spark, sfDir, time)
      case "loops" => ext.GraphLab.doubleRefLoops(spark, sfDir, time)
      case "q149cs" => ext.DedupLab.q149csStages(spark, sfDir, time)
      case "q149w" => ext.DedupLab.q149wStages(spark, sfDir, time)
      case "q149" => ext.DedupLab.q149Stages(spark, sfDir, time)
      case "q149x" => ext.DedupLab.q149xStages(spark, sfDir, time)
      case "q149p" => ext.DedupLab.q149pStages(spark, sfDir, time)
      case "q149pos" => ext.DedupLab.q149posStages(spark, sfDir, time)
      case "q210" => ext.DedupLab.q210Stages(spark, sfDir, time)
      case "q205" => ext.DedupLab.q205Stages(spark, sfDir, time)
      case "q179" => ext.DedupLab.q179Stages(spark, sfDir, time)
      case other => println(s"[lab] unknown experiment $other")
    }
    spark.stop()
  }
}
