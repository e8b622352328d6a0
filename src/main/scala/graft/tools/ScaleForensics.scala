package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.Bench
import graft.spark.{ExtractJob, PagesTable}

/** Per-stage forensics for the cluster-mode scaling cross-check: runs the
  * same extraction legs as `graft.Bench` (SPARK_GRAFT_SCALE_MODE=cluster,
  * local-cluster[1,4] vs [4,4]) with a stage listener attached and prints,
  * per timed stage: wall, summed executor run/cpu/GC time, shuffle
  * write/fetch-wait, task count — the evidence base for the cluster-vs-jvm
  * efficiency gap note in BASELINE.md ("Measured results").
  *
  * Usage: `sbt "runMain graft.tools.ScaleForensics [docs] [reps]"`.
  */
object ScaleForensics {

  private final case class StageLine(id: Int, name: String, tasks: Int,
      wallMs: Long, runMs: Long, cpuMs: Long, gcMs: Long,
      shWriteMs: Long, fetchWaitMs: Long, deserMs: Long, bytesRead: Long)

  private def attach(s: SparkSession): java.util.concurrent.ConcurrentLinkedQueue[StageLine] = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[StageLine]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val i = ev.stageInfo
        val m = i.taskMetrics
        q.add(StageLine(
          i.stageId, i.name.linesIterator.next().take(60), i.numTasks,
          (for (c <- i.completionTime; s0 <- i.submissionTime) yield c - s0).getOrElse(-1L),
          m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime,
          m.shuffleWriteMetrics.writeTime / 1000000L,
          m.shuffleReadMetrics.fetchWaitTime,
          m.executorDeserializeTime, m.inputMetrics.bytesRead))
      }
    })
    q
  }

  private def stolen(): Double = {
    val line = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).getOrElse("")
    val cols = line.trim.split("\\s+").drop(1)
    if (cols.length >= 8) cols(7).toDouble / 100.0 else 0.0
  }

  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toInt).getOrElse(48000)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val corpusDir = s"/tmp/graft_bench_skew_corpus_$docs"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      val s = Bench.newSession(8)
      import s.implicits._
      val familyStride = PagesTable.Families.length
      val skewIdx = PagesTable.Families.indexOf("skew")
      s.range(0, docs.toLong, 1, 32)
        .map(i => PagesTable.genDoc(i * familyStride + skewIdx))
        .write.mode("overwrite").parquet(corpusDir)
      s.stop()
    }

    // tag "jvm": one local[cores] JVM — the same 16 cores without executor
    // processes or netty shuffle; the topology A/B that splits "multi-JVM
    // overhead" from "shared-host ceiling" (VERDICT r4 #2)
    def leg(nExec: Int, cores: Int, tag: String): Unit = {
      val s = if (tag.startsWith("jvm")) Bench.newSession(cores)
        else Bench.newClusterSession(nExec, cores, 8192)
      import s.implicits._
      try {
        val slots = nExec * cores
        val pages = s.read.parquet(corpusDir).as[PagesTable.PageRow]
        val repart = ExtractJob.skewRepartition(pages.toDF(), slots * 4)
          .as[PagesTable.PageRow]
        val extracted = ExtractJob.extract(repart)
          .map(r => r.parse_status)
          .toDF("parse_status")
          .filter(org.apache.spark.sql.functions.col("parse_status") === "ok")
        extracted.count() // warm-up (JIT, codegen, shuffle files)
        val q = attach(s)
        val st0 = stolen()
        val t0 = System.nanoTime()
        val n = extracted.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val st = stolen() - st0
        println(f"LEG $tag nExec=$nExec rate=${n / dt}%.0f docs/s wall=${dt}%.2fs steal=${st}%.1f cpu-s")
        q.forEach { l =>
          println(f"  stage ${l.id}%3d ${l.name}%-60s tasks=${l.tasks}%3d wall=${l.wallMs}%6dms " +
            f"run=${l.runMs}%7dms cpu=${l.cpuMs}%7dms gc=${l.gcMs}%5dms shW=${l.shWriteMs}%5dms " +
            f"fetchWait=${l.fetchWaitMs}%5dms deser=${l.deserMs}%5dms read=${l.bytesRead / 1048576}%4dMB")
        }
      } finally s.stop()
    }

    // legs: cluster-mode lo (1x4) and hi (4x4) as before, plus the
    // equal-width topology pair — one 16-thread JVM vs four 4-core executor
    // JVMs — which isolates multi-JVM cost (netty shuffle, per-heap GC,
    // page-cache sharing) from plain parallelism
    val legSpec = sys.env.getOrElse("SPARK_GRAFT_FORENSIC_LEGS",
      "lo:1x4,hi:4x4,jvm16:1x16,cl16:1x16")
    for (r <- 1 to reps) {
      println(s"=== rep $r docs=$docs ===")
      legSpec.split(",").foreach { spec =>
        val Array(tag, dims) = spec.split(":")
        val Array(ne, co) = dims.split("x").map(_.toInt)
        leg(ne, co, tag)
      }
    }
  }
}
