package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4): times a SUBSET of
  * SparkEntry.queries with the same methodology as the frozen Bench.scala
  * (same session config, same noop sink, same sort order), plus per-query
  * /proc/stat steal telemetry so a noisy window can't masquerade as a
  * regression or a win. Optionally dumps .explain("formatted") per query.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.BenchExtra [reps] [query,query,...]"
  *   SPARK_GRAFT_EXPLAIN_DIR=/root/repo/plans/r06 dumps plans (no timing bias:
  *     explain happens AFTER the timed passes).
  *
  * This is NOT the artifact of record — Bench.scala is. BenchExtra exists so
  * the optimize/measure loop can isolate one query at a time (guide §1).
  */
object BenchExtra {

  private def stolenCpuSeconds(): Double = {
    val line = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).getOrElse("")
    val cols = line.trim.split("\\s+").drop(1)
    if (cols.length >= 8) cols(7).toDouble / 100.0 else 0.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 1
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet) else None
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")

    val spark = graft.Bench.newSession(cpus)
    // same cold-start absorption as Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).write.format("noop").mode("overwrite").save()

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val out = new StringBuilder
    out.append("{")
    var first = true
    qs.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val times = (1 to reps).map { _ =>
        val st0 = stolenCpuSeconds()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, stolenCpuSeconds() - st0)
      }
      val best = times.minBy(_._1)
      if (!first) out.append(",")
      first = false
      out.append(f"""\n "$name%s": {"best_sec": ${best._1}%.3f, "steal_cpu_s": ${best._2}%.2f, "all": [${times.map(t => f"${t._1}%.3f").mkString(",")}]}""")
      println(f"TIMED $name%-28s best ${best._1}%8.3f s  steal ${best._2}%6.2f  all [${times.map(t => f"${t._1}%.2f").mkString(", ")}]")
      explainDir.foreach { dir =>
        val f = new java.io.File(dir, s"${name}_$suffix.txt")
        f.getParentFile.mkdirs()
        val w = new java.io.PrintWriter(f)
        try w.println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        finally w.close()
      }
    }
    out.append("\n}")
    println("BENCHEXTRA_JSON " + out.toString.replaceAll("\n", ""))
    spark.stop()
  }
}
