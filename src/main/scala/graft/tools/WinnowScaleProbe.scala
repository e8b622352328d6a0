package graft.tools
import org.apache.spark.sql.SparkSession
object WinnowScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("winnow-scale")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.local.dir", "/dev/shm/graft-winnow-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    var t0 = System.nanoTime()
    val nFps = graft.ops.Dedup.winnowFingerprints(spark, dir).count()
    val tFps = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val nPairs = graft.ops.Dedup.winnowContainment(spark, dir).count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"winnow_scale","fps":$nFps,"fps_s":$tFps%.1f,"pairs":$nPairs,"pairs_s":$tPairs%.1f}""")
    spark.stop()
  }
}
