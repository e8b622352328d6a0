package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions path: native functions usable from plain SQL. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects simhash64/cosine_ff for SQL use") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val sim = spark.sql("SELECT simhash64('the quick brown fox') AS h").head.getLong(0)
      val simAgain = spark.sql("SELECT simhash64('the quick brown fox') AS h").head.getLong(0)
      assert(sim == simAgain && sim != 0L)
      val cos = spark.sql(
        "SELECT cosine_ff(array(cast(1.0 as float), cast(0.0 as float)), " +
          "array(cast(1.0 as float), cast(0.0 as float))) AS c").head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val ortho = spark.sql(
        "SELECT cosine_ff(array(cast(1.0 as float), cast(0.0 as float)), " +
          "array(cast(0.0 as float), cast(1.0 as float))) AS c").head.getDouble(0)
      assert(math.abs(ortho) < 1e-12)
    } finally spark.stop()
  }
}
