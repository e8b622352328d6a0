package graft.api

import graft.spark.SnapshotStore
import org.apache.spark.sql.SparkSession

/** `ferrules-api` binary analogue (api/main.rs:244-306): start the HTTP
  * serving surface. With an ingest root, every accepted upload is MERGEd
  * into the pages input table (SnapshotStore, keyed by url) — the
  * driver-side entry that feeds the same table ExtractJobRunner batches
  * over (SURVEY §2.1 S2), so "upload now, extract at scale later" is one
  * continuous surface. Without it the server is Spark-free.
  *
  * usage: ApiServerRunner [port] [ingestRoot]
  *   port        listen port (default 3002, api/main.rs listen-addr default
  *               0.0.0.0:3002; 0 picks an ephemeral port)
  *   ingestRoot  optional SnapshotStore root for upload ingestion
  */
object ApiServerRunner {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(3002)
    val ingestRoot = args.lift(1)

    val ingest: (String, Array[Byte]) => Unit = ingestRoot match {
      case None => (_, _) => ()
      case Some(root) =>
        val builder = SparkSession.builder()
          .appName("graft-api")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.shuffle.partitions", 32)
        val spark = (if (sys.props.contains("spark.master")) builder
          else builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val store = new SnapshotStore(root)
        (name, bytes) => {
          import spark.implicits._
          val ts = new java.sql.Timestamp(System.currentTimeMillis())
          val row = graft.spark.PagesTable.PageRow(
            url = s"https://ingest.api/$name",
            warc_ts = ts,
            html = bytes,
            text = "",
            lang = "")
          // MERGE on url: re-uploading the same filename replaces the row
          // (S4 idempotent-sink discipline, utils.rs:129-184)
          store.merge(Seq(row).toDF(), "url")
          ()
        }
    }

    val server = new ApiServer(onIngest = ingest)
    val bound = server.start(port)
    println(s"graft-api listening on 0.0.0.0:$bound" +
      ingestRoot.map(r => s" (ingesting to $r)").getOrElse(""))
    // serve until interrupted
    Thread.currentThread().join()
  }
}
