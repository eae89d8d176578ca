package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable demonstration of the full museum ETL on the zero-egress
  * fixtures: `sbt "runMain graft.pipeline.PipelineDemo [outDir]"`.
  * Prints per-table counts and a metadata sample; optionally writes all
  * five tables as parquet (the K2/K1/K5 sink step). */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-museum-pipeline")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --via-files: stage the fixtures through the file-backed ApiSource
    // (JSON objects + parquet blobs) and ingest from disk instead of
    // from the in-memory frames — the S1/S2 file-source path.
    val (objects, images) =
      if (args.contains("--via-files")) {
        val dir = java.nio.file.Files.createTempDirectory("api_stage").toString
        graft.sources.ApiSource.writeObjects(Fixtures.metObjects(spark), dir)
        graft.sources.ApiSource.writeImages(Fixtures.images(spark), dir)
        println(s"[pipeline] ingesting from file-backed ApiSource at $dir")
        (graft.sources.ApiSource.readObjects(spark, dir),
         graft.sources.ApiSource.readImages(spark, dir))
      } else (Fixtures.metObjects(spark), Fixtures.images(spark))
    val tables = MuseumPipeline.run(spark, objects, images)
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(s"[pipeline] $name: ${df.count()} rows")
    }
    println("[pipeline] artwork_metadata sample:")
    tables("artwork_metadata")
      .select("object_id", "title", "artist", "culture", "period", "split",
        "gridfs_file_id", "transformed_gridfs_file_id")
      .orderBy("object_id")
      .show(20, truncate = false)

    args.filterNot(_.startsWith("--")).headOption.foreach { outDir =>
      tables.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$outDir/$name")
      }
      println(s"[pipeline] wrote 5 tables to $outDir")
    }
    spark.stop()
  }
}
