package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Similarity

/** Streaming embedding ingest with INCREMENTAL ANN indexing — the
  * always-on form of q161: vectors arrive in micro-batches, each batch
  * is assigned against the PERSISTED centroid model (one narrow map,
  * zero shuffles — the centroids ride as literals exactly like the
  * batch path), and the assignment store grows by batch-keyed parquet
  * appends. The maintained index always equals what batch assignment
  * of everything-seen-so-far would produce, because IVF assignment is
  * per-vector independent given centroids — the same structural
  * argument that makes q161 exact, carried across batch boundaries and
  * restarts.
  *
  * State layout (the CurationStream conventions):
  *  - `statePath/cents` — the centroid model, written ONCE by the
  *    offline trainer (q161's `ivfIndex` on the base corpus). The
  *    stream only READS it; retraining is an offline decision (e.g.
  *    when per-cluster balance drifts — see [[clusterCounts]]).
  *  - `statePath/asg/batch=<id>` — per-batch assignments, OVERWRITE:
  *    an at-least-once replay of a batch rewrites its own directory,
  *    so the fold is replay-idempotent by layout.
  *
  * [[clusterCounts]] is the index-health view a retrain decision
  * reads: per-cluster vector counts over everything ingested — when
  * the biggest cluster's share grows past the planner's probe budget,
  * an offline re-train (new cents generation) is warranted. */
object AnnIngest {

  /** One micro-batch: assign against the persisted model, land the
    * batch's assignments in its own directory. */
  private[graft] def step(batch: DataFrame, batchId: Long,
      statePath: String): Unit = {
    val spark = batch.sparkSession
    val cents = Similarity.centroidModel(
      spark.read.parquet(s"$statePath/cents"))
    Similarity.assignAgainst(batch.select("vec_id", "embedding"), cents)
      .write.mode("overwrite").parquet(s"$statePath/asg/batch=$batchId")
  }

  /** Start the ingest loop over a streaming (vec_id, embedding) frame.
    * `statePath/cents` must already hold the trained model. */
  def start(vecs: DataFrame, statePath: String,
            checkpointPath: String): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(batch, batchId, statePath)
      }

  /** Every assignment ingested so far — row-identical to batch
    * assignment of the same vectors against the same centroids
    * (StreamingSpec pins it across a restart and a replay). */
  def assignments(spark: SparkSession, statePath: String): DataFrame = {
    val p = new Path(s"$statePath/asg")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL("vec_id BIGINT, cid BIGINT"))
    // project away the partition-discovered `batch` column so both
    // branches return the documented two-column schema (a consumer
    // doing unionByName must not see a shape that depends on whether
    // state exists yet)
    else spark.read.parquet(s"$statePath/asg").select("vec_id", "cid")
  }

  /** Per-cluster vector counts — the balance metric an offline retrain
    * decision reads (a cluster absorbing the stream means the model no
    * longer spreads the data; probe cost degrades toward brute force). */
  def clusterCounts(spark: SparkSession, statePath: String): DataFrame =
    assignments(spark, statePath)
      .groupBy("cid").agg(count(lit(1)).as("n_vecs"))
      .orderBy("cid")
}
