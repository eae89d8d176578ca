package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.StorageConnector

/** [[StorageConnector]] backed by the `graft-store` DataSource V2
  * connector — the fourth implementation of the storage seam, and the
  * one that closes the north-star loop: every read goes through the
  * full DSv2 scan path (zone-map segment pruning, claimed filters,
  * column pruning, reported statistics) and every write through the
  * two-phase DSv2 commit protocol, so the WHOLE operator library —
  * including the GridFS bucket round trip — runs unchanged over a
  * connector with a real external-store life-cycle. ConnectorSpec runs
  * the same pipeline over all four implementations.
  *
  * DSv2 path-less writes only speak Append/Overwrite on the
  * DataFrameWriter; ErrorIfExists/Ignore are the store-existence
  * semantics layered here, exactly as a driver-side client would. */
class GraftStoreV2Connector extends StorageConnector {

  override def read(spark: SparkSession, name: String): DataFrame =
    spark.read.format("graft-store").option("name", name).load()

  override def write(df: DataFrame, name: String, mode: SaveMode): Unit = mode match {
    case SaveMode.Overwrite =>
      df.write.format("graft-store").option("name", name).mode("overwrite").save()
    case SaveMode.Append =>
      df.write.format("graft-store").option("name", name).mode("append").save()
    case SaveMode.ErrorIfExists =>
      if (GraftStore.exists(name))
        throw new IllegalStateException(s"collection exists: $name")
      write(df, name, SaveMode.Overwrite)
    case SaveMode.Ignore =>
      if (!GraftStore.exists(name)) write(df, name, SaveMode.Overwrite)
  }
}
