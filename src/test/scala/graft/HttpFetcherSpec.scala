package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MuseumPipeline
import graft.sources.HttpFetcher

/** The live S1–S3 path against an in-process HTTP server: same
  * (url, bytes, status) contract as the fixtures, so the pipeline runs
  * unchanged with the fetcher swapped in. */
class HttpFetcherSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = SparkTestSession.spark

  private var server: HttpServer = _
  private def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/img/", { exchange =>
      val id = exchange.getRequestURI.getPath.stripPrefix("/img/")
      val body = s"IMAGEBYTES_$id".getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(200, body.length.toLong)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.createContext("/missing/", { exchange =>
      exchange.sendResponseHeaders(404, -1L)
      exchange.close()
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("token bucket: burst passes, then sustained rate paces") {
    var clock = 0L
    val b = new HttpFetcher.TokenBucket(ratePerSec = 10.0, burst = 2, now = () => clock)
    assert(b.acquireDelayNs() == 0L) // burst token 1
    assert(b.acquireDelayNs() == 0L) // burst token 2
    val d3 = b.acquireDelayNs() // empty: next token is 100ms away
    assert(d3 == 100000000L, s"got $d3")
    val d4 = b.acquireDelayNs() // queued behind d3
    assert(d4 == 200000000L, s"got $d4")
    clock = 300000000L // 300ms later both matured
    assert(b.acquireDelayNs() == 0L)
  }

  test("fetchBinary: 200 yields bytes, 404 yields null+status, dead host yields -1") {
    import spark.implicits._
    val urls = Seq(
      s"$base/img/1.jpg", s"$base/img/2.jpg",
      s"$base/missing/3.jpg",
      "http://127.0.0.1:1/unroutable.jpg" // nothing listens on port 1
    ).toDF("url").repartition(2)
    val got = HttpFetcher.fetchBinary(urls, ratePerSec = 1000.0, burst = 8,
        connectTimeoutMs = 800, readTimeoutMs = 800)
      .collect().map(r => r.getString(0) -> (Option(r.getAs[Array[Byte]]("bytes")), r.getInt(2))).toMap
    assert(new String(got(s"$base/img/1.jpg")._1.get, StandardCharsets.UTF_8) == "IMAGEBYTES_1.jpg")
    assert(got(s"$base/img/2.jpg")._2 == 200)
    assert(got(s"$base/missing/3.jpg") == ((None, 404)))
    assert(got("http://127.0.0.1:1/unroutable.jpg") == ((None, -1)))
  }

  test("museum pipeline runs end-to-end with the live fetcher swapped in for fixtures") {
    import spark.implicits._
    // MET-shaped object rows: two good images, one 404, one empty url
    val objects = Seq(
      (101L, "Work A", "Artist A", "Paintings", s"$base/img/101.jpg", 200),
      (102L, "Work B", "Artist B", "Drawings", s"$base/img/102.jpg", 200),
      (103L, "Work C", "Artist C", "Paintings", s"$base/missing/103.jpg", 200),
      (104L, "Work D", "Artist D", "Paintings", "", 200)
    ).toDF("objectID", "title", "artistDisplayName", "department", "primaryImage", "status")
      .withColumn("culture", lit("c")).withColumn("period", lit("p"))
      .withColumn("objectDate", lit("d")).withColumn("medium", lit("m"))
    val images = HttpFetcher.fetchBinary(
      objects.where("length(primaryImage) > 0").select(col("primaryImage").as("url")),
      ratePerSec = 1000.0)
    val (metadata, files, chunks) = MuseumPipeline.ingest(objects, images, maxDownloads = 10)
    // 101 + 102 fetched; 103's 404 and 104's empty url are filtered out
    assert(metadata.select("object_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(101L, 102L))
    assert(files.count() == 2)
    // the stored blob is byte-identical to what the server returned
    val rebuilt = graft.operators.Chunking.reassemble(chunks)
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]]("data"), StandardCharsets.UTF_8)).toMap
    assert(rebuilt.values.toSet == Set("IMAGEBYTES_101.jpg", "IMAGEBYTES_102.jpg"))
  }
}
