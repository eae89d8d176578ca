package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.ImageOps

/** In-memory fixtures per FIXTURES.md §A — museum-domain inputs shaped
  * like the MET API (A4) and the reference's GridFS layout (A2/A3), for
  * the zero-egress environment where S1–S3 live HTTP cannot run. Includes
  * every edge the reference's code paths branch on: empty/null
  * primaryImage (F2), non-200 rows (F1/F3), duplicate objectIDs (dedup),
  * null/""/missing cleanable fields (C1), an undecodable image (F6). */
object Fixtures {

  /** MET-shaped object rows. objectIDs 101–110, with:
    *  - 104: primaryImage "" (F2-dropped)
    *  - 105: primaryImage null (F2-dropped)
    *  - 106: status 404 (F1-dropped)
    *  - 107/108: duplicates of 101/102's objectID (dedup victims; later created_at)
    *  - 109: image URL whose fetch failed (F3-dropped)
    *  - 110: image bytes undecodable (F6-dropped at transform)
    *  - nulls/"" sprinkled through cleanable fields (C1) */
  def metObjects(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (101L, "Sunflowers", "Vincent", "European Paintings", null.asInstanceOf[String], "", "1887", "Oil on canvas", "http://img/101.jpg", 200),
      (102L, "Bridge", null.asInstanceOf[String], "Asian Art", "Japan", "Edo", null.asInstanceOf[String], "Woodblock", "http://img/102.jpg", 200),
      (103L, "Vase", "Unknown", null.asInstanceOf[String], "Greek", "Classical", "450 BC", "", "http://img/103.jpg", 200),
      (104L, "NoImage", "A", "Dept", "C", "P", "1900", "M", "", 200),
      (105L, "NullImage", "B", "Dept", "C", "P", "1901", "M", null.asInstanceOf[String], 200),
      (106L, "NotFound", "C", "Dept", "C", "P", "1902", "M", "http://img/106.jpg", 404),
      (101L, "Sunflowers dup", "Vincent", "European Paintings", "", "", "1887", "Oil", "http://img/101b.jpg", 200),
      (102L, "Bridge dup", "Hokusai", "Asian Art", "Japan", "Edo", "1830", "Woodblock", "http://img/102b.jpg", 200),
      (109L, "FetchFail", "D", "Dept", "C", "P", "1903", "M", "http://img/109.jpg", 200),
      (110L, "BadBytes", "E", "Dept", "C", "P", "1904", "M", "http://img/110.jpg", 200)
    ).toDF("objectID", "title", "artistDisplayName", "department", "culture",
      "period", "objectDate", "medium", "primaryImage", "status")
  }

  /** Image fetch results keyed by URL. 109 → status 500 (F3); 110 →
    * garbage bytes (decode fails, F6); others → real JPEGs of varying
    * sizes, one large enough to span multiple GridFS chunks. */
  def images(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("http://img/101.jpg", ImageOps.makeTestJpeg(320, 480, 101), 200),
      ("http://img/102.jpg", ImageOps.makeTestJpeg(640, 400, 102), 200),
      ("http://img/103.jpg", ImageOps.makeTestJpeg(1200, 900, 103), 200), // multi-chunk (>255 KiB)
      ("http://img/101b.jpg", ImageOps.makeTestJpeg(320, 480, 1101), 200),
      ("http://img/102b.jpg", ImageOps.makeTestJpeg(320, 480, 1102), 200),
      ("http://img/109.jpg", Array.emptyByteArray, 500),
      ("http://img/110.jpg", Array.fill[Byte](4096)(42), 200)
    ).toDF("url", "bytes", "status")
  }
}
