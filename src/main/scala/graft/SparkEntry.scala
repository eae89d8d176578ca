package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Anomaly, Bpe, Chunking, Curation, CurationPipeline, Dedup, Diff, Graph, HeavyHitters, Merge, Packing, ProductQuant, Profile, Relational, Similarity, Skew, SuffixDedup, Temporal, TextAnalysis, TokenizerReport, Unigram, WordPiece}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module registries (one entry per
  * implemented operator from SURVEY.md §2); `oracleSql` holds the DuckDB
  * twins. Invariant: every oracle key exists in `queries`, aliases and
  * ORDER BY match exactly on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Deterministic keep-first dedup + group-count + having in one plan —
    * the reference's dedup pass (transform_load.py:47-70) re-expressed. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_dedup_group")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Chunking.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Temporal.queries ++
      Packing.queries ++ Curation.queries ++ Anomaly.queries ++ ProductQuant.queries ++ graft.sources.Layout.queries ++ HeavyHitters.queries ++
      Skew.queries ++ Profile.queries ++ Merge.queries ++ Graph.queries ++ SuffixDedup.queries ++
      CurationPipeline.queries ++ Diff.queries ++ Bpe.queries ++ WordPiece.queries ++ Unigram.queries ++ TokenizerReport.queries ++
      graft.functions.Multimodal.queries ++ graft.sources.v2.StoreQueries.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ Chunking.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ TextAnalysis.oracle ++ Temporal.oracle ++
      Packing.oracle ++ Curation.oracle ++ Anomaly.oracle ++ ProductQuant.oracle ++ graft.sources.Layout.oracle ++ HeavyHitters.oracle ++
      Skew.oracle ++ Profile.oracle ++ Merge.oracle ++ Graph.oracle ++ SuffixDedup.oracle ++
      CurationPipeline.oracle ++ Diff.oracle ++ Bpe.oracle ++ WordPiece.oracle ++ Unigram.oracle ++ TokenizerReport.oracle ++
      graft.functions.Multimodal.oracle ++ graft.sources.v2.StoreQueries.oracle
}
