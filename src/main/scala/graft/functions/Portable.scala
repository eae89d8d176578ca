package graft.functions

/** Cross-engine-deterministic primitives shared by the LLM-data operators
  * (dedup, simhash, LSH) and their DuckDB oracle twins.
  *
  * The driver's correctness gate hash-compares Spark output against DuckDB
  * (BASELINE.md). Engine-native hashes (xxhash64, DuckDB hash()) differ, so
  * anything hash-dependent would be unverifiable. Instead: a 48-bit hash
  * from the first 12 hex chars of md5 — md5 is identical everywhere, 48
  * bits keep `a*h+b mod p` inside int64. Spark spells it
  * `conv(substring(md5(x),1,12),16,10)`, DuckDB `CAST('0x'||substr(md5(x),
  * 1,12) AS BIGINT)`. MinHash coefficients and LSH hyperplanes are
  * literals computed here once and embedded verbatim in both dialects.
  */
object Portable {

  /** Modulus for MinHash permutations: < 2^30 so a*h+b stays in int64. */
  val P: Long = 1000000007L

  /** Canonical whitespace tokenizer, Spark dialect — the single
    * definition shared by Dedup and TextAnalysis so their oracles can
    * never desynchronize (DuckDB twin:
    * `regexp_split_to_array(trim(text), '\s+')`). */
  val sparkToks: String = "split(trim(text), '\\\\s+')"

  /** 48-bit portable hash, Spark SQL dialect. */
  def sparkHash48(e: String): String =
    s"cast(conv(substring(md5($e), 1, 12), 16, 10) as bigint)"

  /** 48-bit portable hash, DuckDB dialect. */
  def duckHash48(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 12)) AS BIGINT)"

  /** MinHash signature length and banding shape (4 bands × 4 rows):
    * s-curve threshold (1/4)^(1/4) ≈ 0.71 on shingle Jaccard — pairs
    * above ~0.7 collide in ≥1 band with high probability. */
  val MinhashK = 16
  val Bands = 4
  val RowsPerBand: Int = MinhashK / Bands

  /** Per-permutation affine coefficients — one formula for ANY width
    * (the q158 K-ablation uses j up to 63; the production signature is
    * the j < 16 prefix). */
  def minhashAj(j: Int): Long = (j * 2654435761L + 1L) % P
  def minhashBj(j: Int): Long = (j * 40503L + 7L) % P

  /** The production-width coefficients, fixed literals. */
  val minhashA: Seq[Long] = (0 until MinhashK).map(minhashAj)
  val minhashB: Seq[Long] = (0 until MinhashK).map(minhashBj)

  /** Random-hyperplane LSH: 8 planes × 64 dims with ±1 components derived
    * from md5 parity at build time — embedded as literals, so both engines
    * see the same planes and the bucket computation is integer-exact. */
  val LshPlanes = 8
  val EmbeddingDim = 64

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def planeSign(j: Int, i: Int): Int =
    if ((java.lang.Long.parseLong(md5Hex(s"plane_${j}_$i").substring(0, 12), 16) % 2) == 0) -1 else 1

  val planes: Seq[Seq[Int]] =
    (0 until LshPlanes).map(j => (0 until EmbeddingDim).map(i => planeSign(j, i)))

  /** Multi-band LSH candidate generation: number of independent band
    * tables. Recall comes from the union across bands; candidate volume
    * is bounded per band by [[lshBandBits]]. */
  val LshBands = 4

  /** Bits per band, scaled with corpus size: bitlen(n-1) + 3 (floor 8).
    * 2^bits ≈ 8·n buckets per band, so the expected bucket-local
    * self-join output stays LINEAR-ish in n instead of the fixed-256-
    * bucket Θ(n²/256) blowup — the round-2 scale gap. Integer-exact in
    * both engines: Spark computes it driver-side from `Long` bit length;
    * the DuckDB twin spells the identical value as
    * `greatest(8, length(bin(n - 1)) + 3)`. */
  def lshBandBits(n: Long): Int =
    math.max(8, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1)) + 3)

  /** A plane as an array literal — identical text is valid in both Spark
    * SQL and DuckDB (`array(1,-1,...)` is Spark-only; `[1,-1,...]` is
    * DuckDB-only; `array(...)` chosen per dialect by the caller). */
  def planeElems(j: Int): String = planes(j).mkString(", ")

  /** IVF centroid-count floor — the k a tiny corpus still gets. */
  val IvfKFloor = 16

  /** IVF centroid-count cap: 2^16 centroids × 64 dims × 8 B ≈ 32 MB of
    * model — the largest literal-inlined centroid matrix worth
    * broadcasting per task. Past it (n ≳ 4×10^9 vectors) cluster size
    * grows linearly again and the next lever is a hierarchical coarse
    * quantizer, not more flat centroids. */
  val IvfKCap: Int = 1 << 16

  /** IVF centroid count, scaled with corpus size — the [[lshBandBits]]
    * pattern applied to the ANN family: k = 2^ceil(bitlen(n−1)/2), the
    * power of two ≥ √n (floor [[IvfKFloor]], cap [[IvfKCap]]). √n
    * centroids ⇒ ~√n vectors per cluster, so cluster-local pair work
    * (SemDeDup's Σ|c|²) grows as n^1.5 — never n²/k-fixed — and the
    * cid-keyed shuffle's key space grows WITH the corpus instead of
    * pinning parallelism at a constant. Integer-exact in both engines:
    * Spark computes it driver-side from Long bit length; the DuckDB
    * twin spells the identical value as
    * `greatest(16, 1 << least(16, (length(bin(n - 1)) + 1) // 2))`. */
  def ivfK(n: Long): Int = {
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))
    math.max(IvfKFloor, 1 << math.min(16, (bitlen + 1) / 2))
  }

  /** IVF Lloyd training-sample modulus: every `mod`-th vector trains.
    * Floor 3 (the historical 1/3 sample at test scale); past
    * n ≈ 768·k the modulus grows so the sample stays ≈ 256·k vectors —
    * Lloyd needs a representative sample PER CENTROID, not a constant
    * fraction of the corpus (a 1/3 sample of 10^12 vectors is still
    * 3×10^11 rows per iteration — the anti-pattern the index exists to
    * avoid). Integer-exact in both engines; DuckDB spells it
    * `greatest(3, n // (256 * k))`. At the test SFs the cap is above
    * n, so the modulus stays 3 and no oracle hash moves. */
  def ivfTrainMod(n: Long, k: Int): Long = math.max(3L, n / (256L * k))

  /** IVF probe budget for a k-centroid index: 3k/4 — the measured knee
    * of the recall sweep (tools/RecallSweep, PLANS round-13): on this
    * near-uniform synthetic corpus recall tracks the scanned fraction
    * almost linearly, so the ≥0.85 recall floor (q131) needs ~3/4 of
    * the lists probed at ANY k. On clustered real data the same knee
    * sits far lower — the fraction is a data property, the scaling rule
    * (probes ∝ k, fraction constant) is the portable part. DuckDB twin:
    * `(3 * k) // 4`. */
  def ivfNprobe(k: Int): Int = math.max(1, 3 * k / 4)
}
