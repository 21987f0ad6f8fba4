package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpus generator for EMPIRICAL scale
  * validation (r11 verdict ask #2): regenerates the `documents` and
  * `embeddings` tables at any scale factor from the same model the
  * driver's testdata follows, so the expensive pair-graph/text/embedding
  * queries can be timed at 1× and 10× sf0.1 and their scaling exponents
  * measured instead of argued from plan shapes.
  *
  * The model was measured off `/root/testdata/sf0.1` (TESTDATA.md):
  *   - documents: text = `n_toks ~ Uniform[10,100]` tokens drawn from the
  *     31-word vocabulary (avg 54.1, std 25.7 — matches uniform), source
  *     = `"src" + (doc_id % 20)` (exact in the real data), lang weights
  *     en 41% / zh 15% / es 15% / fr 15% / de 14%, n_chars =
  *     length(text), and a ~1/625 exact-duplicate rate (8/5000 at sf0.1):
  *     a dup row replays an EARLIER doc's token stream (seed_id < id) so
  *     the dedup family has real mass to find.
  *   - embeddings: 64 iid per-dim draws normalized to unit length (real
  *     norms are 1±1e-7), label ~ Uniform[0,10) independent of geometry
  *     (measured within-label vs cross-label cosine both ≈ 0).
  *
  * Every random draw is `xxhash64(seed_id | id, lane)` over a
  * `spark.range` id — no wall-clock, no Math.random, no IO order — so a
  * given (outDir, nDocs, nVecs) regenerates bit-identically, and the
  * whole generator is one codegen'd projection per table: generating the
  * 10× corpus (50k docs / 20k vecs) is seconds, and the same plan would
  * generate the 10,000× corpus on a cluster unchanged.
  *
  * Usage: `runMain graft.ScaleGen <outDir> <nDocs> <nVecs>` — writes
  * `<outDir>/documents.parquet` and `<outDir>/embeddings.parquet`
  * (sf0.1-equivalent: 5000 2000; sf1-equivalent: 50000 20000).
  */
object ScaleGen {

  /** The real corpus's exact 31-token vocabulary (distinct tokens of
    * sf0.1 documents.text, sorted). */
  private[graft] val Vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** Uniform draw in [0, m) from lane `lane` of the row's hash stream. */
  private def draw(seed: Column, lane: Int, m: Int): Column =
    pmod(xxhash64(seed, lit(lane)), lit(m.toLong))

  /** `closed` mode — the testdata model verbatim: fixed 31-word vocab,
    * ~1/625 exact dups, near-dup structure EMERGENT from vocabulary
    * collisions. At 10× this saturates the DF cap (every shingle's df
    * grows 10×, hot shingles get dropped, the pair graph SHRINKS) — a
    * real property of the gate corpus's model and a validation that the
    * cap bounds pair cost, but useless for measuring the engine's own
    * scaling. `open` mode — vocabulary ∝ corpus (token space `w<k>`,
    * k < max(64, n/5), so incidental shingle collisions vanish) with
    * near-dup structure INJECTED explicitly: ~12.5% of docs replay an
    * earlier doc's token stream with per-token substitution probability
    * 1/64 (≈0.8 substituted tokens per 54-token doc → Jaccard mostly
    * ≥ 0.8), plus the 1/625 exact-dup arm. Pair-graph edges ∝ N at every
    * scale — how a real corpus's template mass scales — so open-mode
    * exponents measure the ENGINE. */
  private[graft] def documents(spark: SparkSession, n: Long,
      mode: String = "closed"): DataFrame = {
    val base = spark.range(n)
      .withColumn("cls", draw(col("id"), 2, 5000))
      // dup target: a hash-chosen doc in the previous ≤1000 ids, so dups
      // stay id-local like a crawl's re-fetches
      .withColumn("tgt",
        col("id") - lit(1L) -
          pmod(xxhash64(col("id"), lit(3)), least(col("id"), lit(1000L))))
    val seeded = mode match {
      case "closed" =>
        // ~1/625 exact dups; near-dup structure left to vocab collisions
        base.withColumn("seed_id",
            when(col("cls") < 8 && col("id") > 0, col("tgt"))
              .otherwise(col("id")))
          .withColumn("subst", lit(false))
      case "open" =>
        // 8/5000 exact dups + 625/5000 near-dups with substitution
        base.withColumn("seed_id",
            when(col("cls") < 633 && col("id") > 0, col("tgt"))
              .otherwise(col("id")))
          .withColumn("subst", col("cls") >= 8 && col("cls") < 633 &&
            col("id") > 0)
    }
    val vocabArr = array(Vocab.map(lit): _*)
    val vOpen = math.max(64L, n / 5)
    def tokClosed(seed: Column, i: Column): Column =
      element_at(vocabArr,
        (pmod(xxhash64(seed, i.cast("long")), lit(31L)) + 1).cast("int"))
    def tokOpen(seed: Column, i: Column): Column =
      concat(lit("w"), pmod(xxhash64(seed, i.cast("long")), lit(vOpen))
        .cast("string"))
    val tok: (Column, Column) => Column =
      if (mode == "closed") tokClosed else tokOpen
    seeded
      .withColumn("n_toks", (draw(col("seed_id"), 4, 91) + 10).cast("int"))
      .withColumn("text", array_join(
        transform(sequence(lit(1), col("n_toks")), i =>
          when(col("subst") &&
              pmod(xxhash64(col("id"), i.cast("long"), lit(7)), lit(64L)) === 0,
            tok(col("id"), i + lit(1000000)))
            .otherwise(tok(col("seed_id"), i))), " "))
      .withColumn("r", draw(col("id"), 5, 100))
      .withColumn("lang",
        when(col("r") < 41, "en").when(col("r") < 56, "zh")
          .when(col("r") < 71, "es").when(col("r") < 86, "fr")
          .otherwise("de"))
      .select(col("id").as("doc_id"), col("text"), col("lang"),
        concat(lit("src"), (col("id") % 20).cast("string")).as("source"),
        length(col("text")).as("n_chars"))
  }

  /** Planted-cluster blob count: one blob per ~256 vectors (≈ 2× the
    * deployed 128 cell occupancy, so the K ∝ N trained codebook has
    * cells to spare per blob), floored at 16 like the fixture. */
  private[graft] def blobCount(n: Long): Long = math.max(16L, n / 256)

  /** `iso` mode — the testdata model verbatim: 64 iid uniform[-1,1)
    * lanes, unit-normalized. ISOTROPIC by construction — no cluster
    * structure for a trained codebook or a routed coarse level to
    * learn; the measured recall ceiling of every trained arm on the
    * gate corpora is a property of this geometry (R17_NOTES grid).
    * `blobs` mode — the planted-cluster fixture (R17InvariantSpec)
    * promoted to a generator dial (r17 verdict ask #4): [[blobCount]]
    * cluster centers (64 iid uniform lanes seeded by the blob id),
    * each vector = unit(center + 0.3·noise) with iid per-(id, dim)
    * noise — intra-blob cosine ≈ |c|²/(|c|² + 0.09|u|²) ≈ 0.92 ≫ the
    * 0.4 near-dup bar, cross-blob ≈ 0 — so near-dup mass is real,
    * blob-aligned, and ∝ N: the corpus where trained blocking and
    * trained coarse routing SHOULD win, measured instead of argued.
    * Blob membership is hash-assigned (id-uniform), never id-local. */
  private[graft] def embeddings(spark: SparkSession, n: Long,
      mode: String = "iso"): DataFrame = {
    require(mode == "iso" || mode == "blobs", s"unknown embeddings mode $mode")
    def lane(seed: Column, l: Int): Column =
      draw(seed, l, 1 << 20).cast("double") / (1 << 19) - 1.0
    val raw =
      if (mode == "iso")
        array((0 until 64).map(d => lane(col("id"), 100 + d)): _*)
      else
        array((0 until 64).map(d =>
          lane(col("blob"), 300 + d) + lit(0.3) * lane(col("id"), 400 + d)): _*)
    spark.range(n)
      .withColumn("blob", pmod(xxhash64(col("id"), lit(250)),
        lit(blobCount(n))))
      .withColumn("raw", raw)
      .withColumn("nrm",
        sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float"))
          .as("embedding"),
        draw(col("id"), 200, 10).cast("int").as("label"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args.length <= 5,
      "usage: ScaleGen <outDir> <nDocs> <nVecs> [closed|open] [iso|blobs]")
    val (outDir, nDocs, nVecs) = (args(0), args(1).toLong, args(2).toLong)
    val mode = if (args.length >= 4) args(3) else "closed"
    val embMode = if (args.length >= 5) args(4) else "iso"
    require(mode == "closed" || mode == "open", s"unknown mode $mode")
    require(embMode == "iso" || embMode == "blobs",
      s"unknown embeddings mode $embMode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.init(SparkSession.builder()
      .appName("graft-scalegen")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    documents(spark, nDocs, mode).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
    embeddings(spark, nVecs, embMode).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")
    System.err.println(
      s"[scalegen] wrote $outDir (docs=$nDocs vecs=$nVecs mode=$mode emb=$embMode)")
    spark.stop()
  }
}
