package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (extensions — no reference analog; the similarity surface a training
  * -data pipeline needs).
  *
  * Two tiers:
  *  - brute-force cosine top-k (the correctness baseline): broadcast the
  *    small query set against the corpus — one narrow pass, no shuffle of
  *    the corpus, scales to any corpus size at O(|Q| * N).
  *  - random-hyperplane LSH buckets (the scale path): 8 sign bits → 256
  *    buckets; candidates = same-bucket rows only, then exact cosine
  *    re-rank inside the bucket. At 100 TB the bucket id becomes the
  *    partition key, so each query touches 1/256th of the corpus.
  *
  * Determinism: hyperplane weights are integers derived from md5 on the
  * driver and inlined as literals into BOTH the Spark plan and the oracle
  * SQL; dot products and norms are fixed-order folds in double — so both
  * engines see bit-identical cosines and bucket ids.
  */
object SimilarityOps {
  import Tables._

  private val NumPlanes = 8
  private val Dim = 64

  /** 60-bit integer from the first 15 hex chars of md5 — same value as the
    * SQL-side fold used elsewhere (DedupOps.h60Sql). */
  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic pseudo-random hyperplane weights in [-1000, 1000]. */
  private[ops] val planes: IndexedSeq[IndexedSeq[Long]] =
    (0 until NumPlanes).map(p => (0 until Dim).map(i => h60(s"${p}_$i") % 2001 - 1000))

  /** Spark-side LSH bucket id: 8 hyperplane sign bits, MSB = plane 0. */
  private val bucketExpr: String =
    (0 until NumPlanes).map { p =>
      s"""(CASE WHEN (${Vec.dotConst("embedding", planes(p))}) > 0
           THEN ${1L << (NumPlanes - 1 - p)} ELSE 0 END)"""
    }.mkString(" + ")

  /** DuckDB-side bucket id over column `embedding` — same literals. */
  private val bucketSql: String =
    (0 until NumPlanes).map { p =>
      val w = planes(p).mkString(", ")
      s"""(CASE WHEN list_reduce(list_prepend(0::DOUBLE,
             list_transform(list_zip(embedding, [$w]),
               q -> CAST(q[1] AS DOUBLE) * q[2])), (a, v) -> a + v) > 0
           THEN ${1L << (NumPlanes - 1 - p)} ELSE 0 END)"""
    }.mkString(" + ")

  private val cosineSql: String = """
    list_reduce(list_prepend(0::DOUBLE,
      list_transform(list_zip(q.embedding, c.embedding),
        p2 -> CAST(p2[1] AS DOUBLE) * CAST(p2[2] AS DOUBLE))), (a, v) -> a + v) /
    (sqrt(list_reduce(list_prepend(0::DOUBLE,
       list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       (a, v) -> a + v)) *
     sqrt(list_reduce(list_prepend(0::DOUBLE,
       list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       (a, v) -> a + v)))"""

  /** Brute-force cosine top-10 for each query vector (vec_id < 5),
    * broadcast-joined against the corpus; per-query window rank. */
  def cosineTopk(s: SparkSession, d: String): DataFrame = {
    val v = embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        expr(s"sqrt(${Vec.normSq("embedding")})").as("nrm"))
    val q = v.filter(col("vec_id") < 5)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    broadcast(q.as("q"))
      .join(v.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("vec_id"),
        expr(s"(${Vec.dot("`q`.embedding", "`c`.embedding")}) / (`q`.nrm * `c`.nrm)")
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** LSH-bucketed ANN: candidates share the query's 8-bit hyperplane
    * bucket; exact cosine re-rank, top-5 per query. The recall/cost dial is
    * the number of planes (more planes = smaller buckets). */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val v = embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        expr(s"sqrt(${Vec.normSq("embedding")})").as("nrm"),
        expr(bucketExpr).cast("long").as("bucket"))
    val q = v.filter(col("vec_id") < 5)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    broadcast(q.as("q"))
      .join(v.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("q.bucket").as("bucket"),
        col("c.vec_id").as("vec_id"),
        expr(s"(${Vec.dot("`q`.embedding", "`c`.embedding")}) / (`q`.nrm * `c`.nrm)")
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("bucket"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_cosine_topk" -> cosineTopk,
    "s_ann_lsh" -> annLsh)

  val oracles: Map[String, String] = Map(
    "s_cosine_topk" -> s"""
      WITH ranked AS (
        SELECT q.vec_id q_id, c.vec_id vec_id, $cosineSql AS cosine,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY $cosineSql DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 5)
      SELECT q_id, rank::INT AS rank, vec_id, cosine FROM ranked
      WHERE rank <= 10 ORDER BY q_id, rank""",
    "s_ann_lsh" -> s"""
      WITH b AS (SELECT vec_id, embedding, ($bucketSql)::BIGINT AS bucket
                 FROM embeddings),
      ranked AS (
        SELECT q.vec_id q_id, q.bucket bucket, c.vec_id vec_id,
               $cosineSql AS cosine,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY $cosineSql DESC, c.vec_id) AS rank
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 5)
      SELECT q_id, bucket, rank::INT AS rank, vec_id, cosine FROM ranked
      WHERE rank <= 5 ORDER BY q_id, rank""")
}
