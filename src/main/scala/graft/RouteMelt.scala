package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement harness (sibling of [[RecallGrid]]): prints the
  * ROUTED pair-recall melt — coarse codebook ∈ {random, trained-K₁} ×
  * coarse probes P₁ ∈ {2, 4, 8, K₁} — on any corpus:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.RouteMelt'
  * The gate corpora can only read P₁ ≤ K₁ ∈ {3, 4}; the operating-point
  * decision for [[graft.ops.SimilarityOps.DeployedP1]] comes from this
  * harness at 200k vectors (K₁ = 40), on both the isotropic and the
  * planted-blob ScaleGen corpora (the structured one is where routing
  * is cheap and training pays; the isotropic one is the floor).
  */
object RouteMelt {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.init(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = ops.DedupOps.nearDupRecallMelt(spark, d).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"== routed pair-recall melt ($d, $dt%.1f s) ==")
    rows.foreach(r => println(
      f"  ${r.getString(0)}%-8s p1=${r.getLong(1)}%-3d " +
        f"n_true=${r.getLong(2)} n_caught=${r.getLong(3)} " +
        f"recall=${r.getDouble(4)}%.3f"))
    spark.stop()
  }
}
