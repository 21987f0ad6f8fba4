package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement harness (not part of the library surface; sibling of
  * [[Scratch]]/[[Probe]]): prints the near-dup blocking recall/cost grid
  * (codebook ∈ {random, trained} × probe ∈ {1, 2}) at each requested
  * occupancy —
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.RecallGrid 128 512'
  * The occ-128 grid is the oracle-gated `d_neardup_recall_grid`; other
  * occupancies change K (and with it the oracle's CTE constants), so they
  * ride this harness + the R17 spec invariants instead of the gate.
  */
object RecallGrid {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.init(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val occs = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(128L, 512L)
    for (occ <- occs) {
      val t0 = System.nanoTime()
      val rows = ops.DedupOps.nearDupRecallGridAt(spark, d, occ).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== occ $occ ($dt%.1f s) ==")
      rows.foreach(r => println(
        f"  ${r.getString(0)}%-8s probe=${r.getLong(1)} " +
          f"n_true=${r.getLong(2)} n_caught=${r.getLong(3)} " +
          f"recall=${r.getDouble(4)}%.3f"))
    }
    spark.stop()
  }
}
