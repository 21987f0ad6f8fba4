package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.TimestampType

/** Testdata-shape canary: the driver regenerates /root/testdata between
  * rounds, and a silent physical-type change (round 7: events.ts flipped
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ) after the last commit,
  * breaking 23 queries and 49 tests with one shared analysis error) must
  * fail HERE, as one named test per table/SF, instead of as dozens of
  * mysterious downstream failures.
  *
  * Every loader must (a) resolve + yield rows and (b) expose the columns
  * downstream queries key on; `events.ts` must arrive as a session-zoned
  * TIMESTAMP at every SF regardless of the physical shape on disk (the
  * adaptive dispatch in [[Tables.events]]).
  */
class TestdataShapeSpec extends SparkSpec {
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  private val loaders: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame, Seq[String])] = Seq(
    ("lineitem", Tables.lineitem _, Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")),
    ("orders", Tables.orders _, Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")),
    ("customer", Tables.customer _, Seq("c_custkey", "c_nationkey")),
    ("supplier", Tables.supplier _, Seq("s_suppkey", "s_nationkey")),
    ("part", Tables.part _, Seq("p_partkey")),
    ("nation", Tables.nation _, Seq("n_nationkey", "n_regionkey", "n_name")),
    ("region", Tables.region _, Seq("r_regionkey", "r_name")),
    ("events", Tables.events _, Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
    ("documents", Tables.documents _, Seq("doc_id", "text", "lang", "source", "n_chars")),
    ("embeddings", Tables.embeddings _, Seq("vec_id", "embedding", "label"))
  )

  for (sf <- sfs; (name, load, cols) <- loaders)
    test(s"canary: $name resolves with expected columns at $sf") {
      graft.GraftSession.init(spark)
      val df = load(spark, sf)
      val have = df.columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"$name at $sf missing columns: $missing (have: $have)")
      // one action proves the read path end-to-end (footer + first batch)
      assert(df.limit(1).count() == 1L, s"$name at $sf is empty")
    }

  for (sf <- sfs)
    test(s"canary: events.ts is TimestampType after adaptive load at $sf") {
      graft.GraftSession.init(spark)
      val dt = Tables.events(spark, sf).schema("ts").dataType
      assert(dt == TimestampType,
        s"events.ts loaded as $dt at $sf — Tables.events dispatch needs a new case")
    }

  test("adaptive events loader: legacy nanos-as-long branch converts exactly") {
    // the branch real testdata no longer exercises (pre-r7 generations
    // shipped TIMESTAMP(NANOS), read as raw longs under nanosAsLong):
    // synthesize a long-typed ts and assert the floor-division conversion
    graft.GraftSession.init(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    val nanos = Seq(
      (1L, 1700000000123456789L), // 1700000000.123456 s + 789 ns (floored)
      (2L, 999L),                 // sub-microsecond → epoch
      (3L, 0L))
    nanos.toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    val us = got.selectExpr("event_id", "unix_micros(ts)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(us == Map(1L -> 1700000000123456L, 2L -> 0L, 3L -> 0L), s"got $us")
  }
}
