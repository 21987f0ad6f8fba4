package graft.ops

import graft.SparkSpec

/** Semantic + plan-shape guards for the corpus-preparation ops. Exact
  * values are the DuckDB oracle gate's job; these assert the invariants
  * the oracle can't express (plan shape, cross-row properties). */
class CorpusOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("decontaminate: eval docs excluded, overlaps bounded by shingle count") {
    val rows = CorpusOps.decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 != 0, s"eval doc ${r.getLong(0)} in output")
      assert(r.getLong(2) <= r.getLong(1), "n_hit exceeds n_sh")
    }
  }

  test("decontaminate: eval shingle set is broadcast, train side not shuffled to the join") {
    val p = CorpusOps.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n${p.take(1500)}")
  }

  test("seq_pack: per-source offsets are a gapless token layout") {
    val rows = CorpusOps.seqPack(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._2)
      var expectStart = 0L
      ordered.foreach { case (_, _, nTok, start) =>
        assert(start == expectStart, s"gap: start=$start expected=$expectStart")
        expectStart += nTok
      }
    }
    CorpusOps.seqPack(spark, sf).collect().foreach { r =>
      assert(r.getLong(5) >= 0 && r.getLong(5) < CorpusOps.SeqBudget)
      assert(r.getLong(4) == r.getLong(3) / CorpusOps.SeqBudget)
    }
  }

  test("seq_pack_global: two-phase prefix sum equals the global concat order") {
    val rows = CorpusOps.seqPackGlobal(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    // replay the single global window (source, doc_id) on the driver
    var running = 0L
    rows.sortBy(t => (t._1, t._2)).foreach { case (_, id, nTok, start) =>
      assert(start == running, s"doc $id start=$start expected=$running")
      running += nTok
    }
    // the corpus-side window must stay partitioned by source; only the
    // shard-totals relation may hit a single partition
    val p = CorpusOps.seqPackGlobal(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "shard bases not broadcast")
  }

  test("stratified sample: kept buckets honor per-language rates, deterministic") {
    val rates = Map("en" -> 80, "fr" -> 50, "es" -> 30, "de" -> 20)
    val a = CorpusOps.stratifiedSample(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val rate = rates.getOrElse(r.getString(1), 10)
      assert(r.getLong(2) < rate, s"doc ${r.getLong(0)} bucket ${r.getLong(2)} >= $rate")
    }
    val b = CorpusOps.stratifiedSample(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq, "sample not deterministic")
  }

  test("stratified sample plans no shuffle before the filter") {
    // narrow filter: the only exchange allowed is the final orderBy's
    val p = CorpusOps.stratifiedSample(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllMatchIn(p).size
    assert(exchanges <= 1, s"unexpected shuffles:\n${p.take(1500)}")
  }

  test("rarity: min_df <= mean_df, df table broadcast onto token rows") {
    val rows = CorpusOps.rarity(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(4).toDouble <= r.getDouble(3) + 1e-9,
        s"min_df ${r.getLong(4)} > mean_df ${r.getDouble(3)}")
    }
    val p = CorpusOps.rarity(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"df table not broadcast:\n${p.take(1500)}")
  }

  test("exportTrainingShards: deduped, gapless per-shard packing, manifest consistent") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toFile
      .getAbsolutePath + "/corpus"
    val manifest = CorpusOps.exportTrainingShards(spark, sf, out, shards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(manifest.length == 4, s"expected 4 shards, got ${manifest.length}")
    val back = spark.read.parquet(out)
    // dedup: no text appears twice anywhere in the export
    assert(back.count() == back.select("text").distinct().count())
    // packing: within each shard, start_tok is the gapless running sum
    val rows = back.select("shard", "doc_id", "n_tokens", "start_tok")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (_, docs) =>
      var expect = 0L
      docs.sortBy(_._2).foreach { case (_, id, nTok, start) =>
        assert(start == expect, s"doc $id: start=$start expected=$expect")
        expect += nTok
      }
    }
    // manifest totals equal the written data
    manifest.foreach { case (shard, nDocs, nToks, nSeqs) =>
      val inShard = rows(shard)
      assert(nDocs == inShard.length)
      val total = inShard.map(_._3).sum
      assert(nToks == total)
      // the loader chunks ceil(total/budget) windows — independently
      // re-derived from the token total, not from seq_id
      assert(nSeqs == (total + CorpusOps.SeqBudget - 1) / CorpusOps.SeqBudget)
    }
  }

  test("exportTrainingShards manifest invariants hold over random corpora (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // doc sizes around the 20-token gate, with forced duplicate texts so
    // both the gate and the dedup interact with the packing
    val corpusGen = for {
      n <- Gen.choose(5, 40)
      sizes <- Gen.listOfN(n, Gen.choose(1, 300))
      dups <- Gen.listOfN(n, Gen.oneOf(true, false, false))
    } yield sizes.zip(dups)
    val prop = Prop.forAll(corpusGen) { spec =>
      // duplicates clone the previous doc's text VERBATIM (fold keeps the
      // actual text, not just its size, so the dedup branch really fires)
      val docs = spec.zipWithIndex
        .foldLeft(Vector.empty[(Long, String)]) { case (acc, ((k, dup), i)) =>
          val text = if (dup && acc.nonEmpty) acc.last._2
            else Seq.fill(k)(s"w$i").mkString(" ")
          acc :+ (i.toLong, text)
        }
      val dir = java.nio.file.Files.createTempDirectory("graft_prop").toFile
        .getAbsolutePath
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val manifest = CorpusOps
        .exportTrainingShards(spark, dir, s"$dir/out", shards = 3)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val back = spark.read.parquet(s"$dir/out")
        .select("shard", "doc_id", "n_tokens", "start_tok", "seq_id")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val expectKept = docs.filter(_._2.split(" ").length >= 20)
        .groupBy(_._2).map(_._2.map(_._1).min).toSet
      val keptOk = back.map(_._2).toSet == expectKept
      val gapless = back.groupBy(_._1).forall { case (_, rows) =>
        rows.sortBy(_._2).foldLeft((true, 0L)) { case ((ok, at), r) =>
          (ok && r._4 == at && r._5 == at / CorpusOps.SeqBudget, at + r._3)
        }._1
      }
      val manifestOk = manifest.forall { case (shard, nDocs, nToks, nSeqs) =>
        val rows = back.filter(_._1 == shard)
        nDocs == rows.length && nToks == rows.map(_._3).sum &&
          nSeqs == (nToks + CorpusOps.SeqBudget - 1) / CorpusOps.SeqBudget
      }
      keptOk && gapless && manifestOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("gumbel sample: k rows, key = scaled logw + noise, weight-tilted, deterministic") {
    val rows = CorpusOps.gumbelSample(spark, sf).collect()
    assert(rows.length == 50, s"expected K=50 sampled docs, got ${rows.length}")
    // ranks are 1..K in strictly descending key order
    assert(rows.map(_.getLong(0)).toSeq == (1L to 50L),
      "ranks are not 1..K in order")
    val keys = rows.map(_.getLong(6))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b },
      "samp_key not non-increasing down the ranks")
    // the key decomposes exactly: samp_key = round(logw*1e9) + round(gumbel*1e9)
    rows.foreach { r =>
      val sl = math.round(r.getDouble(4) * 1e9)
      val gs = math.round(r.getDouble(5) * 1e9)
      assert(sl + gs == r.getLong(6),
        s"doc ${r.getLong(1)}: key ${r.getLong(6)} != $sl + $gs")
    }
    // sampling ∝ exp(logw) must tilt the sample's mean logw above the
    // corpus mean (500 docs, 50 drawn — astronomically unlikely to fail
    // by chance if the keys actually use the weights)
    val corpusMean = CorpusOps.dsirWeights(spark, sf)
      .agg(org.apache.spark.sql.functions.avg("dsir_logw")).head.getDouble(0)
    val sampleMean = rows.map(_.getDouble(4)).sum / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean logw $sampleMean not above corpus mean $corpusMean")
    // hash-derived noise: a second run is bit-identical
    val again = CorpusOps.gumbelSample(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "resample is not deterministic")
  }

  test("length buckets: caps are powers of two, docs fit, totals reconcile") {
    val rows = CorpusOps.lengthBuckets(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cap, nDocs, sumTok, pad) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert((cap & (cap - 1)) == 0 && cap >= 1, s"cap $cap not a power of 2")
      assert(pad == cap * nDocs - sumTok && pad >= 0)
      // every doc in the bucket exceeds the next cap down (else it would
      // have landed there): sum_tokens > (cap/2) * n_docs
      if (cap > 1) assert(sumTok > (cap / 2) * nDocs,
        s"bucket $cap holds docs that fit a smaller cap")
      assert(math.abs(r.getDouble(4) - pad.toDouble / (cap * nDocs)) == 0.0)
    }
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total, "bucket doc counts != corpus")
  }

  test("pii scrub: deny-list terms are gone from clean_text, counts match") {
    val rows = CorpusOps.piiScrub(spark, sf).collect()
    assert(rows.exists(_.getLong(3) > 0), "no deny-list hits in test corpus")
    rows.foreach { r =>
      assert(!r.getString(4).contains("customer"),
        s"doc ${r.getLong(0)} still contains the deny term")
      if (r.getLong(3) > 0)
        assert(r.getString(4).contains("[REDACTED]"))
    }
  }
}
