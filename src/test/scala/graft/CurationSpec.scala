package graft

import org.apache.spark.sql.functions._

import graft.queries.CurationQueries

/** Contract specs for the dataset-assembly operators (CurationQueries):
  * the properties that make each one trustworthy in a pipeline, beyond
  * the oracle's value equality.
  */
class CurationSpec extends GraftSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = CurationQueries.queries(name)(spark, sf)

  test("docs_sample is reproducible and a subset of docs_split's train universe") {
    val a = run("docs_sample").collect().map(_.getLong(0)).sorted
    val b = run("docs_sample").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "hash sampling must be re-run-identical")
    val n = Tables.documents(spark, sf).count()
    assert(a.length > 0 && a.length < n, "sample must be a proper subset")
    // ~10% with slack for the small gate corpus
    assert(math.abs(a.length.toDouble / n - 0.10) < 0.06)
  }

  test("docs_split: assignment is a pure function of doc_id (stable under corpus growth)") {
    val full = run("docs_split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // recompute on an arbitrary half of the corpus: every doc must keep
    // the split it had on the full corpus — the property random splits lack
    val half = CurationQueries.queries("docs_split")(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    half.foreach { case (id, s) => assert(full(id) === s) }
    val bySplit = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("docs_decontaminate: no survivor shares a word 3-gram with the benchmark slice") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), w => w =!= "").as("w"))
      .select(col("doc_id"),
        when(size(col("w")) >= 3,
          transform(sequence(lit(1), size(col("w")) - 2),
            i => concat_ws(" ", element_at(col("w"), i),
              element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
          .otherwise(array().cast("array<string>")).as("g"))
    val benchGrams = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(col("g")).as("g")).distinct()
      .as[String].collect().toSet
    val survivors = run("docs_decontaminate").collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty)
    val survivorGrams = docs.filter(col("doc_id").isin(survivors.toSeq: _*))
      .select(explode(col("g")).as("g")).as[String].collect().toSet
    assert(survivorGrams.intersect(benchGrams).isEmpty,
      "a surviving doc still shares an n-gram with the benchmark set")
    // and the filter must not be vacuous: something was removed
    val train = docs.filter(col("doc_id") % 97 =!= 0).count()
    assert(survivors.size < train, "decontamination removed nothing")
  }

  test("docs_decontaminate_bloom: never a false negative; false positives forced and measured at a small m") {
    // The Bloom contract has two halves. (1) NO FALSE NEGATIVES at ANY
    // geometry: an exact-contaminated gram is in the reference set, so
    // its probes are all set by construction — bloom-kept must be a
    // subset of exact-kept. (2) FALSE POSITIVES are the geometry trade:
    // at the registered m = 2^20 the gate corpus measures zero (the
    // two keep sets are equal — asserted, since the arithmetic is
    // deterministic on a fixed corpus), so shrink m to 2^14 where
    // ~1.1k set bits in 16k positions force probe collisions,
    // re-assert half (1), and record the measured over-drop rate.
    val exactKept = run("docs_decontaminate").collect()
      .map(_.getLong(0)).toSet
    val bloomKept = run("docs_decontaminate_bloom").collect()
      .map(_.getLong(0)).toSet
    assert(bloomKept.subsetOf(exactKept),
      "bloom dropped fewer docs than the exact filter — a false negative")
    info(s"registered m=2^20: exact kept ${exactKept.size}, bloom kept " +
      s"${bloomKept.size} (${exactKept.size - bloomKept.size} false positives)")
    assert(bloomKept === exactKept,
      "the registered geometry must measure zero false positives here")
    val smallKept = graft.queries.CurationQueries
      .decontaminateBloom(spark, sf, m = 1L << 14)
      .collect().map(_.getLong(0)).toSet
    assert(smallKept.subsetOf(exactKept),
      "false negative at the small geometry")
    val fp = exactKept.size - smallKept.size
    info(s"m=2^14: bloom kept ${smallKept.size}, false positives $fp " +
      f"(rate ${fp.toDouble / exactKept.size}%.4f)")
    assert(fp > 0,
      "the small geometry must force measurable false positives")
  }

  test("plan shapes: sample/split shuffle-free; pack shuffles once, by shard") {
    // AQE wraps the plan before exchanges materialize; plan the queries
    // with it off (same device as PartitioningSpec) so the exchange
    // count is inspectable
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def exchanges(name: String): Seq[String] =
        run(name).queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.outputPartitioning.toString
        }
      // membership is a pure function of doc_id — any exchange here would
      // mean the 100 TB scan acquired a shuffle it never needs
      assert(exchanges("docs_sample").isEmpty)
      assert(exchanges("docs_split").isEmpty)
      // packing needs exactly one hash exchange on the shard key; the
      // corpus-scaled shard count adds a one-row-per-partition
      // SinglePartition exchange for the token-total scalar (bounded by
      // partition count, never by data) and nothing else
      val packEx = exchanges("docs_pack")
      assert(packEx.count(_.contains("shard")) === 1)
      assert(packEx.filterNot(_.contains("shard"))
        .forall(_.contains("SinglePartition")))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("dedup_chunks keeps the globally-first occurrence of a shared passage") {
    import spark.implicits._
    // two docs open with the SAME 32-word boilerplate (one aligned
    // chunk), then diverge; a third is fully distinct — the shape
    // whole-doc dedup cannot catch (all three doc fingerprints differ)
    val shared = (1 to 32).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (5L, s"$shared alpha beta gamma"),
      (9L, s"$shared delta epsilon"),
      (7L, (1 to 40).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = tmpDir("dedup-chunks")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.queries("dedup_chunks")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // every doc has 2 chunks; the shared opening survives ONCE, under
    // the smaller (doc_id, chunk_id): (5, 0) with 2 displaced copies
    assert(out.length === 5)
    assert(out.filter(_._3 > 1L).toSeq === Seq((5L, 0L, 2L)))
    assert(!out.exists(r => r._1 === 9L && r._2 === 0L),
      "the later copy of the shared chunk must be dropped")
  }

  test("dedup_cdc_chunks: content-defined boundaries are shift-robust; stride chunks are not") {
    import spark.implicits._
    // A long deterministic word stream, then the SAME stream with two
    // words PREPENDED — the edit every fixed-stride chunker loses
    // everything to.
    val words = (0 until 400).map(i => s"w${(i * 37 + 11) % 997}x$i")
    val orig = words.mkString(" ")
    val shifted = "alpha beta " + orig
    def cdcFps(text: String): Set[String] =
      CurationQueries.cdcChunkRows(Seq((1L, text)).toDF("doc_id", "text"))
        .select(col("chunk_fp")).collect().map(_.getString(0)).toSet
    val a = cdcFps(orig)
    val b = cdcFps(shifted)
    assert(a.size > 5, s"expected several CDC chunks, got ${a.size}")
    // locality: the prepended words only disturb the FIRST chunk (they
    // merge into it up to its boundary); every later chunk re-aligns
    assert((a -- b).size <= 1,
      s"CDC must lose at most the first chunk to a prefix edit, lost ${(a -- b).size}")
    // contrast: fixed-stride chunking loses (nearly) every fingerprint
    // to the same two-word prefix — the failure mode CDC exists to fix
    def strideFps(text: String): Set[String] =
      CurationQueries.chunkRows(Seq((1L, text)).toDF("doc_id", "text"))
        .select(col("chunk_fp")).collect().map(_.getString(0)).toSet
    val sa = strideFps(orig)
    val sb = strideFps(shifted)
    assert((sa -- sb).size > sa.size / 2,
      "fixed-stride chunks should mostly NOT survive a prefix edit")
    // chunk ids are dense per doc and chunks tile the word stream
    val rows = CurationQueries.cdcChunkRows(Seq((1L, orig)).toDF("doc_id", "text"))
      .select(col("cid"), col("n_words")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === rows.indices.map(_.toLong))
    assert(rows.map(_._2).sum === 400L, "chunks must tile every word exactly once")
  }

  test("docs_mixture: per-language weights hold exactly and copies are contiguous") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byLang = docs.groupBy(_._2).view.mapValues(_.size).toMap
    val rows = run("docs_mixture").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mixByLang = rows.groupBy(_._2).view.mapValues(_.size).toMap
    // integral weights are exact: es doubles, unweighted langs unchanged
    assert(mixByLang("es") === 2 * byLang("es"))
    for (l <- byLang.keySet -- Set("en", "es"))
      assert(mixByLang(l) === byLang(l))
    // the fractional 0.5 weight halves en via the hash slice — exact
    // count is corpus-dependent, but it must be a strict downsample
    val en = mixByLang.getOrElse("en", 0)
    assert(en > 0 && en < byLang("en"))
    // copy indices are 1..copies per doc (no gaps, no dups)
    rows.groupBy(_._1).values.foreach { copies =>
      assert(copies.map(_._3).sorted.sameElements(1L to copies.length))
    }
    // and the mixture is reproducible
    assert(run("docs_mixture").count() === rows.length)
  }

  test("docs_stratified_sample: min(k, stratum size) docs per language, reproducible") {
    val byLang = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("docs_stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sampled = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(sampled.keySet === byLang.keySet, "every language represented")
    for ((lang, ids) <- sampled) {
      assert(ids.size === math.min(25L, byLang(lang)), s"stratum $lang size")
    }
    // ranks are 1..k dense per language and the sample is re-run-identical
    rows.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length))
    }
    val again = run("docs_stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again === rows.toSet)
  }

  test("docs_chunk: windows tile every document with the declared geometry") {
    val (c, s) = (32, 24) // ChunkWords / ChunkStride
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), w => w =!= "")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = run("docs_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, rows) =>
      val len = lens(id)
      val expectN = if (len <= c) 1L else 1L + (len - c + s - 1) / s
      assert(rows.length === expectN, s"doc $id chunk count")
      assert(rows.map(_._2).sorted.sameElements(0L until expectN))
      rows.sortBy(_._2).foreach { case (_, k, nWords) =>
        // each chunk holds C words, except a short tail; starts tile by S
        val expectWords = math.min(c.toLong, len - k * s)
        assert(nWords === expectWords, s"doc $id chunk $k width")
      }
    }
    // docs with at least one word all chunked
    assert(chunks.map(_._1).distinct.length === lens.count(_._2 > 0))
  }

  test("docs_interleave: positions are unique and each round-robin cycle mixes sources") {
    val rows = run("docs_interleave").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = Tables.documents(spark, sf).count()
    assert(rows.length === n, "interleave must keep every doc")
    val positions = rows.map(_._3)
    assert(positions.distinct.length === rows.length, "positions must be unique")
    assert(positions.min === 0L)
    // within each POSITIONAL cycle [c*nsrc, (c+1)*nsrc) no source
    // repeats — the anti-ordering-bias property the operator exists
    // for. Group by pos div nsrc, not by consecutive rows: under
    // unbalanced sources exhausted sources leave positional gaps and
    // row-chunking would misalign the cycles.
    val nsrc = rows.map(_._2).distinct.length
    rows.groupBy(_._3 / nsrc).foreach { case (c, cycle) =>
      val srcs = cycle.map(_._2)
      assert(srcs.distinct.length === srcs.length,
        s"cycle $c repeats a source: ${srcs.toSeq}")
    }
    // reproducible: a second run yields the identical order
    val again = run("docs_interleave").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("docs_pack: bin ids equal the sequential greedy fill per shard") {
    val rows = run("docs_pack").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._2).foreach { case (_, _, n, bin) =>
        assert(bin === cum / graft.queries.CurationQueries.PackBudget,
          "bin must be tokens-before-this-doc div budget")
        cum += n
      }
    }
    // bins are non-decreasing in doc order, so packing is streamable
    assert(rows.nonEmpty)
  }

  test("docs_curation_e2e_kmeans: every stage binds, budgets are cut not re-counted, pack fill is greedy") {
    val out = run("docs_curation_e2e_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "composite must keep a non-empty training set")
    val survivors = out.map(_._1).toSet
    // stage containment: survivors pass EVERY stage's own keep set
    val cur = graft.queries.TextQueries.queries("docs_curation")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val semDropped = graft.queries.VectorQueries
      .queries("dedup_semdedup_kmeans")(spark, sf)
      .filter(col("kept") === 0L).collect().map(_.getLong(0)).toSet
    val dec = run("docs_decontaminate").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(cur.keySet), "must pass the curation gate")
    assert(survivors.intersect(semDropped).isEmpty,
      "no semantic duplicate may survive")
    assert(survivors.subsetOf(dec), "must pass decontamination")
    // the chain IS the intersection — no stage silently unioned away
    assert(survivors === cur.keySet.diff(semDropped).intersect(dec))
    // each non-curation stage binds on this corpus (drops something
    // the others kept) — the composite is not a re-label of one stage
    assert(cur.keySet.intersect(semDropped).nonEmpty, "semdedup must bind")
    assert(cur.keySet.diff(dec).nonEmpty, "decontamination must bind")
    // token budgets: kept_tokens = gate n_tokens minus ExactSubstr
    // dup_tokens (never negative, never above the raw count)
    val spans = graft.queries.TextQueries
      .queries("dedup_substring_spans")(spark, sf)
      .select(col("doc_id"), col("dup_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, _, keptTok, _) =>
      assert(keptTok === cur(id) - spans.getOrElse(id, 0L))
      assert(keptTok >= 0L && keptTok <= cur(id))
    }
    assert(out.exists { case (id, _, _, _) => spans.contains(id) },
      "at least one survivor must have been span-cut")
    // pack face: greedy sequential fill per shard over KEPT tokens
    out.groupBy(_._2).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._1).foreach { case (_, _, n, bin) =>
        assert(bin === cum / graft.queries.CurationQueries.PackBudget)
        cum += n
      }
    }
  }
}
