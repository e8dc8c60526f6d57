package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}
import graft.search.VectorSearch

class SearchPipelineSpec extends AnyFunSuite {
  import TestSpark._

  lazy val emb = Tables.embeddings(spark, sf).cache()
  lazy val docs = Tables.documents(spark, sf).cache()

  test("fast brute-force cosine ranking matches exact-decimal ranking") {
    val fast = VectorSearch.bruteTopK(emb, emb.filter(col("vec_id") === 0L), 11)
      .collect().map(_.getLong(0)).filterNot(_ == 0L).take(10)
    val exact = VectorSearch.bruteTopKExact(emb, 0L, 10)
      .collect().map(_.getLong(0))
    assert(fast.toSeq == exact.toSeq)
  }

  test("LSH ANN results are a subset of the corpus with sane scores; recall@10 vs brute >= 0.3") {
    val ann = VectorSearch.annTopK(emb, 0L, 10, nBits = 4, nTables = 6).collect()
    val brute = VectorSearch.bruteTopKExact(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(ann.nonEmpty)
    val recall = ann.map(_.getLong(0)).count(brute.contains).toDouble / brute.size
    assert(recall >= 0.3, s"recall@10 = $recall") // 4-bit buckets: coarse but useful
  }

  test("IVF with nProbe == nLists is exactly brute force; partial probe keeps recall") {
    val exhaustive = VectorSearch.ivfTopK(emb, 0L, 10, nLists = 8, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    val brute = VectorSearch.bruteTopK(emb, emb.filter(col("vec_id") === 0L), 11)
      .collect().map(_.getLong(0)).filterNot(_ == 0L).take(10).toSeq
    assert(exhaustive == brute)
    val partial = VectorSearch.ivfTopK(emb, 0L, 10, nLists = 8, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = partial.count(brute.toSet.contains).toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@10 = $recall")
  }

  test("IVF eval harness reports sane macro metrics") {
    val m = graft.search.Eval.ivfVsBrute(spark, emb, 10, 10, 8, 4).collect().head
    val recall = m.getAs[Double]("recall_at_k")
    val ndcg = m.getAs[Double]("ndcg_at_k")
    assert(recall > 0.2 && recall <= 1.0, s"ivf recall=$recall")
    assert(ndcg > 0.2 && ndcg <= 1.0, s"ivf ndcg=$ndcg")
  }

  test("embedding near-dup plans an equi-join, not a BroadcastNestedLoopJoin") {
    for (df <- Seq(Dedup.embeddingNearDups(emb, 0.35, 300L),
                   Dedup.embeddingNearDupsLsh(emb, 0.35, 300L))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop"), s"all-pairs join in plan:\n$plan")
    }
  }

  test("LSH embedding near-dup: subset of exact pairs, recall >= 0.85 at test threshold") {
    val exact = Dedup.embeddingNearDups(emb, 0.35, 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupsLsh(emb, 0.35, 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    val recall = lsh.size.toDouble / exact.size
    // 0.35 cosine is the near-orthogonal regime — 0.85+ is what 4x16 LSH
    // buys there (it is lossless-ish at production thresholds >= 0.8)
    assert(recall >= 0.85, s"recall = $recall (${lsh.size}/${exact.size})")
  }

  test("blocked exact near-dup matches the single-block form for any block size") {
    val one = Dedup.embeddingNearDups(emb, 0.35, 300L, blockSize = 1024L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val many = Dedup.embeddingNearDups(emb, 0.35, 300L, blockSize = 37L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == many && one.nonEmpty)
  }

  test("HNSW tier: recall@10 >= 0.95 vs brute force, beating LSH at equal k") {
    val m = graft.search.Eval.hnswVsBrute(spark, emb, 20, 10).collect().head
    val recall = m.getAs[Double]("recall_at_k")
    val ndcg = m.getAs[Double]("ndcg_at_k")
    assert(recall >= 0.95, s"hnsw recall@10 = $recall")
    assert(ndcg >= 0.9, s"hnsw ndcg@10 = $ndcg")
    val lsh = graft.search.Eval.annVsBrute(spark, emb, 20, 10, 4, 8)
      .collect().head.getAs[Double]("recall_at_k")
    assert(recall > lsh, s"hnsw ($recall) should beat lsh ($lsh)")
  }

  test("HNSW single-query top-k matches brute-force ranking on a single partition") {
    val one = emb.coalesce(1)
    val hnsw = graft.search.Hnsw.hnswTopK(one, 0L, 10, efS = 500)
      .collect().map(_.getLong(0)).toSeq
    val brute = VectorSearch.bruteTopK(emb, emb.filter(col("vec_id") === 0L), 11)
      .collect().map(_.getLong(0)).filterNot(_ == 0L).take(10).toSeq
    assert(hnsw == brute) // efS >= corpus ⇒ exhaustive ⇒ exact
  }

  test("HNSW adjacency is serializable and degree-bounded by 2M") {
    val adj = graft.search.Hnsw.hnswIndex(emb, m = 16).cache()
    assert(adj.count() > 0)
    val maxDeg = adj.agg(max(size(col("neighbors")))).collect().head.getInt(0)
    assert(maxDeg <= 32, s"layer-0 degree cap 2M=32, got $maxDeg")
    // every vector appears at level 0
    assert(adj.filter(col("level") === 0).select("vec_id").distinct().count() ==
      emb.count())
  }

  test("minhash LSH finds the exact-duplicate pairs (jaccard 1.0)") {
    val exactPairs = Dedup.ngramJaccardPairs(docs, 3, 0.999, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Dedup.minhashLshPairs(docs, 3, 16, 4, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs have identical signatures → every exact dup must be found
    assert(exactPairs.subsetOf(lshPairs),
      s"missed: ${exactPairs.diff(lshPairs)}")
  }

  test("murmur3 minhash tier returns the same verified pairs as the md5 tier") {
    val md5Pairs = Dedup.minhashLshPairs(docs, 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fastPairs = Dedup.minhashLshPairsFast(docs, 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact-Jaccard verify makes the pair set hash-family-independent
    // up to candidate recall; at this threshold/banding both recall fully
    assert(md5Pairs == fastPairs,
      s"md5-only: ${md5Pairs.diff(fastPairs)}, fast-only: ${fastPairs.diff(md5Pairs)}")
  }

  test("simhash gives identical fingerprints for identical docs") {
    val sig = Dedup.simhash(docs)
    val joined = docs.toDF("id1", "t1", "l1", "s1", "n1")
      .join(docs.toDF("id2", "t2", "l2", "s2", "n2"),
        col("t1") === col("t2") && col("id1") < col("id2"))
      .select("id1", "id2")
    val sigMap = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    joined.collect().foreach { r =>
      assert(sigMap(r.getLong(0)) == sigMap(r.getLong(1)))
    }
  }

  test("fingerprint is deterministic across runs") {
    val a = TextAnalysis.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = TextAnalysis.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("multimodal feature extraction preserves row count and byte lengths") {
    import graft.operators.Multimodal
    val feats = Multimodal.extractFeatures(Multimodal.withPayload(docs))
    assert(feats.count() == docs.count())
    val row = feats.orderBy("doc_id").collect().head
    val text = docs.orderBy("doc_id").collect().head.getAs[String]("text")
    assert(row.getInt(1) == text.getBytes("UTF-8").length)
  }

  test("metric-parameterized top-k: dot/euclidean/cosine rank consistently") {
    import graft.search.VectorSearch
    val emb = Tables.embeddings(spark, sf)
    val dup = emb.filter(col("vec_id") === 0L)
      .withColumn("vec_id", lit(990000L)) // exact duplicate of the query vector
    val withDup = emb.unionByName(dup)
    // a duplicate vector is the top hit under every metric; euclidean
    // scores land in (0, 1] with the duplicate at exactly 1
    for (m <- Seq("cosine", "dot", "euclidean")) {
      val top = VectorSearch.bruteTopKMetric(withDup, 0L, 3, m).collect()
      assert(top.head.getLong(0) == 990000L, s"metric $m")
    }
    val eu = VectorSearch.bruteTopKMetric(withDup, 0L, 3, "euclidean").collect()
    assert(eu.head.getDouble(1) == 1.0)
    assert(eu.forall(r => r.getDouble(1) > 0 && r.getDouble(1) <= 1.0))
  }

  test("ANN verdict rows: every registry quality floor passes at sf0.001") {
    val names = Seq("q_eval_ann_quality", "q_eval_ivf_quality",
      "q_eval_hnsw_quality", "q_vector_ann_ivf", "q_vector_ann_hnsw")
    names.foreach { n =>
      val rows = QueryRegistry.queryFns(n)(spark, sf).collect()
      assert(rows.nonEmpty, n)
      rows.foreach { r =>
        assert(r.getBoolean(r.fieldIndex("pass")),
          s"$n: ${r.getString(r.fieldIndex("metric"))} below its floor")
      }
    }
  }
}
