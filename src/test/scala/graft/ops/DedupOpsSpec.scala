package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different content about spark engines"),
    (5L, "  the  quick   brown fox jumps over the lazy dog ") // ws-normalized dup
  ).toDF("doc_id", "text")

  test("exactDedup keeps the lowest id per normalized key") {
    val kept = DedupOps.exactDedup(
      docs, "doc_id", concat_ws(" ", TextOps.tokens(lower($"text"))))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("wordShingles produces k-grams; short docs produce none") {
    val sh = Seq((1L, "a b c d"), (2L, "a b"))
      .toDF("id", "t")
      .select($"id", DedupOps.wordShingles($"t", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty)
  }

  test("ngramJaccardPairs computes exact jaccard and respects the threshold") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    // identical docs (1,2), (1,5), (2,5): jaccard 1.0
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs((2L, 5L)) == 1.0)
    // 7 shingles each, 5 shared (positions before/after lazy->sleepy):
    // J = 5 / (7 + 7 - 5) = 5/9
    assert(math.abs(pairs((1L, 3L)) - 5.0 / 9) < 1e-15)
    assert(!pairs.contains((1L, 4L)))
  }

  test("containmentPairs flags a short doc quoted inside a long one") {
    val quoteDocs = Seq(
      (1L, "alpha beta gamma delta"), // 2 3-shingles, both inside doc 2
      (2L, "intro words alpha beta gamma delta and a long tail of extra content here"),
      (3L, "totally unrelated text about other things entirely now")
    ).toDF("doc_id", "text")
    val out = DedupOps.containmentPairs(quoteDocs, "doc_id", "text", 3, 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5)))
      .toMap
    // doc 1's shingle set is wholly inside doc 2: containment 1.0
    assert(out((1L, 2L)) == ((2L, 1.0)))
    assert(out.size == 1)
    // same pair is INVISIBLE to jaccard at the same threshold (union-drowned)
    val j = DedupOps.ngramJaccardPairs(quoteDocs, "doc_id", "text", 3, 0.8)
      .collect()
    assert(j.isEmpty)
  }

  test("ngramJaccardAgainst pairs only across corpora, never within one") {
    val left = Seq((10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val right = Seq((1L, "the quick brown fox jumps over the sleepy dog"),
      (2L, "unrelated material entirely")).toDF("doc_id", "text")
    val pairs = DedupOps.ngramJaccardAgainst(left, right, "doc_id", "text",
      k = 3, threshold = 0.3)
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toSet
    // both (identical) left docs match right doc 1; 10-11 is NOT emitted
    assert(pairs == Set((10L, 1L), (11L, 1L)))
  }

  test("incrementalDedup drops exact and near matches of the corpus, keeps fresh docs") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "  THE quick   brown fox jumps over the lazy dog"), // exact (normalized)
      (11L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
      (12L, "genuinely novel material with no overlap at all"), // fresh
      (13L, "xy zw") // too short to shingle, not an exact dup -> fresh
    ).toDF("doc_id", "text")
    val kept = DedupOps.incrementalDedup(
      incoming, existing, "doc_id", "text",
      concat_ws(" ", TextOps.tokens(lower($"text"))), k = 3, threshold = 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 13L))
  }

  test("minhash LSH finds the exact and near dups with high probability") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 32)
    val cand = DedupOps.minhashLshCandidates(sigs, bands = 8, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical shingle sets -> identical signatures -> always candidates
    assert(cand.contains((1L, 2L)) && cand.contains((1L, 5L)) && cand.contains((2L, 5L)))
    // J=5/9 dup: P[detect] = 1-(1-(5/9)^4)^8 ~ 0.56; deterministic given
    // fixed hash seeds — assert the actual deterministic outcome
    assert(!cand.contains((1L, 4L)) && !cand.contains((3L, 4L)))
  }

  test("minhashLshCandidates hot-bucket cap bounds a planted duplicate cluster") {
    // 40 identical docs (one hot bucket per band) + 20 distinct docs
    val corpus = ((1L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta")) ++
      (101L to 120L).map(i =>
        (i, (1 to 10).map(j => s"w${(i * 17 + j * 31) % 97}").mkString(" "))))
      .toDF("doc_id", "text")
    val sigs = DedupOps.minhashSignatures(corpus, "doc_id", "text", 3, 32)
    val uncapped = DedupOps.minhashLshCandidates(sigs, 8, 4).count()
    val capped = DedupOps.minhashLshCandidates(sigs, 8, 4,
      maxBucketSize = Some(10L)).count()
    // uncapped: the 40-clone cluster alone contributes C(40,2) = 780 pairs
    assert(uncapped >= 780L, s"uncapped=$uncapped")
    // capped at 10: every clone bucket (size 40) drops; the distinct docs'
    // small buckets are untouched, so candidates collapse to the tail
    assert(capped < 780L / 2, s"capped=$capped should exclude the hot cluster")
    // and a cap ABOVE the cluster size changes nothing
    val loose = DedupOps.minhashLshCandidates(sigs, 8, 4,
      maxBucketSize = Some(1000L)).count()
    assert(loose == uncapped)
  }

  test("ShingleMinHash matches the exploded-index min(xxhash64(i, sh)) bit for bit") {
    val docsBig = (1L to 40L).map(i =>
      (i, (1 to (i % 7 + 3).toInt).map(j => s"tok${(i * 31 + j * 17) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val numHashes = 8
    val fast = DedupOps.minhashSignatures(docsBig, "doc_id", "text", k = 3, numHashes)
    // reference formulation: explode shingles, aggregate min per family
    val idx = DedupOps.shingleIndexHashed(docsBig, "doc_id", "text", k = 3)
    val aggs = (0 until numHashes).map(i => min(xxhash64(lit(i), $"sh")).as(s"mh_$i"))
    val slow = idx.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (1 to numHashes).map(r.getLong).toSeq).toMap
    val (f, s) = (toMap(fast), toMap(slow))
    assert(f.nonEmpty && f == s)
    // interpreted eval path (no codegen) agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val row = docsBig.filter($"doc_id" === 10L).select($"text").head().getString(0)
    val lit10 = Literal(
      new GenericArrayData(row.split(" ").map(UTF8String.fromString)),
      ArrayType(StringType))
    val viaEval = graft.expr.ShingleMinHash(lit10, 3, numHashes)
      .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
    assert(viaEval == f(10L))
  }

  test("minhashVerifiedPairs: exact jaccard on LSH candidates, high recall vs ngram truth") {
    val corpus = (1L to 60L).map { i =>
      val base = (1 to 12).map(j => s"w${(i * 13 + j * 7) % 40}").mkString(" ")
      // every third doc is a near-dup of its predecessor (one token changed)
      if (i % 3 == 0) (i, base.replaceFirst("w\\d+", "zzz"))
      else (i, base)
    }.toDF("doc_id", "text")
    // make ids 3k near-dup pairs with 3k-... build explicit dups instead:
    val docs = corpus.union(
      (101L to 120L).map(i => (i, corpus.filter($"doc_id" === (i - 100)).head().getString(1)))
        .toDF("doc_id", "text"))
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = DedupOps.minhashVerifiedPairs(docs, "doc_id", "text", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every reported pair is EXACT (jaccard matches ground truth bitwise)
    got.foreach { case (pair, jac) => assert(truth(pair) == jac, s"pair $pair") }
    // LSH recall follows the S-curve 1-(1-J^rows)^bands: ~0.4 at J=0.5,
    // >0.999 at J>=0.9 — assert where the algorithm makes promises
    val high = truth.filter(_._2 >= 0.9).keySet
    assert(high.nonEmpty && high.subsetOf(got.keySet),
      s"missed high-similarity pairs: ${high -- got.keySet}")
    val mid = truth.filter(_._2 >= 0.7).keySet
    val midRecall = (mid & got.keySet).size.toDouble / math.max(mid.size, 1)
    assert(midRecall >= 0.9, s"J>=0.7 recall $midRecall")
  }

  test("portable minhash: exact pairs, high recall, layout-invariant") {
    val docs = (1L to 60L).map { i =>
      val base = (1 to 12).map(j => s"w${(i * 13 + j * 7) % 40}").mkString(" ")
      if (i % 3 == 0) (i, base.replaceFirst("w\\d+", "zzz")) else (i, base)
    }.toDF("doc_id", "text")
      .union((101L to 115L).map(i =>
        (i, (1 to 12).map(j => s"w${((i - 100) * 13 + j * 7) % 40}").mkString(" ")))
        .toDF("doc_id", "text"))
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = DedupOps.portableMinhashVerifiedPairs(docs, "doc_id", "text", 3, 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every reported pair is EXACT (md5-hash-set jaccard == string-set
    // jaccard: distinct-set sizes survive the 60-bit hashing)
    got.foreach { case (pair, jac) => assert(truth(pair) == jac, s"pair $pair") }
    val high = truth.filter(_._2 >= 0.9).keySet
    assert(high.nonEmpty && high.subsetOf(got.keySet),
      s"missed high-similarity pairs: ${high -- got.keySet}")
    // layout invariance: same pairs from a different partitioning
    val rep = DedupOps.portableMinhashVerifiedPairs(
      docs.repartition(7), "doc_id", "text", 3, 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rep == got.keySet)
  }

  test("minhash signature of identical sets is identical; similar sets collide more") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 32)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).toVector).toMap
    assert(sigs(1L) == sigs(2L) && sigs(1L) == sigs(5L))
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    val agree14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(agree13 > agree14) // minhash agreement tracks jaccard
  }

  test("portable simhash: 60-bit signature, same invariants as production") {
    val sh = DedupOps.portableSimhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.values.forall(s => s >= 0 && s < (1L << 60)), "60-bit range")
    assert(sh(1L) == sh(2L) && sh(1L) == sh(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("simhash: identical docs equal; near dups closer than unrelated") {
    val sh = DedupOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L) && sh(1L) == sh(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("simhashNearDupPairs == naive all-pairs Hamming predicate; no cartesian") {
    val corpus = (1L to 80L).map { i =>
      // clusters of 4 near-identical docs (i/4 shares a base, position
      // i%4 perturbs one token) + loose tails
      val base = (1 to 14).map(j => s"t${(i / 4 * 11 + j * 5) % 60}")
      val doc = base.updated(3, s"p${i % 4}").mkString(" ")
      (i, doc)
    }.toDF("doc_id", "text")
    val sigs = DedupOps.portableSimhash(corpus, "doc_id", "text")
    val r = 5
    val naive = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        DedupOps.hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .filter(col("hamming") <= r)
      .collect().map(_.toString).sorted.toSeq
    assert(naive.nonEmpty, "planted clusters must produce near pairs")
    val chunked = DedupOps.simhashNearDupPairs(sigs, bits = 60, maxHamming = r)
    assert(chunked.collect().map(_.toString).sorted.toSeq == naive)
    val plan = chunked.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"chunk join must stay an equi-join:\n$plan")
  }

  test("hamming column function") {
    val out = Seq((0xffL, 0x0fL)).toDF("a", "b")
      .select(DedupOps.hamming($"a", $"b")).as[Int].collect().head
    assert(out == 4)
  }

  test("stop-shingle cap drops ultra-frequent shingles") {
    val idx = DedupOps.shingleIndex(docs, "doc_id", "text", 3, maxShingleDf = Some(2))
      .select($"sh").as[String].collect()
    // "the quick brown" appears in docs 1,2,5 (df=3 > 2) -> dropped
    assert(!idx.contains("the quick brown"))
  }

  private def spanRows(df: org.apache.spark.sql.DataFrame) =
    DedupOps.spanDedup(df, "doc_id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("spanDedup cuts duplicated spans everywhere but the first occurrence") {
    val corpus = Seq(
      (1L, "a b c d e"), // owns first occurrence of every one of its spans
      (2L, "x y a b c z"), // "a b c" duplicated -> cut positions 2..4
      (3L, "p q r s t") // all spans unique -> untouched
    ).toDF("doc_id", "text")
    val out = spanRows(corpus)
    assert(out(1L) == (("a b c d e", 5L, 0L)))
    assert(out(2L) == (("x y z", 3L, 3L)))
    assert(out(3L) == (("p q r s t", 5L, 0L)))
  }

  test("spanDedup merges overlapping cut spans into one region") {
    val corpus = Seq(
      (1L, "a b c d"), // first occurrences of "a b c" and "b c d"
      (2L, "z a b c d z") // both dup spans overlap -> positions 1..4 cut once
    ).toDF("doc_id", "text")
    val out = spanRows(corpus)
    assert(out(2L) == (("z z", 2L, 4L)))
  }

  test("spanDedup: full removal yields empty text; short docs untouched") {
    val corpus = Seq(
      (1L, "a b c"),
      (2L, "a b c"), // exactly one dup span covering the whole doc
      (3L, "a b") // shorter than k=3: no spans, never cut
    ).toDF("doc_id", "text")
    val out = spanRows(corpus)
    assert(out(1L) == (("a b c", 3L, 0L)))
    assert(out(2L) == (("", 0L, 3L)))
    assert(out(3L) == (("a b", 2L, 0L)))
  }

  test("spanDedup is partitioning-invariant") {
    val base = docs
    val one = DedupOps.spanDedup(base.repartition(1), "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    val eight = DedupOps.spanDedup(base.repartition(8), "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    assert(one == eight)
  }

  test("lineDedup drops lines shared by more than maxDocFreq docs, " +
    "keeps order, omits all-boilerplate docs") {
    val web = Seq(
      (1L, "HEADER\nalpha one\nmid\nFOOTER"),
      (2L, "HEADER\nbeta two\nmid\nFOOTER"),
      (3L, "HEADER\ngamma three\nFOOTER"),
      (4L, "HEADER\nFOOTER") // nothing unique -> disappears
    ).toDF("doc_id", "text")
    // threshold 2: HEADER/FOOTER (df 4) drop; "mid" (df 2) stays
    val out = DedupOps.lineDedup(web, "doc_id", "text", maxDocFreq = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out == Map(
      1L -> (("alpha one\nmid", 2L)),
      2L -> (("beta two\nmid", 2L)),
      3L -> (("gamma three", 1L))))
  }

  test("lineDedup: threshold 1 keeps only globally unique lines; " +
    "empty lines count as one shared line") {
    val web = Seq(
      (1L, "same\nuniq a\n"),  // trailing \n -> empty last line
      (2L, "same\nuniq b\n")
    ).toDF("doc_id", "text")
    val out = DedupOps.lineDedup(web, "doc_id", "text", maxDocFreq = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "same" (df 2) and the trailing empty line (df 2) both drop
    assert(out == Map(1L -> "uniq a", 2L -> "uniq b"))
  }

  test("lineDedup == in-memory reference on randomized multi-line docs") {
    val rnd = new scala.util.Random(97L)
    val vocabLines = (0 until 12).map(i => s"line $i")
    (1 to 3).foreach { round =>
      val docs = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(6)
        (id, Seq.fill(n)(vocabLines(rnd.nextInt(vocabLines.size)))
          .mkString("\n"))
      }
      val maxDf = 1L + rnd.nextInt(10)
      // reference: exact line df over distinct docs, order-preserving
      val df_ = docs.flatMap { case (id, t) => t.split("\n", -1).map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val expect = docs.flatMap { case (id, t) =>
        val kept = t.split("\n", -1).filter(l => df_(l) <= maxDf)
        if (kept.isEmpty) None
        else Some(id -> ((kept.mkString("\n"), kept.length.toLong)))
      }.toMap
      val got = DedupOps.lineDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text", maxDf)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      assert(got == expect, s"round $round maxDf $maxDf")
    }
  }

  test("lineDedup is partitioning-invariant") {
    val web = Seq(
      (1L, "h\na\nf"), (2L, "h\nb\nf"), (3L, "h\nc\nf"), (4L, "h\nd\nf"))
      .toDF("doc_id", "text")
    val one = DedupOps.lineDedup(web.repartition(1), "doc_id", "text", 2L)
      .collect().map(_.toSeq).toSet
    val eight = DedupOps.lineDedup(web.repartition(8), "doc_id", "text", 2L)
      .collect().map(_.toSeq).toSet
    assert(one == eight)
  }

  test("prefixJaccardPairs == uncapped full-index pairs (prefix filter " +
    "is complete); prefix index is strictly smaller") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    for (t <- Seq(0.3, 0.6)) {
      val full = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      val pref = DedupOps.prefixJaccardPairs(docs, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      assert(pref == full, s"t=$t: prefix filter must drop no qualifying pair")
    }
    // the index actually shrinks: prefix entries < full entries
    val idx = DedupOps.shingleIndexHashed(docs, "doc_id", "text", 3)
    val fullEntries = idx.count()
    val prefixLen = idx.groupBy($"doc_id").count()
      .select(sum(($"count" - ceil($"count" * 0.6) + 1).cast("long")))
      .collect()(0).getLong(0)
    assert(prefixLen < fullEntries / 2,
      s"prefix index $prefixLen should be well under full $fullEntries")
  }

  test("noveltyScores: first doc fully novel; verbatim copy fully seen; partial overlap exact") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),         // shingles: ab g, b g d -> first, all novel
      (2L, "alpha beta gamma delta"),         // exact copy -> novelty 0
      (3L, "alpha beta gamma epsilon zeta"),  // 3 shingles, 1 seen (a b g)
      (4L, "xx yy")).toDF("doc_id", "text")   // < k tokens -> no row
    val got = DedupOps.noveltyScores(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"got $got")
    assert(got(1L) == ((2L, 0L, 1.0)))
    assert(got(2L) == ((2L, 2L, 0.0)))
    assert(got(3L) == ((3L, 1L, 1.0 - 1.0 / 3.0)))
    // layout invariance: scores are set-algebra over min ids
    val re = DedupOps.noveltyScores(docs.repartition(7), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(re == got)
  }

  test("duplicateSpans: planted shared run yields exactly its maximal span") {
    // ids 10/11 share a 7-token run inside otherwise-unique text; with
    // k=4 the duplicated windows are positions 2..5 in doc 10 (run at
    // tokens [2, 9)) and 0..3 in doc 11 (run at [0, 7)) — islands merge
    // them into ONE maximal span each, end exclusive.
    val run = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (10L, s"unique one $run tail ten eleven"),
      (11L, s"$run closing words here"),
      (12L, "nothing repeated in this document at all"))
      .toDF("doc_id", "text")
    val spans = DedupOps.duplicateSpans(d, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((10L, 2L, 9L), (11L, 0L, 7L)))
  }

  test("duplicateSpans: within-doc repetition counts toward the threshold") {
    // the 4-token window repeats INSIDE one doc -> both occurrences span
    val d = Seq(
      (20L, "intro words spam spam spam spam middle spam spam spam spam out"),
      (21L, "totally fresh text never repeating anything anywhere today"))
      .toDF("doc_id", "text")
    val spans = DedupOps.duplicateSpans(d, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only the window 'spam spam spam spam' repeats (positions 2 and 7);
    // the gap (5 > k) keeps the two occurrences separate islands
    assert(spans == Set((20L, 2L, 6L), (20L, 7L, 11L)))
  }

  test("duplicateSpanStats: span-free docs report zeros; fractions on the x1e6 grid") {
    val run = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (10L, s"unique one $run tail ten eleven"),
      (11L, s"$run closing words here"),
      (12L, "nothing repeated in this document at all"))
      .toDF("doc_id", "text")
    val got = DedupOps.duplicateSpanStats(d, k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(12L) == ((7L, 0L, 0L, 0L)))
    assert(got(10L) == ((12L, 1L, 7L, 7L * 1000000L / 12L)))
    assert(got(11L) == ((10L, 1L, 7L, 700000L)))
  }

  test("tokenWindowHashes == the fingerprint-per-window HOF formulation") {
    import graft.ops.TextOps
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextOps.tokens(lower(col("text")))
    for (k <- Seq(2, 8)) {
      val fast = d.select(col("doc_id"), toks.as("w"))
        .filter(size(col("w")) >= k)
        .select(col("doc_id"),
          graft.expr.TokenWindowExprs.tokenWindowHashes(col("w"), k).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val spec = d.select(col("doc_id"), toks.as("w"))
        .filter(size(col("w")) >= k)
        .select(col("doc_id"), transform(
          sequence(lit(0), size(col("w")) - k),
          i => TextOps.fingerprint(
            concat_ws(" ", slice(col("w"), i + 1, lit(k))))).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fast == spec, s"k=$k rolling != per-window spec")
      assert(fast.nonEmpty)
    }
  }

  test("tokenWindowHashes edge cases: short docs, k=1, null token") {
    import graft.expr.TokenWindowExprs.tokenWindowHashes
    val rows = Seq(
      (1L, Some(Seq(Some("a"), Some("b")))),
      (2L, Some(Seq(Some("only")))),
      (3L, None),
      (4L, Some(Seq(Some("x"), None))))
      .toDF("id", "w")
    val k3 = rows.select(col("id"), tokenWindowHashes(col("w"), 3).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(k3(1L) == Seq.empty) // fewer than k tokens
    assert(k3(2L) == Seq.empty)
    assert(k3(3L) == null)      // null array
    assert(k3(4L) == Seq.empty) // short-circuits before the null element
    // with enough tokens the null element SURFACES instead of skipping
    val k2n = rows.filter(col("id") === 4L)
      .select(tokenWindowHashes(col("w"), 2)).head()
    assert(k2n.isNullAt(0))
    val k1 = rows.filter(col("id") === 1L)
      .select(tokenWindowHashes(col("w"), 1)).head().getSeq[Long](0)
    assert(k1 == Seq(97L, 98L)) // single-char polynomials
  }

  test("duplicateSpans is layout-invariant (hash counts + island algebra)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      DedupOps.duplicateSpans(df, k = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(d)
    assert(run(d.repartition(7)) == a)
    assert(a.nonEmpty) // the synthetic corpus plants exact dups
  }
}
