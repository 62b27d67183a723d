package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Ground truth for the t7 PII scrub and t8 sequence packing operators
  * (hand-computed expectations; the DuckDB oracles are the second,
  * independent check at sf0.01).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("piiScrub counts and redacts emails, IPs and phone numbers") {
    val df = Seq(
      (1L, "write to alice.smith@corp.example.org or bob@x.io today"),
      (2L, "server at 10.0.42.17 and backup 192.168.1.254 online"),
      (3L, "call 555-867-5309 maybe"),
      (4L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val (ne, ni, np) = TextAnalysis.piiCounts(col("text"))
    val out = df.select(col("doc_id"), ne.as("e"), ni.as("i"), np.as("p"),
      TextAnalysis.piiRedact(col("text")).as("r")).orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2L &&
      out(0).getString(4) == "write to <EMAIL> or <EMAIL> today")
    assert(out(1).getLong(2) == 2L &&
      out(1).getString(4) == "server at <IP> and backup <IP> online")
    assert(out(2).getLong(3) == 1L && out(2).getString(4) == "call <PHONE> maybe")
    assert(out(3).toSeq.slice(1, 4) == Seq(0L, 0L, 0L) &&
      out(3).getString(4) == "nothing sensitive here at all")
  }

  test("bigramCollocations counts adjacent pairs with doc frequency and a deterministic cut") {
    val df = Seq(
      (1L, "click here to read more"),
      (2L, "click here now"),
      (3L, "read more click here"),
      (4L, "one")                       // single token: contributes no bigram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCollocations(df, "doc_id", "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "click here" appears 3x in 3 docs; "read more" 2x in 2 docs;
    // the k=3 cut then takes the tie group's alphabetical head
    assert(out(0) == ("click here", 3L, 3L))
    assert(out(1) == ("read more", 2L, 2L))
    assert(out(2) == ("here now", 1L, 1L))
    assert(out.length == 3)
  }

  test("domainMixSample allocates sqrt-weighted quotas with a floor of one") {
    // sources: a=100 rows (w=10), b=16 (w=4), c=1 (w=1) -> sum w = 15
    // target 15 -> quotas: a = 15*10/15 = 10, b = 4, c = 1
    val rows = (0 until 100).map(i => (i.toLong, "a")) ++
      (100 until 116).map(i => (i.toLong, "b")) ++ Seq((116L, "c"))
    val df = rows.toDF("doc_id", "source")
    val out = TextAnalysis.domainMixSample(df, col("source"), col("doc_id"), 15L)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 10L, "b" -> 4L, "c" -> 1L))
    // deterministic: the same call returns the identical doc_id set
    val ids1 = TextAnalysis.domainMixSample(df, col("source"), col("doc_id"), 15L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextAnalysis.domainMixSample(df, col("source"), col("doc_id"), 15L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2 && ids1.size == 15)
  }

  test("tfidfTopTerms ranks by score; high-tf ubiquitous terms lose to rare terms") {
    // 5 docs; "cat" is in all 5 (df=5, idf=ln(1)=0, score 0 at ANY tf),
    // "dog" in 2, "eel"/"fox" in 1 each; short tokens ("a", "of") drop.
    // Doc 5 is the regression case: cat tf=3 (score 0) must lose to fox
    // tf=1 (score ln 5) — an integer (tf desc) ranking would invert it.
    val df = Seq(
      (1L, "cat dog dog eel a"),
      (2L, "cat dog of"),
      (3L, "cat cat cat"),
      (4L, "cat"),
      (5L, "cat cat cat fox")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", 2)
      .orderBy("doc_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    def sc(tf: Int, df: Int) = BigDecimal(tf * math.log(5.0 / df))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      (1L, 1L, "dog", 2L, 2L, sc(2, 2)), // 2·ln 2.5 = 1.8326 beats eel's ln 5
      (1L, 2L, "eel", 1L, 1L, sc(1, 1)),
      (2L, 1L, "dog", 1L, 2L, sc(1, 2)), // ln 2.5 beats cat's 0
      (2L, 2L, "cat", 1L, 5L, 0.0),      // idf = ln(1) = 0
      (3L, 1L, "cat", 3L, 5L, 0.0),
      (4L, 1L, "cat", 1L, 5L, 0.0),
      (5L, 1L, "fox", 1L, 1L, sc(1, 1)), // score ln 5 outranks cat tf=3 score 0
      (5L, 2L, "cat", 3L, 5L, 0.0)))
  }

  test("sequencePack assigns contiguous budget-boundary packs per group") {
    // group g: 3-token docs, budget 5 -> cumulative starts 0,3,6 ->
    // packs 0,0,1 with offsets 0,3,1 (doc 2 STARTS in pack 0 and
    // overflows the boundary — the documented greedy-contiguous rule);
    // group h packs independently from offset 0
    val df = Seq(
      (1L, "g", "a b c"), (2L, "g", "d e f"), (3L, "g", "g h i"),
      (4L, "h", "j k l m n o")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sequencePack(df, col("source"), col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")), 5L)
      .select("doc_id", "pack_id", "pack_offset").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 3L), (3L, 1L, 1L), (4L, 0L, 0L)))
  }

  test("charStats: exact Simpson, grid-quantized Shannon, degenerate and empty docs") {
    val df = Seq(
      (1L, "aaaa"),  // one symbol: zero entropy, zero diversity
      (2L, "aabb"),  // uniform over 2: H = 1 bit, Simpson = 1/2
      (3L, "aab"),   // H = 2/3·log2(3/2) + 1/3·log2(3) quantized per term
      (4L, "")       // empty: excluded, never divided by
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def termFp(n: Long, total: Long): Long = {
      val p = n.toDouble / total.toDouble
      // StrictMath, not math.log: the kernel contract is "Spark's own
      // log bits", and Math.log intrinsics may differ by 1 ulp
      math.floor(-p * StrictMath.log(p) / StrictMath.log(2.0) * 1000000.0 + 0.5).toLong
    }
    val h3 = termFp(2, 3) + termFp(1, 3) // ~918296 (0.918296 bits)
    val s3 = math.floor((1.0 - 5.0 / 9.0) * 1000000.0 + 0.5).toLong
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 0L, 0L),
      (2L, 4L, 2L, 500000L, 1000000L),
      (3L, 3L, 2L, s3, h3)))
    assert(h3 == 918296L) // pins the grid arithmetic itself
  }

  test("qualityDeciles assigns per-source ntile buckets with the remainder up front") {
    // 12 docs in source A (deciles of 12: first two deciles get 2 docs),
    // 3 docs in source B (only deciles 1..3 occupied, one doc each) —
    // token counts make the quality score strictly increasing in i, so
    // the decile order is the doc order
    val docs = ((0 until 12).map(i => (i.toLong, ("w " * (i + 1)).trim, "A")) ++
      (20 until 23).map(i => (i.toLong, ("w " * (i + 1)).trim, "B")))
      .map { case (id, t, s) => (id, t, s, t.length.toLong) }
      .toDF("doc_id", "text", "source", "n_chars")
    val out = TextAnalysis.qualityDeciles(docs, "doc_id", "text", "n_chars", "source")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val a = out.filter(_._2 == "A").map(_._3).toSeq
    val b = out.filter(_._2 == "B").map(_._3).toSeq
    assert(a == Seq(1L, 1L, 2L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L))
    assert(b == Seq(1L, 2L, 3L))
  }

  test("langScores kernel fuzz: hit counts match the stopHits column twin per language") {
    // random token soup drawn from every language's stopwords, shared
    // words ("la" is es AND fr; "de"/"en" appear in other languages'
    // lists), non-stopwords, runs of spaces (empty tokens) and CJK
    // glyphs; the kernel's struct fields must equal the interpreted
    // filter+isin twin for every language, and langId must equal the
    // earliest-max scalar argmax
    val rnd = new scala.util.Random(515)
    val langs = graft.operators.TextAnalysis.stopwords
    val pool = langs.flatMap(_._2) ++ Seq("zzz", "qqq", "la", "de", "")
    val docs = (0 until 120).map { i =>
      val toks = (0 until rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.size)))
      (i.toLong, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val kernel = graft.functions.HashExpressions.langScores(col("text"))
    val twinCols = langs.map { case (lang, words) =>
      graft.operators.TextAnalysis.stopHits(col("text"), words).as(s"t_$lang") }
    val rows = df.select(
        Seq(col("doc_id")) ++ langs.map { case (l, _) => kernel.getField(s"s_$l").as(s"k_$l") } ++
          twinCols ++ Seq(graft.operators.TextAnalysis.langId(col("text")).as("lang")): _*)
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      val ks = langs.indices.map(i => r.getLong(1 + i))
      val ts = langs.indices.map(i => r.getLong(1 + langs.size + i))
      assert(ks == ts, s"kernel vs twin diverged on doc ${r.getLong(0)}")
      // earliest-max argmax (the CASE chain's >= tie-break)
      val best = langs.indices.minBy(i => (-ks(i), i))
      assert(r.getString(1 + 2 * langs.size) == langs(best)._1,
        s"langId tie-break diverged on doc ${r.getLong(0)}")
    }
    assert(rows.nonEmpty)
  }

  test("unigramLogprob fuzz: corpus-trained scores match a scalar reference exactly") {
    // random zipf-ish corpus (few common tokens, a long tail, repeated
    // tokens within docs); the scalar reference replays the exact
    // arithmetic — per-token -StrictMath.log(c/N) (Spark's log codegen
    // calls StrictMath.log) quantized to the 1e6 grid once, tf-weighted
    // BIGINT sums, integer-div average — so the compare is == on longs
    val rnd = new scala.util.Random(1414)
    val vocab = Vector("the", "of", "and", "rare1", "rare2", "x9", "qq", "zz")
    val docs = (0 until 80).map { i =>
      val len = 1 + rnd.nextInt(25)
      val toks = (0 until len).map { _ =>
        // skewed draw: heavy head, light tail
        val r = rnd.nextInt(10)
        vocab(if (r < 5) r % 3 else 3 + rnd.nextInt(5))
      }
      (i.toLong, toks.mkString(" "))
    }
    val got = graft.operators.TextAnalysis.unigramLogprob(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val allToks = docs.flatMap(_._2.split(" ", -1))
    val counts = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = allToks.size.toDouble
    val lpFp = counts.map { case (t, c) =>
      t -> math.floor(-StrictMath.log(c.toDouble / n) * 1000000.0 + 0.5).toLong
    }
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val sum = toks.map(lpFp).sum
      (id, toks.length.toLong, sum, sum / toks.length)
    }
    assert(got == expected)
    assert(expected.map(_._4).distinct.size > 5, "fixture must spread the scores")
  }

  test("bm25TopDocs fuzz: ranking matches a scalar BM25 reference exactly") {
    // the scalar reference replays the operator's exact double sequence
    // (StrictMath.log like Spark's log codegen, the same left-assoc
    // parenthesization and long→double promotions, floor(x·1e4 + 0.5)
    // per-term fixed point before the per-doc BIGINT sum), so the
    // compare is == on longs — any drift in the arithmetic contract the
    // DuckDB oracle depends on fails here first
    val rnd = new scala.util.Random(1616)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "rarely", "often",
      "xyz", "qq", "topic", "noise")
    val query = Seq("rarely", "topic", "alpha")
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(30) // 0-length docs stay in N but score nothing
      val toks = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks.mkString(" "))
    }
    val k = 15
    val got = graft.operators.TextAnalysis.bm25TopDocs(
        docs.toDF("doc_id", "text"), "doc_id", "text", query, k)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    def toks(t: String) =
      t.toLowerCase.split("[^a-z]+").filter(_.length >= 3).toSeq
    val tf = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, o) => ((id, w), o.size.toLong) } }
      .toMap
    val dl = docs.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val dfreq = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = docs.size.toLong
    val avgdl = dl.values.sum.toDouble / n.toDouble
    val scored = docs.flatMap { case (id, _) =>
      val hits = query.flatMap { w => tf.get((id, w)).map { f =>
        val df = dfreq(w)
        val idf = StrictMath.log((n.toDouble - df + 0.5) / (df + 0.5) + 1.0)
        val c = idf * (f * (1.2 + 1.0)) /
          (f + 1.2 * (1.0 - 0.75 + 0.75 * dl(id) / avgdl))
        math.floor(c * 10000.0 + 0.5).toLong
      } }
      if (hits.isEmpty) None else Some((id, hits.size.toLong, hits.sum))
    }
    val expected = scored.sortBy { case (id, _, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, h, s), i) => (id, i + 1L, h, s) }
    assert(got == expected)
    assert(expected.map(_._4).distinct.size > 5, "fixture must spread the scores")
  }

  test("heavyHitters fuzz: exact under heavy CMS collisions (tiny grid)") {
    // planted heavy hitters + a hapax tail; w = 2 forces nearly every
    // token into a colliding cell, so the candidate filter passes lots
    // of false positives — the exact verify pass must trim them all.
    // Equality with the scalar count also proves no true hitter was
    // dropped (the CMS overestimate guarantee).
    val rnd = new scala.util.Random(1717)
    val heavy = Vector("aaa", "bbb", "ccc")
    val docs = (0 until 50).map { i =>
      val toks = (0 until 40).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 6) heavy(rnd.nextInt(heavy.size))
        else "tl" + ('a' + rnd.nextInt(20)).toChar + ('a' + rnd.nextInt(20)).toChar // long tail, few repeats
      }
      (i.toLong, toks.mkString(" "))
    }
    val threshold = 50L
    // w = 0 exercises the corpus-sized default (cmsWidthFor → the 1024
    // floor at 50 docs), same exact output as any explicit width
    for (w <- Seq(2, 1024, 0)) {
      val got = graft.operators.TextAnalysis.heavyHitters(
          docs.toDF("doc_id", "text"), "text", threshold, d = 4, w = w)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val counts = docs.flatMap(_._2.split(" ", -1)).filter(_.length >= 3)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = counts.filter(_._2 >= threshold).toSeq
        .sortBy { case (t, n) => (-n, t) }
      assert(got == expected, s"w=$w")
      assert(expected.size >= 3 && counts.size > 100 &&
        counts.values.count(_ < threshold) > 100,
        "fixture must have hitters above a real sub-threshold tail")
    }
  }

  test("postingsIndex fuzz: blocked postings match a scalar reference (block boundaries exercised)") {
    // small blockSize forces multi-block terms; the scalar reference
    // rebuilds doc-distinct postings in id order, cuts blocks, and
    // fingerprints the same comma-joined byte sequence through the same
    // md5 — == on strings
    val rnd = new scala.util.Random(1818)
    val vocab = Vector("aaa", "bbb", "ccc", "ddd", "eee", "fff")
    val docs = (0 until 120).map { i =>
      val toks = (0 until 1 + rnd.nextInt(4)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks.mkString(" "))
    }
    val got = graft.operators.TextAnalysis.postingsIndex(
        docs.toDF("doc_id", "text"), "doc_id", "text", blockSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val postings = docs.flatMap { case (id, t) =>
      t.toLowerCase.split("[^a-z]+").filter(_.length >= 3).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = postings.toSeq.flatMap { case (term, ids) =>
      ids.grouped(16).zipWithIndex.map { case (blk, b) =>
        (term, b.toLong, blk.size.toLong, md5hex(blk.mkString(",")))
      }
    }.toSet
    assert(expected.exists(_._2 >= 2), "fixture must produce multi-block terms")
    assert(got == expected)
  }

  test("bigramLogprob fuzz: corpus-trained conditional scores match a scalar reference exactly") {
    // the scalar reference replays the operator's arithmetic — add-one
    // smoothed -StrictMath.log((c2+1)/(c1+V)) quantized once to the 1e6
    // grid, tf-weighted BIGINT sums, integer-div average — so the
    // compare is == on longs (the t14 contract at bigram order)
    val rnd = new scala.util.Random(1919)
    val vocab = Vector("the", "cat", "sat", "mat", "dog", "ran", "far")
    val docs = (0 until 70).map { i =>
      val len = rnd.nextInt(20) // includes <2-token docs (no bigrams, no row)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = graft.operators.TextAnalysis.bigramLogprob(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def grams(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val allGrams = docs.flatMap(d => grams(d._2))
    val c2 = allGrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.toSeq.groupBy(_._1.split(" ")(0)).view
      .mapValues(_.map(_._2).sum).toMap
    val v = c1.size.toLong
    val lpFp = c2.map { case (g, n) =>
      g -> math.floor(-StrictMath.log((n + 1).toDouble / (c1(g.split(" ")(0)) + v).toDouble)
        * 1000000.0 + 0.5).toLong
    }
    val expected = docs.flatMap { case (id, t) =>
      val gs = grams(t)
      if (gs.isEmpty) None else {
        val sum = gs.map(lpFp).sum
        Some((id, gs.size.toLong, sum, sum / gs.size))
      }
    }
    assert(got == expected)
    assert(expected.map(_._4).distinct.size > 5, "fixture must spread the scores")
  }

  test("repetitionScore fuzz: random repetitive corpora match a scalar n-gram count") {
    val rnd = new scala.util.Random(777)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val n = 3
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(12) // includes len < n (guard path)
      val toks = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks.mkString(" "))
    }.filter(_._2.nonEmpty)
    val (total, distinct, rep) =
      TextAnalysis.repetitionScore(TextAnalysis.wsTokens(col("text")), n)
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), total.as("t"), distinct.as("d"), rep.as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      .sortBy(_._1)
    val expected = docs.sortBy(_._1).map { case (id, text) =>
      val toks = text.split(" ")
      if (toks.length < n) (id, 0L, 0L, 0.0)
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        (id, grams.size.toLong, grams.distinct.size.toLong,
          1.0 - grams.distinct.size.toDouble / grams.size)
      }
    }
    assert(got == expected)
    assert(expected.exists(_._4 > 0.0), "fixture must contain repeated n-grams")
  }

  test("sequencePack fuzz: per-group cumulative packing matches a scalar fold") {
    // random groups + token counts (incl. docs larger than the budget,
    // which must span pack boundaries starting where their cumsum says)
    val rnd = new scala.util.Random(555)
    val budget = 64L
    val rows = (0 until 120).map { i =>
      (i.toLong, s"g${rnd.nextInt(4)}", 1L + rnd.nextInt(100))
    }
    val df = rows.toDF("doc_id", "source", "toks")
    val got = TextAnalysis.sequencePack(df, col("source"), col("doc_id"),
        col("toks"), budget)
      .select("doc_id", "pack_id", "pack_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy(_._2).values.flatMap { grp =>
      var cum = 0L
      grp.sortBy(_._1).map { case (id, _, t) =>
        val out = id -> (cum / budget, cum % budget); cum += t; out
      }
    }.toMap
    assert(got == expected)
  }

  test("chunkWindows fuzz: strided chunks match a scalar reference at every boundary") {
    // random token counts around the window/stride boundaries (0, 1,
    // window, window+1, window+stride, exact multiples, long docs) —
    // every chunk must start at i*stride, only the LAST may be short,
    // every token covered, no fully-contained chunk ever emitted
    val rnd = new scala.util.Random(77)
    val (window, stride) = (5, 3)
    val docs = (0 until 80).map { i =>
      val n = Seq(0, 1, window - 1, window, window + 1, window + stride,
        2 * window, rnd.nextInt(40))(rnd.nextInt(8))
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }
    val got = TextAnalysis.chunkWindows(docs.toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    val expected = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1).toSeq // split keeps empties, like Spark's
      val toks = if (text.isEmpty) Seq("") else w
      val n = toks.length
      val nChunks = math.max(math.ceil((n - window).toDouble / stride).toInt, 0) + 1
      (0 until nChunks).flatMap { i =>
        val chunk = toks.slice(i * stride, i * stride + window)
        val txt = chunk.mkString(" ")
        if (txt.isEmpty) None
        else Some((id, i) -> (txt, math.min(n - i * stride, window).toLong))
      }
    }.toMap
    assert(got == expected)
    // boundary sanity: some doc produced >1 chunk and some tail is short
    assert(expected.keys.exists(_._2 > 0), "no multi-chunk doc — vacuous")
    assert(expected.values.exists(_._2 < window), "no short tail exercised")
  }

  test("domainMixSample fuzz: integer quota allocation matches a scalar reference") {
    val rnd = new scala.util.Random(808)
    val rows = (0 until 300).map(i => (i.toLong, s"s${rnd.nextInt(6)}"))
    val target = 80L
    val got = TextAnalysis.domainMixSample(rows.toDF("doc_id", "source"),
        col("source"), col("doc_id"), target)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // scalar replay: w_g = floor(sqrt(n_g)); quota_g = max(1,
    // target·w_g div Σw); keep each group's first quota_g ids in
    // (md5(id), id) order
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val groups = rows.groupBy(_._2)
    val weights = groups.view.mapValues(g => math.floor(math.sqrt(g.size.toDouble)).toLong).toMap
    val tw = weights.values.sum
    val expected = groups.flatMap { case (g, members) =>
      val quota = math.max(1L, target * weights(g) / tw)
      members.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(quota.toInt)
    }.toSet
    assert(got == expected)
    assert(got.size < rows.size) // the quota must actually subsample
  }

  test("charStats fuzz: matches a scalar reference over random ASCII corpora") {
    val rnd = new scala.util.Random(4242)
    // biased alphabet (realistic skew) + degenerate single-char and
    // whitespace-heavy docs
    val alpha = "aaaabbccdefg hij.k!"
    val docs = (0L until 60L).map { i =>
      val len = rnd.nextInt(120)
      val s =
        if (i % 17 == 0) "z" * (len + 1)
        else (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (i, s)
    }.filter(_._2.nonEmpty)
    val got = TextAnalysis.charStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = docs.map { case (id, s) =>
      val counts = s.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val total = s.length.toLong
      val sumsq = counts.values.map(n => n * n).sum
      val ent = counts.values.toSeq.sorted.map { n =>
        val p = n.toDouble / total.toDouble
        // StrictMath mirrors the kernel (Math.log intrinsics may differ by 1 ulp)
        math.floor(-p * StrictMath.log(p) / StrictMath.log(2.0) * 1000000.0 + 0.5).toLong
      }.sum
      val simp = math.floor((1.0 - sumsq.toDouble / total.toDouble / total.toDouble)
        * 1000000.0 + 0.5).toLong
      (id, total, counts.size.toLong, simp, ent)
    }
    assert(got.toSeq == expected)
  }
}
