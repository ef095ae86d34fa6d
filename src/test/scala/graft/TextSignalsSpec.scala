package graft

import graft.ops.TextAnalysis

/** PII scrubbing and repetition-signal operators. */
class TextSignalsSpec extends SparkSpec {

  test("piiScrub redacts emails, intl phones, and IPv4, and counts each") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org thanks"),
      (2L, "call +44-020-7946 or +1-555-0100 now"),
      (3L, "server at 192.168.0.1 and 10.0.0.255"),
      (4L, "no pii here at all"),
      (5L, "a@b.co and 8.8.8.8 and +1-555-9999")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == ("reach me at [EMAIL] thanks", 1))
    assert(out(2L) == ("call [PHONE] or [PHONE] now", 2))
    assert(out(3L) == ("server at [IP] and [IP]", 2))
    assert(out(4L) == ("no pii here at all", 0))
    assert(out(5L) == ("[EMAIL] and [IP] and [PHONE]", 3))
  }

  test("piiScrub leaves near-miss text untouched") {
    import spark.implicits._
    val docs = Seq(
      // not an email (no TLD), not a phone (wrong grouping), not an IPv4 (3 octets)
      (1L, "user@localhost 555-0100 10.0.1 v1.2.3.x")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "doc_id", "text").collect().head
    assert(out.getString(1) == "user@localhost 555-0100 10.0.1 v1.2.3.x")
    assert(out.getInt(2) == 0)
  }

  test("repetitionSignals: degenerate, clean, and single-token documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"), // one token type; all 2-grams identical
      (2L, "all words here are distinct tokens"), // no repetition at all
      (3L, "word"), // single token: dup_2gram_frac pinned to 0
      (4L, "a b a b a b")).toDF("doc_id", "text") // alternating: 2 distinct 2-grams of 5
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4, 1.0, 1.0 - 1.0 / 3.0)))
    assert(out(2L) == ((6, 1.0 / 6.0, 0.0)))
    assert(out(3L) == ((1, 1.0, 0.0)))
    assert(out(4L) == ((6, 0.5, 1.0 - 2.0 / 5.0)))
  }

  test("topNgrams: per-group top-k bigrams, count-desc with string tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a b a b c"),   // bigrams: "a b" ×2, "b a", "b c"
      (2L, "en", "a b x"),       // "a b", "b x"
      (3L, "de", "nur ein wort paar"),
      (4L, "de", "x")            // single token → no bigrams
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.topNgrams(docs, "text", "lang", k = 2)
      .orderBy($"lang", $"n".desc, $"ngram")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("de", "ein wort", 1L), ("de", "nur ein", 1L), // tie → lexicographic
      ("en", "a b", 3L), ("en", "b a", 1L)))
  }

  test("bigramLmScore: hand-counted stats and add-one smoothed score") {
    import spark.implicits._
    // corpus counts — unigrams: a=3 b=2 c=1 z=1 (V=4); bigrams: "a b"=2, "b a"=1, "a c"=1
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a c"),
      (3L, "z")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val d1 = out(0); val d2 = out(1); val d3 = out(2)
    // d1: instances ab(c2=2,c1=3), ba(1,2), ab(2,3)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3), d1.getLong(4)) == ((3L, 5L, 8L, 4L)))
    val expected1 = (math.log(3.0 / 7.0) + math.log(2.0 / 6.0) + math.log(3.0 / 7.0)) / 3.0
    assert(math.abs(d1.getDouble(5) - expected1) < 1e-12)
    // d2: one instance ac(c2=1,c1=3) → ln((1+1)/(3+4))
    assert((d2.getLong(1), d2.getLong(2), d2.getLong(3)) == ((1L, 1L, 3L)))
    assert(math.abs(d2.getDouble(5) - math.log(2.0 / 7.0)) < 1e-12)
    // d3: single token → zero bigrams, null score — but vocab is a corpus
    // constant and must still be present on the row
    assert((d3.getLong(1), d3.getLong(2), d3.getLong(3), d3.getLong(4)) == ((0L, 0L, 0L, 4L)))
    assert(d3.isNullAt(5))
  }

  test("salientTerms: df-capped vocabulary, per-doc top-k by (tf desc, term)") {
    import spark.implicits._
    // df: a=1 b=2 c=3 z=1 q=1; cap df<=2 excludes c everywhere
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "b b b c z"),
      (3L, "c c q")).toDF("doc_id", "text")
    val out = TextAnalysis.salientTerms(docs, "doc_id", "text", maxDf = 2L, k = 2)
      .orderBy("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, "a", 2L, 1L), (1L, "b", 1L, 2L),
      (2L, "b", 3L, 2L), (2L, "z", 1L, 1L),
      (3L, "q", 1L, 1L)))
  }

  test("hashedClassifierScore: feature count, weight bounds, determinism") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), // 3 unigrams + 2 bigrams = 5 features
      (2L, "alpha beta gamma"), // identical text → identical score
      (3L, "solo"),             // 1 unigram, no bigrams
      (4L, "")                  // split("") = [""] → 1 feature, defined score
    ).toDF("doc_id", "text")
    val out = TextAnalysis.hashedClassifierScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 == 5L)
    assert(out(3L)._1 == 1L)
    assert(out(4L)._1 == 1L)
    assert(out(1L) == out(2L))
    // every bucket weight is in [-500000, 500000], so |mean| is bounded too
    out.values.foreach { case (n, ws, sc) =>
      assert(math.abs(ws) <= 500000L * n)
      assert(sc == ws.toDouble / n.toDouble)
    }
  }

  test("sentenceStats: positions, boundary regex, whitespace-run drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two. Three! Four five six?"),   // 3 sentences
      (2L, "No terminator at all"),             // 1 run, no punctuation
      (3L, "Tail dot.   "),                     // trailing spaces → dropped run
      (4L, "a . b")                             // "a ." and "b"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 1, 2, 8), (1L, 2, 1, 6), (1L, 3, 3, 14),
      (2L, 1, 4, 20),
      (3L, 1, 2, 9),
      (4L, 1, 2, 3), (4L, 2, 1, 1)))
  }

  test("toksOf: pre-tokenized ARRAY<STRING> input gives identical results to raw text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val raw = Seq(
      (1L, "The cat sat on the mat", "en", "web"),
      (2L, "the cat SAT on a hat", "en", "web"),
      (3L, "un gato y un perro y un gato", "es", "books"),
      (4L, "cat cat cat the the mat", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val tok = raw.select(col("doc_id"), col("lang"), col("source"),
      graft.ops.Dedup.tokens(col("text")).as("tokens"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(TextAnalysis.topNgrams(raw, "text", "lang", 3)) ==
      rows(TextAnalysis.topNgrams(tok, "tokens", "lang", 3)))
    assert(rows(TextAnalysis.salientTerms(raw, "doc_id", "text", 2L, 2)) ==
      rows(TextAnalysis.salientTerms(tok, "doc_id", "tokens", 2L, 2)))
    assert(rows(TextAnalysis.collocationLift(raw, "text", 5, 1L)) ==
      rows(TextAnalysis.collocationLift(tok, "tokens", 5, 1L)))
    assert(rows(TextAnalysis.zipfSlope(raw, "text", "source", 10)) ==
      rows(TextAnalysis.zipfSlope(tok, "tokens", "source", 10)))
    assert(rows(TextAnalysis.vocabCoverage(raw, "text", Seq(2, 5))) ==
      rows(TextAnalysis.vocabCoverage(tok, "tokens", Seq(2, 5))))
    assert(rows(TextAnalysis.tokenDriftTV(raw, "doc_id", "text", "lang")) ==
      rows(TextAnalysis.tokenDriftTV(tok, "doc_id", "tokens", "lang")))
  }

  test("x171 hash-keyed spelling ≡ string-keyed spelling on a corpus that crosses the threshold") {
    // ADVICE r11: the sf0.001/sf0.01 gate corpora yield ZERO shingles with
    // n_sources >= 10, so the DuckDB oracle verified x171 only vacuously.
    // This corpus crosses the threshold on purpose AND stresses every piece
    // the rewrite added: 12 sources × 5 docs; template A (40 words → 38
    // qualifying 3-grams, n_sources=12, n_docs=60 — MORE than 30 rows tie
    // at the cut, so the 30th-largest-n_docs threshold admits a strict
    // superset and the final (n_docs desc, shingle) tie-break must pick the
    // 30 lexicographically-smallest); template B in 10 sources (just at the
    // >= 10 gate, below the cut); template C in 9 sources (must be dropped);
    // per-doc unique noise (n_sources=1).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = (0 until 40).map(i => f"wa$i%02d")
    val tA = words.mkString(" ")                             // all 60 docs
    val tB = (0 until 12).map(i => f"wb$i%02d").mkString(" ") // sources 0-9
    val tC = (0 until 12).map(i => f"wc$i%02d").mkString(" ") // sources 0-8
    val rows = for {
      s <- 0 until 12; d <- 0 until 5
    } yield {
      val id = s * 5 + d
      val parts = Seq(tA) ++
        (if (s < 10) Seq(tB) else Nil) ++
        (if (s < 9) Seq(tC) else Nil) ++
        Seq(s"noise$id only here $id")
      (id.toLong, parts.mkString(" "), f"s$s%02d")
    }
    val dir = java.nio.file.Files.createTempDirectory("x171eq").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")) // x171 reads the shared tokenized view,
      // which carries the documents schema's lang column
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // the straightforward string-keyed spelling (the pre-r11 implementation)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source", split(lower($"text"), "\\s+").as("w"))
    val expected = toks
      .select($"doc_id", $"source",
        explode(when(size($"w") >= 3,
          expr("transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))"))
          .otherwise(array(concat_ws(" ", $"w")))).as("shingle"))
      .distinct()
      .groupBy($"shingle")
      .agg(countDistinct($"source").as("n_sources"),
        countDistinct($"doc_id").as("n_docs"))
      .filter($"n_sources" >= 10)
      .orderBy($"n_docs".desc, $"shingle")
      .limit(30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    val got = graft.queries.Extensions.x171BoilerplateNgrams(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    // sanity: the corpus really crosses the gate and really overflows the cut
    assert(expected.size == 30, s"corpus must saturate the top-30 (got ${expected.size})")
    assert(expected.forall(_._2 >= 10))
    assert(expected.forall(_._3 == 60L), "top-30 should be template-A shingles tied at n_docs=60")
    assert(got == expected,
      s"hash-keyed x171 diverges from string-keyed spelling:\n got=$got\n exp=$expected")
  }
}
