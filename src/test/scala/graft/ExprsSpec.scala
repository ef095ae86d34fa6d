package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.{Exprs, Ops}

/** The custom-Catalyst-expression layer's own contract spec.
  *
  * Every operator family ultimately rests on the ~20 native expressions in
  * [[graft.functions.Exprs]]; until now they were verified only through the
  * query oracles that happen to exercise them. This suite pins the layer
  * directly:
  *
  *  1. **Dual-mode parity** — each expression must produce byte-identical
  *     results whether Spark evaluates it through generated Java
  *     (`spark.sql.codegen.factoryMode=CODEGEN_ONLY`, whole-stage on) or the
  *     interpreted fallback (`NO_CODEGEN`, whole-stage off). Spark switches
  *     between these paths by itself (codegen compilation failure, huge
  *     generated methods, fallback conf), so a divergence would be a
  *     nondeterminism bug that no single-mode test can see.
  *  2. **Null propagation** — all expressions use null-intolerant
  *     `nullSafeEval`/`defineCodeGen`, so NULL in ⇒ NULL out, in both modes.
  *  3. **Edge contracts** the kernels document: min-length dot products,
  *     zero-vector cosine, sub-k token arrays, empty inputs.
  */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  // -- fixture: one table whose rows cover normal / null / empty / short /
  //    mismatched / degenerate shapes for every input type the layer takes
  private def fixture(): DataFrame = {
    val rows = Seq(
      // id, toks,                                     veca,                 vecb,                 la,                lb,            txt,                      pv, pw
      (0, Some(Seq("the", "cat", "sat", "on", "mat")), Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f, 6f)), Some(Seq(1L, 2L, 3L)), Some(Seq(2L, 3L, 4L)), Some("hello world hello world"), 1L, 2L),
      (1, None, None, Some(Seq(1f)), None, Some(Seq.empty[Long]), None, 3L, 4L),
      (2, Some(Seq.empty[String]), Some(Seq.empty[Float]), Some(Seq.empty[Float]), Some(Seq.empty[Long]), Some(Seq.empty[Long]), Some(""), 0L, 0L),
      (3, Some(Seq("solo")), Some(Seq(1f, 0f)), Some(Seq(0.5f)), Some(Seq(5L)), Some(Seq(1L, 5L, 9L)), Some("ab"), 5L, 6L),
      (4, Some(Seq("a", "a", "a", "b", "a")), Some(Seq(0f, 0f, 0f)), Some(Seq(1f, 1f, 1f)), Some(Seq(-3L, -1L, 7L)), Some(Seq(-1L)), Some("你好世界，这是中文文本"), 2L, 1L)
    )
    rows.toDF("id", "toks", "veca", "vecb", "la", "lb", "txt", "pv", "pw")
  }

  private val pairSet: Array[Long] =
    Array(Ops.packPair(1L, 2L), Ops.packPair(3L, 4L)).sorted
  private val allOnes = Array.fill(16)(-1L)
  private val allZeros = new Array[Long](16)
  private val hotKeys = Array(11L, 22L)
  private val hotDfs = Array(5L, 9L)

  /** The projection applying every Column builder in Exprs. */
  private def applyAll(df: DataFrame): DataFrame = {
    val sh = Exprs.shingle_hashes(col("toks"), 3)
    df.select(
      col("id"),
      Exprs.cosine_sim(col("veca"), col("vecb")).as("cos"),
      Exprs.dot_f(col("veca"), col("vecb")).as("dotf"),
      Exprs.dot_l(col("la"), col("lb")).as("dotl"),
      Exprs.minhash_sig(col("toks"), 3, 8).as("sig"),
      Exprs.oph_sig(col("toks"), 3, 8).as("ophsig"),
      Exprs.band_hashes(Exprs.minhash_sig(col("toks"), 3, 8), 4).as("bands"),
      sh.as("sh"),
      Exprs.ngram_hashes(col("toks"), 2).as("ngrams"),
      Exprs.repetition_stats(col("toks"), 2).as("rep"),
      Exprs.simhash64(col("toks")).as("simh"),
      Exprs.jaccard_shingles(col("toks"), col("toks"), 3).as("jacc"),
      Exprs.winnow_fingerprint(col("txt"), 4, 5).as("winnow"),
      Exprs.hyperplane_bucket(col("veca"), 8, 42L).as("hyp"),
      Exprs.pair_in_sorted_set(col("pv"), col("pw"), pairSet).as("pair"),
      Exprs.deflate_ratio_ppm(col("txt")).as("defl"),
      Exprs.lang_id(col("txt")).as("lang"),
      Exprs.bpe_merge_pair(col("toks"), "a", "a").as("bpe"),
      Exprs.bloom_any(sh, allOnes).as("bloom1"),
      Exprs.bloom_any(sh, allZeros).as("bloom0"),
      Exprs.sorted_intersect_count(sh, sh).as("sic"),
      Exprs.prefix_rank_sort(sh, hotKeys, hotDfs).as("prs"),
      Exprs.smix64(col("pv")).as("smix"),
      Exprs.cms_lookup(typedLit(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)), col("txt"), 2, 4).as("cms")
    ).orderBy("id")
  }

  private def collectInMode(mode: String, wholeStage: Boolean): Seq[Seq[Any]] = {
    val conf = spark.conf
    val prevMode = conf.getOption("spark.sql.codegen.factoryMode")
    val prevWs = conf.getOption("spark.sql.codegen.wholeStage")
    try {
      conf.set("spark.sql.codegen.factoryMode", mode)
      conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      applyAll(fixture()).collect().toSeq.map(_.toSeq)
    } finally {
      prevMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      prevWs.fold(conf.unset("spark.sql.codegen.wholeStage"))(v =>
        conf.set("spark.sql.codegen.wholeStage", v))
    }
  }

  test("every custom expression: codegen and interpreted paths agree on edge rows") {
    val gen = collectInMode("CODEGEN_ONLY", wholeStage = true)
    val interp = collectInMode("NO_CODEGEN", wholeStage = false)
    assert(gen.size == 5 && interp.size == 5)
    gen.zip(interp).zipWithIndex.foreach { case ((g, i), rowIdx) =>
      assert(g == i, s"codegen/interpreted divergence on fixture row $rowIdx:\n gen=$g\n int=$i")
    }
  }

  test("null propagation: null input to any null-intolerant expression yields null") {
    val row1 = applyAll(fixture()).filter(col("id") === 1).collect()(0)
    // toks, veca, la, txt are all NULL on row 1 — every consumer must be null
    for (c <- Seq("cos", "dotf", "dotl", "sig", "bands", "sh", "ngrams", "rep",
        "simh", "jacc", "winnow", "hyp", "defl", "lang", "bpe", "bloom1",
        "bloom0", "sic", "prs", "cms"))
      assert(row1.isNullAt(row1.fieldIndex(c)), s"$c should be NULL when its input is NULL")
    // pv/pw are non-null longs → these stay defined
    assert(!row1.isNullAt(row1.fieldIndex("pair")))
    assert(!row1.isNullAt(row1.fieldIndex("smix")))
  }

  test("kernel edge contracts: documented degenerate-input behavior") {
    val r = applyAll(fixture()).collect().map(x => x.getInt(0) -> x).toMap

    // dot products use the min-length contract (mismatched lengths tolerated)
    assert(r(0).getAs[Long]("dotl") == 1L * 2 + 2L * 3 + 3L * 4)
    assert(r(3).getAs[Double]("dotf") == 1.0 * 0.5) // veca len 2, vecb len 1
    // zero vector → cosine 0.0, not NaN
    assert(r(4).getAs[Double]("cos") == 0.0)
    // empty arrays → dot 0, cosine 0
    assert(r(2).getAs[Long]("dotl") == 0L && r(2).getAs[Double]("cos") == 0.0)

    // sub-k token arrays: shingle set degenerates to ONE whole-doc hash
    assert(r(3).getAs[collection.Seq[Long]]("sh").size == 1)
    assert(r(2).getAs[collection.Seq[Long]]("sh").size == 1) // even empty docs
    // positional n-grams are empty below k — the documented asymmetry
    assert(r(3).getAs[collection.Seq[Long]]("ngrams").isEmpty)
    assert(r(0).getAs[collection.Seq[Long]]("ngrams").size == 4) // 5 tokens, k=2

    // repetition stats [n_tokens, n_distinct_kgrams, max_token_count]
    assert(r(2).getAs[collection.Seq[Long]]("rep") == Seq(0L, 1L, 0L))
    assert(r(4).getAs[collection.Seq[Long]]("rep")(0) == 5L)
    assert(r(4).getAs[collection.Seq[Long]]("rep")(2) == 4L) // "a" appears 4 times

    // BPE leftmost non-overlapping: a a a b a → a_a a b a
    assert(r(4).getAs[collection.Seq[String]]("bpe") == Seq("a_a", "a", "b", "a"))
    assert(r(0).getAs[collection.Seq[String]]("bpe") == Seq("the", "cat", "sat", "on", "mat"))

    // self-intersection = set size; self-jaccard = 1.0
    assert(r(0).getAs[Long]("sic") == r(0).getAs[collection.Seq[Long]]("sh").size.toLong)
    assert(r(0).getAs[Double]("jacc") == 1.0)

    // packed-pair probe: (1,2) in the set, (5,6) and (2,1) not (order matters)
    assert(r(0).getAs[Boolean]("pair"))
    assert(!r(3).getAs[Boolean]("pair"))
    assert(!r(4).getAs[Boolean]("pair"))

    // bloom: all-ones bitset hits everything (shingle sets are never empty),
    // all-zeros hits nothing
    assert(r(0).getAs[Boolean]("bloom1") && !r(0).getAs[Boolean]("bloom0"))

    // deflate: empty text is defined as incompressible (10⁶ ppm); repeated
    // text compresses below it
    assert(r(2).getAs[Long]("defl") == 1000000L)
    assert(r(0).getAs[Long]("defl") < 1000000L)

    // prefix rank sort keeps the array a permutation of its input
    assert(r(0).getAs[collection.Seq[Long]]("prs").sorted == r(0).getAs[collection.Seq[Long]]("sh").sorted)

    // minhash signature length is exactly numHashes; bands exactly `bands`
    assert(r(0).getAs[collection.Seq[Long]]("sig").size == 8)
    assert(r(0).getAs[collection.Seq[Long]]("bands").size == 4)
  }

  test("SQL-registered names evaluate identically to the Column builders") {
    Exprs.registerAll(spark)
    val df = fixture()
    df.createOrReplaceTempView("exprs_fixture")
    val viaSql = spark.sql(
      """SELECT id, dot_l(la, lb) AS dotl, simhash64(toks) AS simh,
        |       lang_id(txt) AS lang,
        |       sorted_intersect_count(shingle_hashes(toks), shingle_hashes(toks)) AS sic
        |FROM exprs_fixture ORDER BY id""".stripMargin).collect().toSeq.map(_.toSeq)
    val viaCols = df.select(col("id"),
        Exprs.dot_l(col("la"), col("lb")).as("dotl"),
        Exprs.simhash64(col("toks")).as("simh"),
        Exprs.lang_id(col("txt")).as("lang"),
        Exprs.sorted_intersect_count(Exprs.shingle_hashes(col("toks"), 3),
          Exprs.shingle_hashes(col("toks"), 3)).as("sic"))
      .orderBy("id").collect().toSeq.map(_.toSeq)
    assert(viaSql == viaCols)
  }
}
