package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE-style tokenizer training on the cluster (Sennrich et al. '16 shape):
  * `merges` rounds of count-adjacent-pairs → pick the most frequent →
  * rewrite every occurrence, over the whole corpus.
  *
  * Scale shape per round: pair counting is ONE map-side-combining aggregate
  * over the current token table (shuffle = distinct-pair partials), the
  * winning pair is a 1-row TakeOrdered collect (driver state = `merges`
  * pairs total), and the rewrite is a codegen'd map-side expression
  * ([[graft.functions.Exprs.BpeMergePair]]) with the pair riding as a
  * constant. Each round localCheckpoints the rewritten token table, so
  * round t rereads stored blocks instead of re-running t-1 merge passes —
  * linear total cost, the standard iterative-refinement discipline (x28's
  * convergence loop). At 100 TB you run this on a corpus sample; the plan
  * shape is the same.
  *
  * Determinism: ties on pair count break lexicographically on (lhs, rhs);
  * the rewrite consumes leftmost non-overlapping occurrences ("a a a" with
  * pair (a,a) → ["a_a", "a"]). Both rules are re-spelled exactly in the
  * DuckDB oracle ([[bpeSql]]), which carries the corpus between rounds as
  * double-space-joined strings so plain `replace()` reproduces the
  * non-overlapping merge scan. Merged symbols join with '_' — distinct
  * from anything in a whitespace-tokenized corpus.
  */
object Bpe {

  /** Train `merges` BPE merges; returns (merge_rank, lhs, rhs, pair_count)
    * — the learned merge table, most-frequent-first. Stops early if the
    * corpus runs out of adjacent pairs.
    *
    * Merge rounds are BATCHED where provably equivalent to the sequential
    * algorithm: each pair-count job collects the top (want+1) pairs and
    * applies the longest rank-contiguous prefix p₁..pₘ that is
    * (a) pairwise symbol-disjoint, (b) free of self-pairs (lhs == rhs),
    * and (c) strictly more frequent than the first excluded pair
    * (cₘ > cₘ₊₁; absent pair counts as 0). Under (a)+(b), merging pⱼ
    * leaves every other accepted pair's occurrences untouched (l ≠ r
    * makes all pⱼ occurrences non-overlapping, so its count drops to 0,
    * and disjointness means no accepted pair's tokens are consumed), so
    * the recorded counts equal the sequential ones; every pair a merge
    * CREATES (x·lⱼrⱼ / lⱼrⱼ·y / lⱼrⱼ·lⱼrⱼ) is count-bounded by an old
    * pair sharing a symbol with pⱼ — necessarily OUTSIDE the disjoint
    * prefix, hence ranked ≤ cₘ₊₁ < cᵢ by (c) — and every pair a merge
    * touches otherwise only loses count. So at each intermediate step i
    * the (c desc, lhs, rhs)-max of the rewritten corpus is exactly pᵢ,
    * i.e. the batch replays the sequential trajectory. When the prefix
    * collapses (m = 0: top pair is a self-pair or ties into an
    * interaction), the round falls back to the always-correct single
    * merge. One rewrite projection chains the batch's codegen'd
    * [[graft.functions.Exprs.BpeMergePair]] constants, so a batch of m
    * costs one job + one checkpoint instead of m of each. */
  def bpeMerges(docs: DataFrame, textCol: String, merges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs.select(Dedup.tokens(col(textCol)).as("toks")).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var t = 1
    var exhausted = false
    while (t <= merges && !exhausted) {
      val want = merges - t + 1
      val top = cur
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS lhs, toks[i + 1] AS rhs))"))
          .as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(want + 1)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // longest disjoint self-pair-free rank prefix …
        var m = 0
        val used = scala.collection.mutable.Set.empty[String]
        var ok = true
        while (ok && m < math.min(want, top.length)) {
          val (l, r, _) = top(m)
          if (l == r || used(l) || used(r)) ok = false
          else { used += l; used += r; m += 1 }
        }
        // … shrunk until strictly above the first excluded count (ties
        // could let a merge-created pair win a lex tie-break mid-batch)
        while (m > 1 && m < top.length && top(m - 1)._3 <= top(m)._3) m -= 1
        if (m == 0) m = 1 // single merge is sequentially exact regardless
        val batch = top.take(m)
        batch.zipWithIndex.foreach { case ((l, r, c), j) =>
          learned += (((t + j).toLong, l, r, c)) }
        cur = cur
          .withColumn("toks", batch.foldLeft(col("toks")) { case (acc, (l, r, _)) =>
            graft.functions.Exprs.bpe_merge_pair(acc, l, r) })
          .localCheckpoint()
        t += m
      }
    }
    learned.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** The x104 oracle: the same training loop unrolled as CTEs. The corpus
    * state between rounds is ' tok1  tok2  ... ' (double-space separators,
    * single-space fences), so the round-t rewrite is
    * `replace(s, ' l  r ', ' l_r ')` — SQL replace scans left-to-right
    * non-overlapping, exactly the kernel's merge scan, and the match
    * consuming one space from each flanking separator preserves the
    * invariant. */
  def bpeSql(table: String, textCol: String, merges: Int): String = {
    val rounds = (1 to merges).map { t =>
      s"""p$t AS (
         |  SELECT pr.lhs AS lhs, pr.rhs AS rhs, count(*) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(tk)),
         |      i -> struct_pack(lhs := tk[i], rhs := tk[i + 1]))) AS pr
         |    FROM (SELECT list_transform(string_split(s, '  '), x -> trim(x)) AS tk
         |          FROM s${t - 1}))
         |  GROUP BY 1, 2),
         |t$t AS (SELECT lhs, rhs, c FROM p$t ORDER BY c DESC, lhs, rhs LIMIT 1),
         |s$t AS (
         |  SELECT replace(s, ' ' || t.lhs || '  ' || t.rhs || ' ',
         |                    ' ' || t.lhs || '_' || t.rhs || ' ') AS s
         |  FROM s${t - 1}, t$t t)""".stripMargin
    }.mkString(",\n")
    val unioned = (1 to merges).map { t =>
      s"SELECT $t AS merge_rank, lhs, rhs, CAST(c AS BIGINT) AS pair_count FROM t$t"
    }.mkString("\nUNION ALL ")
    s"""WITH s0 AS (
       |  SELECT ' ' || array_to_string(string_split_regex(lower($textCol), '\\s+'), '  ') || ' ' AS s
       |  FROM $table),
       |$rounds
       |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs, pair_count FROM (
       |$unioned)
       |ORDER BY merge_rank""".stripMargin
  }

  /** ENCODE with a trained merge table: apply the `merges` learned rewrites
    * in rank order and report per-source token counts + compression.
    *
    * The scale contrast with [[bpeMerges]] is the point: training is
    * iterative (a job per merge), but encoding is ONE map pass — the merge
    * table collects to the driver (`merges` rows — bounded by construction)
    * and rides into a single projection as a chain of codegen'd
    * [[graft.functions.Exprs.BpeMergePair]] constants, so a 100 TB corpus
    * encodes in one scan with zero shuffles before the final per-source
    * aggregate. Compression is all-integer (`⌊10⁶·tok_bpe/tok_raw⌋`). */
  def bpeEncodeReport(docs: DataFrame, srcCol: String, textCol: String,
      merges: Int = 6): DataFrame = {
    val table = bpeMerges(docs, textCol, merges).collect()
      .sortBy(_.getLong(0))
    val base = docs.select(col(srcCol).as("source"),
        Dedup.tokens(col(textCol)).as("toks"))
      .withColumn("n_raw", size(col("toks")).cast("long"))
    val encoded = table.foldLeft(base) { (df, m) =>
      df.withColumn("toks",
        graft.functions.Exprs.bpe_merge_pair(col("toks"), m.getString(1), m.getString(2)))
    }
    encoded
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_raw")).as("tok_raw"),
        sum(size(col("toks")).cast("long")).as("tok_bpe"))
      .select(col("source"), col("n_docs"), col("tok_raw"), col("tok_bpe"),
        expr("(tok_bpe * 1000000) DIV tok_raw").as("compression_ppm"))
      .orderBy(col("source"))
  }

  /** The x118 oracle: [[bpeSql]]'s training rounds rederived verbatim (the
    * oracle must learn the same table), with source + raw length carried
    * through the rewrite chain and folded per source at the end. */
  def bpeEncodeSql(table: String, srcCol: String, textCol: String, merges: Int): String = {
    val rounds = (1 to merges).map { t =>
      s"""p$t AS (
         |  SELECT pr.lhs AS lhs, pr.rhs AS rhs, count(*) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(tk)),
         |      i -> struct_pack(lhs := tk[i], rhs := tk[i + 1]))) AS pr
         |    FROM (SELECT list_transform(string_split(s, '  '), x -> trim(x)) AS tk
         |          FROM s${t - 1}))
         |  GROUP BY 1, 2),
         |t$t AS (SELECT lhs, rhs, c FROM p$t ORDER BY c DESC, lhs, rhs LIMIT 1),
         |s$t AS (
         |  SELECT src, n_raw,
         |    replace(s, ' ' || t.lhs || '  ' || t.rhs || ' ',
         |               ' ' || t.lhs || '_' || t.rhs || ' ') AS s
         |  FROM s${t - 1}, t$t t)""".stripMargin
    }.mkString(",\n")
    s"""WITH s0 AS (
       |  SELECT $srcCol AS src,
       |    CAST(len(string_split_regex(lower($textCol), '\\s+')) AS BIGINT) AS n_raw,
       |    ' ' || array_to_string(string_split_regex(lower($textCol), '\\s+'), '  ') || ' ' AS s
       |  FROM $table),
       |$rounds
       |SELECT src AS source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_raw) AS BIGINT) AS tok_raw,
       |  CAST(sum(len(string_split(s, '  '))) AS BIGINT) AS tok_bpe,
       |  (CAST(sum(len(string_split(s, '  '))) AS BIGINT) * 1000000)
       |    // CAST(sum(n_raw) AS BIGINT) AS compression_ppm
       |FROM s$merges GROUP BY src ORDER BY source""".stripMargin
  }
}
