package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Exprs

/** SparkSessionExtensions entry point: installs the graft function surface
  * into any session at build time —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *
  * This is the deployment-grade registration (catalog-level, survives
  * `newSession()`), complementing [[Exprs.registerAll]]'s per-session
  * temp-function path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("cosine_sim", "cosine_sim(array<float>, array<float>) - cosine similarity",
      es => Exprs.CosineSim(es(0), es(1)))
    inject("dot_f", "dot_f(array<float>, array<float>) - dot product",
      es => Exprs.DotF(es(0), es(1)))
    inject("simhash64", "simhash64(array<string>) - 64-bit SimHash of tokens",
      es => Exprs.SimHash64(es(0)))
    inject("lang_id", "lang_id(string) - heuristic language id (de/en/es/fr/zh)",
      es => Exprs.LangId(es(0)))
    inject("shingle_hashes", "shingle_hashes(array<string>) - distinct sorted 3-shingle hashes",
      es => Exprs.ShingleHashes(es(0), 3))
    inject("repetition_stats",
      "repetition_stats(array<string>) - [n_tokens, n_distinct_2grams, max_token_count]",
      es => Exprs.RepetitionStats(es(0), 2))
    inject("smix64", "smix64(bigint) - SplitMix64 mix of a 64-bit key",
      es => Exprs.Smix64(org.apache.spark.sql.catalyst.expressions.Cast(
        es(0), org.apache.spark.sql.types.LongType)))
    inject("minhash_sig", "minhash_sig(array<string>) - 16-hash MinHash signature of 3-shingles",
      es => Exprs.MinHashSig(es(0), 3, 16))
    inject("band_hashes", "band_hashes(array<bigint>) - 16 LSH band keys of a MinHash signature",
      es => Exprs.BandHashes(es(0), 16))
    inject("winnow_fingerprint",
      "winnow_fingerprint(string) - winnowing fingerprint hashes (k=8, w=16)",
      es => Exprs.WinnowFingerprint(es(0), 8, 16))
    inject("hyperplane_bucket",
      "hyperplane_bucket(array<float>) - 16-bit random-hyperplane LSH bucket",
      es => Exprs.HyperplaneBucket(es(0), 16, 42L))

    // custom operator stack (build-brief preference c): exact-k reservoir
    // sampling — LogicalPlan + SparkStrategy + SparkPlan
    ext.injectPlannerStrategy(_ => graft.plans.ReservoirSampleStrategy)
    // custom optimizer rule (preference b): column pruning through the
    // reservoir — Catalyst's ColumnPruning can't see through a foreign node
    ext.injectOptimizerRule(_ => graft.plans.ReservoirColumnPruning)
  }
}
