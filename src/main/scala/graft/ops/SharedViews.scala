package graft.ops

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized intermediates.
  *
  * A corpus-scale mining job (the exact near-dup pair graph, a document-
  * frequency table) is computed ONCE per corpus snapshot in a real
  * deployment and its output persisted for every downstream consumer —
  * clustering, survivor selection, governance reports, audit queries all
  * READ the pair table; none of them re-mines the corpus. This memo is the
  * in-session spelling of that materialization: the first consumer builds
  * and `localCheckpoint`s the relation, later consumers (and re-runs inside
  * the same session) reuse the checkpointed blocks.
  *
  * Keyed by (session identity, applicationId, tag) so that distinct
  * SparkSessions — test suites each build their own — never see each
  * other's blocks, and a tag naturally includes the corpus path so
  * different inputs never alias. Entries die with the JVM; the relations
  * cached here are pair graphs and frequency tables, orders of magnitude
  * smaller than their input corpus.
  */
object SharedViews {

  private final case class Key(session: Int, app: String, tag: String)
  private val cache = new ConcurrentHashMap[Key, DataFrame]()

  /** Memoize `build` under `tag` for the lifetime of `spark`. The built
    * relation is eagerly materialized (`localCheckpoint`) so every consumer
    * — including the builder's own downstream stages — starts from stored
    * blocks instead of re-running the mining lineage.
    *
    * Deliberately get-then-putIfAbsent, NOT computeIfAbsent: builds NEST
    * (the CC labels build reads the memoized pair graph; the co-purchase
    * edges build reads the memoized baskets), and a computeIfAbsent
    * re-entered for a different key can land in the same hash bin and
    * throw ConcurrentHashMap's "Recursive update" — a bin-placement
    * lottery. The worst case here is two racing threads each paying one
    * redundant checkpoint; correctness is unaffected. */
  def materialized(spark: SparkSession, tag: String)(build: => DataFrame): DataFrame = {
    val key = Key(System.identityHashCode(spark), spark.sparkContext.applicationId, tag)
    val existing = cache.get(key)
    if (existing != null) existing
    else {
      val built = build.localCheckpoint()
      val prev = cache.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }
}
