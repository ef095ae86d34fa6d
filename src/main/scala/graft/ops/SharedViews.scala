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
    * blocks instead of re-running the mining lineage. */
  def materialized(spark: SparkSession, tag: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(
      Key(System.identityHashCode(spark), spark.sparkContext.applicationId, tag),
      _ => build.localCheckpoint())
}
