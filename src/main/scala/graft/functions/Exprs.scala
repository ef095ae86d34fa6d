package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the training-data-pipeline operators the
  * built-in function library lacks (MinHash, SimHash, winnowing, vector
  * similarity, language id).
  *
  * All are native `Expression`s with real `doGenCode` (they emit a single
  * static call into [[Ops]]), so they stay inside whole-stage codegen —
  * preference order (b) of the build brief: composition of built-ins would
  * re-hash every shingle per permutation (128× the work), a UDF would break
  * codegen entirely.
  */
object Exprs {

  /** cosine(array<float>, array<float>) → double */
  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Ops.cosine(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Ops.cosine($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** int8_quantize(array<float>) → binary: symmetric scalar quantization,
    * one byte per dimension ([[Ops.int8Quantize]]) — the storage codec of
    * the quantized IVF serving index. */
  case class Int8Quantize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(v: Any): Any =
      Ops.int8Quantize(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.int8Quantize($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** int8_cosine(array<float> query, binary code) → double: asymmetric
    * cosine against an [[Int8Quantize]]d corpus vector. */
  case class Int8Cosine(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(q: Any, code: Any): Any =
      Ops.int8Cosine(q.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        code.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (q, c) => s"graft.functions.Ops.int8Cosine($q, $c)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** dot(array<float>, array<float>) → double */
  case class DotF(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Ops.dotF(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Ops.dotF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** dot(array<bigint>, array<bigint>) → bigint, exact int64. */
  case class DotL(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Ops.dotL(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Ops.dotL($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** minhash_sig(array<string> tokens) → array<bigint>, k-token shingles. */
  case class MinHashSig(child: Expression, shingleK: Int, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Ops.minhashSig(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], shingleK, numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.minhashSig($c, $shingleK, $numHashes)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** oph_sig(array<string> tokens) → array<bigint>: one-permutation-hashing
    * MinHash with rotation densification ([[Ops.ophSig]]) — one hash per
    * shingle instead of `numBins`, the corpus-scale signature path. */
  case class OphSig(child: Expression, shingleK: Int, numBins: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Ops.ophSig(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], shingleK, numBins)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.ophSig($c, $shingleK, $numBins)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** band_hashes(array<bigint> sig) → array<bigint> of length `bands`. */
  case class BandHashes(child: Expression, bands: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Ops.bandHashes(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.bandHashes($c, $bands)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** shingle_hashes(array<string> tokens) → array<bigint>: the DISTINCT
    * SORTED k-shingle hash set of a token array, one codegen'd call. The
    * composed spelling (`transform` + `slice` + `concat_ws` + `xxhash64`)
    * is semantically identical but runs interpreted — Spark's higher-order
    * lambdas never enter whole-stage codegen and pay ~10µs/shingle in
    * per-element allocation; this kernel hashes token hashes directly
    * (no string rebuild) at ~0.1µs/shingle. Tokens never contain the join
    * delimiter (they are split on whitespace), so the hash partition of
    * shingle identity is the same as hashing the joined string. */
  case class ShingleHashes(child: Expression, shingleK: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Ops.shingleHashData(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], shingleK)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.shingleHashData($c, $shingleK)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ngram_hashes(array<string> tokens) → array<bigint>: POSITIONAL k-gram
    * hashes — one hash per window position, multiplicity and order kept
    * (unlike [[ShingleHashes]]' distinct sorted set). Docs shorter than k
    * yield an empty array. The count-on-hashes half of the
    * count/reconstruct top-k pattern: frequency aggregation shuffles 8-byte
    * keys, never n-gram strings. */
  case class NgramHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Ops.ngramHashData(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.ngramHashData($c, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** prefix_rank_sort(array<bigint>) → array<bigint>: the input shingle-hash
    * array re-sorted by (hot-document-frequency ASC, hash ASC), where the
    * hot table — the globally most frequent shingles — rides inside the
    * expression as two parallel long arrays hashed into an O(1) lookup at
    * deserialization. The PPJoin prefix-order kernel: shingles absent from
    * the hot table tie at df 0 and stay in hash order; boilerplate shingles
    * sort LAST and leave every prefix. (A literal Spark map was measured
    * and rejected: `element_at` over ArrayBasedMapData is a LINEAR scan of
    * the 4096 keys per comparison — 30× slower end-to-end.) */
  case class PrefixRankSort(child: Expression, hotKeys: Array[Long], hotDfs: Array[Long])
      extends UnaryExpression {
    @transient private lazy val hot: java.util.HashMap[java.lang.Long, java.lang.Long] = {
      val m = new java.util.HashMap[java.lang.Long, java.lang.Long](hotKeys.length * 2)
      var i = 0
      while (i < hotKeys.length) { m.put(hotKeys(i), hotDfs(i)); i += 1 }
      m
    }
    def rank(v: org.apache.spark.sql.catalyst.util.ArrayData)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val n = v.numElements()
      val xs = new Array[java.lang.Long](n)
      var i = 0
      while (i < n) { xs(i) = v.getLong(i); i += 1 }
      java.util.Arrays.sort(xs, new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int = {
          val da = hot.getOrDefault(a, 0L).longValue()
          val db = hot.getOrDefault(b, 0L).longValue()
          if (da != db) java.lang.Long.compare(da, db)
          else java.lang.Long.compare(a.longValue(), b.longValue())
        }
      })
      val out = new Array[Long](n)
      i = 0
      while (i < n) { out(i) = xs(i).longValue(); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      rank(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("prefixRankSort", this, classOf[PrefixRankSort].getName)
      defineCodeGen(ctx, ev, c => s"$ref.rank($c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** sorted_intersect_count(array<bigint>, array<bigint>) → bigint: merge
    * walk over two ascending duplicate-free arrays (ShingleHashes output).
    * Zero allocation per pair vs size(array_intersect)'s hash set + array. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Ops.sortedIntersectCount(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Ops.sortedIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** repetition_stats(array<string> tokens) → array<bigint>
    * `[n_tokens, n_distinct_kgrams, max_token_count]`: the per-document
    * repetition signals in one codegen'd pass — replaces an explode +
    * two-level aggregation + join (three shuffles) with zero shuffles. */
  case class RepetitionStats(child: Expression, shingleK: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Ops.repetitionStats(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], shingleK)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.repetitionStats($c, $shingleK)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** jaccard_shingles(array<string>, array<string>) → double (exact). */
  case class JaccardShingles(left: Expression, right: Expression, shingleK: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Ops.jaccardShingles(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], shingleK)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Ops.jaccardShingles($a, $b, $shingleK)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** simhash64(array<string> tokens) → bigint */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Ops.simhash64(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.simhash64($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** winnow_fingerprint(string) → array<bigint> */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Ops.winnowFingerprint(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.winnowFingerprint($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** hyperplane_bucket(array<float>) → bigint — random-hyperplane LSH. */
  case class HyperplaneBucket(child: Expression, nbits: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Ops.hyperplaneBucket(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nbits, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.hyperplaneBucket($c, $nbits, ${seed}L)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** bloom_any(array<bigint> shingles) → boolean — true iff any shingle
    * hash maybe-hits the bloom bitset carried IN the expression (not as a
    * child literal: a 2^20-bit filter as a CreateArray of 16K children
    * would blow up codegen; `ctx.addReferenceObj` ships it with the task
    * binary instead, the broadcast-equivalent path). Stays inside
    * whole-stage codegen. */
  case class BloomAnyExpr(child: Expression, bits: Array[Long]) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(v: Any): Any =
      Ops.bloomAny(bits, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.bloomAny($ref, $c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** deflate_ratio_ppm(string) → bigint — Deflater compression ratio on the
    * ppm grid; the compressibility quality signal. JVM-only semantics (no
    * SQL engine exposes deflate), so its consumers carry exact ScalaTest
    * oracles instead of DuckDB ones. */
  case class DeflateRatio(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Ops.deflateRatioPpm(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.deflateRatioPpm($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** pair_in_sorted_set(bigint v, bigint w) → boolean — exact membership of
    * the packed (v, w) pair in a sorted long array carried via
    * `ctx.addReferenceObj` (the BloomAnyExpr task-binary path, but exact):
    * the broadcast-hash-join-equivalent for EDGE SET probes, letting a
    * wedge stream test closure map-side instead of shuffling to a join. */
  case class PairInSortedSet(left: Expression, right: Expression, set: Array[Long])
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Ops.pairInSortedSet(set, a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pairSet", set, "long[]")
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Ops.pairInSortedSet($ref, $a, $b)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** cms_lookup(array<bigint> matrix, string token) → bigint — count-min
    * point estimate (min over rows at the token's double-hashed buckets);
    * rows/width ride as expression params, codegen'd. */
  case class CmsLookup(left: Expression, right: Expression, rows: Int, width: Int)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(m: Any, t: Any): Any =
      Ops.cmsLookup(m.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], rows, width)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (m, t) => s"graft.functions.Ops.cmsLookup($m, $t, $rows, $width)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** bpe_merge_pair(array<string>, l, r) → array<string> — one BPE merge
    * pass; the (l, r) pair rides as expression params (driver-known
    * constants per training round), codegen'd. */
  case class BpeMergePair(child: Expression, l: String, r: String)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    private lazy val lU = org.apache.spark.unsafe.types.UTF8String.fromString(l)
    private lazy val rU = org.apache.spark.unsafe.types.UTF8String.fromString(r)
    override protected def nullSafeEval(t: Any): Any =
      Ops.bpeMergePair(t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lU, rU)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("bpeL", lU)
      val rRef = ctx.addReferenceObj("bpeR", rU)
      defineCodeGen(ctx, ev, t => s"graft.functions.Ops.bpeMergePair($t, $lRef, $rRef)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** lang_id(string) → string */
  case class LangId(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(v: Any): Any =
      Ops.langId(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.langId($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** smix64(bigint) → bigint — SplitMix64 as a codegen'd column: the
    * shard-router's key hash. A SQL respell would need wrapping 64-bit
    * multiplies, which ANSI mode rejects; the native expression keeps the
    * Java wrap semantics and stays inside whole-stage codegen. */
  case class Smix64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Ops.splitmix64(v.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Ops.splitmix64($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // -------------------------------------------------------- Column builders
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(ex(a), ex(b)))
  def int8_quantize(v: Column): Column = col(Int8Quantize(ex(v)))
  def int8_cosine(q: Column, code: Column): Column = col(Int8Cosine(ex(q), ex(code)))
  def dot_f(a: Column, b: Column): Column = col(DotF(ex(a), ex(b)))
  def dot_l(a: Column, b: Column): Column = col(DotL(ex(a), ex(b)))
  def minhash_sig(tokens: Column, shingleK: Int = 3, numHashes: Int = 128): Column =
    col(MinHashSig(ex(tokens), shingleK, numHashes))
  def oph_sig(tokens: Column, shingleK: Int = 3, numBins: Int = 128): Column =
    col(OphSig(ex(tokens), shingleK, numBins))
  def band_hashes(sig: Column, bands: Int = 16): Column = col(BandHashes(ex(sig), bands))
  def jaccard_shingles(a: Column, b: Column, shingleK: Int = 3): Column =
    col(JaccardShingles(ex(a), ex(b), shingleK))
  def shingle_hashes(tokens: Column, shingleK: Int = 3): Column =
    col(ShingleHashes(ex(tokens), shingleK))
  def repetition_stats(tokens: Column, shingleK: Int = 2): Column =
    col(RepetitionStats(ex(tokens), shingleK))
  def simhash64(tokens: Column): Column = col(SimHash64(ex(tokens)))
  def winnow_fingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    col(WinnowFingerprint(ex(text), k, w))
  def hyperplane_bucket(vec: Column, nbits: Int = 16, seed: Long = 42L): Column =
    col(HyperplaneBucket(ex(vec), nbits, seed))
  def pair_in_sorted_set(a: Column, b: Column, set: Array[Long]): Column =
    col(PairInSortedSet(ex(a), ex(b), set))
  def deflate_ratio_ppm(text: Column): Column = col(DeflateRatio(ex(text)))
  def lang_id(text: Column): Column = col(LangId(ex(text)))
  def bpe_merge_pair(tokens: Column, l: String, r: String): Column =
    col(BpeMergePair(ex(tokens), l, r))
  def bloom_any(shingles: Column, bits: Array[Long]): Column =
    col(BloomAnyExpr(ex(shingles), bits))
  def cms_lookup(matrix: Column, token: Column, rows: Int, width: Int): Column =
    col(CmsLookup(ex(matrix), ex(token), rows, width))
  def sorted_intersect_count(a: Column, b: Column): Column =
    col(SortedIntersectCount(ex(a), ex(b)))
  def ngram_hashes(tokens: Column, k: Int): Column = col(NgramHashes(ex(tokens), k))
  def smix64(c: Column): Column = col(Smix64(ex(c)))
  def prefix_rank_sort(shingles: Column, hotKeys: Array[Long], hotDfs: Array[Long]): Column =
    col(PrefixRankSort(ex(shingles), hotKeys, hotDfs))

  /** Register the SQL-facing names so `spark.sql` users get the same surface
    * (reference EP3 parity: the analytics layer is plain SQL). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    def register(name: String, f: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, f, "scala_udf")
    register("cosine_sim", es => CosineSim(es(0), es(1)))
    register("int8_quantize", es => Int8Quantize(es(0)))
    register("int8_cosine", es => Int8Cosine(es(0), es(1)))
    register("dot_f", es => DotF(es(0), es(1)))
    register("dot_l", es => DotL(es(0), es(1)))
    register("simhash64", es => SimHash64(es(0)))
    register("lang_id", es => LangId(es(0)))
    register("shingle_hashes", es => ShingleHashes(es(0), 3))
    register("repetition_stats", es => RepetitionStats(es(0), 2))
    register("ngram_hashes", es => NgramHashes(es(0), 2))
    register("sorted_intersect_count", es => SortedIntersectCount(es(0), es(1)))
  }
}
