package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership prefilter — the join-free fast path for
  * incremental corpus dedup (the batch-vs-corpus problem `incrDedup`
  * solves with a band-table join).
  *
  * The corpus side compresses to a bit array (~1.2 GB per 10⁹
  * fingerprints at 1 % fpp) built by ONE map-side-combined aggregate —
  * Spark's own `BloomFilterAggregate`, the engine's runtime-join-filter
  * kernel, driven here as a first-class operator. Probing is a pure
  * narrow `BloomFilterMightContain` expression: each batch row answers
  * "possibly seen?" against broadcast bits with zero shuffle and zero
  * join. The contract is one-sided: NO FALSE NEGATIVES (a row the
  * filter rejects is definitely new), false positives at rate ~fpp
  * (rows the filter admits still need the exact check). So a 100 TB
  * ingest touches the corpus table only for the ~fpp·|batch| maybe-dup
  * sliver instead of shuffling the whole batch against a billion-row
  * fingerprint table:
  *
  *   definitelyNew = batch.filter(!mightContain)   // narrow, join-free
  *   trueDups      = maybeDup ⋈ corpus             // tiny remainder
  *
  * Scale notes. The built bits ship to probes as a plan literal —
  * fine to ~100 MB (plan broadcast); beyond that keep the corpus
  * PARTITIONED by fingerprint range and build one bloom per range so
  * each probe task loads only its range's bits. Spark caps a single
  * `BloomFilterAggregate` at `spark.sql.optimizer.runtime.bloomFilter.
  * creationSideThreshold`-independent hard limits
  * (`...bloomFilter.maxNumItems` / `maxNumBits`, defaults 4 M items /
  * 64 M bits); raise them for corpus-scale builds or shard as above.
  *
  * Hashing: values are reduced with `xxhash64` BEFORE insertion (the
  * same contract the engine's own runtime filters use: the aggregate
  * inserts longs, `BloomFilterMightContain` probes the long hash of
  * the value). Fingerprints are md5 strings here, so the 64-bit
  * reduction adds a ~2⁻⁶⁴ per-pair collision — absorbed into the fpp
  * budget, and immaterial next to the filter's own error.
  *
  * Cited behavior: reference jp-qcew re-ingests only missing
  * (year, qtr) partitions (`data_process.py:118-131`); this is the
  * row-granular version of the same idempotence idea at corpus scale.
  */
object Bloom {

  /** Optimal bit count for `n` items at false-positive rate `fpp`
    * (standard  m = -n·ln p / (ln 2)² ).
    */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1; got n=$n fpp=$fpp")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Build the corpus bloom filter over `item` in ONE distributed
    * aggregate (map-side partial blooms OR-merged at the single
    * reducer). Returns None on empty input — there is nothing to
    * probe against, and callers must treat every batch row as new.
    *
    * The result is a durable artifact: persist it beside the corpus
    * snapshot and reuse it across every subsequent ingest batch —
    * rebuilding only when the corpus grows past `expectedItems`.
    */
  def build(df: DataFrame, item: Column, expectedItems: Long,
            fpp: Double = 0.01): Option[Array[Byte]] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(item))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(df.select(ColumnBridge.column(agg).as("bloom"))
      .head().getAs[Array[Byte]](0))
  }

  /** Membership probe column: true = possibly in the built set,
    * false = DEFINITELY not. Narrow (no shuffle, no join); the bits
    * ride the serialized plan.
    */
  def mightContain(bloomBits: Array[Byte], item: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBits, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(item)))))

  /** Split an ingest batch against a corpus fingerprint set:
    * (definitelyNew, maybeDup). `definitelyNew` is exact-by-contract
    * (no false negatives) and computed with NO join; only `maybeDup`
    * (~fpp of the batch plus true dups) needs the exact corpus probe.
    */
  def prefilterNew(batch: DataFrame, corpus: DataFrame, item: Column,
                   expectedItems: Long, fpp: Double = 0.01)
      : (DataFrame, DataFrame) =
    build(corpus, item, expectedItems, fpp) match {
      case None => (batch, batch.limit(0))
      case Some(bits) =>
        val hit = mightContain(bits, item)
        (batch.filter(!hit), batch.filter(hit))
    }
}
