package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast bloom-filter join pre-filter — the explicit form of Spark's
  * own runtime row-level filtering (`InjectRuntimeFilter` /
  * `BloomFilterMightContain`), exposed as an operator so a selective
  * dim→fact join can skip fact rows BEFORE the join's shuffle even when
  * the injection rule's size thresholds don't trigger.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table into a sort-merge join and shuffling only the ~|dim| matching
  * share of it: the bloom is built from ONE aggregation over the dim
  * side (a few MB of bits, driver-held like the IVF probe lists), then
  * rides the fact SCAN as the codegen'd Catalyst
  * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * predicate — no UDF, no shuffle, no false negatives. The join that
  * follows removes the bloom's false positives, so results are exactly
  * the plain join's (which is what the oracle replays).
  *
  * The bloom keys are `xxhash64(key)` longs — the same convention the
  * engine's injected runtime filter uses, so the sketch format and the
  * probe expression agree. */
object BloomJoin {

  /** `fact` rows whose `factKey` might be in `dim`'s `dimKey` set (no
    * false negatives; fpp-bounded false positives). `expectedDimKeys`
    * sizes the sketch — it's a hint, not a bound (an undersized bloom
    * only raises fpp, never drops a key). */
  def bloomPrefilter(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedDimKeys > 0, "expectedDimKeys must be positive")
    // xxhash64 is TYPE-sensitive (an INT and a BIGINT with equal values
    // hash differently), so a dim/fact key dtype mismatch would make
    // every probe miss — silent false negatives, the one thing a bloom
    // must never do. Hash the dim key AS the fact key's type.
    val factType = fact.schema(factKey).dataType
    val bloom = dim.select(xxhash64(col(dimKey).cast(factType)).as("__h"))
      .stat.bloomFilter("__h", expectedDimKeys, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.graft.Bridge
    val might = Bridge.column(BloomFilterMightContain(
      Literal(bytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(Bridge.expression(col(factKey))))))
    fact.where(might)
  }
}
