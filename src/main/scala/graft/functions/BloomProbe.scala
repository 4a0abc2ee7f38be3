package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** SQL surface `bloom_might_contain(filter_binary, long_value)` over
  * Spark's native [[BloomFilterMightContain]] expression — the codegen'd
  * probe used by Spark's own runtime row-level filtering. Spark 4.1 does
  * not register it in the public FunctionRegistry, so the engine injects it
  * (like [[Md5Hash48]]): probing a pre-built filter stays inside
  * whole-stage codegen instead of crossing a Scala-UDF boundary per row.
  *
  * The filter argument is the `writeTo` serialization of a
  * `util.sketch.BloomFilter` (what `df.stat.bloomFilter` builds); both that
  * builder and `mightContainLong` consume raw longs, so no extra hashing
  * is applied on either side.
  */
object BloomProbe {
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "bloom_might_contain takes (filter binary, long value)")
      BloomFilterMightContain(children.head, children(1))
    },
  )
}
