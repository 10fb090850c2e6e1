package graft.functions

import org.apache.spark.sql.{GraftFunctionBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** SQL-surface registration for graft's custom expressions: after
  * [[register]] (or installing [[GraftExtensions]] via
  * `spark.sql.extensions`), `spark.sql` text can call `vec_dot`,
  * `vec_l2sq`, `vec_cosine` and `shingle_hashes` directly — the SQL
  * interface the reference lacks entirely, over the same codegen
  * expressions the DataFrame API uses. */
object GraftFunctions {

  // one helper per expected type: a boolean where an int is required (or a
  // typed null) must fail HERE with the argument's name, not later with an
  // opaque ClassCastException from an erased cast
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: java.lang.Integer, IntegerType) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a non-null INT literal, got $other")
  }
  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: java.lang.Boolean, BooleanType) => v.booleanValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a non-null BOOLEAN literal, got $other")
  }

  /** name -> (implementing class, builder from SQL argument list). */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", classOf[VectorExprs.DotProduct].getName,
      args => VectorExprs.DotProduct(args(0), args(1))),
    ("vec_l2sq", classOf[VectorExprs.L2SqDistance].getName,
      args => VectorExprs.L2SqDistance(args(0), args(1))),
    ("vec_cosine", classOf[VectorExprs.CosineSim].getName,
      args => VectorExprs.CosineSim(args(0), args(1))),
    ("shingle_hashes", classOf[TextExprs.ShingleHashes].getName,
      args => TextExprs.ShingleHashes(args(0),
        intLit(args(1), "shingle width n"),
        if (args.length > 2) boolLit(args(2), "trailing") else true)),
    ("minhash_sig", classOf[TextExprs.MinHashSig].getName,
      args => TextExprs.MinHashSig(args(0), intLit(args(1), "numPerms"))),
    ("simhash_bits", classOf[TextExprs.SimHashBits].getName,
      args => TextExprs.SimHashBits(args(0),
        if (args.length > 1) intLit(args(1), "bits") else 64)),
    ("md5_shingle_hashes", classOf[TextExprs.Md5ShingleHashes].getName,
      args => TextExprs.Md5ShingleHashes(args(0),
        intLit(args(1), "shingle width n"),
        if (args.length > 2) boolLit(args(2), "trailing") else true)),
    ("adc_lookup", classOf[VectorExprs.AdcLookup].getName,
      args => VectorExprs.AdcLookup(args(0), args(1),
        intLit(args(2), "codebook size k"))),
    ("bq_pack", classOf[VectorExprs.BqPack].getName,
      args => VectorExprs.BqPack(args(0))),
    ("bq_hamming", classOf[VectorExprs.BqHamming].getName,
      args => VectorExprs.BqHamming(args(0), args(1))),
    ("deflate_ratio", classOf[TextExprs.DeflateRatio].getName,
      args => TextExprs.DeflateRatio(args(0),
        if (args.length > 1) intLit(args(1), "deflate level") else 6)),
    ("nfc_normalize", classOf[TextExprs.NfcNormalize].getName,
      args => TextExprs.NfcNormalize(args(0))),
    ("strip_accents", classOf[TextExprs.StripAccents].getName,
      args => TextExprs.StripAccents(args(0))))

  /** Idempotent registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, cls, builder) =>
      GraftFunctionBridge.register(spark, name, cls, builder) }
}

/** `spark.sql.extensions` entry point: sessions built with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) get the functions without any
  * code call. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, cls, builder) =>
      ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(cls, name),
        builder))
    }
}
