package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of graft's custom Catalyst expressions, so they are
  * callable from `spark.sql(...)` exactly like built-ins:
  *
  *  - at session build: `.withExtensions(new GraftExtensions)` (the
  *    SparkSessionExtensions injection point — cluster deployments set
  *    `spark.sql.extensions=graft.functions.GraftExtensions`);
  *  - on an existing session: `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    // conf-gated (spark.graft.rangeJoin.binWidth); no-op until enabled
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // plans graft's native operators (AsOfJoinPlan → AsOfJoinExec);
    // AsOf.joinMerge also self-attaches via experimental.extraStrategies
    // so existing sessions work without the extension
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  /** name → expression builder for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_signature" -> (es => MinHashSignatureExpr(es.head, intArg(es(1), "minhash_signature"))),
    "simhash_blocks" -> (es => SimHashBlocksExpr(es.head)),
    "md5_simhash_blocks" -> (es => Md5SimHashBlocksExpr(es.head)),
    "dot_product" -> (es => DotProductExpr(es.head, es(1))),
    "word_shingles" -> (es => WordShinglesExpr(es.head, intArg(es(1), "word_shingles"))),
    "cosine_sim" -> (es => CosineSimExpr(es.head, es(1))),
    "srp_bucket" -> (es => SrpBucketExpr(es.head,
      intArg(es(1), "srp_bucket"), if (es.length > 2) intArg(es(2), "srp_bucket") else 0)),
    "text_stats" -> (es => TextStatsExpr(es.head)),
    "char_ngrams" -> (es => CharNgramsExpr(es.head, intArg(es(1), "char_ngrams"))),
    "jaccard_sim" -> (es => JaccardExpr(es.head, es(1))),
    "gram_hashes" -> (es => GramHashesExpr(es.head, intArg(es(1), "gram_hashes"))),
    "jaccard_sim_hashed" -> (es => JaccardLongExpr(es.head, es(1))),
  )

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}
