package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.Skew
import org.apache.spark.sql.functions._

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("custom expressions callable from SQL after registration") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s")
      .as[Double].head() === 1.0)
    assert(spark.sql("SELECT size(word_shingles('a b c d', 3)) AS n").as[Int].head() === 2)
    assert(spark.sql("SELECT size(minhash_signature(word_shingles('a b c d e', 2), 8)) AS n")
      .as[Int].head() === 8)
    assert(spark.sql("SELECT text_stats('the cat and the dog.').n_tokens AS n")
      .as[Int].head() === 5)
    assert(spark.sql("SELECT srp_bucket(array(1.0D, -1.0D), 4, 0) AS b").as[Long].head() >= 0L)
    assert(spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head() === 11.0)
    assert(spark.sql("SELECT size(md5_simhash_blocks(array('a', 'b'))) AS n")
      .as[Int].head() === 4)
    // SQL results agree with the Column API on real data
    Tables.t(spark, sf, "documents").limit(20).createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql("SELECT doc_id, simhash_blocks(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')) AS b FROM docs_ext")
      .as[(Long, Seq[Long])].collect().toMap
    val viaCol = Tables.t(spark, sf, "documents").limit(20)
      .select(col("doc_id"), graft.llm.Dedup.simhashBlocks(col("text")).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql === viaCol)
  }

  test("GraftExtensions injects functions at session build") {
    val orig = spark // keep a handle; builder getOrCreate would return it
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val one = s2.sql("SELECT cosine_sim(array(3.0D, 0.0D), array(7.0D, 0.0D)) AS s")
        .collect()(0).getDouble(0)
      assert(one === 1.0)
      // the injected optimizer rule fires on this session when enabled
      import s2.implicits._
      s2.conf.set("spark.graft.rangeJoin.binWidth", "100")
      val pts = (0L until 500L).map(i => (i, i % 1000)).toDF("pid", "pt")
      val iv = (0L until 10L).map(i => (i, i * 100, i * 100 + 99)).toDF("iid", "lo", "hi")
      val joined = pts.join(iv, pts("pt") >= iv("lo") && pts("pt") <= iv("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"extensions-injected RangeJoinRewrite should apply: ${plan.take(600)}")
      assert(joined.count() === 500)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
    }
  }

  test("salted join equals plain join") {
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(orders, "l_orderkey")
    val salted = Skew.saltedJoin(li, orders, "l_orderkey", salts = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    val b = salted.groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(a === b)
  }
}
