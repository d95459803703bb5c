package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.api.TypeWidening
import graft.llm.TextOps

/** Property-based tests (SURVEY §5 strategy item 5): type-widening
  * lattice laws and similarity-kernel invariants over random inputs.
  * Uses raw ScalaCheck (scalatestplus isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(prop: Prop, cases: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val numericTypes: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  test("widening is reflexive-by-equality, antisymmetric, transitive") {
    check(Prop.forAll(numericTypes, numericTypes, numericTypes) { (a, b, c) =>
      val refl = TypeWidening.canWiden(a, a)
      val anti = a == b || !(TypeWidening.canWiden(a, b) && TypeWidening.canWiden(b, a))
      val trans = !(TypeWidening.canWiden(a, b) && TypeWidening.canWiden(b, c)) ||
        TypeWidening.canWiden(a, c)
      refl && anti && trans
    }, cases = 100)
  }

  test("widening never accepts a non-numeric source or target") {
    check(Prop.forAll(numericTypes) { n =>
      !TypeWidening.canWiden(StringType, n) && !TypeWidening.canWiden(n, StringType)
    }, cases = 20)
  }

  private val word: Gen[String] = Gen.choose(1, 6).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaLowerChar))
  private val doc: Gen[String] = Gen.choose(2, 30).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))

  test("prefix-filter set-similarity join equals brute force on random corpora") {
    // random small token-set corpora at random thresholds: the prefix
    // pruning must lose no qualifying pair and admit no extra
    val corpus: Gen[List[List[String]]] = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 8).flatMap(m => Gen.listOfN(m, word))))
    val thresholds = Gen.oneOf((1, 2), (3, 5), (4, 5), (9, 10), (1, 1))
    check(Prop.forAll(corpus, thresholds) { case (docs, (num, den)) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t.distinct) }
        .toDF("id", "toks")
      val got = graft.llm.SetSimilarity.selfJoinPairs(df, num, den)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val sets = docs.map(_.distinct.toSet).zipWithIndex
      val truth = (for {
        (sa, ia) <- sets; (sb, ib) <- sets if ia < ib
        inter = (sa & sb).size; uni = (sa ++ sb).size
        if sa.nonEmpty && sb.nonEmpty && inter * den >= uni * num
      } yield (ia.toLong, ib.toLong)).toSet
      got == truth
    }, cases = 25)
  }

  test("positional shingle md5 kernel equals the transform/slice/md5 chain") {
    // the kernel replaced an interpreted HOF chain inside
    // Dedup.positionalShingles (q182/q190) — same md5 hex per position,
    // including the fewer-than-k empty case, multi-byte UTF-8 tokens,
    // and NULL elements (concat_ws skips them: no bytes, no separator —
    // round-14 advice pinned into the contract)
    val tok: Gen[String] =
      Gen.oneOf(word, Gen.const("ü§"), Gen.const("é"), Gen.const(null: String))
    val toksGen: Gen[List[String]] = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tok))
    val kGen = Gen.choose(1, 6)
    check(Prop.forAll(toksGen, kGen) { (toks, k) =>
      val df = Seq(Tuple1(toks)).toDF("toks")
      val kernel = df.select(
        graft.functions.Hashing.positionalShingleMd5(col("toks"), k).as("h"))
        .as[Seq[String]].collect().head
      // the production site filters n >= k before the expression, so the
      // chain is only defined there (sequence(1, 0) would run DESCENDING)
      val chain =
        if (toks.size < k) Seq.empty[String]
        else df.select(expr(
          s"transform(sequence(1, size(toks) - ${k - 1}), " +
            s"i -> md5(concat_ws(' ', slice(toks, i, $k))))").as("h"))
          .as[Seq[String]].collect().head
      kernel == chain
    }, cases = 25)
  }

  test("jaccard kernel: bounded, symmetric, self-similarity 1") {
    check(Prop.forAll(Gen.listOfN(8, doc)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .withColumn("sh", TextOps.wordShingles(col("text"), 2))
        .filter(size(col("sh")) > 0)
      val a = df.select(col("id").as("ia"), col("sh").as("sa"))
      val b = df.select(col("id").as("ib"), col("sh").as("sb"))
      val sims = a.crossJoin(b)
        .select(col("ia"), col("ib"), TextOps.jaccard(col("sa"), col("sb")).as("j"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      sims.forall { case ((x, y), j) =>
        j >= 0.0 && j <= 1.0 &&
          math.abs(j - sims((y, x))) < 1e-12 &&
          (x != y || j == 1.0)
      }
    }, cases = 10)
  }

  test("minhash signature similarity estimates jaccard within tolerance") {
    // near-dup construction: doc B = doc A with `edits` words replaced
    val gen = for {
      words <- Gen.listOfN(25, word)
      edits <- Gen.choose(0, 5)
    } yield (words, edits)
    check(Prop.forAll(gen) { case (words, edits) =>
      val a = words.mkString(" ")
      val b = (words.drop(edits) ++ Seq.fill(edits)("zzz")).mkString(" ")
      val df = Seq((1L, a), (2L, b)).toDF("id", "text")
        .select(col("id"),
          graft.functions.Hashing.minhashSignature(
            TextOps.wordShingles(col("text"), 2), 256).as("sig"),
          TextOps.wordShingles(col("text"), 2).as("sh"))
      val rows = df.collect().sortBy(_.getLong(0))
      val sigA = rows(0).getSeq[Long](1); val sigB = rows(1).getSeq[Long](1)
      val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 256
      val shA = rows(0).getSeq[String](2).toSet
      val shB = rows(1).getSeq[String](2).toSet
      val exact = shA.intersect(shB).size.toDouble / shA.union(shB).size
      math.abs(est - exact) < 0.2
    }, cases = 10)
  }

  test("cosine kernel: bounded and symmetric on random vectors") {
    val vec: Gen[List[Double]] = Gen.listOfN(16, Gen.choose(-1.0, 1.0))
    check(Prop.forAll(vec, vec) { (u, v) =>
      (!u.exists(_ != 0.0) || !v.exists(_ != 0.0)) || {
        val df = Seq((u, v)).toDF("u", "v")
        val s1 = df.select(graft.llm.Similarity.cosine(col("u"), col("v"))).as[Double].head()
        val s2 = df.select(graft.llm.Similarity.cosine(col("v"), col("u"))).as[Double].head()
        s1 >= -1.0 - 1e-9 && s1 <= 1.0 + 1e-9 && math.abs(s1 - s2) < 1e-12
      }
    }, cases = 10)
  }

  test("hashed-gram jaccard equals string-gram jaccard on random texts") {
    val word: Gen[String] = Gen.chooseNum(0, 400).map(n => s"w$n")
    val text: Gen[String] = Gen.listOfN(25, word).map(_.mkString(" "))
    check(Prop.forAll(text, text) { (ta, tb) =>
      val df = Seq((ta, tb)).toDF("a", "b")
      import graft.functions.Hashing
      val r = df.select(
        graft.llm.TextOps.jaccard(
          Hashing.charNgrams(col("a"), 4), Hashing.charNgrams(col("b"), 4)).as("js"),
        Hashing.jaccardSimHashed(
          Hashing.gramHashes(col("a"), 4), Hashing.gramHashes(col("b"), 4)).as("jh"))
        .as[(Double, Double)].head()
      (r._1.isNaN && r._2.isNaN) || math.abs(r._1 - r._2) < 1e-12
    }, cases = 15)
  }

  test("rolling chunks: deterministic, sorted-distinct, and cover the text") {
    val word: Gen[String] = Gen.chooseNum(0, 4000).map(n => s"t$n")
    val text: Gen[String] = Gen.listOfN(80, word).map(_.mkString(" "))
    check(Prop.forAll(text) { t =>
      val df = Seq(Tuple1(t)).toDF("text")
      def run() = df.select(graft.functions.Hashing.rollingChunks(col("text"), 32, 0x3f))
        .as[Seq[Long]].head()
      val c1 = run(); val c2 = run()
      c1 == c2 && c1.nonEmpty && c1 == c1.sorted && c1.distinct == c1
    }, cases = 15)
  }

  test("md5-simhash: identical token arrays collide; blocks stay in 16-bit range") {
    val word: Gen[String] = Gen.chooseNum(0, 300).map(n => s"m$n")
    val toks: Gen[List[String]] = Gen.nonEmptyListOf(word).map(_.take(40))
    check(Prop.forAll(toks) { ts =>
      val df = Seq((ts, ts)).toDF("a", "b")
      import graft.functions.Hashing
      val r = df.select(Hashing.md5SimhashBlocks(col("a")).as("ba"),
          Hashing.md5SimhashBlocks(col("b")).as("bb"))
        .as[(Seq[Long], Seq[Long])].head()
      r._1 == r._2 && r._1.length == 4 && r._1.forall(v => v >= 0L && v < 65536L)
    }, cases = 15)
  }

  test("upsert is idempotent and base/update-absorbing over random batches") {
    val row = for {
      k <- Gen.choose(0L, 20L)
      s <- Gen.alphaStr.map(_.take(5))
      v <- Gen.choose(-100.0, 100.0)
    } yield (k, s, v)
    // distinct keys within each side: Merge.upsert requires pre-resolved
    // update batches (and a keyed base snapshot is unique by construction)
    val side = Gen.listOfN(8, row).map(_.groupBy(_._1).map(_._2.head).toSeq)
    check(Prop.forAll(side, side) { (b, u) =>
      val base = b.toDF("k", "s", "v")
      val upd = u.toDF("k", "s", "v")
      val once = graft.operators.Merge.upsert(base, upd, Seq("k"))
      val twice = graft.operators.Merge.upsert(once, upd, Seq("k"))
      val o = once.as[(Long, String, Double)].collect().toSet
      val t = twice.as[(Long, String, Double)].collect().toSet
      val keys = o.map(_._1)
      // idempotent; result covers exactly base ∪ update keys; update rows win
      o == t &&
        keys == (b.map(_._1) ++ u.map(_._1)).toSet &&
        u.toSet.subsetOf(o)
    }, cases = 15)
  }

  test("pq encode/adc: self-distance is minimal and adc is nonnegative") {
    val vec = Gen.listOfN(16, Gen.choose(-1.0, 1.0)).map(_.toArray)
    check(Prop.forAll(Gen.listOfN(4, vec)) { vs =>
      val ids = vs.indices.map(_.toLong).toArray
      val cents = vs.toArray
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
        .toDF("id", "v")
      val out = df.select(col("id"),
        graft.functions.VectorOps.pqEncode(col("v"), ids, cents, 4).as("codes"),
        graft.functions.VectorOps.pqAdc(col("v"),
          graft.functions.VectorOps.pqEncode(col("v"), ids, cents, 4),
          ids, cents, 4).as("selfd"))
        .as[(Long, Seq[Long], Double)].collect()
      out.forall { case (id, codes, selfd) =>
        // own block distance is exactly 0 → every block picks a 0-distance
        // centroid (own id unless an identical block ties lower) and the
        // total self ADC is 0
        codes.length == 4 && selfd == 0.0
      }
    }, cases = 10)
  }

  test("forward-fill window form equals a sequential last-non-null scan") {
    // the portable running-count + per-group max trick (Curation q97)
    // must equal the obvious sequential carry-forward on any series
    val series: Gen[List[Option[Long]]] = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.option(Gen.choose(0L, 100L))))
    check(Prop.forAll(series) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
      val w = org.apache.spark.sql.expressions.Window.orderBy("i")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val got = df.withColumn("grp", count("v").over(w))
        .withColumn("filled", max("v").over(
          org.apache.spark.sql.expressions.Window.partitionBy("grp")))
        .orderBy("i").select("filled").as[Option[Long]].collect().toList
      val expect = vs.scanLeft(Option.empty[Long])((acc, v) => v.orElse(acc)).tail
      got == expect
    }, cases = 15)
  }

  test("sequence packing assigns floor(prefix-sum / budget) with dense packs") {
    val lens: Gen[List[Long]] = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 600L)))
    val budget = 1000L
    check(Prop.forAll(lens) { ls =>
      val df = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "n")
      val w = org.apache.spark.sql.expressions.Window.orderBy("i")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val got = df.withColumn("cum", sum("n").over(w))
        .withColumn("pack", floor((col("cum") - col("n")) / budget).cast("long"))
        .orderBy("i").select("pack").as[Long].collect().toList
      val prefix = ls.scanLeft(0L)(_ + _).init
      val expect = prefix.map(_ / budget)
      val dense = got.distinct.sorted == (got.head to got.max).toList
      got == expect && got.head == 0L && dense &&
        got.zip(got.tail).forall { case (a, b) => a <= b }
    }, cases = 15)
  }

  test("kernels propagate null inputs as null results") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c d"))).toDF("id", "text")
    val got = df.select(col("id"),
      TextOps.wordShingles(col("text"), 2).as("sh"),
      graft.functions.TextStats(col("text")).as("st"),
      TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2) && got(0).isNullAt(3))
    assert(!got(1).isNullAt(1) && !got(1).isNullAt(2) && !got(1).isNullAt(3))
  }
}
