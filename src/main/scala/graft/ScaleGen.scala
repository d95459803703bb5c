package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic synthetic-corpus generator for scaling evidence
  * (dev tool, not part of the shipped library surface): emits
  * schema-compatible `lineitem` / `events` / `documents` / `embeddings`
  * parquet at `multiplier`× the sf0.1 fixture row rates, so the slow
  * query families can be timed at two scales and superlinear behavior
  * flagged (SCALE.md's measured scaling table — the one empirical point
  * behind the plan-structural 100 TB arguments).
  *
  * Everything is a pure function of (seed, row id) via a splitmix-style
  * mixer — no RNG state, so any subset of any table regenerates
  * identically at any parallelism. Distribution shapes mirror the
  * fixture where the probed queries are sensitive to them:
  * triangular-skewed part keys (so the co-purchase projection has hubs
  * and a real support-≥2 edge set), zipf-ish token draws (so
  * collocation/n-gram tops exist), planted near-duplicate documents
  * every 37th row (so the MinHash/set-sim candidate structure is
  * non-trivial), and 16-cluster embeddings (so IVF cells are
  * meaningful). Generates the five tables the slow families read
  * (`part` since round 11 — FK-closed against lineitem's part keys, so
  * q292's triple itemsets joins the probe ladder too). */
object ScaleGen {

  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def h(seed: Long, id: Long, salt: Long): Long =
    mix(seed ^ mix(id ^ mix(salt))) & Long.MaxValue

  /** Heaps'-law vocabulary: V ∝ N^0.5 anchored at the fixture's 20 k
    * words for the 1× corpus, so a 100× corpus draws from a 200 k-word
    * vocabulary the way real text does (Heaps 1978, V = K·N^β with
    * β ≈ 0.5) instead of re-hammering a corpus-independent 20 k — the
    * SCALE.md caveat-10 artifact that inflated the token-frequency-bound
    * families' measured ratios. */
  private[graft] def vocabOf(mult: Double): Long =
    math.max(20000L, math.round(20000.0 * math.sqrt(mult)))

  /** Scale-proportional embedding cluster count (the same de-confound
    * for cell-population-driven costs): 16 at 1×, 16·mult beyond, so
    * cell occupancy stays corpus-independent the way a diversifying
    * real embedding distribution's does. */
  private[graft] def clustersOf(mult: Double): Int =
    math.max(16L, math.round(16.0 * mult)).toInt

  /** Tokens of document `id`: 10..100 draws from a zipf-ish vocab
    * (triangular min-of-two skew over [[vocabOf]] words). Pure function. */
  private[graft] def docTokens(seed: Long, id: Long, vocab: Long): Array[String] = {
    val n = 10 + (h(seed, id, 1) % 91).toInt
    Array.tabulate(n) { i =>
      val a = h(seed, id * 131 + i, 2) % vocab
      val b = h(seed, id * 131 + i, 3) % vocab
      "w" + math.min(a, b)
    }
  }

  /** Document text: every 37th doc (id % 37 == 1, id > 0) is a
    * near-duplicate of its predecessor with one token substituted —
    * plants the near-dup pair structure the LSH family prunes on. */
  private[graft] def docText(seed: Long, id: Long, vocab: Long): Array[String] = {
    if (id > 0 && id % 37 == 1) {
      val base = docTokens(seed, id - 1, vocab)
      val pos = (h(seed, id, 4) % base.length).toInt
      val out = base.clone()
      out(pos) = "w" + (h(seed, id, 5) % vocab)
      out
    } else docTokens(seed, id, vocab)
  }

  def main(args: Array[String]): Unit = {
    val Array(outDir, multStr) = args.take(2)
    val mult = multStr.toDouble
    val seed = if (args.length > 2) args(2).toLong else 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rows(base: Long): Long = (base * mult).toLong
    val parts = cpus.toInt * 2

    // documents: doc_id, text, lang, source, n_chars
    // args(3)/args(4) pin vocab / cluster count explicitly — the
    // pre-round-9 corpus-independent behavior (vocab=20000 clusters=16
    // at every mult), kept reproducible for artifact-vs-Heaps A/B
    val vocab = if (args.length > 3) args(3).toLong else vocabOf(mult)
    spark.range(0, rows(5000), 1, parts).map { id =>
      val toks = docText(seed, id, vocab)
      val text = toks.mkString(" ")
      val lang = (h(seed, id, 6) % 10) match {
        case 0 => "de"; case 1 => "fr"; case 2 => "es"; case _ => "en"
      }
      (id, text, lang, "src" + (h(seed, id, 7) % 20), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // lineitem: skewed part keys -> hubby co-purchase graph
    val nOrders = rows(150000)
    val nParts = rows(20000)
    spark.range(0, nOrders, 1, parts).flatMap { o =>
      val nl = 1 + (h(seed, o, 8) % 7).toInt
      (1 to nl).map { ln =>
        val a = h(seed, o * 17 + ln, 9) % nParts
        val b = h(seed, o * 17 + ln, 10) % nParts
        val p = math.min(a, b)
        val qty = 1.0 + (h(seed, o * 17 + ln, 11) % 50).toDouble
        val price = qty * ((90000 + p % 100000).toDouble / 100.0)
        val rf = Array("A", "N", "R").apply((h(seed, o * 17 + ln, 12) % 3).toInt)
        val ls = Array("F", "O").apply((h(seed, o * 17 + ln, 13) % 2).toInt)
        val day = (h(seed, o * 17 + ln, 14) % 2400).toInt
        (o, p, h(seed, o * 17 + ln, 15) % rows(1000), ln,
          qty, math.round(price * 100) / 100.0,
          (h(seed, o * 17 + ln, 16) % 11).toDouble / 100.0,
          (h(seed, o * 17 + ln, 17) % 9).toDouble / 100.0,
          rf, ls,
          java.sql.Timestamp.valueOf(
            java.time.LocalDate.of(1992, 1, 1).plusDays(day).atStartOfDay()))
      }
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // part: one row per part key the lineitem generator can draw
    // (FK-closed), fixture-shaped columns. Brand cardinality stays
    // corpus-INDEPENDENT (25, the TPC-H shape) on purpose: q292's
    // basket self-join keys on the order and projects to brands, so
    // its honest growth axis is order count × basket size — a brand
    // space that grew with the corpus would deflate the triple
    // supports and understate the family's true scaling
    val partNames = Array("cold", "small", "large", "fresh", "dark",
      "plain", "quick", "round")
    val partKinds = Array("widget", "bolt", "gear", "spring", "valve")
    val partTypes = Array("ECONOMY", "PROMO", "STANDARD", "SMALL", "LARGE")
    spark.range(0, nParts, 1, parts).map { p =>
      (p,
        partNames((h(seed, p, 30) % partNames.length).toInt) + " " +
          partKinds((h(seed, p, 31) % partKinds.length).toInt),
        "Brand#" + (1 + (h(seed, p, 32) % 25).toInt),
        partTypes((h(seed, p, 33) % partTypes.length).toInt),
        1 + (h(seed, p, 34) % 50).toInt,
        900.0 + (p % 1000).toDouble / 10.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size").cast("int").as("p_size"),
        col("p_retailprice"))
      .write.mode("overwrite").parquet(s"$outDir/part.parquet")

    // events: 30 days, 5 types, JSON props {"k": 0..99}
    val nUsers = rows(1500)
    spark.range(0, rows(100000), 1, parts).map { e =>
      val us = h(seed, e, 18) % (30L * 86400 * 1000000)
      val types = Array("click", "view", "purchase", "signup", "error")
      (e,
        java.sql.Timestamp.from(java.time.Instant
          .parse("2024-01-01T00:00:00Z").plusNanos(us * 1000)),
        h(seed, e, 19) % nUsers,
        types.apply((h(seed, e, 20) % 5).toInt),
        (h(seed, e, 21) % 10000).toDouble / 100.0,
        s"""{"k": ${h(seed, e, 22) % 100}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // embeddings: deterministic cluster centers + small noise; cluster
    // count scales with the corpus (clustersOf — 16 at 1×)
    val nClusters = if (args.length > 4) args(4).toInt else clustersOf(mult)
    spark.range(0, rows(2000), 1, parts).map { v =>
      val c = (h(seed, v, 23) % nClusters).toInt
      val emb = Array.tabulate(64) { d =>
        val center = ((mix(c * 64L + d) % 1000).toDouble / 500.0).toFloat
        val noise = ((h(seed, v * 64 + d, 24) % 200).toDouble / 1000.0 - 0.1).toFloat
        center + noise
      }
      (v, emb, c)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"""{"out":"$outDir","multiplier":$mult}""")
    spark.stop()
  }
}
