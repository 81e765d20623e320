package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replica-scale audit for the adaptive perceptual-hash band dial
  * (VERDICT r16 #1): per media family, the dialed width, the measured
  * same-key pair volume at that width (pairs/doc — the quantity the
  * dial budgets), the production query's wall, and planted-twin recall.
  * Run against sf0.1 and its mediaScale replicas:
  *
  *   runMain graft.ScaleUp /root/testdata/sf0.1 tmp/me10 10 mediaScale
  *   runMain graft.MediaAudit /root/testdata/sf0.1
  *   runMain graft.MediaAudit tmp/me10
  *
  * Prints one JSON line per family — the BENCH_NOTES_r17 table rows.
  * Linearity claim under audit: pairs/doc ~flat and twin recall 100%
  * across the replica steps, at whatever width the volume dial picks.
  *
  * GENUINE mode (r17, the other leg of VERDICT r16 #1 — recall on real
  * decoded payloads, not byte-plane stubs, at corpus scale):
  *
  *   runMain graft.MediaAudit genuine [nPerFamily=30000]
  *
  * generates n genuine payloads per family IN EXECUTORS (real PNGs /
  * PCM-16 WAVs / animated GIFs, deterministic per doc_id), pushes them
  * through the production decode→hash→twin kernels ([[MediaOps
  * .imageHashesOf]] et al. — the planted twin is the operator's own
  * model, applied to the DECODED plane), and prints per (family, leg):
  * the dial's width choice for that corpus, and per candidate width
  * the planted-twin band recall + measured pairs/doc. Two legs per
  * family: `diverse` (per-id unique content — every width's recall on
  * independent real payloads) and `coarse` (a fixed blocky base shared
  * by ALL docs + per-id fine texture — width-16 prefixes collide
  * corpus-wide, so the DIAL MUST WIDEN on genuine payloads, and recall
  * at the dialed width is the number under audit; video has no coarse
  * leg — its dial engagement is covered by the me100 replica audit).
  */
object MediaAudit {

  // ----- genuine payload builders (executor-side, deterministic) -----

  private def pngBytes(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = f(x, y).max(0).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = samples(i).toByte
      data(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def gifBytes(frames: Seq[(Int, Int) => Int], w: Int, h: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y).max(0).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Diverse leg: per-id unique genuine content (the ExtensionsSpec
    * generators, seeded by doc_id — 4096 luma samples / 4000 PCM
    * samples / 5×576-px frames, the payload sizes the fine grid was
    * designed for). */
  private[graft] def diverseImage(id: Long): Array[Byte] = {
    val s = (id % 100000L).toInt
    pngBytes(64, 64, (x, y) =>
      (math.sin(x * (0.11 + 0.013 * s)) * 90 +
        math.sin(y * 0.07 * (s % 5 + 1)) * 70 +
        ((x * 31 + y * 17 + s * 97) % 41) + 128).toInt)
  }

  private[graft] def diverseAudio(id: Long): Array[Byte] = {
    val s = (id % 100000L).toInt
    wavBytes(Array.tabulate(4000) { i =>
      (math.sin(i * (0.031 + 0.007 * s)) * 2800 +
        math.sin(i * 0.0049 * (s + 3)) * 1400 +
        ((i * 2654435761L + s * 40503L) % 997L - 498L) / 2).toShort
    })
  }

  private[graft] def diverseVideo(id: Long): Array[Byte] = {
    val s = (id % 100000L).toInt
    gifBytes((0 until 5).map { k => (x: Int, y: Int) =>
      val i = y * 24 + x
      (math.sin(i * (0.07 + 0.011 * s) + k) * 100 +
        ((i * 13 + k * 29 + s * 71) % 37) + 120).toInt
    }, 24, 24)
  }

  /** Coarse leg: every doc shares one blocky base quantized at the
    * COARSE cell stride of the flat luma stream (the 8×9 box cells see
    * big fixed inter-cell steps — width-16 prefixes are corpus-
    * constant, the collision regime that forces the dial), plus per-id
    * noise whose fine-cell sums (~15 samples) are noise-dominated while
    * the ~56-sample coarse sums stay base-dominated: the fine-grid
    * chars split the corpus, the coarse chars don't. */
  private[graft] def coarseImage(id: Long): Array[Byte] = {
    val s = (id % 100000L).toInt
    pngBytes(64, 64, (x, y) => {
      val i = y * 64 + x
      ((i / 56) * 23) % 144 + 40 +
        ((i * 31 + (i * i + 7) * s) % 41)
    })
  }

  private[graft] def coarseAudio(id: Long): Array[Byte] = {
    val s = (id % 100000L).toInt
    wavBytes(Array.tabulate(4000) { i =>
      val h = i * 0x9E3779B97F4A7C15L + (s + 1L) * 0xC2B2AE3D27D4EB4FL
      (500 + ((i / 47) * 900) % 3500 +
        (((h >>> 16) % 801L) - 400L)).toShort
    })
  }

  // ----- recall denominators (exact bar, computed WITHOUT banding) -----

  /** Twins within the exact verify bar — the recall denominator that
    * isolates banding loss from bar exits (a twin beyond Hamming 6 is
    * "not a near-dup" by the operator's own definition, identically in
    * both engines). */
  private def hamEligible(h: DataFrame): Long = {
    val a = h.select(col("doc_id"), col("v"))
    a.alias("x").join(a.alias("y"), expr("y.doc_id = x.doc_id + 10000"))
      .selectExpr("""aggregate(zip_with(x.v, y.v,
        |  (p, q) -> bit_count(cast(p as bigint) ^ cast(q as bigint))),
        |  cast(0 as bigint), (acc, z) -> acc + z) as ham"""
        .stripMargin.replace("\n", " "))
      .filter("ham <= 6").count()
  }

  private def frameEligible(h: DataFrame): Long = {
    val a = h.select(col("doc_id"), col("v"))
    a.alias("x").join(a.alias("y"), expr("y.doc_id = x.doc_id + 10000"))
      .selectExpr("""size(filter(sequence(0, 2), f ->
        |  aggregate(transform(sequence(0, 3), b ->
        |    bit_count(cast(element_at(x.v, f * 4 + b + 1) as bigint)
        |      ^ cast(element_at(y.v, f * 4 + b + 1) as bigint))),
        |    cast(0 as bigint), (a2, z) -> a2 + z) <= 6)) as mf"""
        .stripMargin.replace("\n", " "))
      .filter("mf >= 2").count()
  }

  /** Planted-twin band recall at width `w`: twins sharing at least one
    * ALIGNED band prefix (the collision model of the candidate join —
    * bands group by (band_idx, prefix)). Distributed: one +10000
    * equi-join, no driver collect. */
  private def recallAt(h: DataFrame, w: Int): Long = {
    val a = h.selectExpr(
      "doc_id", s"transform(bk, x -> substring(x, 1, $w)) as p")
    a.alias("x").join(a.alias("y"), expr("y.doc_id = x.doc_id + 10000"))
      .selectExpr("exists(zip_with(x.p, y.p, (u, v2) -> u = v2), b -> b) as hit")
      .filter("hit").count()
  }

  /** Same-key pair volume per doc at width `w` (the dial's budgeted
    * quantity). */
  private def pairsPerDocAt(h: DataFrame, w: Int, docs: Long): Double = {
    val vol = h
      .selectExpr("doc_id",
        s"posexplode(transform(bk, x -> substring(x, 1, $w))) as (band_idx, band_hash)")
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bn"))
      .agg(sum(expr("(bn * (bn - 1)) div 2")).as("pairs"))
      .collect()(0)
    (if (vol.isNullAt(0)) 0L else vol.getLong(0)).toDouble / math.max(docs, 1)
  }

  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  // ----- genuine mode -----

  private def genuineMain(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._

    // base ids on the 3k lattice: twin = id + 10000 ≡ id + 1 (mod 3)
    // can never equal another base id — the fixture's own id discipline
    def corpusOf(mime: String, gen: Long => Array[Byte]): DataFrame =
      spark.range(n).select((col("id") * 3).as("doc_id"))
        .repartition(32)
        .as[Long]
        .map(id => (id, mime, gen(id)))
        .toDF("doc_id", "mime", "media")

    def leg(family: String, legName: String, hashes: DataFrame, bpd: Int,
            eligible: DataFrame => Long): Unit = {
      val h = hashes.persist()
      val docs = h.count()
      val dial = MediaOps.adaptiveBandWidth(
        h.selectExpr("doc_id", "posexplode(bk) as (band_idx, band_hash)"), bpd)
      val elig = eligible(h)
      val total = docs / 2
      val perW = MediaOps.BandWidths.map { w =>
        val hit = recallAt(h, w)
        val ppd = pairsPerDocAt(h, w, docs)
        f""""w$w":{"recall":"$hit/$elig","pairs_per_doc":$ppd%.1f}"""
      }
      h.unpersist()
      println(s"""{"family":"$family","leg":"$legName","docs":$docs,""" +
        s""""dial":$dial,"bar_exits":${total - elig},${perW.mkString(",")}}""")
    }

    leg("q107", "diverse",
      MediaOps.imageHashesOf(corpusOf("image/png", diverseImage)), 4, hamEligible)
    leg("q107", "coarse",
      MediaOps.imageHashesOf(corpusOf("image/png", coarseImage)), 4, hamEligible)
    leg("q113", "diverse",
      MediaOps.audioFingerprintsOf(corpusOf("audio/wav", diverseAudio)), 4, hamEligible)
    leg("q113", "coarse",
      MediaOps.audioFingerprintsOf(corpusOf("audio/wav", coarseAudio)), 4, hamEligible)
    leg("q111", "diverse",
      MediaOps.videoFrameHashesOf(corpusOf("video/gif", diverseVideo)), 12, frameEligible)
  }

  // ----- replica mode (the original BENCH_NOTES_r17 §1 tables) -----

  private def replicaMain(spark: SparkSession, dir: String): Unit = {
    def audit(tag: String, hashes: DataFrame, bpd: Int,
              query: => DataFrame, eligible: DataFrame => Long,
              plantedTwins: Long): Unit = {
      val h = hashes.persist()
      val docs = h.count() // base + planted twins
      val t0 = System.nanoTime()
      val width = MediaOps.cachedBandWidth(tag, dir, h, bpd)
      val probeS = (System.nanoTime() - t0) / 1e9
      val vol = h
        .selectExpr("doc_id",
          s"posexplode(transform(bk, x -> substring(x, 1, $width))) as (band_idx, band_hash)")
        .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bn"))
        .agg(sum(expr("(bn * (bn - 1)) div 2")).as("pairs"))
        .collect()(0)
      val pairs = if (vol.isNullAt(0)) 0L else vol.getLong(0)
      val elig = eligible(h)
      val t1 = System.nanoTime()
      val out = query.persist()
      val nOut = out.count()
      val wallS = (System.nanoTime() - t1) / 1e9
      val twins = out.filter(col("is_twin")).count()
      out.unpersist()
      println(f"""{"family":"$tag","dir":"$dir","docs":$docs,"width":$width,""" +
        f""""pairs":$pairs,"pairs_per_doc":${pairs.toDouble / math.max(docs, 1)}%.1f,""" +
        f""""probe_s":$probeS%.2f,"wall_s":$wallS%.2f,"out_pairs":$nOut,""" +
        f""""band_recall":"$twins/$elig","bar_exits":${plantedTwins - elig}}""")
      // attribution sweep (opt-in): recall at EVERY candidate width on
      // this corpus — separates width-independent band-spread loss
      // (constant across the row) from width-induced loss (grows
      // rightward), without re-running the production query
      if (sys.env.contains("SPARK_GRAFT_AUDIT_WIDTHS")) {
        val perW = MediaOps.BandWidths.map(w =>
          s""""w$w":"${recallAt(h, w)}/$elig"""")
        println(s"""{"family":"$tag","dir":"$dir","recall_sweep":{${perW.mkString(",")}}}""")
      }
      h.unpersist()
    }

    val corpus = MediaOps.mediaCorpus(spark, dir)
    def expected(mime: String, minLen: Int): Long =
      corpus.filter(col("mime") === mime && length(col("media")) >= minLen).count()
    def wanted(tag: String): Boolean =
      sys.env.get("SPARK_GRAFT_AUDIT_FAMILY").forall(_.split(",").contains(tag))

    if (wanted("q107"))
      audit("q107", MediaOps.imageHashes(spark, dir), 4,
        MediaOps.imageDedup(spark, dir), hamEligible, expected("image/png", 72))
    if (wanted("q113"))
      audit("q113", MediaOps.audioFingerprints(spark, dir), 4,
        MediaOps.audioDedup(spark, dir), hamEligible, expected("audio/wav", 85))
    if (wanted("q111"))
      audit("q111", MediaOps.videoFrameHashes(spark, dir), 12,
        MediaOps.videoDedup(spark, dir), frameEligible, expected("video/mp4", 216))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MediaAudit <sfDir> | MediaAudit genuine [n]")
    val spark = session()
    if (args(0) == "genuine")
      genuineMain(spark, if (args.length > 1) args(1).toLong else 30000L)
    else replicaMain(spark, args(0))
    spark.stop()
  }
}
