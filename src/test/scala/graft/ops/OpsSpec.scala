package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkFixture

/** Training-data operator tests over small in-memory frames +
  * the driver testdata when present. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("exact dedup finds byte-identical groups") {
    val df = docsDf((1L, "same text"), (2L, "same text"), (3L, "other"))
    val dups = Dedup.exact(df).collect()
    assert(dups.length == 1)
    assert(dups(0).getAs[Long]("keep_id") == 1L)
    assert(dups(0).getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH finds near-duplicates, skips unrelated") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = base.replace("word7", "changed7")
    val far = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val df = docsDf((1L, base), (2L, near), (3L, far))
    val pairs = Dedup.minhashLsh(df).collect()
    val nearPair = pairs.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(nearPair.isDefined, s"expected (1,2) candidate, got ${pairs.mkString(",")}")
    assert(nearPair.get.getAs[Double]("est_jaccard") > 0.5)
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 3L || r.getAs[Long]("doc_a") == 3L))
  }

  test("simhash near-dups within hamming 3") {
    // a one-word swap in a 60-token doc flips ~13/64 bits (unweighted word
    // simhash), so the realistic <=3 neighborhood is near-identical text:
    // exact copy (hamming 0) + same text with duplicated words (tiny drift)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " tok1" // one extra repeated token: small acc shift
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = docsDf((1L, base), (2L, base), (3L, far), (4L, near))
    val pairs = Dedup.simhashNearDups(df).collect()
    val p12 = pairs.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(p12.isDefined && p12.get.getAs[Int]("hamming") == 0)
    assert(!pairs.exists(r => r.getAs[Long]("doc_a") == 3L || r.getAs[Long]("doc_b") == 3L))
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("ngram jaccard verifies LSH candidates exactly") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = base.replace("word7", "changed7")
    val df = docsDf((1L, base), (2L, near), (3L, "totally different little text"))
    val dups = Dedup.ngramJaccardDups(df, 0.7).collect()
    assert(dups.exists(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L))
    dups.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.7))
  }

  test("langid: marker + CJK heuristics") {
    assert(TextOps.detectLang("the quick brown fox is that with for") == "en")
    assert(TextOps.detectLang("der hund und die katze ist nicht da") == "de")
    assert(TextOps.detectLang("el perro y la casa es que por una") == "es")
    assert(TextOps.detectLang("中文文本没有空格但是有很多汉字") == "zh")
    assert(TextOps.detectLang("これは日本語のテキストです") == "ja")
    assert(TextOps.detectLang("") == "und")
  }

  test("fingerprint invariant to whitespace runs") {
    assert(TextOps.fingerprint("a  b\tc") == TextOps.fingerprint("a b c"))
    assert(TextOps.fingerprint("a b c") != TextOps.fingerprint("a bc"))
  }

  test("token/quality columns") {
    val df = docsDf((1L, "Hello, world! This is the test."), (2L, ""))
    val stats = TextOps.stats(df).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(stats(0).getAs[Long]("n_tokens") == 6L)
    assert(stats(0).getAs[Long]("n_punct") == 3L)
    assert(stats(1).getAs[Long]("n_tokens") == 0L)
  }

  test("brute-force ANN: self excluded, ranks deterministic, lsh recall sane") {
    val emb = (0 until 50).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val brute = SimSearch.bruteForceTopK(emb, nQueries = 2, k = 5).collect()
    assert(brute.length == 10)
    assert(!brute.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    val ranks = brute.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Long]("rank")).sorted
    assert(ranks.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // LSH with few bits must recover a decent chunk of the brute top-5
    val lsh = SimSearch.lshTopK(emb, nQueries = 2, k = 5, nBits = 6, nTables = 6, dim = 8).collect()
    val bruteSet = brute.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lshSet = lsh.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(lshSet.intersect(bruteSet).size >= bruteSet.size / 2, s"recall too low: ${lshSet.intersect(bruteSet).size}/${bruteSet.size}")
  }

  test("multimodal: deterministic features, frame sampling, schema") {
    val media = Multimodal.synthetic(spark, 30)
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length == 30)
    val video = feats.filter(_.kind == "video")
    assert(video.forall(_.sampled_frames.size == 8))
    assert(video.forall(f => f.sampled_frames == f.sampled_frames.sorted))
    val audio = feats.filter(_.kind == "audio")
    assert(audio.forall(_.rms > 0))
    // determinism: second run byte-identical
    val feats2 = Multimodal.extractFeatures(Multimodal.synthetic(spark, 30)).collect().sortBy(_.media_id)
    assert(feats.map(_.phash).toSeq == feats2.map(_.phash).toSeq)
  }

  test("frame sampling edge cases") {
    assert(Multimodal.sampleFrames(0, 8) == Nil)
    assert(Multimodal.sampleFrames(5, 8) == (0 until 5))
    assert(Multimodal.sampleFrames(100, 4) == Seq(0, 25, 50, 75))
  }
}
