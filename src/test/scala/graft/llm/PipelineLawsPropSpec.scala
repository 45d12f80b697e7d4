package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws for the round-5 pipeline operators, evaluated
  * through the real operators on generated corpora and checked against
  * driver-side reference computations (deterministic fixed-seed
  * sampling, same approach as CubeLawsPropSpec).
  *
  * Laws:
  *  1. chunking — chunk count follows ceil(max(n-size,0)/stride)+1,
  *     concatenating chunks at stride offsets reproduces the token
  *     sequence exactly (full coverage, right overlap), tail chunk
  *     carries the remainder;
  *  2. hashed BoW — vector sums equal token counts, permuting tokens
  *     changes nothing (bag semantics), and the native kernel equals
  *     the relational build row-for-row;
  *  3. BPE — one mergePair pass conserves symbol mass (fused pairs
  *     shrink the array by exactly the number of non-overlapping
  *     occurrences) and concatenating the symbols reproduces the word.
  */
class PipelineLawsPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  private val word = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc = Gen.choose(0, 60).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))

  test("chunkDocs laws: count, coverage, tail remainder") {
    val texts = samples(doc, 60, seed = 7001L)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for ((size, stride) <- Seq((10, 7), (16, 16), (5, 2))) {
      val out = Pipelines.chunkDocs(docs, $"doc_id", $"text", size, stride)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getString(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        val expect =
          if (n == 0) 0 else math.ceil(math.max(n - size, 0).toDouble
            / stride).toInt + 1
        val chunks = out.getOrElse(i.toLong, Array.empty)
        assert(chunks.length === expect, s"doc $i n=$n $size/$stride")
        chunks.foreach { case (_, ci, nt, text) =>
          val ref = toks.slice(ci * stride, ci * stride + size)
          assert(nt === ref.length && text === ref.mkString(" "),
            s"doc $i chunk $ci")
        }
      }
    }
  }

  test("hashedBow laws: mass, permutation invariance, kernel parity") {
    val texts = samples(doc, 50, seed = 7101L).filter(_.trim.nonEmpty)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vecs = Featurize.hashedBow(docs, $"doc_id", $"text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.nonEmpty)
        assert(vecs(i.toLong).sum === toks.length.toDouble, s"doc $i")
    }
    // permutation invariance: reversed token order, same vector
    val rev = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t.split("\\s+").reverse.mkString(" ")) }
      .toDF("doc_id", "text")
    val vecsRev = Featurize.hashedBow(rev, $"doc_id", $"text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs === vecsRev)
    // kernel vs relational on the same generated corpus
    val rel = Featurize.hashedBowRelational(docs, $"doc_id", $"text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs === rel)
  }

  test("mergePair laws: mass conservation and reassembly") {
    val words = samples(word, 80, seed = 7201L).distinct
    val df = words.toDF("w")
      .select($"w", Bpe.initSymbols($"w").as("s"))
    for ((a, b) <- Seq(("a", "b"), ("e", "e"), ("t", "h"))) {
      val merged = df.select($"w", Bpe.mergePair($"s", a, b).as("m"))
        .as[(String, Seq[String])].collect()
      merged.foreach { case (w, m) =>
        // reassembly: concatenation always reproduces the word
        assert(m.mkString === w, s"$w under ($a,$b)")
        // mass: array shrinks by the number of non-overlapping (a,b)
        // occurrences scanned left-to-right
        var i = 0; var occ = 0
        val cs = w.map(_.toString)
        while (i < cs.length - 1) {
          if (cs(i) == a && cs(i + 1) == b) { occ += 1; i += 2 }
          else i += 1
        }
        assert(m.length === w.length - occ, s"$w under ($a,$b)")
      }
    }
  }
}
