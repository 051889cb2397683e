package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Generative pin of the composed training chain's arrival-split
  * invariance (the PackPropSpec treatment applied to the WHOLE
  * curationSink → token count → materializeSink pipeline): for ANY
  * corpus in the invariance domain and ANY contiguous id-ordered split
  * into 2/3/4/5 arrival batches, everything the chain persists —
  * finalized sequences (byte content included), final fill offsets,
  * carried tail payloads, the admitted corpus (post-strip text
  * included), and the ledger cardinality — is identical to the
  * one-batch run. x_training_pipeline hash-gates ONE 3-batch split
  * against DuckDB; this spec pins the admitted-only feed rule as a
  * property over random corpora and batch counts.
  *
  * Invariance domain (what the generator deliberately stays inside —
  * the domain the sink contracts promise, not a test convenience):
  *  - similarity classes are TRANSITIVE: dups are verbatim copies
  *    (estimated sim 1.0 in every arrangement), and the only partial
  *    overlap — the shared strip phrase — is ~0.18 Jaccard against a
  *    0.9 admission threshold, so banded MinHash can never promote it;
  *    non-transitive near-dup chains genuinely admit differently under
  *    different splits (batch-delta dedup compares quality-passing
  *    docs, the index only admitted ones) and are out of contract.
  *  - shared windows live in ADMITTED docs: the in-batch keep-lowest
  *    strip ranks over dedup-kept docs while the cross-batch index
  *    holds admitted ones, so a window shared only with a
  *    kept-but-never-admitted doc (e.g. contaminated) strips in-batch
  *    but not across — here contaminated docs share windows with
  *    nothing admissible.
  * Inside that domain the corpus still exercises every ledger path:
  * quality rejects, verbatim dup drops (index AND delta), substring
  * strips whose POST-STRIP text must feed packing, contamination
  * drops, null / literal-"null" / duplicate-name streams, empty
  * batches, and tails carried across every batch boundary.
  */
class TrainingPipelinePropSpec extends AnyFunSuite with SparkTestSession {

  private val Ctx = 16 // small ctx: sequences finalize AND tails carry
  private val WT = 4   // strip window grain
  private val TH = 0.9 // admission threshold: verbatim-only dups

  /** Everything the chain persists, in comparable driver-side form. */
  private case class ChainOut(
      seqs: Set[(Option[String], Option[String], Long, Long, String)],
      fill: Map[Option[String], Long],
      tail: Set[(Option[String], Option[String], Long, String)],
      admitted: Map[Long, String],
      nLedger: Long)

  /** Drive the REAL chain glue (the x_training_pipeline shape) over a
    * pre-batched corpus, then read back every persisted surface. */
  private def runChain(sp: SparkSession,
      docs: Seq[(Long, String, String, Int)], nBatches: Int): ChainOut = {
    import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_chain_prop").toString
    try {
      val df = docs.toDF("doc_id", "source", "text", "batch")
        .localCheckpoint()
      val bench = Seq((100000L, (0 to 10).map(j => s"b$j").mkString(" ")))
        .toDF("doc_id", "text")
      DocumentStreaming.registerSuite(sp, s"$root/cur/vocab", bench,
        "text", "doc_id", n = 3)
      val curate = DocumentStreaming.curationSink(s"$root/cur",
        "text", "doc_id", n = 2, numHashes = 16, bands = 4,
        threshold = TH, windowTokens = WT, shingleN = 3, flagAt = 0.8)
      val mat = DocumentStreaming.materializeSink(s"$root/fill",
        s"$root/tail", s"$root/out", "doc_id", "source", "pieces",
        ctxLen = Ctx)
      val srcDim = df.select("doc_id", "source")
      (0 until nBatches).foreach { b =>
        curate(df.filter(col("batch") === b).select("doc_id", "text"),
          b.toLong)
        // THE chain: this batch's admitted partition — and only it —
        // feeds packing in the same micro-batch cadence
        val admitted = sp.read.schema("doc_id LONG, text STRING")
          .parquet(s"$root/cur/admitted/batch_id=$b")
        mat(admitted.join(srcDim, Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            graft.operators.Corpus.tokens(col("text")).as("pieces")),
          b.toLong)
      }
      val seqs = sp.read.parquet(s"$root/out")
        .select(col("source"), col("seq_id"),
          col("n_docs").cast("long"), col("n_pad").cast("long"),
          array_join(col("tokens"), " "))
        .collect().map(r => (Option(r.getString(0)),
          Option(r.getString(1)), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      val fill = sp.read
        .schema("source STRING, next_end LONG, as_of_batch LONG")
        .parquet(s"$root/fill/batch_id=${nBatches - 1}")
        .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      val tail = sp.read
        .schema("source STRING, seq_id STRING, seq_off LONG, " +
          "_toks ARRAY<STRING>, as_of_batch LONG")
        .parquet(s"$root/tail/batch_id=${nBatches - 1}")
        .select(col("source"), col("seq_id"), col("seq_off"),
          array_join(col("_toks"), " "))
        .collect().map(r => (Option(r.getString(0)),
          Option(r.getString(1)), r.getLong(2), r.getString(3))).toSet
      val admitted = (0 until nBatches)
        .map(b => sp.read.schema("doc_id LONG, text STRING")
          .parquet(s"$root/cur/admitted/batch_id=$b"))
        .reduce(_ unionByName _)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val nLedger = (0 until nBatches)
        .map(b => sp.read.schema("doc_id LONG")
          .parquet(s"$root/cur/ledger/batch_id=$b").count())
        .sum
      ChainOut(seqs, fill, tail, admitted, nLedger)
    } finally graft.core.Scratch.deleteRec(root)
  }

  private sealed trait Kind
  private case object Uniq extends Kind
  private case object Rej extends Kind
  private case object Phrase extends Kind
  private case object Contam extends Kind
  private case class Dup(of: Int) extends Kind

  /** Deterministic text per spec: every non-shared word is unique to
    * its doc (disjoint shingle sets — no accidental similarity), every
    * quality-passing kind carries a stopword, the phrase kind embeds
    * the corpus-wide 4-token strip phrase between unique flanks, and
    * the contaminated kind is a verbatim stopworded copy of the bench
    * doc (9 of 10 shingles hit → rate 0.9 ≥ 0.8). */
  private def text(i: Int, kind: Kind, uniqLen: Int,
      texts: Int => String): String = kind match {
    case Uniq => "the " + (0 until uniqLen).map(j => s"u${i}x$j")
      .mkString(" ")
    case Rej => "zz qq"
    case Phrase => s"the f${i}a f${i}b f${i}c p0 p1 p2 p3 " +
      s"g${i}a g${i}b g${i}c"
    case Contam => "the " + (0 to 10).map(j => s"b$j").mkString(" ")
    case Dup(of) => texts(of)
  }

  test("chain over any contiguous 2/3/4/5-batch split == the one-batch " +
      "run (sequences, fill, tail, admitted corpus, ledger count)") {
    val sp = spark
    val genKind: Int => Gen[Kind] = i => {
      val base = Seq(4 -> Gen.const(Uniq: Kind), 2 -> Gen.const(Rej: Kind),
        3 -> Gen.const(Phrase: Kind), 2 -> Gen.const(Contam: Kind))
      val withDup = if (i == 0) base
        else base :+ (3 -> Gen.chooseNum(0, i - 1).map(Dup(_): Kind))
      Gen.frequency(withDup: _*)
    }
    val genCorpus = for {
      k <- Gen.oneOf(2, 3, 4, 5)
      n <- Gen.chooseNum(4, 12)
      kinds <- Gen.sequence[Vector[Kind], Kind](
        (0 until n).map(genKind))
      lens <- Gen.listOfN(n, Gen.chooseNum(4, 8))
      srcs <- Gen.listOfN(n, Gen.oneOf(null: String, "a", "b", "null"))
      batches <- Gen.listOfN(n, Gen.chooseNum(0, k - 1))
    } yield (kinds, lens, srcs, batches, k)
    val prop = Prop.forAll(genCorpus) { case (kinds, lens, srcs, bs, k) =>
      val txts = new Array[String](kinds.size)
      kinds.zipWithIndex.foreach { case (kd, i) =>
        txts(i) = text(i, kd, lens(i), txts(_))
      }
      // ids relabeled in (batch, position) order, so the split is a
      // contiguous id-range partition — the arrival order both forms
      // fold in (the PackPropSpec relabeling)
      val arranged = kinds.indices
        .sortBy(i => (bs(i), i)).zipWithIndex
        .map { case (i, id) => (id.toLong, srcs(i), txts(i), bs(i)) }
      val split = runChain(sp, arranged, k)
      val one = runChain(sp,
        arranged.map { case (id, s, t, _) => (id, s, t, 0) }, 1)
      import org.scalacheck.Prop.propBoolean
      ((split.seqs == one.seqs)
        :| s"sequences diverged: ${split.seqs} vs ${one.seqs}") &&
      ((split.fill == one.fill)
        :| s"fill state diverged: ${split.fill} vs ${one.fill}") &&
      ((split.tail == one.tail)
        :| s"tail state diverged: ${split.tail} vs ${one.tail}") &&
      ((split.admitted == one.admitted)
        :| s"admitted corpus diverged: ${split.admitted} " +
           s"vs ${one.admitted}") &&
      ((split.nLedger == one.nLedger && split.nLedger == kinds.size)
        :| s"ledger count diverged: ${split.nLedger} vs " +
           s"${one.nLedger} vs ${kinds.size}")
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
