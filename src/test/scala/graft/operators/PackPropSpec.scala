package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generative pin of the packing family's central identity: for ANY
  * corpus shape (null/duplicate-name streams, zero-token docs, overlong
  * docs, empty batches) and ANY 3-batch arrival split that respects id
  * order, `incrementalPackTokenized` chained over the batches is
  * byte-identical to one `packTokenized` run over the concatenation —
  * and BOTH match an independently written pure-Scala greedy fold, so
  * the Spark scan and the oracle's list_reduce can't share a bug. The
  * returned state must cover every stream seen (overlong-only streams
  * at offset 0, carried-forward streams untouched); zero-token docs
  * pack nowhere and create no stream.
  */
class PackPropSpec extends AnyFunSuite with SparkTestSession {

  private val Ctx = 10L

  /** Independent truth: the greedy no-split fold, straight off the
    * scaladoc contract (eos = 1). Returns (rows by id, final state by
    * stream): row = (n_tokens, seq index or None, seq_off, overlong). */
  private def pureFold(docs: Seq[(Long, Option[String], Long)])
      : (Map[Long, (Long, Option[Long], Long, Boolean)],
         Map[Option[String], Long]) = {
    val rows = Map.newBuilder[Long, (Long, Option[Long], Long, Boolean)]
    var state = Map.empty[Option[String], Long]
    docs.filter(_._3 > 0).groupBy(_._2).foreach { case (g, ds) =>
      var end = 0L
      ds.sortBy(_._1).foreach { case (id, _, n) =>
        val k = n + 1
        if (k > Ctx) rows += id -> ((k, None, -1L, true))
        else {
          val start = if (end % Ctx + k > Ctx) (end / Ctx + 1) * Ctx else end
          end = start + k
          rows += id -> ((k, Some(start / Ctx), start % Ctx, false))
        }
      }
      state += g -> end
    }
    (rows.result(), state)
  }

  private def collectPacked(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Option[String], Long, Boolean)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), Option(r.getString(3)), r.getLong(4),
        r.getBoolean(5)))).toMap

  test("incremental over any 3-batch split == one batch run == the " +
      "pure greedy fold (rows AND state)") {
    val sp = spark
    import sp.implicits._
    // streams include None (null group) and a stream literally named
    // "null" — the collision class the null-sentinel fixes addressed
    val genDoc = for {
      g <- Gen.oneOf(Option.empty[String], Some("a"), Some("b"),
        Some("null"))
      n <- Gen.chooseNum(0L, 13L) // 0 drops; 10..13 (+eos) overlong
      b <- Gen.chooseNum(0, 2)
    } yield (g, n, b)
    val genDocs = Gen.chooseNum(1, 40).flatMap(Gen.listOfN(_, genDoc))
    val prop = Prop.forAll(genDocs) { specs =>
      // ids relabeled in (batch, position) order, so ONE run over the
      // id-ordered concatenation is the incremental chain's truth
      val docs = specs.zipWithIndex
        .sortBy { case ((_, _, b), i) => (b, i) }
        .zipWithIndex
        .map { case (((g, n, b), _), id) => (id.toLong, g, n, b) }
      val df = docs.map { case (id, g, n, b) => (id, g.orNull, n, b) }
        .toDF("doc_id", "source", "n_tok", "batch")
        .localCheckpoint()
      val batchRun = collectPacked(Corpus.packTokenized(
        df, "doc_id", "source", "n_tok", ctxLen = Ctx.toInt))
      var st = Corpus.emptyPackState(sp)
      var inc = Map.empty[Long, (Long, Option[String], Long, Boolean)]
      (0 to 2).foreach { b =>
        val (p, st2) = Corpus.incrementalPackTokenized(
          df.filter(col("batch") === b), st,
          "doc_id", "source", "n_tok", ctxLen = Ctx.toInt)
        inc ++= collectPacked(p)
        st = st2
      }
      val gotState = st.collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      val (expRows, expState) =
        pureFold(docs.map { case (id, g, n, _) => (id, g, n) })
      val expPacked = expRows.map { case (id, (k, seq, off, over)) =>
        id -> ((k, seq.flatMap(s => docs.find(_._1 == id).get._2
          .map(g => s"$g#$s")), off, over))
      }
      import org.scalacheck.Prop.propBoolean
      ((batchRun == expPacked)
        :| s"batch run diverged: $batchRun vs $expPacked") &&
      ((inc == expPacked)
        :| s"incremental diverged: $inc vs $expPacked") &&
      ((gotState == expState)
        :| s"state diverged: $gotState vs $expState")
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }
}
