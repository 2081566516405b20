package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Property tests of the Aria commit semantics over random workloads
  * (SURVEY.md §5.2), run against a minimal pure-Scala model of one epoch
  * (the same rules as the AriaSpec simulator — reserve = per-key min
  * Tid, hazards strictly-smaller-Tid, both commit rules). Pure and fast:
  * thousands of random batches, no Spark.
  */
class AriaPropertiesSpec extends AnyFunSuite {

  /** scalacheck-native runner (no scalatestplus bridge in the offline
    * cache): 300 cases per property, failure message carries the args. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  case class Op(tid: Int, key: Int, isUpdate: Boolean)

  /** One epoch: returns (abortedTids, perKeyCommittedWriters). */
  def epoch(ops: Seq[Op], reorder: Boolean): (Set[Int], Map[Int, Seq[Int]]) = {
    val byTid = ops.groupBy(_.tid)
    val rts = mutable.Map[Int, Int]()
    val wts = mutable.Map[Int, Int]()
    for (o <- ops) {
      rts.updateWith(o.key)(v => Some(v.fold(o.tid)(math.min(_, o.tid))))
      if (o.isUpdate) wts.updateWith(o.key)(v => Some(v.fold(o.tid)(math.min(_, o.tid))))
    }
    val aborted = byTid.collect { case (tid, tops)
      if {
        val raw = tops.exists(o => wts.get(o.key).exists(w => w != 0 && w < tid))
        val war = tops.exists(o => o.isUpdate && rts.get(o.key).exists(r => r != 0 && r < tid))
        val waw = tops.exists(o => o.isUpdate && wts.get(o.key).exists(w => w != 0 && w < tid))
        if (reorder) waw || (raw && war) else raw || waw
      } => tid
    }.toSet
    val writers = ops.filter(o => o.isUpdate && !aborted.contains(o.tid))
      .groupBy(_.key).map { case (k, os) => k -> os.map(_.tid).distinct }
    (aborted, writers)
  }

  val genBatch: Gen[List[Op]] = for {
    nTxns <- Gen.choose(1, 25)
    ops <- Gen.listOf(for {
      tid <- Gen.choose(1, nTxns)
      key <- Gen.choose(1, 15)
      upd <- Gen.prob(0.4)
    } yield Op(tid, key, upd))
  } yield ops

  test("at most one committed writer per key per epoch") {
    check(Prop.forAll(genBatch) { ops =>
      val (_, writers) = epoch(ops, reorder = false)
      writers.values.forall(_.size <= 1)
    })
  }

  test("at most one committed writer per key per epoch (reorder mode)") {
    check(Prop.forAll(genBatch) { ops =>
      val (_, writers) = epoch(ops, reorder = true)
      writers.values.forall(_.size <= 1)
    })
  }

  test("the committed writer of a key is its minimum-Tid writer") {
    check(Prop.forAll(genBatch) { ops =>
      val (aborted, writers) = epoch(ops, reorder = false)
      writers.forall { case (k, tids) =>
        val minWriter = ops.filter(o => o.isUpdate && o.key == k).map(_.tid).min
        tids.forall(_ == minWriter)
      }
    })
  }

  test("the smallest Tid always commits") {
    check(Prop.forAll(genBatch) { ops =>
      ops.isEmpty || {
        val minTid = ops.map(_.tid).min
        val (aborted, _) = epoch(ops, reorder = false)
        !aborted.contains(minTid)
      }
    })
  }

  test("reorder mode commits a superset of no-reorder mode") {
    check(Prop.forAll(genBatch) { ops =>
      val (abortedBase, _) = epoch(ops, reorder = false)
      val (abortedReorder, _) = epoch(ops, reorder = true)
      // abort(reorder) = waw ∨ (raw ∧ war) ⊆ abort(base) = raw ∨ waw
      abortedReorder.subsetOf(abortedBase)
    })
  }

  test("read-only transactions never abort in reorder mode") {
    check(Prop.forAll(genBatch) { ops =>
      val readOnly = ops.groupBy(_.tid).collect {
        case (tid, tops) if tops.forall(!_.isUpdate) => tid
      }.toSet
      val (aborted, _) = epoch(ops, reorder = true)
      // a read-only txn has no write set → no WAW and no WAR → commits
      aborted.intersect(readOnly).isEmpty
    })
  }

  test("determinism: same batch → same outcome regardless of op order") {
    check(Prop.forAll(genBatch) { ops =>
      val a = epoch(ops, reorder = false)
      val b = epoch(scala.util.Random.shuffle(ops), reorder = false)
      a._1 == b._1
    })
  }
}
