package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver consumes `SparkEntry.queries` as a Map — a duplicate
  * face name silently SHADOWS the earlier definition (last wins) and
  * drops a face from the correctness gate without any error. Caught
  * live in round 16 (a new stage-count funnel landed on the existing
  * `q_funnel` name); this pin makes the next collision a CI failure
  * instead of a silent coverage loss.
  */
class RegistrySpec extends AnyFunSuite {

  test("face names are unique across every query registry") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty,
      s"duplicate face names shadow earlier definitions: $dups")
  }

  test("every oracle-checked face has a non-empty oracle string") {
    val empty = SparkEntry.allDefs
      .filter(q => q.oracle.exists(_.trim.isEmpty)).map(_.name)
    assert(empty.isEmpty, s"blank oracle SQL: $empty")
  }
}
