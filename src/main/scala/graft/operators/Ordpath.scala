package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ordpath / DeweyID document-order labels (SURVEY.md §1.2; reference:
  * bundles/sirix-core/src/main/java/io/sirix/node/SirixDeweyID.java:35).
  *
  * A node's position is an integer array (`pos: array<int>`); document
  * order is lexicographic array order and ancestry is array-prefix
  * containment. Both are pure column expressions (codegen'd), so
  * containment joins can pre-filter on a top-segment equi-key before the
  * prefix test — no tree walk at query time.
  */
object Ordpath {

  /** a is an ancestor of b ⇔ a is a strict prefix of b. */
  def isAncestor(a: Column, b: Column): Column =
    size(a) < size(b) && slice(b, lit(1), size(a)) === a

  def isDescendant(a: Column, b: Column): Column = isAncestor(b, a)

  def isSelfOrAncestor(a: Column, b: Column): Column =
    a === b || isAncestor(a, b)

  /** Parent label = drop the last component. */
  def parent(a: Column): Column =
    when(size(a) > 0, slice(a, lit(1), size(a) - 1))

  def level(a: Column): Column = size(a)

  /** Sibling axes: same parent, position strictly after/before. The last-
    * component compare is guarded behind `when` — empty (root) labels have
    * no last element, and Spark's And does not short-circuit nulls away. */
  def isFollowingSibling(a: Column, b: Column): Column =
    coalesce(
      size(a) === size(b) && size(a) > 0 && parent(a) === parent(b) &&
        when(size(a) > 0 && size(b) > 0,
          element_at(b, size(b)) > element_at(a, size(a))),
      lit(false))

  def isPrecedingSibling(a: Column, b: Column): Column =
    isFollowingSibling(b, a)

  /** Document-order comparator: negative/zero/positive like compareTo.
    * Lexicographic with shorter-prefix-first (ancestors precede
    * descendants, matching the reference's pre-order). */
  def docOrderCmp(a: Column, b: Column): Column = {
    // first differing component decides; else shorter array first
    val n = least(size(a), size(b))
    val firstDiff = filter(
      zip_with(slice(a, lit(1), n), slice(b, lit(1), n), (x, y) => x - y),
      x => x =!= 0)
    when(size(firstDiff) > 0, element_at(firstDiff, 1))
      .otherwise(size(a) - size(b))
  }
}
