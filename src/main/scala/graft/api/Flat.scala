package graft.api

/** Dot-path flatten/unflatten of nested maps/lists — the HTTP
  * query-string codec of the reference web UI (app/flat.py:5-96), ported
  * as a pure Scala utility (F7). Depth-capped exactly like the original.
  *
  * Values are `Map[String, Any]` / `Seq[Any]` / leaf scalars; flattened
  * form is `Map[String, Any]` with dot-joined keys and integer indices
  * for list positions, e.g.
  * `{a: [{x: 1}], b: {c: 4}}` ⇄ `{"a.0.x" -> 1, "b.c" -> 4}`.
  */
object Flat {

  val MaxDepth = 10

  class DepthError(msg: String) extends IllegalArgumentException(msg)

  def flatten(value: Any): Map[String, Any] = {
    def go(v: Any, prefix: String, depth: Int): Seq[(String, Any)] = {
      if (depth > MaxDepth) throw new DepthError(s"flatten: depth > $MaxDepth")
      v match {
        case m: Map[_, _] =>
          m.toSeq.flatMap { case (k, x) =>
            go(x, if (prefix.isEmpty) k.toString else s"$prefix.$k", depth + 1)
          }
        case s: Seq[_] =>
          s.zipWithIndex.flatMap { case (x, i) =>
            go(x, if (prefix.isEmpty) i.toString else s"$prefix.$i", depth + 1)
          }
        case leaf => Seq(prefix -> leaf)
      }
    }
    go(value, "", 0).toMap
  }

  /** Rebuild the nested structure. Sibling keys decide the node kind: if
    * every child key at a level is an integer, the node is a list ordered
    * by index — and the indices must be exactly 0..n−1, like the
    * reference's int_keys_to_list (app/flat.py:64-67: "must start from
    * 0" when min ≠ 0, "must have no gaps" when max > n−1); otherwise a
    * map.
    */
  def unflatten(flat: Map[String, Any]): Any = {
    if (flat.isEmpty) return Map.empty[String, Any]
    if (flat.keySet == Set("")) return flat("")

    def build(entries: Seq[(List[String], Any)], depth: Int): Any = {
      if (depth > MaxDepth) throw new DepthError(s"unflatten: depth > $MaxDepth")
      val groups = entries.groupBy(_._1.head)
      val children: Map[String, Any] = groups.map { case (head, es) =>
        val sub = es.map { case (path, v) => (path.tail, v) }
        // a key that is BOTH a leaf and a prefix ('metrics' alongside
        // 'metrics.0.name') is conflicting input: silently letting
        // the leaf win dropped the whole deeper subtree and the
        // caller's graph rendered empty with no diagnostic
        head -> (if (sub.exists(_._1.isEmpty)) {
          if (sub.exists(_._1.nonEmpty))
            throw new IllegalArgumentException(
              s"conflicting keys: '$head' is both a value and a prefix")
          sub.collectFirst { case (Nil, v) => v }.get
        } else build(sub, depth + 1))
      }
      if (children.keys.forall(k => k.forall(_.isDigit) && k.nonEmpty)) {
        val byIdx = children.map { case (k, v) => k.toInt -> v }
        // '0' and '00' both normalize to index 0: losing one entry
        // while the start/gap guards still pass would silently drop a
        // requested element
        if (byIdx.size != children.size)
          throw new IllegalArgumentException(
            "duplicate list indices after int normalization")
        if (byIdx.keys.min != 0)
          throw new IllegalArgumentException("must start from 0")
        if (byIdx.keys.max > byIdx.size - 1)
          throw new IllegalArgumentException("must have no gaps")
        byIdx.toSeq.sortBy(_._1).map(_._2)
      } else children
    }
    build(flat.toSeq.map { case (k, v) => (k.split('.').toList, v) }, 0)
  }

  /** Legend-label shortener (F8, make_short_names at
    * app/__init__.py:70-81): keep only the positions whose value varies
    * across the labels; when every position is constant, keep position 0
    * (reference behavior).
    */
  def shortenLabels(labels: Seq[String]): Seq[String] = {
    if (labels.size <= 1) return labels
    val parts = labels.map(_.split('.').toSeq)
    val width = parts.map(_.size).max
    val padded = parts.map(p => p.padTo(width, ""))
    // the varying-position judgment is Graph.shortNames' own (ONE
    // definition of the reference semantics); only the join shape
    // (dots, padding dropped) is this convenience form's
    val keep = Graph.varyingPositions(padded)
    padded.map(p => keep.map(p(_)).filter(_.nonEmpty).mkString("."))
  }
}
