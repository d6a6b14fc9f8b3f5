package graft.plan

/** Top-level output column orderings (reference O1:
  * ProtoToAvroTranslator.scala:59,68,71 — a user-supplied `Ordering[String]`
  * applied to the select list at plan time; zero runtime cost).
  */
object FieldOrdering {

  /** Default: lexicographic (reference `ordering: Ordering[String] = Ordering.String`). */
  val Lexicographic: Ordering[String] = Ordering.String

  /** The id-first / metadata-last production ordering of the reference runner
    * (Main.scala:148-168): named ids in `idOrdering` first, then any other
    * `*_id`, then everything else, `metadata` last; lexicographic tiebreak.
    */
  def idFirst(idOrdering: List[String]): Ordering[String] = new Ordering[String] {
    private val lowestPriorityId = idOrdering.size
    private def priority(s: String): Int = s match {
      case x if x.endsWith("_id") =>
        val i = idOrdering.indexOf(x)
        if (i == -1) lowestPriorityId else i
      case "metadata" => lowestPriorityId + 2
      case _          => lowestPriorityId + 1
    }
    override def compare(x: String, y: String): Int = {
      val (px, py) = (priority(x), priority(y))
      if (px == py) Ordering.String.compare(x, y) else Ordering.Int.compare(px, py)
    }
  }
}
