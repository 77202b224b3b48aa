package graft

object SketchQueries {
  val entries: Seq[QueryDef] = Seq()
}
