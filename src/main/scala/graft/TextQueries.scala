package graft

object TextQueries {
  val entries: Seq[QueryDef] = Seq()
}
