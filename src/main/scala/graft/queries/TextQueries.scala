package graft.queries

object TextQueries {
  def all: Seq[Q] = Seq()
}
