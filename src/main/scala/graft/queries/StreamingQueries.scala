package graft.queries

object StreamingQueries {
  def all: Seq[Q] = Seq()
}
