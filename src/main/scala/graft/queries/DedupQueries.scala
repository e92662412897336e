package graft.queries

object DedupQueries {
  def all: Seq[Q] = Seq()
}
