package graft.queries

/** Assembles every query module into the single driver-facing catalog. */
object Catalog {
  def modules: Seq[Seq[Q]] = Seq(
    Relational.all,
    Scalars.all,
    Etl.all,
    Ext.all,
    Windows.all,
    Multimodal.all,
    Extra.all,
    Curation.all,
    Mining.all,
    Scale.all,
    Temporal.all,
    Lexical.all,
    Analytics.all,
    Insights.all,
    Signals.all,
    Spatial.all,
    Training.all,
    Frontier.all,
    Horizon.all,
    Zenith.all,
    Corpus.all
  )

  lazy val all: Seq[Q] = {
    val qs = modules.flatten
    val dupes = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    qs.sortBy(_.name)
  }
}
