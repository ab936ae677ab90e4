package graft.vocab

/** A flattened SKOS/OWL ontology concept (SURVEY.md §1.1 "Graph
  * (ontology)"; reference `data_etl_app/src/data_etl_app/models/skos_concept.py:22-47`).
  *
  * `matchLabels` = name ∪ altLabels is the match surface for brute
  * search (T8) and vocabulary splits (T10/T12). Identity is `name`
  * (unique within a scheme — duplicate labels are load-time errors).
  */
final case class Concept(
    scheme: String,
    name: String,
    uri: String,
    altLabels: Seq[String],
    ancestors: Seq[String]) {
  def matchLabels: Set[String] = altLabels.toSet + name
}

/** Ontology tree build + flatten (SURVEY.md T20; reference
  * `data_etl_app/src/data_etl_app/utils/rdf_to_graph_util.py:42-117`).
  *
  * Driver-side, one-time, tiny (≤ thousands of concepts) — the result is
  * broadcast to executors. The input is N-Triples-ish lines (the engine's
  * canonical graph interchange; see `graft.emit` for the writer side).
  */
object Ontology {
  final case class Triple(s: String, p: String, o: String)

  val SubClassOf = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
  val Label = "http://www.w3.org/2000/01/rdf-schema#label"
  val AltLabel = "http://www.w3.org/2004/02/skos/core#altLabel"

  /** Minimal N-Triples parser: `<s> <p> "literal" .` or `<s> <p> <o> .`
    * No escapes beyond \" and \\ (ontology labels are plain text).
    */
  def parseNTriples(text: String): Vector[Triple] = {
    text.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { line =>
        val m = NtLine.findFirstMatchIn(line)
        m.map { g =>
          val obj = if (g.group(3) != null) g.group(3)
                    else g.group(4).replace("\\\"", "\"").replace("\\\\", "\\")
          Triple(g.group(1), g.group(2), obj)
        }
      }.toVector
  }

  private val NtLine =
    """^<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|"((?:[^"\\]|\\.)*)")\s*\.\s*$""".r

  /** Flatten the `subClassOf` tree under `rootUri` into concepts whose
    * `ancestors` is the label path from the root (exclusive). Exactly one
    * `rdfs:label` per node; duplicate labels within a scheme raise.
    */
  def flatten(triples: Seq[Triple], rootUri: String, scheme: String): Vector[Concept] = {
    val children: Map[String, Seq[String]] =
      triples.filter(_.p == SubClassOf).groupBy(_.o).view.mapValues(_.map(_.s)).toMap
    val labels: Map[String, Seq[String]] =
      triples.filter(_.p == Label).groupBy(_.s).view.mapValues(_.map(_.o)).toMap
    val altLabels: Map[String, Seq[String]] =
      triples.filter(_.p == AltLabel).groupBy(_.s).view.mapValues(_.map(_.o)).toMap

    val out = Vector.newBuilder[Concept]
    val seenUris = scala.collection.mutable.HashSet.empty[String]
    val seenNames = scala.collection.mutable.HashSet.empty[String]

    def labelOf(uri: String): String = labels.get(uri) match {
      case Some(Seq(one)) => one
      case Some(many) =>
        throw new IllegalArgumentException(
          s"concept $uri has ${many.length} rdfs:label values; expected exactly 1")
      case None =>
        throw new IllegalArgumentException(s"concept $uri has no rdfs:label")
    }

    def walk(uri: String, path: List[String]): Unit = {
      if (!seenUris.add(uri)) return
      children.getOrElse(uri, Nil).sorted.foreach { child =>
        val name = labelOf(child)
        if (!seenNames.add(name))
          throw new IllegalArgumentException(
            s"duplicate concept label '$name' in scheme $scheme")
        out += Concept(scheme, name, child,
          altLabels.getOrElse(child, Nil).sorted, path.reverse)
        walk(child, name :: path)
      }
    }
    walk(rootUri, Nil)
    out.result()
  }
}
