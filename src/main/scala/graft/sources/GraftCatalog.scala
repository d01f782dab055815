package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog plugin — the third Spark extension surface alongside
  * the repo's optimizer rules/strategy ([[graft.extensions
  * .GraftExtensions]]) and the [[SyntheticDocs]] TableProvider: tables
  * addressable from PURE SQL, no `read.format` plumbing:
  *
  *   spark.conf: spark.sql.catalog.graft = graft.sources.GraftCatalog
  *   SELECT count(*) FROM graft.synth.docs_500
  *
  * The `synth` namespace exposes `docs_<rows>` virtual tables backed
  * by [[SyntheticDocs.SynthTable]], so every pushdown the provider
  * implements (column pruning, range→partition pruning, COUNT(*)
  * from metadata) works identically through the catalog path. Being
  * generated, the namespace is infinite — `listTables` advertises a
  * few canonical sizes.
  *
  * Read-only by design: create/alter/drop/rename throw — a synthetic
  * corpus has no mutable state.
  */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  // ≤18 digits so `.toLong` can't overflow — a longer digit run is
  // "no such table", not a NumberFormatException out of loadTable
  private val DocsName = "docs_(\\d{1,18})".r

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    namespace match {
      case Array("synth") =>
        Array(1000L, 100000L, 10000000L).map(n =>
          Identifier.of(namespace, s"docs_$n"))
      case _ => throw new NoSuchNamespaceException(namespace)
    }

  override def loadTable(ident: Identifier): Table =
    (ident.namespace(), ident.name()) match {
      case (Array("synth"), DocsName(n)) =>
        new SyntheticDocs.SynthTable(n.toLong, parts = 8)
      case _ => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
