package graft

/** Core data model of the KG-construction engine.
  *
  * The input table shape is mandated by BASELINE.json#input_hint:
  * (repo, path, commit, lang, content) — an Iceberg-style table of
  * source-code repositories. This generalizes the reference's document
  * corpus (one file = one unit of work, /root/reference/python.py:678-694)
  * with `lang` playing the role of the extension-based format tag
  * (/root/reference/python.py:465-476).
  *
  * All provenance is kept FLAT (no nested struct) so Catalyst column
  * pruning can drop unused provenance columns at the parquet scan —
  * at 10^12-file scale the (subj, pred, obj) projection used by the
  * linking stage must never drag `content`-sized payloads through a
  * shuffle.
  */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** One candidate (subj, pred, obj) triple with flat provenance.
  *
  * This is the reformulation of the reference's per-section extraction
  * output (e.g. extract_wisdom sections, DSRP relationship pairs —
  * /root/reference/Demo_Prompts/identify_dsrp_relationships/system.md)
  * as KG edges. `extractor` mirrors the reference's prompt-template
  * name; (repo, path, commit) mirror its per-file output naming
  * (/root/reference/python.py:733-737).
  */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    conf: Double,
    repo: String,
    path: String,
    commit: String,
    extractor: String,
    line: Int
)

/** A document that failed extraction or was rejected by a guard —
  * the reference's skip-and-continue error channel
  * (/root/reference/python.py:722-730, app.py:332-339) as a typed
  * quarantine row instead of a UI error list.
  */
final case class QuarantineRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    reason: String,
    detail: String
)

/** Mention → canonical entity assignment produced by the
  * canonicalization stage (connected components over the link graph).
  */
final case class EntityAssignment(
    entity: String,
    entityId: Long,
    canonicalId: Long
)

/** Node of the materialized graph. */
final case class GraphNode(
    canonicalId: Long,
    canonical: String,
    kind: String,
    memberCount: Long
)

/** Edge of the materialized graph (subject doc → canonical entity). */
final case class GraphEdge(
    subj: String,
    pred: String,
    canonicalId: Long,
    conf: Double,
    repo: String,
    path: String,
    commit: String
)
