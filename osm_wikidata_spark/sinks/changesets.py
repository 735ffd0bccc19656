"""OSM write-back data plane (SURVEY.md §2.1 S12).

The reference's write-back is three steps: build a changeset-create
document (edit.py:15-26), mutate each matched element's XML with the
wikidata/wikipedia tags (websocket.py:242-279), and upload over
authenticated HTTP (edit.py:28-60).  The HTTP step is external and out of
scope (like S8/S9's fetches); everything data-shaped is here:

* :func:`new_changeset_xml` — the changeset-create document, byte-
  compatible with the reference's string layout;
* :func:`tag_elements` — per-element XML mutation as a vectorised UDF
  over the upload-gate output (XML is irregular per element, so this is
  Python-side; Arrow-batched, one parse per element);
* :func:`parse_osm_change` — the read-back/audit side: osmChange
  documents → ChangesetEdit rows (osm_api.py:29-49), pure JVM
  ``from_xml`` with an explicit schema.

At scale the element corpus is a table (one row per matched element,
XML as a string column); tagging is embarrassingly parallel and the
changeset-id assignment is a driver-side scalar per batch, mirroring the
reference's one-changeset-per-place-run model (websocket.py:150-180).
"""

from __future__ import annotations

import html

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType


def new_changeset_xml(comment: str, extra_tags: dict[str, str] | None = None) -> str:
    """Changeset-create document (edit.py:15-26, same line layout)."""
    tag_lines = [
        '    <tag k="created_by" v="https://osm.wikidata.link/"/>',
        f'    <tag k="comment" v="{html.escape(comment)}"/>',
    ]
    for k, v in (extra_tags or {}).items():
        if v:
            tag_lines.append(f'    <tag k="{html.escape(k)}" v="{html.escape(v)}"/>')
    tags = "\n".join(tag_lines)
    return f"<osm>\n  <changeset>\n{tags}\n  </changeset>\n</osm>"


def _update_one(
    content: str | None,
    qid: str | None,
    changeset_id,
    wiki_lang: str | None,
    wiki_title: str | None,
) -> str | None:
    """build_updated_xml + check_if_already_tagged + add_wikipedia_tag
    (websocket.py:242-279) on one element document; None = skip (the
    element already carries a wikidata tag — the reference short-circuits
    and records the existing value instead of editing)."""
    import xml.etree.ElementTree as ET

    if not content or not qid:
        return None
    root = ET.fromstring(content)
    if root.find('.//tag[@k="wikidata"]') is not None:
        return None
    elem = root[0]
    elem.set("changeset", str(int(changeset_id)))
    ET.SubElement(elem, "tag", {"k": "wikidata", "v": qid})
    # add_wikipedia_tag (websocket.py:37-53): skip when a language-
    # specific tag exists; overwrite a bare wikipedia tag; else append.
    # Both lang AND title must be present (the reference assumes title
    # exists whenever lang does; a null title here must not produce a
    # literal "en:None" tag value)
    if (
        wiki_lang
        and wiki_title
        and root.find(f'.//tag[@k="wikipedia:{wiki_lang}"]') is None
    ):
        value = f"{wiki_lang}:{wiki_title}"
        existing = root.find('.//tag[@k="wikipedia"]')
        if existing is not None:
            existing.set("v", value)
        else:
            ET.SubElement(elem, "tag", {"k": "wikipedia", "v": value})
    return ET.tostring(root, encoding="unicode")


@F.pandas_udf(StringType())
def updated_element_udf(
    element_xml: pd.Series,
    qid: pd.Series,
    changeset_id: pd.Series,
    wiki_lang: pd.Series,
    wiki_title: pd.Series,
) -> pd.Series:
    out = [
        _update_one(x, q, c, lang if isinstance(lang, str) else None,
                    title if isinstance(title, str) else None)
        for x, q, c, lang, title in zip(
            element_xml, qid, changeset_id, wiki_lang, wiki_title
        )
    ]
    return pd.Series(out, dtype="object")


def tag_elements(
    matches: DataFrame,
    changeset_id: int,
    xml_col: str = "element_xml",
    qid_col: str = "qid",
    lang_col: str | None = "wiki_lang",
    title_col: str | None = "wiki_title",
) -> DataFrame:
    """Write-ready element documents for one changeset.

    Adds ``element_data`` (the mutated XML to PUT; null = element already
    tagged, to be skipped) and ``skipped``.  The upload loop itself
    (edit.py:48-60) is external HTTP and stays out of scope.
    """
    lang = F.col(lang_col) if lang_col and lang_col in matches.columns else F.lit(None).cast("string")
    title = F.col(title_col) if title_col and title_col in matches.columns else F.lit(None).cast("string")
    out = matches.withColumn(
        "element_data",
        updated_element_udf(
            F.col(xml_col), F.col(qid_col), F.lit(changeset_id).cast("long"), lang, title
        ),
    )
    return out.withColumn("skipped", F.col("element_data").isNull())


_OSM_KINDS = ("node", "way", "relation")
_ELEM = (
    "array<struct<_changeset: string, _id: string, _timestamp: string,"
    " tag: array<struct<_k: string, _v: string>>>>"
)
_ACTION = "struct<" + ", ".join(f"{k}: {_ELEM}" for k in _OSM_KINDS) + ">"
OSMCHANGE_SCHEMA = "struct<" + ", ".join(
    f"{a}: array<{_ACTION}>" for a in ("create", "modify", "delete")
) + ">"


def parse_osm_change(payloads: DataFrame, col: str = "payload") -> DataFrame:
    """osmChange documents → ChangesetEdit rows (osm_api.py:29-49).

    One row per changed element that carries a wikidata tag:
    ``(changeset_id, osm_type, osm_id, saved, item_id)`` —
    model.ChangesetEdit's columns.  Pure JVM: explicit-schema
    ``from_xml`` + explodes; elements without a wikidata tag are dropped
    (the reference asserts they cannot occur in its own changesets).

    Plan shape: the document is parsed ONCE per row.  ``from_xml`` sits
    under an ``explode`` of a one-element array — a Generate node, which
    CollapseProject cannot inline expressions through — and all nine
    (action, kind) paths are folded into one tagged element array in a
    single projection.  (A plain aliased projection would NOT protect
    it: project collapsing re-inlines the from_xml into every consumer,
    re-parsing each document nine times.)
    """
    parsed = payloads.select(
        F.explode(F.array(F.from_xml(F.col(col), OSMCHANGE_SCHEMA))).alias("c")
    )

    def _tagged(action: str, kind: str) -> F.Column:
        """array<struct<osm_type, changeset, id, ts, tag>> for one path.

        Both array levels coalesce null→[] — an absent action or kind
        parses as null, and flatten/concat would otherwise null out the
        whole row's element list."""

        def pick(a):
            return F.coalesce(a[kind], F.array())

        def tag(e):
            return F.struct(
                F.lit(kind).alias("osm_type"),
                e["_changeset"].alias("changeset"),
                e["_id"].alias("id"),
                e["_timestamp"].alias("ts"),
                e["tag"].alias("tag"),
            )

        flat = F.flatten(
            F.transform(F.coalesce(F.col(f"c.{action}"), F.array()), pick)
        )
        return F.transform(flat, tag)

    all_elems = F.concat(
        *[
            _tagged(action, kind)
            for action in ("create", "modify", "delete")
            for kind in _OSM_KINDS
        ]
    )
    elems = parsed.select(F.explode(all_elems).alias("e"))
    wd = F.filter(F.col("e.tag"), lambda t: t["_k"] == "wikidata")
    return (
        elems.select(
            # try_cast, not cast: these ride in as XML attribute STRINGS,
            # and under ANSI mode (Spark 4 default) one malformed
            # attribute or wikidata tag value ("QABC", "") would fail the
            # whole ETL job; NULL marks the malformed element instead
            F.col("e.changeset").try_cast("long").alias("changeset_id"),
            F.col("e.osm_type").alias("osm_type"),
            F.col("e.id").try_cast("long").alias("osm_id"),
            F.col("e.ts").alias("saved"),
            wd.alias("__wd"),
        )
        .filter(F.size("__wd") > 0)
        .withColumn(
            "item_id",
            # F.get, not [0]: the guard is the preceding size() filter,
            # which Catalyst may collapse with this projection — get()
            # returns NULL out of bounds instead of faulting under ANSI.
            F.substring(F.get(F.col("__wd"), 0)["_v"], 2, 18).try_cast("long"),
        )
        .select("changeset_id", "osm_type", "osm_id", "saved", "item_id")
    )
